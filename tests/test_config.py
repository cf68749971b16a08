"""Typed config dataclasses."""
import pytest

from obia_tpu.config import (ClassifyConfig, MosaicConfig, QuickshiftConfig,
                             SlicConfig, StatsConfig, TilingConfig)


def test_slic_config_kwargs_roundtrip(small_rgb):
    from obia_tpu.ops.slic import slic
    cfg = SlicConfig(n_segments=20, compactness=5.0)
    labels = slic(small_rgb, **cfg.kwargs())
    assert labels.max() >= 1


def test_config_validation():
    with pytest.raises(ValueError):
        SlicConfig(n_segments=0)
    with pytest.raises(ValueError):
        ClassifyConfig(method="svm")
    with pytest.raises(ValueError):
        ClassifyConfig(test_size=1.5)
    with pytest.raises(ValueError):
        TilingConfig(tile_size=10, buffer=20)
    with pytest.raises(ValueError):
        QuickshiftConfig(max_dist=0)


def test_config_replace():
    cfg = SlicConfig(n_segments=100)
    cfg2 = cfg.replace(n_segments=50)
    assert cfg.n_segments == 100 and cfg2.n_segments == 50


def test_classify_config_kwargs():
    kw = ClassifyConfig(method="mlp", compute_reports=True).kwargs()
    assert kw["method"] == "mlp" and kw["compute_reports"] is True
