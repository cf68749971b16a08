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


def test_cli_commands_registered():
    from click.testing import CliRunner
    from obia_tpu.cli import main
    r = CliRunner().invoke(main, ["--help"])
    assert r.exit_code == 0
    for cmd in ("segment", "tiled-segments", "chm-seeds", "density-seeds",
                "canonical-seeds", "cost-surface", "bench", "info"):
        assert cmd in r.output


def test_cli_segment(tmp_path, rng):
    import numpy as np
    from click.testing import CliRunner
    from obia_tpu.cli import main
    from obia_tpu.geometry import Affine
    from obia_tpu.io.tiff import write_tiff
    arr = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    tif = str(tmp_path / "s.tif")
    write_tiff(tif, arr, transform=Affine(1, 0, 0, 0, -1, 64), crs=32633)
    out = str(tmp_path / "out.gpkg")
    r = CliRunner().invoke(main, ["segment", tif, out, "--n-segments", "9"])
    assert r.exit_code == 0, r.output
    from obia_tpu.vector import read_file
    assert len(read_file(out)) > 2
