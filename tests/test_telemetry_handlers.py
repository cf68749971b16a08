"""Telemetry registry + Image preview/stretch paths."""
import numpy as np
import pytest

from obia_tpu import telemetry
from obia_tpu.geometry import Affine
from obia_tpu.handlers.geotif import Image, image_from_array


def test_telemetry_stage_and_report():
    telemetry.reset()
    with telemetry.stage("unit.test", megapixels=2.0):
        pass
    with telemetry.stage("unit.test"):
        pass
    rep = telemetry.report()
    assert rep["unit.test"]["count"] == 2
    assert rep["unit.test"]["total_s"] >= 0
    telemetry.reset()
    assert telemetry.report() == {}


def test_telemetry_timed_decorator():
    telemetry.reset()

    @telemetry.timed("decorated.fn")
    def f(x):
        return x + 1

    assert f(1) == 2
    assert telemetry.report()["decorated.fn"]["count"] == 1


@pytest.fixture
def img(rng):
    data = rng.random((32, 32, 4)).astype(np.float32)
    return image_from_array(data, Affine(1, 0, 0, 0, -1, 32), crs=4326)


def test_to_image_stretches(img):
    for stretch in (None, "histogram_equalization", "clahe"):
        pil = img.to_image([0, 1, 2], stretch_type=stretch)
        assert pil.size == (32, 32)
    with pytest.raises(ValueError):
        img.to_image([0, 1])  # needs exactly 3 bands
    with pytest.raises(IndexError):
        img.to_image([0, 1, 99])
    with pytest.raises(ValueError):
        img.to_image([0, 1, 2], stretch_type="bogus")


def test_image_properties(img):
    assert img.shape == (32, 32, 4)
    assert (img.height, img.width, img.count) == (32, 32, 4)
    assert img.rasterio_obj is None  # in-memory image: no file handle
    d1 = img.device_array()
    d2 = img.device_array()
    assert d1 is d2  # cached single upload


def test_stage_throughput_accumulates():
    """report() sums timings across calls — the throughput next to them
    must cover every call, not just the last one."""
    from obia_tpu import telemetry

    telemetry.reset()
    with telemetry.stage("agg.test", megapixels=10.0):
        pass
    with telemetry.stage("agg.test", megapixels=30.0):
        pass
    rec = telemetry.report()["agg.test"]
    total_s = rec["total_s"] if "total_s" in rec else rec.get("total")
    assert rec["mp_per_s"] == pytest.approx(40.0 / total_s)
