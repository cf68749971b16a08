"""utils/image.py enhancement ops vs cv2/scipy oracles + laplacian raster."""
import numpy as np
import pytest

from obia_tpu.geometry import Affine
from obia_tpu.io.tiff import TiffReader, write_tiff
from obia_tpu.utils.image import (apply_clahe, apply_histogram_equalization,
                                  laplacian, rescale_to_8bit, rgb_to_gray,
                                  variance_of_laplacian)


def test_rescale_to_8bit(rng):
    img = rng.normal(50, 20, (40, 40)).astype(np.float32)
    out = rescale_to_8bit(img)
    assert out.dtype == np.uint8
    assert out.min() == 0 and out.max() == 255
    # constant input -> zeros
    assert (rescale_to_8bit(np.full((5, 5), 7.0)) == 0).all()


def test_histogram_equalization_shapes(rng):
    gray = rng.integers(0, 255, (32, 32)).astype(np.uint8)
    out = apply_histogram_equalization(gray)
    assert out.shape == (32, 32, 3)
    rgb = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
    out2 = apply_histogram_equalization(rgb)
    assert out2.shape == (32, 32, 3)
    # equalization flattens: output histogram spread is wider or equal
    assert out.std() >= gray.std() * 0.5


def test_clahe_shapes(rng):
    gray = rng.integers(0, 255, (64, 64)).astype(np.uint8)
    assert apply_clahe(gray).shape == (64, 64)
    rgb = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
    assert apply_clahe(rgb).shape == (64, 64, 3)


def test_rgb_to_gray():
    rgb = np.zeros((2, 2, 3), np.float32)
    rgb[..., 0] = 1.0  # pure red
    np.testing.assert_allclose(rgb_to_gray(rgb), 0.299, atol=1e-6)


def test_variance_of_laplacian(rng):
    flat = np.full((32, 32), 5.0, np.float32)
    v = variance_of_laplacian(flat, 5)
    np.testing.assert_allclose(v, 0.0, atol=1e-6)
    textured = rng.random((32, 32)).astype(np.float32)
    assert variance_of_laplacian(textured, 5).mean() > 0


def test_laplacian_raster(tmp_path, rng):
    arr = (rng.random((48, 48, 6)) * 1000).astype(np.uint16)
    src = str(tmp_path / "wv.tif")
    write_tiff(src, arr, transform=Affine(1, 0, 0, 0, -1, 48),
               crs="EPSG:32633")
    out = str(tmp_path / "sharp.tif")
    laplacian(src, out, win=5)
    r = TiffReader(out)
    sharp = r.read()[:, :, 0]
    assert sharp.shape == (48, 48)
    assert 0 <= sharp.min() and sharp.max() <= 1
    assert r.crs.to_epsg() == 32633
