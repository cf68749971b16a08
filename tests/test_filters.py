"""XLA filters vs scipy oracles."""
import numpy as np
import pytest
from scipy import ndimage as ndi

from obia_tpu.ops import filters as F


@pytest.fixture
def arr(rng):
    return rng.random((40, 52)).astype(np.float32)


def test_gaussian_matches_scipy(arr):
    got = np.asarray(F.gaussian_filter(arr, 2.0))
    want = ndi.gaussian_filter(arr, 2.0)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_maximum_filter_matches_scipy(arr):
    for size in (3, 5, 9):
        got = np.asarray(F.maximum_filter(arr, size))
        want = ndi.maximum_filter(arr, size=size)
        np.testing.assert_array_equal(got, want)


def test_uniform_filter_matches_scipy(arr):
    got = np.asarray(F.uniform_filter(arr, 5))
    want = ndi.uniform_filter(arr, size=5)
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("axis", [0, 1])
@pytest.mark.parametrize("mode", ["reflect", "nearest"])
def test_sobel_matches_scipy(arr, axis, mode):
    got = np.asarray(F.sobel(arr, axis=axis, mode=mode))
    want = ndi.sobel(arr, axis=axis, mode=mode)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_local_entropy_basic(rng):
    # constant image -> entropy 0; two-value checkerboard -> entropy ~1 bit
    const = np.full((20, 20), 7, np.uint8)
    e = np.asarray(F.local_entropy(const, F.disk_footprint(3)))
    np.testing.assert_allclose(e, 0.0, atol=1e-6)
    checker = np.indices((20, 20)).sum(0) % 2 * 255
    e2 = np.asarray(F.local_entropy(checker.astype(np.uint8),
                                    F.disk_footprint(3)))
    np.testing.assert_allclose(e2[5:15, 5:15], 1.0, atol=0.05)


def test_entropy_against_manual(rng):
    img = rng.integers(0, 8, (16, 16)).astype(np.uint8)
    fp = F.disk_footprint(2)
    got = np.asarray(F.local_entropy(img, fp, n_levels=8))
    # manual at an interior pixel
    r, c = 8, 8
    ys, xs = np.nonzero(fp)
    vals = [img[r + y - 2, c + x - 2] for y, x in zip(ys, xs)]
    counts = np.bincount(vals, minlength=8).astype(float)
    p = counts / counts.sum()
    want = -(p[p > 0] * np.log2(p[p > 0])).sum()
    np.testing.assert_allclose(got[r, c], want, atol=1e-5)


def test_laplacian_3x3_matches_cv2_ksize3(rng):
    """The XLA Laplacian must use cv2's ksize=3 aperture kernel — it is
    documented as the device twin of the host sharpness path."""
    cv2 = pytest.importorskip("cv2")
    from obia_tpu.ops.filters import laplacian_3x3

    x = (rng.random((32, 36)) * 255).astype(np.float32)
    want = cv2.Laplacian(x, cv2.CV_32F, ksize=3)
    got = np.asarray(laplacian_3x3(x, mode="reflect"))
    # compare away from the border (cv2 default BORDER_REFLECT_101
    # differs from our reflect at the 1-px rim)
    np.testing.assert_allclose(got[2:-2, 2:-2], want[2:-2, 2:-2],
                               rtol=1e-5, atol=1e-4)


def test_gaussian_sigma_zero_returns_float32(rng):
    from obia_tpu.ops.filters import gaussian_filter

    x = (rng.random((8, 8)) * 255).astype(np.uint8)
    out = gaussian_filter(x, 0.0)
    assert out.dtype == np.float32
    np.testing.assert_array_equal(np.asarray(out), x.astype(np.float32))
    with pytest.raises(ValueError):
        gaussian_filter(x, -1.0)
