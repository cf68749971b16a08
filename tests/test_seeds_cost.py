"""Seed generation + cost surface tests."""
import numpy as np
import pytest

from obia_tpu.geometry import Affine
from obia_tpu.io.tiff import TiffReader, write_tiff
from obia_tpu.utils.cost import (chm_gradient, make_cost_surface, ndvi,
                                 normalise, slic_edge)
from obia_tpu.utils.seeds import (_detect_peaks, build_distance_matrix,
                                  make_canonical_seeds, make_chm_seeds,
                                  make_density_seeds)
from obia_tpu.vector import read_file

T = Affine(1.0, 0, 0, 0, -1.0, 64)


@pytest.fixture
def chm(rng):
    """CHM with 3 distinct peaks."""
    h, w = 64, 64
    arr = rng.random((h, w)).astype(np.float32) * 0.5
    for (r, c, height) in ((10, 10, 12.0), (30, 45, 8.0), (50, 20, 15.0)):
        yy, xx = np.mgrid[0:h, 0:w]
        arr += height * np.exp(-((yy - r) ** 2 + (xx - c) ** 2) / 18.0)
    return arr


def test_detect_peaks(chm):
    peaks = _detect_peaks(chm, v_min=5.0, min_dist_px=4, sigma=1)
    assert 2 <= len(peaks) <= 4
    found = {tuple(p) for p in peaks}
    for target in ((10, 10), (30, 45), (50, 20)):
        assert any(abs(p[0] - target[0]) <= 2 and abs(p[1] - target[1]) <= 2
                   for p in found), target


def test_make_chm_and_density_seeds(chm, tmp_path):
    chm_tif = str(tmp_path / "chm.tif")
    write_tiff(chm_tif, chm, transform=T, crs="EPSG:32633")
    out = str(tmp_path / "chm_seeds.gpkg")
    make_chm_seeds(chm_tif, out, h_min_m=5.0, min_dist_px=4, gauss_sigma=1)
    gdf = read_file(out)
    assert 2 <= len(gdf) <= 4
    assert "ch_max" in gdf.columns
    out2 = str(tmp_path / "den_seeds.gpkg")
    make_density_seeds(chm_tif, out2, d_min=5.0, min_dist_px=4, gauss_sigma=1)
    assert len(read_file(out2)) >= 2


def test_make_seeds_missing_raster(tmp_path):
    with pytest.raises(SystemExit):
        make_chm_seeds(str(tmp_path / "nope.tif"), str(tmp_path / "o.gpkg"))


def test_distance_matrix_matches_naive(rng):
    import math
    n = 12
    xs = rng.random(n) * 50
    ys = rng.random(n) * 50
    cost = rng.random((64, 64)).astype(np.float32)
    tfm = T
    weight, xy_thresh, samples = 0.5, 0.8, 12
    D = build_distance_matrix(xs, ys, cost, tfm, weight, xy_thresh, samples)
    # naive oracle mirroring reference semantics
    inv = ~tfm
    for i in range(n):
        for j in range(i + 1, n):
            dx, dy = xs[j] - xs[i], ys[j] - ys[i]
            xy = math.hypot(dx, dy)
            if xy == 0:
                want = 0.0
            elif xy <= xy_thresh:
                want = xy
            else:
                ts = np.linspace(0, 1, samples + 2, dtype=np.float32)[1:-1]
                xl = xs[i] + ts * dx
                yl = ys[i] + ts * dy
                cols = inv.a * xl + inv.b * yl + inv.c
                rows = inv.d * xl + inv.e * yl + inv.f
                ri = np.clip(np.round(rows).astype(int), 0, 63)
                ci = np.clip(np.round(cols).astype(int), 0, 63)
                want = xy * (1 + weight * cost[ri, ci].mean())
            np.testing.assert_allclose(D[i, j], want, rtol=2e-4)
            assert D[i, j] == D[j, i]


def test_canonical_seeds_pipeline(chm, tmp_path):
    chm_tif = str(tmp_path / "chm.tif")
    write_tiff(chm_tif, chm, transform=T, crs="EPSG:32633")
    chm_seeds = str(tmp_path / "chm_seeds.gpkg")
    den_seeds = str(tmp_path / "den_seeds.gpkg")
    make_chm_seeds(chm_tif, chm_seeds, h_min_m=5.0, min_dist_px=3)
    make_density_seeds(chm_tif, den_seeds, d_min=5.0, min_dist_px=3)
    cost_tif = str(tmp_path / "cost.tif")
    write_tiff(cost_tif, np.full((64, 64), 0.5, np.float32), transform=T,
               crs="EPSG:32633")
    out = str(tmp_path / "canonical.gpkg")
    final = make_canonical_seeds(chm_seeds, den_seeds, chm_tif, cost_tif,
                                 out, merge_radius=3.0)
    assert len(final) >= 2
    back = read_file(out, layer="canonical_seeds")
    assert set(["id", "cluster", "ch_max", "origin"]).issubset(back.columns)
    # duplicate seeds (chm+density at same peaks) merged into clusters
    assert back["cluster"].nunique() <= len(back)


def test_cost_surface(tmp_path, rng, chm):
    h, w = 64, 64
    wv3 = rng.random((h, w, 8)).astype(np.float32) * 1000
    wv3_tif = str(tmp_path / "wv3.tif")
    write_tiff(wv3_tif, wv3, transform=T, crs="EPSG:32633")
    chm_tif = str(tmp_path / "chm.tif")
    write_tiff(chm_tif, chm, transform=T, crs="EPSG:32633")
    out = str(tmp_path / "cost.tif")
    with pytest.warns(UserWarning):
        make_cost_surface(wv3_tif, chm_tif, out)  # no slic -> 3 terms
    r = TiffReader(out)
    arr = r.read()[:, :, 0]
    assert arr.shape == (h, w)
    valid = arr != -9999.0
    assert valid.all()
    assert 0 <= arr.min() and arr.max() <= 1
    assert r.nodata == -9999.0
    with pytest.raises(SystemExit):
        make_cost_surface(wv3_tif, chm_tif, out, weights=(1, 1, 1, 1))


def test_slic_edge_and_ndvi():
    lab = np.zeros((10, 10), np.int64)
    lab[:, 5:] = 2
    e = slic_edge(lab)
    assert e[3, 4] > 0 or e[3, 5] > 0
    red = np.array([[0.2]]); nir = np.array([[0.8]])
    np.testing.assert_allclose(ndvi(red, nir), 0.6, atol=1e-6)


def test_cost_rejects_slic_only_weights_without_slic(tmp_path, rng):
    """weights=(0,0,0,1) passes the sum check but leaves nothing to
    normalise without a SLIC layer — must raise cleanly, not divide by
    zero."""
    h, w = 32, 32
    T2 = Affine(1.0, 0, 0, 0, -1.0, h)
    wv3 = rng.random((h, w, 8)).astype(np.float32) * 1000
    chm = rng.random((h, w, 1)).astype(np.float32) * 20
    wv3_tif = str(tmp_path / "wv3b.tif")
    chm_tif = str(tmp_path / "chmb.tif")
    write_tiff(wv3_tif, wv3, transform=T2, crs="EPSG:32633")
    write_tiff(chm_tif, chm, transform=T2, crs="EPSG:32633")
    with pytest.raises(ValueError, match="SLIC"):
        make_cost_surface(wv3_tif, chm_tif, str(tmp_path / "c.tif"),
                          weights=(0, 0, 0, 1))


def test_peaks_survive_near_nodata_border():
    """Smoothing must not bleed the nodata fill: a clear peak a few px
    from a nodata border used to be suppressed to -inf for any sigma."""
    from obia_tpu.utils.seeds import _detect_peaks

    arr = np.full((40, 40), 1.0, np.float32)
    arr[:, :6] = np.nan           # nodata strip (clipped raster edge)
    arr[20, 9] = 20.0             # tree 3 px from the border
    peaks = _detect_peaks(arr, v_min=2.0, min_dist_px=3, sigma=1.0)
    assert len(peaks) == 1 and tuple(peaks[0]) == (20, 9)


def test_cost_surface_nodata_regions(tmp_path, rng):
    """Nodata pixels in the inputs must come out as -9999 in the cost
    raster (they were written as plausible 0..1 values), and valid areas
    must stay finite."""
    from obia_tpu.geometry import Affine
    from obia_tpu.io.tiff import TiffReader, write_tiff
    from obia_tpu.utils.cost import NODATA, make_cost_surface

    T = Affine(1.0, 0, 0, 0, -1.0, 64)
    wv3 = (rng.random((64, 64, 8)) * 1000).astype(np.float32)
    wv3[:, :10] = -9999.0  # nodata strip
    wv3_tif = str(tmp_path / "wv3.tif")
    write_tiff(wv3_tif, wv3, transform=T, crs="EPSG:32610", nodata=-9999.0)
    chm = (rng.random((64, 64, 1)) * 30).astype(np.float32)
    chm_tif = str(tmp_path / "chm.tif")
    write_tiff(chm_tif, chm, transform=T, crs="EPSG:32610")
    out = str(tmp_path / "cost.tif")
    import pytest as _pt
    with _pt.warns(UserWarning):
        make_cost_surface(wv3_tif, chm_tif, out)
    got = TiffReader(out).read()[:, :, 0]
    assert (got[:, :10] == NODATA).all()
    assert np.isfinite(got[:, 10:]).all()
    assert (got[:, 10:] >= 0).all() and (got[:, 10:] <= 1).all()


def test_slic_edge_binary_not_percentile_collapsed():
    """A realistic edge fraction (<2% of pixels) must keep the edge term
    alive — percentile normalisation of a binary map zeroed it."""
    from obia_tpu.utils.cost import slic_edge

    lab = np.zeros((128, 128), np.int64)
    lab[:, 64:] = 1  # one vertical boundary: ~0.8% of pixels
    e = slic_edge(lab)
    assert e.max() == 1.0 and e.sum() >= 128
    # NaN regions (nodata label raster) are never edges
    labf = lab.astype(np.float64)
    labf[:20, :] = np.nan
    ef = slic_edge(labf)
    assert ef[:19, :].sum() == 0
