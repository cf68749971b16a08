"""End-to-end segmentation API tests (create_segments / create_objects /
segment / Segments)."""
import numpy as np
import pytest

from obia_tpu.geometry import Affine
from obia_tpu.handlers.geotif import image_from_array
from obia_tpu.segmentation.segment import Segments, segment
from obia_tpu.segmentation.segment_boundaries import (LABEL_RASTER_ATTR,
                                                      create_segments,
                                                      normalize_band)
from obia_tpu.segmentation.segment_statistics import create_objects
from obia_tpu.vector import read_file


@pytest.fixture
def img(small_rgb):
    t = Affine(2.0, 0, 500000.0, 0, -2.0, 4000000.0)
    return image_from_array(small_rgb, t, crs="EPSG:32633")


def test_normalize_band_constant():
    out = normalize_band(np.full((4, 4), 3.0))
    assert (out == 0).all()


def test_create_segments_basic(img):
    gdf = create_segments(img, method="slic", n_segments=30)
    assert list(gdf["segment_id"]) == list(range(1, len(gdf) + 1))
    assert gdf.crs.to_epsg() == 32633
    lr = np.asarray(gdf.attrs[LABEL_RASTER_ATTR])
    assert lr.shape == img.img_data.shape[:2]
    assert lr.max() == len(gdf) - 1
    # polygons live in world coordinates
    b = gdf.total_bounds
    assert 500000 <= b[0] < b[2] <= 500000 + 2 * img.width
    # area conservation: total polygon area == raster area (in world units)
    total = sum(g.area for g in gdf.geometry)
    assert abs(total - img.width * img.height * 4.0) < 1e-6
    # input not mutated (quirk #1 fixed)
    assert img.img_data.max() > 0.5


def test_create_segments_rejects_bad_kwargs(img):
    with pytest.raises(TypeError):
        create_segments(img, method="slic", bogus_param=1)
    with pytest.raises(Exception):
        create_segments(img, method="watershed")


def test_create_objects_fused(img):
    gdf = create_segments(img, method="slic", n_segments=20)
    objs = create_objects(gdf, img)
    assert len(objs) == len(gdf)
    assert objs.columns[0] == "segment_id"
    assert objs.columns[-1] == "geometry"
    # column schema: b{band}_{stat} for 3 bands x 6 spectral + 6 textural,
    # plus the reference's point-cloud slots
    for b in range(3):
        for stat in ("mean", "variance", "min", "max", "skewness", "kurtosis",
                     "contrast", "dissimilarity", "homogeneity", "ASM",
                     "energy", "correlation"):
            assert f"b{b}_{stat}" in objs.columns, f"b{b}_{stat}"
    for pc in ("pai", "fhd", "ch", "mean_intensity", "variance_intensity"):
        assert pc in objs.columns
        assert objs[pc].isna().all()
    # spot-check mean vs direct masking
    lr = np.asarray(gdf.attrs[LABEL_RASTER_ATTR])
    for sid in (1, len(gdf) // 2, len(gdf)):
        m = lr == sid - 1
        want = img.img_data[:, :, 0][m].mean()
        got = objs.loc[objs["segment_id"] == sid, "b0_mean"].iloc[0]
        np.testing.assert_allclose(got, want, rtol=1e-5)


def test_create_objects_flag_gating(img):
    gdf = create_segments(img, method="slic", n_segments=15)
    objs = create_objects(gdf, img, calc_skewness=False, calc_ASM=False,
                          calc_energy=False, calc_pai=False, calc_fhd=False,
                          calc_ch=False, calc_mean_intensity=False,
                          calc_variance_intensity=False)
    assert "b0_skewness" not in objs.columns
    assert "b0_ASM" not in objs.columns
    assert "pai" not in objs.columns
    assert "b0_mean" in objs.columns


def test_create_objects_guards(img):
    gdf = create_segments(img, method="slic", n_segments=15)
    with pytest.raises(ValueError):
        create_objects(gdf, img, calculate_spectral=False,
                       calculate_textural=False)
    with pytest.raises(NotImplementedError):
        create_objects(gdf, img, calculate_structural=True)


def test_segment_facade_and_gpkg(img, tmp_path):
    s = segment(img, method="slic", n_segments=25, compactness=10)
    assert isinstance(s, Segments)
    assert s.method == "slic"
    assert s.params["n_segments"] == 25
    # params don't leak across instances (quirk #11 fixed)
    s2 = segment(img, method="slic", n_segments=10)
    assert s.params["n_segments"] == 25 and s2.params["n_segments"] == 10
    path = str(tmp_path / "segments.gpkg")
    s.write_segments(path)
    back = read_file(path)
    assert len(back) == len(s.segments)
    assert "b0_mean" in back.columns


def test_segment_facade_quickshift_async_polygonize(img):
    """segment() runs polygonisation in a background thread on EVERY
    method; the quickshift (host-raster) branch must resolve to real
    geometries identical to the sync create_segments path."""
    s = segment(img, method="quickshift", kernel_size=3, max_dist=6,
                ratio=0.5, random_seed=42)
    assert all(g is not None for g in s.segments.geometry)
    sync = create_segments(img, method="quickshift", kernel_size=3,
                           max_dist=6, ratio=0.5, random_seed=42)
    for g, w in zip(s.segments.geometry, sync.geometry):
        assert g.bounds == w.bounds and g.area == w.area


def test_to_segmented_image(img):
    s = segment(img, method="slic", n_segments=16)
    pil = img.to_image([0, 1, 2])
    out = s.to_segmented_image(pil)
    arr = np.array(out)
    assert arr.shape == (img.height, img.width, 3)
    # some yellow boundary pixels exist
    yellow = (arr[:, :, 0] == 255) & (arr[:, :, 1] == 255) & (arr[:, :, 2] == 0)
    assert yellow.any()


def test_segment_with_mask(img):
    h, w = img.img_data.shape[:2]
    mask = np.ones((h, w), np.uint8)
    mask[:, : w // 3] = 0
    gdf = create_segments(img, method="slic", n_segments=20, mask=mask)
    lr = np.asarray(gdf.attrs[LABEL_RASTER_ATTR])
    assert (lr[:, : w // 3] == -1).all()
    assert lr[:, w // 3:].max() >= 0


def test_full_pipeline_deterministic(small_rgb):
    """Race-detection stand-in (SURVEY.md §5): same input -> bit-identical
    labels, features, and predictions across runs."""
    t = Affine(1.0, 0, 0, 0, -1.0, 96)
    img1 = image_from_array(small_rgb.copy(), t, crs=32633)
    img2 = image_from_array(small_rgb.copy(), t, crs=32633)
    s1 = segment(img1, method="slic", n_segments=30)
    s2 = segment(img2, method="slic", n_segments=30)
    np.testing.assert_array_equal(s1.label_raster, s2.label_raster)
    for col in s1.segments.columns:
        if col == "geometry":
            continue
        v1 = s1.segments[col].to_numpy(dtype=float)
        v2 = s2.segments[col].to_numpy(dtype=float)
        np.testing.assert_array_equal(np.nan_to_num(v1), np.nan_to_num(v2))


def test_create_objects_textural_off_keeps_schema(img):
    gdf = create_segments(img, method="slic", n_segments=10)
    objs = create_objects(gdf, img, calculate_textural=False)
    # reference schema: textural columns present but NaN
    assert "b0_contrast" in objs.columns
    assert objs["b0_contrast"].isna().all()
    assert objs["b0_mean"].notna().all()


def test_segment_pointcloud_stats_exact():
    """Hand-computed PAI/FHD/CH + intensity moments on two segments."""
    from obia_tpu.ops.pointcloud import segment_pointcloud_stats
    labels = np.zeros((4, 4), np.int32)
    labels[:, 2:] = 1
    t = Affine(1.0, 0, 0.0, 0, -1.0, 4.0)  # pixel (r,c) -> world (c, 4-r)
    # segment 0: 4 points, 2 at ground (z<1), one at 3.5 (CH), one at 1.5
    # segment 1: 3 points, all ground
    pts = {
        "X": np.array([0.5, 1.5, 0.5, 1.5, 2.5, 3.5, 2.5]),
        "Y": np.array([3.5, 3.5, 2.5, 2.5, 3.5, 3.5, 2.5]),
        "Z": np.array([0.2, 0.8, 3.7, 1.7, 0.1, 0.4, 0.9]),
        "Intensity": np.array([10.0, 20.0, 30.0, 40.0, 5.0, 5.0, 5.0]),
    }
    out = segment_pointcloud_stats(pts, labels, t, 2, voxel_resolution=1.0)
    np.testing.assert_allclose(out["ch"], [3.7, 0.9])
    np.testing.assert_allclose(out["pai"], [np.log(4 / 2), np.log(3 / 3)])
    # seg 0 layers rel zmin=0.2: [0,0,3,1] -> p = [2/4,1/4,1/4]
    p0 = np.array([0.5, 0.25, 0.25])
    np.testing.assert_allclose(out["fhd"][0], -(p0 * np.log(p0)).sum())
    np.testing.assert_allclose(out["fhd"][1], 0.0)  # all one layer
    np.testing.assert_allclose(out["mean_intensity"], [25.0, 5.0])
    np.testing.assert_allclose(out["variance_intensity"],
                               [np.var([10, 20, 30, 40.0]), 0.0])


def test_segment_pointcloud_outside_and_empty():
    from obia_tpu.ops.pointcloud import segment_pointcloud_stats
    labels = np.zeros((2, 2), np.int32)
    t = Affine(1.0, 0, 0.0, 0, -1.0, 2.0)
    pts = {"X": np.array([10.0]), "Y": np.array([10.0]),
           "Z": np.array([1.0])}  # outside the raster; no Intensity field
    out = segment_pointcloud_stats(pts, labels, t, 2, voxel_resolution=1.0)
    assert np.isnan(out["ch"]).all() and np.isnan(out["pai"]).all()
    assert np.isnan(out["mean_intensity"]).all()


def test_create_objects_with_pointcloud(img):
    gdf = create_segments(img, n_segments=12, compactness=8)
    rng = np.random.default_rng(0)
    n = 400
    # points across the raster extent in world coordinates
    xs = 500000.0 + rng.uniform(0, 2.0 * img.img_data.shape[1], n)
    ys = 4000000.0 - rng.uniform(0, 2.0 * img.img_data.shape[0], n)
    pc = {"X": xs, "Y": ys, "Z": rng.uniform(0, 10, n),
          "Intensity": rng.uniform(0, 255, n)}
    objs = create_objects(gdf, img, calculate_structural=True,
                          calculate_radiometric=True, pointcloud=pc,
                          voxel_resolution=1.0)
    for col in ("pai", "fhd", "ch", "mean_intensity", "variance_intensity"):
        assert col in objs.columns
        assert np.isfinite(objs[col].to_numpy()).any(), col
    # structural stub behavior preserved when no cloud is passed
    with pytest.raises(NotImplementedError):
        create_objects(gdf, img, calculate_structural=True)


def test_calculate_structural_stats_single():
    from obia_tpu.segmentation.segment_statistics import (
        calculate_structural_stats)
    pc = {"Z": np.array([0.1, 0.2, 2.5, 2.6])}
    out = calculate_structural_stats(pc, 1.0)
    np.testing.assert_allclose(out["ch"], 2.6)
    np.testing.assert_allclose(out["pai"], np.log(4 / 2))
    p = np.array([0.5, 0.5])
    np.testing.assert_allclose(out["fhd"], -(p * np.log(p)).sum())


def test_lazy_rle_label_raster_path(small_rgb, monkeypatch):
    """Force the RLE download + RLE polygonizer + lazy dense raster path
    (normally only taken above 4 MP) and check it matches the dense path."""
    import obia_tpu.ops.slic as S
    from obia_tpu.geometry import Affine
    from obia_tpu.handlers.geotif import image_from_array
    from obia_tpu.segmentation.segment_boundaries import (LABEL_RASTER_ATTR,
                                                          create_segments,
                                                          unwrap_attr)

    img = image_from_array(small_rgb, Affine(1, 0, 0, 0, -1, 96),
                           crs="EPSG:32633")
    dense = create_segments(img, method="slic", n_segments=24)
    monkeypatch.setattr(S, "_RLE_MIN_PIXELS", 1)
    lazy = create_segments(img, method="slic", n_segments=24)

    lr = unwrap_attr(lazy.attrs[LABEL_RASTER_ATTR])
    assert isinstance(lr, S.LazyRLERaster)
    np.testing.assert_array_equal(
        np.asarray(lr),
        np.asarray(unwrap_attr(dense.attrs[LABEL_RASTER_ATTR])))
    assert len(lazy) == len(dense)
    # identical polygon sets (RLE-native collector vs dense collector)
    for a, b in zip(lazy.geometry, dense.geometry):
        assert abs(a.area - b.area) < 1e-9
        assert np.allclose(a.bounds, b.bounds)


def test_create_objects_filtered_segments_not_stale(img):
    """ADVICE r2 high: after filtering rows out of a segments frame, the
    device-resident label raster attached by create_segments is STALE
    (row i no longer maps to label i); create_objects must compute stats
    against the re-rasterised labels, not the stale device copy."""
    segs = create_segments(img, method="slic", n_segments=24)
    # drop the first half of the objects; keep attrs (pandas propagates)
    kept = segs.iloc[len(segs) // 2:].reset_index(drop=True)
    kept.attrs = dict(segs.attrs)
    objs = create_objects(kept, img)
    assert len(objs) == len(kept)

    # oracle: per-polygon mean via direct rasterisation
    from obia_tpu.geometry.rasterize import rasterize
    H, W, _ = img.img_data.shape
    shapes = [(geom, i) for i, geom in enumerate(kept.geometry)]
    lab = rasterize(shapes, (H, W), transform=img.transform, fill=-1,
                    dtype=np.int32)
    for i in [0, len(kept) - 1]:
        m = lab == i
        assert m.any()
        want = float(img.img_data[:, :, 0][m].mean())
        got = float(objs["b0_mean"].iloc[i])
        assert abs(want - got) < 1e-4, (i, want, got)


def test_lazy_rle_raster_consumers(small_rgb, monkeypatch):
    """ADVICE r2 high: with the lazy RLE raster attached (large scenes),
    boundary overlays and classified-raster export index/compare the
    raster — LazyRLERaster must behave array-like at those boundaries."""
    import obia_tpu.ops.slic as S

    t = Affine(1, 0, 0, 0, -1, 96)
    img2 = image_from_array(small_rgb, t, crs="EPSG:32633")
    monkeypatch.setattr(S, "_RLE_MIN_PIXELS", 1)
    s = segment(img2, method="slic", n_segments=24)
    lr = s._segments.attrs[LABEL_RASTER_ATTR].value
    assert isinstance(lr, S.LazyRLERaster)
    # to_segmented_image slices labels[:, 1:] via boundary_mask
    from PIL.Image import fromarray
    pil = fromarray((np.clip(small_rgb, 0, 1) * 255).astype(np.uint8))
    preview = s.to_segmented_image(pil)
    assert preview.size == (small_rgb.shape[1], small_rgb.shape[0])

    # write_geotiff path does lab >= 0 and lab + 1 on the attached raster
    from obia_tpu.classification.classify import ClassifiedImage
    from obia_tpu.vector import GeoDataFrame
    objs = s.segments
    gdf = GeoDataFrame(objs)
    gdf.attrs = dict(objs.attrs)
    gdf["predicted_class"] = np.arange(1, len(gdf) + 1) % 3
    ci = ClassifiedImage(gdf, None, None, None, t, "EPSG:32633", {},
                         label_raster=lr)
    import tempfile, os
    out = os.path.join(tempfile.mkdtemp(), "cls.tif")
    ci.write_geotiff(out)
    assert os.path.exists(out)


def test_strict_reference_glcm_escape_hatch(img):
    """strict_reference_glcm=True reproduces the reference's texture path
    BUG-COMPATIBLY (bbox crop, background zeros, slab-global quantise,
    and the [:, :, band] axis bug on the band-first masked array)."""
    segs = create_segments(img, method="slic", n_segments=12)
    objs = create_objects(segs, img, strict_reference_glcm=True)
    default = create_objects(segs, img)
    # the buggy slab (C, Hc) differs from the true band plane -> values
    # must diverge from the fixed path on real data
    a = objs["b0_contrast"].to_numpy(float)
    b = default["b0_contrast"].to_numpy(float)
    assert np.isfinite(a).any()
    assert not np.allclose(np.nan_to_num(a), np.nan_to_num(b))

    # independent oracle for one object: inline reference recipe
    from obia_tpu.segmentation.segment_boundaries import (LABEL_RASTER_ATTR,
                                                          unwrap_attr)
    lab = np.asarray(unwrap_attr(segs.attrs[LABEL_RASTER_ATTR]))
    sid = 0
    m = lab == sid
    r = np.flatnonzero(m.any(1)); c = np.flatnonzero(m.any(0))
    crop = np.asarray(img.img_data, np.float32)[r[0]:r[-1] + 1,
                                                c[0]:c[-1] + 1]
    mc = m[r[0]:r[-1] + 1, c[0]:c[-1] + 1]
    masked = np.where(mc[None], np.moveaxis(crop, 2, 0), np.nan)
    slab = masked[:, :, 0]  # the axis bug: column 0 of the crop
    clean = np.nan_to_num(np.asarray(slab, np.float64))
    mn, mx = clean.min(), clean.max()
    q = (np.zeros(clean.shape, np.uint8) if mx == mn
         else ((clean - mn) / (mx - mn) * 255).astype(np.uint8))
    import math
    offs = [(int(round(math.sin(t) * 2)), int(round(math.cos(t) * 2)))
            for t in (0.0, math.pi / 4, math.pi / 2, 3 * math.pi / 4)]
    vals = []
    H2, W2 = q.shape
    for dr, dc in offs:
        P = np.zeros((256, 256))
        for rr in range(H2):
            for cc in range(W2):
                r2, c2 = rr + dr, cc + dc
                if 0 <= r2 < H2 and 0 <= c2 < W2:
                    P[q[rr, cc], q[r2, c2]] += 1
    # symmetric + normed + contrast
        P = P + P.T
        if P.sum():
            P /= P.sum()
        i = np.arange(256)[:, None]; j = np.arange(256)[None, :]
        vals.append((P * (i - j) ** 2).sum())
    want = float(np.mean(vals))
    np.testing.assert_allclose(a[sid], want, rtol=1e-6)


def test_create_objects_reordered_rows(img):
    """A REORDERED segments frame (same length) must not read the attached
    positional label raster — stats would silently bind to wrong rows."""
    from obia_tpu.segmentation.segment_boundaries import create_segments
    from obia_tpu.segmentation.segment_statistics import create_objects

    segments = create_segments(img, method="slic", n_segments=12)
    fwd = create_objects(segments, img)
    rev_in = segments.iloc[::-1].copy()
    rev = create_objects(rev_in, img)
    a = fwd.sort_values("segment_id")["b0_mean"].to_numpy()
    b = rev.sort_values("segment_id")["b0_mean"].to_numpy()
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)
