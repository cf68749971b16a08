"""Sharded mosaic driver: label fidelity vs single-device, seam metric."""
import numpy as np
import pytest

from obia_tpu.ops.slic import slic
from obia_tpu.parallel.mosaic import boundary_map, seam_overhead, segment_mosaic
from obia_tpu.parallel.sharded import make_mesh


def test_segment_mosaic_matches_single_device(small_rgb):
    mesh = make_mesh(8)
    labels_m, k_m = segment_mosaic(small_rgb, n_segments=30,
                                   compactness=10.0, mesh=mesh)
    labels_s = slic(small_rgb, n_segments=30, compactness=10.0,
                    start_label=0, convert2lab=False)
    # identical partitions (sharded SLIC is bit-identical; CCL/merge order
    # is deterministic)
    assert labels_m.shape == labels_s.shape
    overhead = seam_overhead(labels_m, labels_s.astype(np.int32),
                             tolerance_px=0)
    assert overhead == 0.0
    assert k_m == labels_s.max() + 1


def test_segment_mosaic_nondivisible(small_rgb):
    mesh = make_mesh(8)
    img = small_rgb[:90, :123]  # not divisible by mesh dims
    labels, k = segment_mosaic(img, n_segments=20, mesh=mesh)
    assert labels.shape == img.shape[:2]
    assert labels.min() == 0 and labels.max() == k - 1


@pytest.mark.slow
def test_segment_mosaic_matches_single_device_2048():
    """VERDICT r1 item 8: sharded == single-device equality at real strip
    lengths (2048^2 on the 8-device CPU mesh)."""
    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:2048, 0:2048]
    img = np.stack([np.sin(yy / 97.0) + np.cos(xx / 131.0),
                    np.sin((yy + xx) / 151.0),
                    np.cos(yy / 71.0) * np.sin(xx / 113.0)], axis=-1)
    img = (img + rng.normal(0, 0.05, img.shape)).astype(np.float32)
    img -= img.min()
    img /= img.max()
    mesh = make_mesh(8)
    # max_num_iter=3: the equality property is iteration-independent and
    # the full 10 k-means sweeps at 4 MP take minutes on the 1-core CPU CI
    labels_m, k_m = segment_mosaic(img, n_segments=3000, compactness=10.0,
                                   mesh=mesh, max_num_iter=3)
    labels_s = slic(img, n_segments=3000, compactness=10.0, max_num_iter=3,
                    start_label=0, convert2lab=False)
    overhead = seam_overhead(labels_m, labels_s.astype(np.int32),
                             tolerance_px=0)
    assert overhead == 0.0
    assert k_m == labels_s.max() + 1


def test_seam_overhead_metric():
    a = np.zeros((20, 20), np.int32)
    a[:, 10:] = 1
    b = np.zeros((20, 20), np.int32)
    b[:, 10:] = 1
    assert seam_overhead(a, b) == 0.0
    c = np.zeros((20, 20), np.int32)
    c[10:, :] = 1  # completely different boundary
    assert seam_overhead(a, c, tolerance_px=0) > 50.0


def test_mosaic_pipeline_end_to_end(small_rgb, tmp_path):
    """Config 5: pod-parallel segmentation + classification -> GPKG."""
    from obia_tpu.geometry import Affine
    from obia_tpu.handlers.geotif import image_from_array
    from obia_tpu.parallel.mosaic import mosaic_pipeline
    from obia_tpu.utils.utils import label_segments
    from obia_tpu.vector import GeoDataFrame, read_file

    img = image_from_array(small_rgb, Affine(1, 0, 0, 0, -1, 96),
                           crs="EPSG:32633")
    mesh = make_mesh(8)
    # first pass: objects only (to derive training labels); small GLCM
    # level count keeps the 8-virtual-device histogram tables CI-sized
    okw = {"objects_kwargs": {"glcm_levels": 32}}
    objects = mosaic_pipeline(img, n_segments=24, mesh=mesh, **okw)
    assert len(objects) >= 4
    assert "b0_mean" in objects.columns
    pts, cls = [], []
    for i in range(0, len(objects), 2):
        c = objects.geometry.iloc[i].centroid
        pts.append(c)
        cls.append(1 if c.x < 64 else 2)
    training, _ = label_segments(objects,
                                 GeoDataFrame({"class": cls}, geometry=pts))
    out_path = str(tmp_path / "mosaic.gpkg")
    classified = mosaic_pipeline(
        img, n_segments=24, mesh=mesh, output_gpkg=out_path,
        training_classes=training, **okw,
        classify_kwargs={"method": "rf", "n_estimators": 15,
                         "random_state": 0})
    assert "predicted_class" in classified.columns
    back = read_file(out_path)
    assert len(back) == len(classified)


def test_create_objects_ignores_stale_exec(small_rgb):
    """Once gdf rows desync from the mesh-resident label raster (a row
    filter re-rasterises row i -> label i), create_objects must fall back
    to the single-device path instead of reducing over the STALE sharded
    raster through the _exec closures."""
    from obia_tpu.geometry import Affine
    from obia_tpu.handlers.geotif import image_from_array
    from obia_tpu.segmentation.segment_boundaries import create_segments
    from obia_tpu.segmentation.segment_statistics import create_objects

    img = image_from_array(small_rgb, Affine(1, 0, 0, 0, -1, 96),
                           crs="EPSG:32633")
    segments = create_segments(img, method="slic", n_segments=12)
    filtered = segments.iloc[1:].copy()  # rows no longer match label ids

    def boom(*a, **k):
        raise AssertionError("stale sharded closure must not be called")

    objs = create_objects(filtered, img,
                          _exec={"spectral": boom, "glcm": boom})
    assert len(objs) == len(filtered)
    assert np.isfinite(objs["b0_mean"].to_numpy()).all()
    # the unfiltered gdf keeps using the attached raster: values must
    # match the rows it shares with the filtered run
    full = create_objects(segments, img)
    np.testing.assert_allclose(objs["b0_mean"].to_numpy(),
                               full["b0_mean"].to_numpy()[1:],
                               rtol=1e-5, atol=1e-6)


def test_sharded_dust_merge_bitwise_vs_single_device(monkeypatch):
    """The dust-regime sharded merge (per-shard raw edge buffers +
    pmin-reduced head sweeps + compact tail) must be bitwise-identical to
    the single-device two-phase merge. The threshold is patched down so a
    CI-sized scene exercises the big-K structure of both paths."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    import obia_tpu.ops.connectivity as C
    import obia_tpu.parallel.sharded as S
    from obia_tpu.ops.stats import pad_num_segments

    monkeypatch.setattr(C, "_MERGE_TWO_PHASE_MIN_K", 1 << 10)

    rng = np.random.default_rng(3)
    for (H, W, mn, mx) in [(256, 512, 6, 400), (128, 256, 4, 60)]:
        noisy = rng.integers(0, 6, (H, W)).astype(np.int32)
        noisy[rng.random((H, W)) < 0.02] = -1
        lab, k, conv = C.scan_ccl_dense_labels(jnp.asarray(noisy))
        k = int(k)
        assert bool(conv)
        assert pad_num_segments(k) > C._MERGE_TWO_PHASE_MIN_K

        ref_lab, ref_k = C.merge_small_device(lab, k, mn, mx)
        mesh = make_mesh(8)
        lab_sh = jax.device_put(np.asarray(lab),
                                NamedSharding(mesh, P("ty", "tx")))
        out_lab, out_k = S.sharded_merge_small(mesh, lab_sh, k, mn, mx)
        assert out_k == ref_k
        assert np.array_equal(np.asarray(ref_lab), np.asarray(out_lab))
