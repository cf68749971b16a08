"""Polygonizer tests: area/coverage invariants + hole handling."""
import numpy as np

from obia_tpu.geometry.polygonize import polygonize_labels


def test_single_pixel():
    lab = np.full((3, 3), -1, np.int32)
    lab[1, 1] = 5
    polys = polygonize_labels(lab)
    assert list(polys.keys()) == [5]
    p = polys[5][0]
    assert p.area == 1.0
    assert p.bounds == (1.0, 1.0, 2.0, 2.0)


def test_rectangle_and_area_conservation(rng):
    lab = rng.integers(0, 5, size=(24, 31)).astype(np.int32)
    polys = polygonize_labels(lab)
    total = sum(p.area for plist in polys.values() for p in plist)
    assert abs(total - lab.size) < 1e-9
    for label, plist in polys.items():
        want = int((lab == label).sum())
        got = sum(p.area for p in plist)
        assert abs(got - want) < 1e-9, label


def test_hole():
    lab = np.zeros((10, 10), np.int32)
    lab[3:7, 3:7] = 1  # island inside label 0
    polys = polygonize_labels(lab)
    outer = polys[0][0]
    assert len(outer.interiors) == 1
    assert abs(outer.area - (100 - 16)) < 1e-9
    assert abs(polys[1][0].area - 16) < 1e-9
    # point containment respects the hole
    assert not outer.contains_points(np.array(5.0), np.array(5.0))
    assert outer.contains_points(np.array(1.0), np.array(1.0))


def test_diagonal_touch_splits():
    # two pixels of the same label touching only at a corner ->
    # two separate polygons (4-connectivity semantics)
    lab = np.full((4, 4), 7, np.int32)
    lab[1, 1] = 3
    lab[2, 2] = 3
    polys = polygonize_labels(lab)
    assert len(polys[3]) == 2
    assert all(abs(p.area - 1.0) < 1e-9 for p in polys[3])


def test_simplify_collinear():
    lab = np.zeros((8, 8), np.int32)
    polys = polygonize_labels(lab)
    p = polys[0][0]
    # 8x8 square simplifies to 4 corners (5 with closing point)
    assert len(p.exterior.coords_array) == 5
    assert p.area == 64.0


def test_polygonize_rasterize_roundtrip_fuzz():
    """The filtered/reordered create_objects path re-rasterises polygons
    (row i -> label i) and implicitly assumes polygonise->rasterise is the
    identity on label rasters — assert that exactly, pixel coords and
    world coords, native and pure-Python stitchers."""
    from obia_tpu.geometry.affine import Affine
    from obia_tpu.geometry.geom import affine_transform
    from obia_tpu.geometry.polygonize import polygonize_labels
    from obia_tpu.geometry.rasterize import rasterize

    rng = np.random.default_rng(0)
    t = Affine(2.0, 0, 500.0, 0, -2.0, 900.0)
    tl = [t.a, t.b, t.d, t.e, t.c, t.f]
    for trial in range(12):
        H, W = (int(x) for x in rng.integers(6, 24, 2))
        lab = rng.integers(0, 5, (H, W)).astype(np.int32)
        polys = polygonize_labels(lab, use_native=(trial % 2 == 0))
        shapes = [(p, label + 1) for label, ps in polys.items()
                  for p in ps]
        out = rasterize(shapes, (H, W), fill=0) - 1
        np.testing.assert_array_equal(out, lab, err_msg=f"pixel t{trial}")
        wshapes = [(affine_transform(p, tl), v) for p, v in shapes]
        wout = rasterize(wshapes, (H, W), transform=t, fill=0) - 1
        np.testing.assert_array_equal(wout, lab, err_msg=f"world t{trial}")
