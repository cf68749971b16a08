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
