"""Regressions for geometry-layer edge cases: scanline parity at
vertex-on-center rows, WKB Z/M/SRID decoding, within() on concave
outers, empty-geometry bounds, CRS equality, blur border padding."""
import struct

import numpy as np

from obia_tpu.geometry.crs import CRS
from obia_tpu.geometry.geom import MultiPolygon, Polygon
from obia_tpu.geometry.rasterize import rasterize
from obia_tpu.geometry.wkb import dumps, loads


def _pip(px, py, ring):
    """Independent even-odd point-in-polygon (half-open convention)."""
    inside = False
    for (x1, y1), (x2, y2) in zip(ring[:-1], ring[1:]):
        if (y1 > py) != (y2 > py):
            if px < x1 + (py - y1) / (y2 - y1) * (x2 - x1):
                inside = not inside
    return inside


def test_rasterize_vertex_on_center_row():
    """A vertex exactly on a pixel-center row must toggle parity ONCE —
    an inclusive row interval counted both incident edges and inverted
    the rest of the row."""
    ring = [(0, 0), (5, 2.5), (0, 5), (0, 0)]
    m = rasterize([Polygon(ring)], (5, 10)).astype(bool)
    want = np.array([[_pip(c + 0.5, r + 0.5, ring) for c in range(10)]
                     for r in range(5)])
    np.testing.assert_array_equal(m, want)
    assert m[2, :5].all() and not m[2, 5:].any()


def test_rasterize_matches_pip_fuzz():
    rng = np.random.default_rng(3)
    for _ in range(20):
        pts = rng.random((3, 2)) * np.array([12.0, 8.0])
        # snap some vertices onto center rows to stress the parity rule
        pts[0, 1] = np.floor(pts[0, 1]) + 0.5
        ring = [tuple(p) for p in pts] + [tuple(pts[0])]
        m = rasterize([Polygon(ring)], (8, 12)).astype(bool)
        want = np.array([[_pip(c + 0.5, r + 0.5, ring) for c in range(12)]
                         for r in range(8)])
        np.testing.assert_array_equal(m, want)


def test_wkb_z_m_srid_variants():
    ring = [(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)]
    # EWKB Z point
    p = loads(b"\x01" + struct.pack("<I3d", 0x80000001, 1.0, 2.0, 9.0))
    assert (p.x, p.y) == (1.0, 2.0)
    # EWKB ZM + SRID point
    p = loads(b"\x01" + struct.pack(
        "<II4d", 0x80000001 | 0x40000000 | 0x20000000, 4326,
        3.0, 4.0, 9.0, 8.0))
    assert (p.x, p.y) == (3.0, 4.0)
    # ISO ZM polygon (3003) and M polygon (2003)
    for code, extra in ((3003, (1.0, 2.0)), (2003, (7.0,))):
        body = struct.pack("<II", code, 1) + struct.pack("<I", len(ring))
        for x, y in ring:
            body += struct.pack(f"<{2 + len(extra)}d", x, y, *extra)
        poly = loads(b"\x01" + body)
        np.testing.assert_array_equal(poly.exterior.coords_array,
                                      np.array(ring, float))
    # own round-trip unaffected
    q = loads(dumps(Polygon(ring)))
    np.testing.assert_array_equal(q.exterior.coords_array,
                                  np.array(ring, float))


def test_within_concave_and_hole():
    # U-shaped outer: two arms around a gap at 4 <= x <= 6
    outer = Polygon([(0, 0), (10, 0), (10, 1), (6, 1), (6, 8), (4, 8),
                     (4, 1), (0, 1), (0, 0)])
    strip = Polygon([(1, 0.2), (9, 0.2), (9, 0.8), (1, 0.8), (1, 0.2)])
    assert strip.within(outer)  # fully inside the bottom bar
    high = Polygon([(1, 0.2), (5, 7.0), (9, 0.2), (1, 0.2)])
    assert not high.within(outer)  # apex climbs the gap between the arms
    # inner edge spanning a hole whose vertices avoid it
    holed = Polygon([(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)],
                    [[(4, 4), (6, 4), (6, 6), (4, 6), (4, 4)]])
    spans = Polygon([(1, 4.5), (9, 4.5), (9, 5.5), (1, 5.5), (1, 4.5)])
    assert not spans.within(holed)
    ok = Polygon([(1, 1), (3, 1), (3, 3), (1, 3), (1, 1)])
    assert ok.within(holed)


def test_empty_multipolygon_bounds_and_crs_eq():
    b = MultiPolygon([]).bounds
    assert len(b) == 4 and all(np.isnan(v) for v in b)
    c = CRS.from_epsg(32633)
    assert c == np.int64(32633)
    assert not (c == "garbage that is not wkt".upper()) or True  # no raise
    assert c != object()
    assert c in [CRS.from_epsg(4326), 32633]


def test_gaussian_blur_scipy_parity():
    import jax.numpy as jnp
    from scipy import ndimage as ndi

    from obia_tpu.ops.slic import _gaussian_blur

    rng = np.random.default_rng(0)
    a = rng.random((20, 24, 3)).astype(np.float32)
    got = np.asarray(_gaussian_blur(jnp.asarray(a), 2.0))
    want = np.stack([ndi.gaussian_filter(a[..., c], 2.0)
                     for c in range(3)], -1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_sjoin_mixed_left_geometries():
    """A point row on the LEFT must go through the general predicate path
    (the all-points fast path silently skipped non-polygon left rows)."""
    from obia_tpu.geometry.geom import Point
    from obia_tpu.vector import GeoDataFrame, sjoin

    left = GeoDataFrame({"lid": [1, 2]},
                        geometry=[Polygon([(0, 0), (4, 0), (4, 4), (0, 4),
                                           (0, 0)]),
                                  Point(10.0, 10.0)])
    right = GeoDataFrame({"rid": [7, 8]},
                         geometry=[Point(1.0, 1.0), Point(10.0, 10.0)])
    out = sjoin(left, right, predicate="intersects")
    got = set(zip(out["lid"], out["rid"]))
    assert got == {(1, 7), (2, 8)}


def test_gpkg_datetime_and_quoted_column(tmp_path):
    """DATETIME columns and column names containing quotes must write and
    read back through the GeoPackage layer."""
    from obia_tpu.geometry.geom import Point
    from obia_tpu.io.gpkg import write_gpkg, read_gpkg

    ts = np.array(["2026-08-18T10:00:00", "2026-08-18T11:30:00"],
                  dtype="datetime64[s]")
    path = str(tmp_path / "dt.gpkg")
    write_gpkg(path, [("ts", ts), ('size "px"', np.array([3, 4]))],
               [Point(0.0, 0.0), Point(1.0, 1.0)], layer="t",
               crs="EPSG:4326")
    cols, geoms, _ = read_gpkg(path, layer="t")
    assert list(cols["ts"]) == ["2026-08-18T10:00:00",
                                "2026-08-18T11:30:00"]
    assert list(cols['size "px"']) == [3, 4]
    assert len(geoms) == 2


def test_gdf_to_file_datetime_column(tmp_path):
    """GeoDataFrame.to_file hands pandas Timestamps to the GPKG writer —
    they must serialise as ISO text, not crash parameter binding."""
    from obia_tpu.geometry.geom import Point
    from obia_tpu.vector import GeoDataFrame, read_file

    g = GeoDataFrame({"ts": np.array(["2026-01-02T03:04:05"] * 2,
                                     dtype="datetime64[s]")},
                     geometry=[Point(0.0, 0.0), Point(1.0, 1.0)],
                     crs="EPSG:4326")
    path = str(tmp_path / "dtcol.gpkg")
    g.to_file(path, layer="x")
    back = read_file(path, layer="x")
    assert str(back["ts"].iloc[0]).startswith("2026-01-02")


def test_linestring_predicates():
    """intersects/within must work for line layers (GeoJSON/Shapefile
    line features used to raise TypeError or silently return False)."""
    from obia_tpu.geometry import box
    from obia_tpu.geometry.geom import LineString, Point

    b = box(0, 0, 5, 5)
    inside = LineString([(1, 1), (2, 2)])
    crossing = LineString([(1, 1), (9, 9)])
    outside = LineString([(7, 7), (9, 9)])
    assert inside.within(b)
    assert not crossing.within(b)
    assert not outside.within(b)
    assert b.intersects(inside) and inside.intersects(b)
    assert b.intersects(crossing)
    assert not b.intersects(outside)
    assert inside.intersects(LineString([(1, 2), (2, 1)]))
    assert not inside.intersects(LineString([(5, 6), (6, 7)]))
    assert inside.intersects(Point(1.5, 1.5))
    assert not inside.intersects(Point(3.0, 1.5))


def test_overlaps_touch_only_is_false():
    """shapely semantics: boundary contact without interior intersection
    is NOT overlap (abutting tile/segment polygons used to count)."""
    from obia_tpu.geometry import box

    b = box(0, 0, 5, 5)
    assert not b.overlaps(box(5, 0, 10, 5))      # shared edge
    assert not b.overlaps(box(5, 5, 8, 8))       # corner touch
    assert not b.overlaps(box(0, 0, 5, 5))       # equal
    assert not b.overlaps(box(1, 1, 2, 2))       # contained
    assert not b.overlaps(box(9, 9, 11, 11))     # disjoint
    assert b.overlaps(box(3, 3, 8, 8))           # genuine overlap
    assert b.overlaps(box(3, -1, 8, 5))          # vertex-through crossing


def test_empty_polygon_within_no_crash():
    from obia_tpu.geometry import box

    assert not Polygon().within(box(0, 0, 5, 5))
    assert not MultiPolygon([]).within(box(0, 0, 5, 5))


def test_gpkg_nullable_int_and_na_roundtrip(tmp_path):
    """pandas.NA must bind as NULL and an int column with missing values
    must keep INTEGER affinity (it came back as strings)."""
    import pandas as pd

    from obia_tpu.geometry import box
    from obia_tpu.vector import GeoDataFrame, read_file

    g = GeoDataFrame({"n": pd.array([1, None, 3], dtype="Int64"),
                      "m": [10, None, 30]},
                     geometry=[box(i, 0, i + 1, 1) for i in range(3)])
    object.__setattr__(g, "crs", CRS.from_epsg(32610))
    path = str(tmp_path / "na.gpkg")
    g.to_file(path)
    back = read_file(path)
    assert back["n"].iloc[0] == 1 and back["n"].iloc[2] == 3
    assert back["n"].iloc[1] is None or np.isnan(back["n"].iloc[1])
    assert back["m"].iloc[0] == 10 and not isinstance(back["m"].iloc[0], str)


def test_gpkg_custom_srs_definition(tmp_path):
    """A GPKG whose srs_id is a custom registry id (GDAL-style >=100000)
    must take the CRS from the stored definition, not fabricate
    EPSG:<srs_id>."""
    import sqlite3

    from obia_tpu.geometry import box
    from obia_tpu.vector import GeoDataFrame, read_file

    g = GeoDataFrame({"a": [1]}, geometry=[box(0, 0, 1, 1)])
    object.__setattr__(g, "crs", CRS.from_epsg(32610))
    path = str(tmp_path / "srs.gpkg")
    g.to_file(path, layer="t")
    wkt = CRS.from_epsg(32610).to_wkt()
    con = sqlite3.connect(path)
    con.execute("UPDATE gpkg_spatial_ref_sys SET srs_id=100001, "
                "organization='NONE', organization_coordsys_id=0 "
                "WHERE srs_id=32610")
    con.execute("UPDATE gpkg_geometry_columns SET srs_id=100001")
    con.commit(); con.close()
    back = read_file(path, layer="t")
    assert back.crs is not None
    assert back.crs.to_epsg() != 100001  # not a fabricated EPSG
    assert back.crs.to_epsg() == 32610   # recovered from the WKT definition


def test_sjoin_suffixes_both_sides():
    """geopandas semantics: colliding columns get _left AND _right."""
    from obia_tpu.geometry import box
    from obia_tpu.geometry.geom import Point
    from obia_tpu.vector import GeoDataFrame, sjoin

    left = GeoDataFrame({"v": [1]}, geometry=[box(0, 0, 2, 2)])
    right = GeoDataFrame({"v": [9]}, geometry=[Point(1, 1)])
    out = sjoin(left, right)
    assert "v_left" in out.columns and "v_right" in out.columns
    assert out["v_left"].iloc[0] == 1 and out["v_right"].iloc[0] == 9
