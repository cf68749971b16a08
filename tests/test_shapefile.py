"""Shapefile codec round-trips (obia_tpu/io/shapefile.py) through the
public read_file / to_file dispatch."""
import struct

import numpy as np
import pandas as pd
import pytest

from obia_tpu.geometry.geom import (LineString, MultiPolygon, Point,
                                    Polygon, box)
from obia_tpu.vector import GeoDataFrame, read_file


def test_roundtrip_points_with_attributes(tmp_path):
    gdf = GeoDataFrame(
        {"cls": ["veg", "water", "soil"], "height": [1.5, np.nan, 3.25],
         "count": [10, 20, 30], "ok": [True, False, True]},
        geometry=[Point(1, 2), Point(3, 4), Point(5, 6)],
        crs="EPSG:32610")
    p = tmp_path / "pts.shp"
    gdf.to_file(str(p))
    for ext in (".shp", ".shx", ".dbf", ".prj"):
        assert (tmp_path / f"pts{ext}").exists()
    back = read_file(str(p))
    assert len(back) == 3
    assert back.crs is not None and back.crs.to_epsg() == 32610
    assert list(back["cls"]) == ["veg", "water", "soil"]
    assert back["count"].tolist() == [10, 20, 30]
    assert back["ok"].tolist() == [True, False, True]
    assert back["height"][0] == pytest.approx(1.5)
    assert pd.isna(back["height"][1])
    assert back["height"][2] == pytest.approx(3.25)
    for g0, g1 in zip(gdf.geometry, back.geometry):
        assert (g0.x, g0.y) == (g1.x, g1.y)


def test_roundtrip_polygons_with_holes(tmp_path):
    holed = Polygon([(0, 0), (10, 0), (10, 10), (0, 10)],
                    holes=[[(4, 4), (6, 4), (6, 6), (4, 6)]])
    gdf = GeoDataFrame({"i": [0, 1]}, geometry=[holed, box(20, 20, 21, 21)])
    p = tmp_path / "polys.shp"
    gdf.to_file(str(p))
    back = read_file(str(p))
    assert isinstance(back.geometry[0], Polygon)
    assert len(back.geometry[0].interiors) == 1
    assert back.geometry[0].area == pytest.approx(96.0)
    assert back.geometry[1].area == pytest.approx(1.0)


def test_roundtrip_multipolygon(tmp_path):
    multi = MultiPolygon([box(0, 0, 1, 1), box(5, 5, 7, 7)])
    gdf = GeoDataFrame({"i": [0]}, geometry=[multi])
    p = tmp_path / "multi.shp"
    gdf.to_file(str(p))
    back = read_file(str(p))
    # two disjoint CW shells in one record must come back as MultiPolygon
    assert isinstance(back.geometry[0], MultiPolygon)
    assert back.geometry[0].area == pytest.approx(1.0 + 4.0)


def test_roundtrip_lines(tmp_path):
    line = LineString([(0, 0), (5, 5), (10, 0)])
    gdf = GeoDataFrame({"i": [0]}, geometry=[line])
    p = tmp_path / "lines.shp"
    gdf.to_file(str(p))
    back = read_file(str(p))
    assert isinstance(back.geometry[0], LineString)
    np.testing.assert_allclose(np.asarray(back.geometry[0].coords),
                               np.asarray(line.coords))


def test_mixed_types_rejected(tmp_path):
    gdf = GeoDataFrame({"i": [0, 1]},
                       geometry=[Point(0, 0), box(0, 0, 1, 1)])
    with pytest.raises(ValueError, match="ONE shape type"):
        gdf.to_file(str(tmp_path / "mixed.shp"))


def test_shx_index_consistent(tmp_path):
    gdf = GeoDataFrame({"i": list(range(5))},
                       geometry=[Point(i, i) for i in range(5)])
    gdf.to_file(str(tmp_path / "idx.shp"))
    shp = (tmp_path / "idx.shp").read_bytes()
    shx = (tmp_path / "idx.shx").read_bytes()
    assert (len(shx) - 100) // 8 == 5
    for i in range(5):
        off_words, clen = struct.unpack_from(">2i", shx, 100 + 8 * i)
        recno, rlen = struct.unpack_from(">2i", shp, 2 * off_words)
        assert recno == i + 1 and rlen == clen


def test_missing_dbf_is_fine(tmp_path):
    gdf = GeoDataFrame({"i": [0]}, geometry=[Point(1, 1)])
    gdf.to_file(str(tmp_path / "nodbf.shp"))
    (tmp_path / "nodbf.dbf").unlink()
    back = read_file(str(tmp_path / "nodbf.shp"))
    assert len(back) == 1 and isinstance(back.geometry[0], Point)


def test_not_a_shapefile(tmp_path):
    p = tmp_path / "bad.shp"
    p.write_bytes(b"\x00" * 120)
    with pytest.raises(ValueError, match="9994"):
        read_file(str(p))


def test_dbf_wide_numbers_and_blank_logical(tmp_path):
    """Review findings: numeric cells must never overflow their declared
    width; a blank logical cell is None, not True."""
    gdf = GeoDataFrame(
        {"big": [10**16, 2], "f": [1e16, 0.5]},
        geometry=[Point(0, 0), Point(1, 1)])
    p = tmp_path / "wide.shp"
    gdf.to_file(str(p))
    back = read_file(str(p))
    assert back["big"].tolist() == [10**16, 2]
    assert back["f"][0] == pytest.approx(1e16)
    assert back["f"][1] == pytest.approx(0.5)
    # blank logical: patch a hand-written dbf cell to the dBase "unknown"
    from obia_tpu.io.shapefile import _dbf_bytes, _read_dbf
    blob = _dbf_bytes([("flag", [True])], 1)
    blob = blob.replace(b"T", b" ", 1)
    assert _read_dbf(blob)["flag"] == [None]


def test_dbf_truncated_name_collision_deduped(tmp_path):
    gdf = GeoDataFrame(
        {"segment_id_a": [1], "segment_id_b": [2]},
        geometry=[Point(0, 0)])
    p = tmp_path / "coll.shp"
    gdf.to_file(str(p))
    back = read_file(str(p))  # the codec's own reader rejects dup names
    cols = [c for c in back.columns if c != "geometry"]
    assert len(set(cols)) == 2
    assert sorted(v for c in cols for v in back[c].tolist()) == [1, 2]


def test_empty_polygon_writes_null_shape(tmp_path):
    from obia_tpu.io.shapefile import read_shapefile, write_shapefile
    write_shapefile(tmp_path / "empty.shp", [("i", [0, 1])],
                    [Polygon(), box(0, 0, 1, 1)])
    cols, geoms, _ = read_shapefile(tmp_path / "empty.shp")
    assert geoms[0] is None
    assert geoms[1].area == pytest.approx(1.0)
