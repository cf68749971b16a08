"""GeoJSON round-trips (obia_tpu/io/geojson.py) through the public
read_file / to_file dispatch."""
import json

import numpy as np
import pytest

from obia_tpu.geometry.geom import (LineString, MultiPolygon, Point,
                                    Polygon, box)
from obia_tpu.vector import GeoDataFrame, read_file


def _square(x0, y0, s=1.0):
    return box(x0, y0, x0 + s, y0 + s)


def test_roundtrip_polygons_with_properties(tmp_path):
    gdf = GeoDataFrame(
        {"segment_id": [1, 2, 3],
         "name": ["a", "b", None],
         "score": [0.5, np.nan, 2.25]},
        geometry=[_square(0, 0), _square(2, 0), _square(4, 0)],
        crs="EPSG:32610")
    p = tmp_path / "objs.geojson"
    gdf.to_file(str(p))
    back = read_file(str(p))
    assert len(back) == 3
    assert back.crs is not None and back.crs.to_epsg() == 32610
    assert list(back["segment_id"]) == [1, 2, 3]
    import pandas as pd
    assert pd.isna(back["name"][2])
    assert pd.isna(back["score"][1])  # NaN -> null in JSON -> NaN
    for g0, g1 in zip(gdf.geometry, back.geometry):
        assert g0.bounds == pytest.approx(g1.bounds)
        assert g0.area == pytest.approx(g1.area)


def test_roundtrip_geometry_types(tmp_path):
    hole = Polygon([(0, 0), (10, 0), (10, 10), (0, 10)],
                   holes=[[(4, 4), (6, 4), (6, 6), (4, 6)]])
    multi = MultiPolygon([_square(0, 0), _square(3, 3)])
    gdf = GeoDataFrame(
        {"kind": ["pt", "line", "holed", "multi"]},
        geometry=[Point(1.5, 2.5), LineString([(0, 0), (1, 1), (2, 0)]),
                  hole, multi])
    p = tmp_path / "mixed.geojson"
    gdf.to_file(str(p))
    back = read_file(str(p))
    assert isinstance(back.geometry[0], Point)
    assert back.geometry[0].x == 1.5 and back.geometry[0].y == 2.5
    assert isinstance(back.geometry[1], LineString)
    assert isinstance(back.geometry[2], Polygon)
    assert len(back.geometry[2].interiors) == 1
    assert back.geometry[2].area == pytest.approx(100 - 4)
    assert isinstance(back.geometry[3], MultiPolygon)
    assert back.geometry[3].area == pytest.approx(2.0)


def test_read_plain_feature_and_bare_geometry(tmp_path):
    f = tmp_path / "one.geojson"
    f.write_text(json.dumps({
        "type": "Feature", "properties": {"v": 7},
        "geometry": {"type": "Point", "coordinates": [3, 4]}}))
    back = read_file(str(f))
    assert len(back) == 1 and back["v"][0] == 7
    g = tmp_path / "bare.json"
    g.write_text(json.dumps({"type": "Point", "coordinates": [1, 2]}))
    back = read_file(str(g))
    assert isinstance(back.geometry[0], Point)


def test_ragged_properties_fill_none(tmp_path):
    f = tmp_path / "ragged.geojson"
    f.write_text(json.dumps({
        "type": "FeatureCollection",
        "features": [
            {"type": "Feature", "properties": {"a": 1},
             "geometry": {"type": "Point", "coordinates": [0, 0]}},
            {"type": "Feature", "properties": {"b": 2},
             "geometry": {"type": "Point", "coordinates": [1, 1]}},
        ]}))
    import pandas as pd
    back = read_file(str(f))
    assert back["a"][0] == 1 and pd.isna(back["a"][1])
    assert pd.isna(back["b"][0]) and back["b"][1] == 2


def test_bbox_filter(tmp_path):
    gdf = GeoDataFrame({"i": [0, 1, 2]},
                       geometry=[_square(0, 0), _square(10, 10),
                                 _square(20, 20)])
    p = tmp_path / "bb.geojson"
    gdf.to_file(str(p))
    back = read_file(str(p), bbox=(9, 9, 12, 12))
    assert list(back["i"]) == [1]


def test_crs84_and_unsupported_type(tmp_path):
    f = tmp_path / "crs84.geojson"
    f.write_text(json.dumps({
        "type": "FeatureCollection",
        "crs": {"type": "name",
                "properties": {"name": "urn:ogc:def:crs:OGC:1.3:CRS84"}},
        "features": [{"type": "Feature", "properties": {},
                      "geometry": {"type": "Point",
                                   "coordinates": [0, 0]}}]}))
    assert read_file(str(f)).crs.to_epsg() == 4326
    g = tmp_path / "mp.geojson"
    g.write_text(json.dumps({
        "type": "FeatureCollection",
        "features": [{"type": "Feature", "properties": {},
                      "geometry": {"type": "MultiPoint",
                                   "coordinates": [[0, 0], [1, 1]]}}]}))
    with pytest.raises(ValueError, match="MultiPoint"):
        read_file(str(g))


def test_gpkg_dispatch_unchanged(tmp_path):
    gdf = GeoDataFrame({"i": [5]}, geometry=[_square(0, 0)],
                       crs="EPSG:32610")
    p = tmp_path / "x.gpkg"
    gdf.to_file(str(p))
    back = read_file(str(p))
    assert list(back["i"]) == [5] and back.crs.to_epsg() == 32610


def test_nonscalar_properties_stringified(tmp_path):
    """Review finding: datetime-ish property values must not abort
    json.dump mid-write."""
    import datetime
    gdf = GeoDataFrame(
        {"when": [datetime.datetime(2026, 3, 1, 12, 30)]},
        geometry=[Point(0, 0)])
    p = tmp_path / "dt.geojson"
    gdf.to_file(str(p))
    back = read_file(str(p))
    assert back["when"][0] == "2026-03-01T12:30:00"


def test_bbox_keeps_none_geometry(tmp_path):
    f = tmp_path / "noneg.geojson"
    f.write_text(json.dumps({
        "type": "FeatureCollection",
        "features": [
            {"type": "Feature", "properties": {"i": 0}, "geometry": None},
            {"type": "Feature", "properties": {"i": 1},
             "geometry": {"type": "Point", "coordinates": [0, 0]}},
            {"type": "Feature", "properties": {"i": 2},
             "geometry": {"type": "Point", "coordinates": [50, 50]}},
        ]}))
    back = read_file(str(f), bbox=(-1, -1, 1, 1))
    assert list(back["i"]) == [0, 1]  # None-geometry row kept (GPKG parity)
