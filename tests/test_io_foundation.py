"""Foundation-layer tests: Affine, CRS, GeoTIFF codec, WKB, GeoPackage,
GeoDataFrame + sjoin."""
import numpy as np
import pytest

from obia_tpu.geometry import Affine, CRS, MultiPolygon, Point, Polygon, box, wkb
from obia_tpu.geometry.geom import affine_transform
from obia_tpu.io.tiff import TiffReader, write_tiff, lzw_decode, lzw_encode
from obia_tpu.io.gpkg import read_gpkg, write_gpkg
from obia_tpu.vector import GeoDataFrame, read_file, sjoin


# --- Affine -------------------------------------------------------------------

def test_affine_apply_and_invert():
    t = Affine(2.0, 0.0, 100.0, 0.0, -2.0, 500.0)
    x, y = t * (10, 20)
    assert (x, y) == (120.0, 460.0)
    inv = ~t
    col, row = inv * (x, y)
    assert abs(col - 10) < 1e-12 and abs(row - 20) < 1e-12


def test_affine_compose_identity():
    t = Affine(0.5, 0.1, 3.0, -0.2, 1.5, 7.0)
    comp = t * ~t
    ident = Affine.identity()
    assert all(abs(a - b) < 1e-12 for a, b in zip(comp, ident))


def test_affine_gdal_roundtrip():
    t = Affine.from_gdal(100.0, 2.0, 0.0, 500.0, 0.0, -2.0)
    assert t.to_gdal() == (100.0, 2.0, 0.0, 500.0, 0.0, -2.0)
    assert t.shapely_order() == [2.0, 0.0, 0.0, -2.0, 100.0, 500.0]


# --- CRS ----------------------------------------------------------------------

def test_crs_from_user_input():
    assert CRS.from_user_input("EPSG:32633").to_epsg() == 32633
    assert CRS.from_user_input(4326).to_epsg() == 4326
    c = CRS.from_user_input("EPSG:32610")
    assert "UTM zone 10N" in c.to_wkt()
    assert CRS.from_wkt(c.to_wkt()).to_epsg() == 32610


def test_crs_equality():
    assert CRS.from_epsg(4326) == CRS.from_user_input("EPSG:4326")
    assert CRS.from_epsg(4326) != CRS.from_epsg(3857)


# --- GeoTIFF codec ------------------------------------------------------------

@pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.int16, np.float32])
@pytest.mark.parametrize("compression", ["none", "deflate", "lzw", "packbits"])
def test_tiff_roundtrip_striped(tmp_path, dtype, compression, rng):
    h, w, c = 37, 53, 3
    if np.issubdtype(dtype, np.floating):
        arr = rng.normal(size=(h, w, c)).astype(dtype)
    else:
        info = np.iinfo(dtype)
        arr = rng.integers(info.min, info.max, size=(h, w, c)).astype(dtype)
    t = Affine(0.5, 0, 1000.0, 0, -0.5, 2000.0)
    path = str(tmp_path / "x.tif")
    write_tiff(path, arr, transform=t, crs="EPSG:32633",
               compression=compression)
    r = TiffReader(path)
    out = r.read()
    np.testing.assert_array_equal(out, arr)
    assert r.crs.to_epsg() == 32633
    assert all(abs(a - b) < 1e-9 for a, b in zip(r.transform, t))


def test_tiff_roundtrip_tiled(tmp_path, rng):
    arr = rng.integers(0, 255, size=(300, 420, 4)).astype(np.uint8)
    path = str(tmp_path / "tiled.tif")
    write_tiff(path, arr, tiled=True, tile_size=128, compression="deflate",
               transform=Affine(1, 0, 0, 0, -1, 300), crs=4326, nodata=0)
    r = TiffReader(path)
    np.testing.assert_array_equal(r.read(), arr)
    assert r.nodata == 0.0
    assert r.crs.to_epsg() == 4326


def test_tiff_window_read(tmp_path, rng):
    arr = rng.random((64, 64, 2)).astype(np.float32)
    path = str(tmp_path / "w.tif")
    write_tiff(path, arr)
    r = TiffReader(path)
    np.testing.assert_array_equal(r.read(window=(10, 20, 30, 25)),
                                  arr[10:40, 20:45])


def test_tiff_2d_input(tmp_path):
    arr = np.arange(100, dtype=np.uint16).reshape(10, 10)
    path = str(tmp_path / "g.tif")
    write_tiff(path, arr)
    out = TiffReader(path).read()
    np.testing.assert_array_equal(out[:, :, 0], arr)


def test_lzw_roundtrip(rng):
    data = rng.integers(0, 8, 10000).astype(np.uint8).tobytes()
    assert lzw_decode(lzw_encode(data)) == data


# --- Geometry + WKB -----------------------------------------------------------

def test_polygon_area_centroid():
    p = box(0, 0, 10, 10)
    assert p.area == 100.0
    c = p.centroid
    assert abs(c.x - 5) < 1e-12 and abs(c.y - 5) < 1e-12
    hole = Polygon([(0, 0), (10, 0), (10, 10), (0, 10)],
                   holes=[[(2, 2), (4, 2), (4, 4), (2, 4)]])
    assert abs(hole.area - 96.0) < 1e-12


def test_point_in_polygon_vectorised():
    p = Polygon([(0, 0), (4, 0), (4, 4), (0, 4)])
    xs = np.array([1.0, 5.0, 2.0, -1.0, 4.0])
    ys = np.array([1.0, 1.0, 3.9, 2.0, 2.0])
    got = p.contains_points(xs, ys)
    np.testing.assert_array_equal(got, [True, False, True, False, True])


def test_intersects_predicates():
    a = box(0, 0, 2, 2)
    b = box(1, 1, 3, 3)
    c = box(5, 5, 6, 6)
    assert a.intersects(b)
    assert not a.intersects(c)
    assert box(0.5, 0.5, 1, 1).within(a)
    assert a.overlaps(b)
    assert not a.overlaps(c)
    pt = Point(1, 1)
    assert a.intersects(pt) and pt.intersects(a)


def test_wkb_roundtrip():
    poly = Polygon([(0, 0), (3, 0), (3, 3), (0, 3)],
                   holes=[[(1, 1), (2, 1), (2, 2), (1, 2)]])
    out = wkb.loads(wkb.dumps(poly))
    assert out.geom_type == "Polygon"
    assert abs(out.area - poly.area) < 1e-12
    mp = MultiPolygon([box(0, 0, 1, 1), box(2, 2, 3, 3)])
    out2 = wkb.loads(wkb.dumps(mp))
    assert out2.geom_type == "MultiPolygon" and len(out2.geoms) == 2
    pt = wkb.loads(wkb.dumps(Point(1.5, -2.5)))
    assert (pt.x, pt.y) == (1.5, -2.5)


def test_affine_transform_shapely_order():
    # scale x2, translate (100, 200)
    poly = box(0, 0, 1, 1)
    out = affine_transform(poly, [2, 0, 0, 2, 100, 200])
    assert out.bounds == (100, 200, 102, 202)


# --- GPKG + GeoDataFrame ------------------------------------------------------

def test_gpkg_roundtrip(tmp_path):
    path = str(tmp_path / "f.gpkg")
    geoms = [box(0, 0, 1, 1), box(1, 0, 2, 1)]
    write_gpkg(path, [("segment_id", [1, 2]), ("name", ["a", "b"]),
                      ("score", [0.5, np.nan])],
               geoms, layer="segments", crs="EPSG:32633")
    cols, rgeoms, crs = read_gpkg(path)
    assert cols["segment_id"] == [1, 2]
    assert cols["name"] == ["a", "b"]
    assert cols["score"][1] is None
    assert crs.to_epsg() == 32633
    assert abs(rgeoms[0].area - 1.0) < 1e-12


def test_geodataframe_to_file_read_file(tmp_path):
    gdf = GeoDataFrame({"segment_id": [1, 2, 3]},
                       geometry=[box(0, 0, 1, 1), box(1, 0, 2, 1), box(0, 1, 1, 2)],
                       crs="EPSG:4326")
    path = str(tmp_path / "seg.gpkg")
    gdf.to_file(path)
    back = read_file(path)
    assert list(back["segment_id"]) == [1, 2, 3]
    assert back.crs.to_epsg() == 4326
    assert len(back.geometry) == 3


def test_geodataframe_intersects_series():
    gdf = GeoDataFrame(geometry=[box(0, 0, 1, 1), box(5, 5, 6, 6)])
    mask = gdf.intersects(box(0.5, 0.5, 0.7, 0.7))
    assert list(mask) == [True, False]


def test_sjoin_points_in_polygons():
    segs = GeoDataFrame({"segment_id": [1, 2]},
                        geometry=[box(0, 0, 2, 2), box(2, 0, 4, 2)])
    pts = GeoDataFrame({"class": [7, 7, 8]},
                       geometry=[Point(1, 1), Point(1.5, 0.5), Point(3, 1)])
    joined = sjoin(segs, pts, how="inner", predicate="intersects")
    assert len(joined) == 3
    assert set(joined["segment_id"]) == {1, 2}
    grp = joined.groupby(joined.index)["class"].nunique()
    assert grp.loc[0] == 1  # both points in segment 1 share class 7


def test_read_file_bbox(tmp_path):
    gdf = GeoDataFrame({"segment_id": [1, 2]},
                       geometry=[box(0, 0, 1, 1), box(10, 10, 11, 11)],
                       crs=4326)
    path = str(tmp_path / "b.gpkg")
    gdf.to_file(path)
    sub = read_file(path, bbox=(0, 0, 2, 2))
    assert list(sub["segment_id"]) == [1]


def test_create_objects_glcm_levels(rng):
    from obia_tpu.geometry import Affine
    from obia_tpu.handlers.geotif import image_from_array
    from obia_tpu.segmentation.segment_boundaries import create_segments
    from obia_tpu.segmentation.segment_statistics import create_objects
    img = image_from_array(rng.random((64, 64, 2)).astype(np.float32),
                           Affine(1, 0, 0, 0, -1, 64), crs=4326)
    gdf = create_segments(img, method="slic", n_segments=9)
    objs = create_objects(gdf, img, glcm_levels=16)
    assert np.isfinite(objs["b0_ASM"].to_numpy(dtype=float)).all()


def test_bigtiff_roundtrip(tmp_path, rng):
    arr = rng.integers(0, 60000, size=(90, 130, 3)).astype(np.uint16)
    path = str(tmp_path / "big.tif")
    write_tiff(path, arr, transform=Affine(1, 0, 10.0, 0, -1, 90.0),
               crs="EPSG:32633", bigtiff=True, compression="deflate")
    with open(path, "rb") as f:
        magic = f.read(4)
    assert magic[:2] == b"II" and magic[2] == 43  # BigTIFF magic
    r = TiffReader(path)
    assert r.big
    np.testing.assert_array_equal(r.read(), arr)
    assert r.crs.to_epsg() == 32633
    assert r.transform.c == 10.0
    # windowed read too
    np.testing.assert_array_equal(r.read(window=(5, 7, 20, 30)),
                                  arr[5:25, 7:37])


def test_bigtiff_tiled(tmp_path, rng):
    arr = (rng.random((140, 260, 2)) * 100).astype(np.float32)
    path = str(tmp_path / "bigtiled.tif")
    write_tiff(path, arr, bigtiff=True, tiled=True, tile_size=128)
    r = TiffReader(path)
    assert r.big and r.tiled
    np.testing.assert_array_equal(r.read(), arr)


# ---- external-reader interop (PIL bundles libtiff's codec semantics) -------

PIL_Image = pytest.importorskip("PIL.Image", reason="PIL not installed")


def _interop_scene(rng):
    """Runs + noise so LZW crosses several code-width bumps and a table
    reset (>4094 codes)."""
    a = np.concatenate([
        np.repeat(np.arange(256, dtype=np.uint8), 97),
        (rng.random(120000) * 255).astype(np.uint8),
        np.tile(np.arange(64, dtype=np.uint8), 900)])
    side = int(len(a) ** 0.5)
    return a[: side * side].reshape(side, side)


def test_lzw_reads_libtiff_output(tmp_path, rng):
    """Our LZW decoder on a PIL/libtiff-written file (the early-change
    width bump used to be one code too early, desyncing at the first
    9->10 bit change on any real-world LZW GeoTIFF)."""
    img = _interop_scene(rng)
    p = str(tmp_path / "pil_lzw.tif")
    PIL_Image.fromarray(img).save(p, compression="tiff_lzw")
    got = np.asarray(TiffReader(p).read()).squeeze()
    np.testing.assert_array_equal(got, img)


@pytest.mark.parametrize("compression", ["lzw", "deflate", "packbits"])
def test_libtiff_reads_our_output(tmp_path, rng, compression):
    """PIL/libtiff must read back write_tiff output exactly — catches
    encoder-side LZW width bugs and the predictor-on-PackBits bug (the
    Predictor tag is undefined for PackBits; standard readers ignore it
    and would return raw differences)."""
    img = _interop_scene(rng)
    p = str(tmp_path / f"ours_{compression}.tif")
    write_tiff(p, img[..., None], transform=Affine(1, 0, 0, 0, -1, 0),
               crs="EPSG:32610", compression=compression)
    back = np.asarray(PIL_Image.open(p))
    np.testing.assert_array_equal(back, img)


def test_rgb_photometric_tag(tmp_path, rng):
    """3-band uint8 output is tagged RGB so standard viewers render it
    in colour (it was BlackIsZero + extrasamples)."""
    img = (rng.random((40, 50, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "rgb.tif")
    write_tiff(p, img, transform=Affine(1, 0, 0, 0, -1, 0),
               crs="EPSG:32610", compression="deflate")
    pim = PIL_Image.open(p)
    assert pim.mode == "RGB"
    np.testing.assert_array_equal(np.asarray(pim), img)
    np.testing.assert_array_equal(np.asarray(TiffReader(p).read()), img)


def test_crs_is_geographic():
    assert CRS.from_epsg(4326).is_geographic
    assert not CRS.from_epsg(32610).is_geographic
    assert not CRS.from_epsg(3857).is_geographic
    # heuristic exceptions: projected codes inside 4xxx, geographic outside
    assert not CRS.from_epsg(4087).is_geographic
    assert CRS.from_epsg(3819).is_geographic
    # WKT root keyword is authoritative
    assert CRS.from_wkt('GEOGCS["custom",DATUM["D",SPHEROID["S",1,0]]]'
                        ).is_geographic
    assert not CRS.from_wkt('PROJCS["custom",GEOGCS["g",DATUM["D",'
                            'SPHEROID["S",1,0]]],UNIT["metre",1]]'
                            ).is_geographic


def test_open_geotiff_band_zero_raises(tmp_path, rng):
    """bands are 1-based; band 0 used to wrap to the LAST band silently."""
    from obia_tpu.handlers.geotif import open_geotiff

    arr = (rng.random((10, 12, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "b.tif")
    write_tiff(p, arr, transform=Affine(1, 0, 0, 0, -1, 0),
               crs="EPSG:32610")
    with pytest.raises(IndexError, match="1-based"):
        open_geotiff(p, bands=[0])
    with pytest.raises(IndexError):
        open_geotiff(p, bands=[4])
    img = open_geotiff(p, bands=[1, 3])
    assert img.img_data.shape[2] == 2
