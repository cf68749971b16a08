"""Coordinate reprojection (geometry/transform_crs): accuracy against
independent formulations + driver wiring (VERDICT r3 item 5).

The Krueger-series implementation is validated three ways: exact
construction points, an independent Snyder-series transverse Mercator,
and the meridian arc by numerical integration — no PROJ anywhere."""
import numpy as np
import pytest

from obia_tpu.geometry.crs import CRS
from obia_tpu.geometry.transform_crs import (CRSTransformError, Transformer,
                                             to_raster_crs, utm_forward,
                                             utm_inverse,
                                             webmercator_forward)
from obia_tpu.vector import GeoDataFrame
from obia_tpu.geometry.geom import Point, Polygon


def _snyder_utm(lon, lat, zone):
    """Independent transverse Mercator (Snyder 1987, eq. 8-9..8-13)."""
    a = 6378137.0
    f = 1 / 298.257223563
    e2 = f * (2 - f)
    ep2 = e2 / (1 - e2)
    k0 = 0.9996
    lon0 = np.radians(zone * 6 - 183)
    phi = np.radians(lat)
    lam = np.radians(lon)
    N = a / np.sqrt(1 - e2 * np.sin(phi) ** 2)
    T = np.tan(phi) ** 2
    C = ep2 * np.cos(phi) ** 2
    A = (lam - lon0) * np.cos(phi)
    M = a * ((1 - e2 / 4 - 3 * e2 ** 2 / 64 - 5 * e2 ** 3 / 256) * phi
             - (3 * e2 / 8 + 3 * e2 ** 2 / 32 + 45 * e2 ** 3 / 1024)
             * np.sin(2 * phi)
             + (15 * e2 ** 2 / 256 + 45 * e2 ** 3 / 1024) * np.sin(4 * phi)
             - (35 * e2 ** 3 / 3072) * np.sin(6 * phi))
    x = k0 * N * (A + (1 - T + C) * A ** 3 / 6
                  + (5 - 18 * T + T ** 2 + 72 * C - 58 * ep2) * A ** 5 / 120)
    y = k0 * (M + N * np.tan(phi)
              * (A ** 2 / 2 + (5 - T + 9 * C + 4 * C ** 2) * A ** 4 / 24
                 + (61 - 58 * T + T ** 2 + 600 * C - 330 * ep2)
                 * A ** 6 / 720))
    return x + 500000.0, y


def test_utm_construction_points():
    E, N = utm_forward(15.0, 0.0, 33, True)
    assert abs(E - 500000.0) < 1e-6 and abs(N) < 1e-6
    # southern hemisphere false northing
    E, N = utm_forward(15.0, -0.001, 33, False)
    assert N < 10000000.0 and N > 9999000.0


def test_utm_against_snyder_series():
    rng = np.random.default_rng(3)
    lat = rng.uniform(-80, 84, 200)
    lon = 15.0 + rng.uniform(-3, 3, 200)  # zone 33 interior
    E1, N1 = utm_forward(lon, lat, 33, True)
    E2, N2 = _snyder_utm(lon, lat, 33)
    # two independent series agree to sub-mm inside the zone
    assert np.abs(E1 - E2).max() < 1e-3
    assert np.abs(N1 - N2).max() < 1e-3


def test_utm_meridian_arc_by_integration():
    """Northing on the central meridian == k0 * meridian arc length."""
    a = 6378137.0
    e2 = (1 / 298.257223563) * (2 - 1 / 298.257223563)
    phi = np.linspace(0, np.radians(45.0), 2_000_001)
    integrand = a * (1 - e2) / (1 - e2 * np.sin(phi) ** 2) ** 1.5
    arc = np.trapezoid(integrand, phi) if hasattr(np, "trapezoid") \
        else np.trapz(integrand, phi)
    _, N = utm_forward(15.0, 45.0, 33, True)
    assert abs(N - 0.9996 * arc) < 1e-3


def test_utm_roundtrip_subcentimetre():
    rng = np.random.default_rng(5)
    lat = rng.uniform(-80, 84, 500)
    lon = 15.0 + rng.uniform(-3.5, 3.5, 500)
    E, N = utm_forward(lon, lat, 33, True)
    lon2, lat2 = utm_inverse(E, N, 33, True)
    E2, N2 = utm_forward(lon2, lat2, 33, True)
    assert np.abs(lon2 - lon).max() < 1e-10
    assert np.abs(lat2 - lat).max() < 1e-10
    assert np.hypot(E2 - E, N2 - N).max() < 1e-4  # < 0.1 mm


def test_webmercator_control_points():
    x, y = webmercator_forward(180.0, 0.0)
    assert abs(x - 20037508.342789244) < 1e-6 and abs(y) < 1e-9
    tr = Transformer.from_crs(3857, 4326)
    lon, lat = tr.transform(*webmercator_forward(12.5, 41.9))
    assert abs(lon - 12.5) < 1e-12 and abs(lat - 41.9) < 1e-9


def test_transformer_pivots_utm_to_utm():
    tr = Transformer.from_crs(32633, 32632)
    back = Transformer.from_crs(32632, 32633)
    x, y = tr.transform(300000.0, 5000000.0)
    x2, y2 = back.transform(x, y)
    assert np.hypot(x2 - 300000.0, y2 - 5000000.0) < 1e-3


def test_transformer_rejects_unsupported():
    with pytest.raises(CRSTransformError):
        Transformer.from_crs(4326, 2154)  # Lambert-93: unsupported


def test_gdf_to_crs_and_raster_hook():
    # a 4326 point lands where utm_forward says in 32633
    g = GeoDataFrame({"a": [1]}, geometry=[Point(15.1, 45.0)], crs=4326)
    out = g.to_crs(32633)
    E, N = utm_forward(15.1, 45.0, 33, True)
    p = out.geometry.iloc[0]
    assert abs(p.x - E) < 1e-6 and abs(p.y - N) < 1e-6
    assert out.crs == CRS.from_epsg(32633)
    # polygons transform every ring
    sq = Polygon([(15.0, 45.0), (15.01, 45.0), (15.01, 45.01),
                  (15.0, 45.01)])
    g2 = GeoDataFrame({"a": [1]}, geometry=[sq], crs=4326).to_crs(32633)
    assert g2.geometry.iloc[0].bounds[0] > 400000
    # to_raster_crs: passthrough on same crs, transform on differing
    same = to_raster_crs(out, 32633)
    assert same is out
    rt = to_raster_crs(out, 4326)
    p2 = rt.geometry.iloc[0]
    assert abs(p2.x - 15.1) < 1e-9 and abs(p2.y - 45.0) < 1e-9


def test_tile_and_process_reprojects_boxes(tmp_path):
    """A 4326 boxes GPKG over a 32633 raster yields the same annotations
    as the native-CRS GPKG (the reference's to_crs behavior)."""
    import json
    from obia_tpu.geometry import Affine
    from obia_tpu.io.tiff import write_tiff
    from obia_tpu.utils.training import tile_and_process
    from obia_tpu.geometry.geom import box as gbox

    rng = np.random.default_rng(0)
    arr = (rng.random((96, 96, 3)) * 255).astype(np.uint8)
    raster = str(tmp_path / "scene.tif")
    # 1 m pixels near (E=500000, N=4982950) in zone 33
    E0, N0 = 500000.0, 4983000.0
    write_tiff(raster, arr, transform=Affine(1, 0, E0, 0, -1, N0),
               crs="EPSG:32633")

    def run(gpkg_name, crs_epsg):
        b_utm = gbox(E0 + 10, N0 - 30, E0 + 30, N0 - 10)
        g = GeoDataFrame({"id": [1]}, geometry=[b_utm], crs=32633)
        if crs_epsg != 32633:
            g = g.to_crs(crs_epsg)
        gp = str(tmp_path / gpkg_name)
        g.to_file(gp)
        out = str(tmp_path / f"out_{crs_epsg}")
        tile_and_process(raster, boxes_gpkg_path=gp, output_dir=out,
                         tile_size=96, overlap=0, selected_bands=[1, 2, 3],
                         apply_clahe_flag=False)
        with open(out + "/annotations.json") as f:
            return json.load(f)

    native = run("native.gpkg", 32633)
    wgs = run("wgs.gpkg", 4326)
    # same tiles annotated, boxes within a pixel of each other
    assert set(native) == set(wgs) and len(native) >= 1
    for k in native:
        a = np.asarray(native[k]["boxes"], float).reshape(-1)
        b = np.asarray(wgs[k]["boxes"], float).reshape(-1)
        assert a.shape == b.shape and a.size >= 4
        assert np.abs(a - b).max() <= 1.0
