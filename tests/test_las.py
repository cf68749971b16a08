"""LAS codec round-trips (obia_tpu/io/las.py) and the
create_objects(pointcloud="x.las") on-ramp."""
import struct

import numpy as np
import pytest

from obia_tpu.io.las import LasData, read_las, write_las


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def _cloud(rng, n=500):
    return {
        "X": 500000.0 + rng.uniform(0, 100, n),
        "Y": 4000000.0 - rng.uniform(0, 100, n),
        "Z": rng.uniform(0, 40, n),
        "Intensity": rng.integers(0, 4096, n).astype(np.uint16),
        "classification": rng.integers(0, 10, n).astype(np.uint8),
        "gps_time": rng.uniform(3.0e8, 3.1e8, n),
        "red": rng.integers(0, 65536, n).astype(np.uint16),
        "green": rng.integers(0, 65536, n).astype(np.uint16),
        "blue": rng.integers(0, 65536, n).astype(np.uint16),
        "return_number": rng.integers(1, 4, n).astype(np.uint8),
        "number_of_returns": np.full(n, 3, np.uint8),
        "point_source_id": rng.integers(0, 100, n).astype(np.uint16),
    }


@pytest.mark.parametrize("fmt", [0, 1, 2, 3, 6, 7, 8])
def test_roundtrip_all_formats(tmp_path, rng, fmt):
    pc = _cloud(rng)
    path = tmp_path / f"f{fmt}.las"
    write_las(path, pc, point_format=fmt, crs="EPSG:32610")
    back = read_las(path)
    assert isinstance(back, LasData)
    assert back.point_format == fmt
    assert back.version == ((1, 4) if fmt >= 6 else (1, 2))
    # coordinates quantised to the default mm scale
    for ax in "XYZ":
        np.testing.assert_allclose(back[ax], pc[ax], atol=5.1e-4)
    np.testing.assert_array_equal(back["Intensity"], pc["Intensity"])
    np.testing.assert_array_equal(back["classification"],
                                  pc["classification"])
    np.testing.assert_array_equal(back["return_number"], pc["return_number"])
    np.testing.assert_array_equal(back["number_of_returns"],
                                  pc["number_of_returns"])
    np.testing.assert_array_equal(back["point_source_id"],
                                  pc["point_source_id"])
    if fmt in (1, 3, 6, 7, 8):
        np.testing.assert_allclose(back["gps_time"], pc["gps_time"])
    else:
        assert "gps_time" not in back
    if fmt in (2, 3, 7, 8):
        for c in ("red", "green", "blue"):
            np.testing.assert_array_equal(back[c], pc[c])
    assert back.crs is not None and back.crs.to_epsg() == 32610


def test_scale_offset_applied(tmp_path):
    pc = {"X": np.array([10.0, 10.25]), "Y": np.array([20.0, 20.25]),
          "Z": np.array([1.0, 1.25])}
    path = tmp_path / "s.las"
    write_las(path, pc, point_format=0, scale=(0.25, 0.25, 0.25),
              offset=(10.0, 20.0, 1.0))
    back = read_las(path)
    assert back.scales == (0.25, 0.25, 0.25)
    assert back.offsets == (10.0, 20.0, 1.0)
    np.testing.assert_allclose(back["X"], pc["X"])
    np.testing.assert_allclose(back["Z"], pc["Z"])


def test_extra_bytes_records_skipped(tmp_path, rng):
    """Files whose point record length exceeds the format size (extra
    bytes) must decode: the dtype itemsize comes from the header."""
    pc = _cloud(rng, n=50)
    path = tmp_path / "base.las"
    write_las(path, pc, point_format=1)
    buf = bytearray(path.read_bytes())
    header_size, = struct.unpack_from("<H", buf, 94)
    point_offset, = struct.unpack_from("<I", buf, 96)
    rec_len, = struct.unpack_from("<H", buf, 105)
    body = bytes(buf[point_offset:])
    n = len(body) // rec_len
    padded = b"".join(body[i * rec_len:(i + 1) * rec_len] + b"\xAA" * 4
                      for i in range(n))
    struct.pack_into("<H", buf, 105, rec_len + 4)
    fat = tmp_path / "fat.las"
    fat.write_bytes(bytes(buf[:point_offset]) + padded)
    back = read_las(fat)
    np.testing.assert_allclose(back["X"], pc["X"], atol=5.1e-4)
    np.testing.assert_array_equal(back["Intensity"], pc["Intensity"])


def test_las14_u64_count(tmp_path, rng):
    """LAS 1.4 keeps the true count in the u64 field (legacy u32 is 0
    for formats >= 6) — the reader must use it."""
    pc = _cloud(rng, n=77)
    path = tmp_path / "v14.las"
    write_las(path, pc, point_format=6)
    buf = path.read_bytes()
    legacy, = struct.unpack_from("<I", buf, 107)
    count64, = struct.unpack_from("<Q", buf, 247)
    assert legacy == 0 and count64 == 77
    assert read_las(path)["X"].size == 77


def test_laz_rejected(tmp_path, rng):
    pc = _cloud(rng, n=5)
    path = tmp_path / "c.las"
    write_las(path, pc, point_format=1)
    buf = bytearray(path.read_bytes())
    buf[104] |= 0x80  # LAZ compression bit
    path.write_bytes(bytes(buf))
    with pytest.raises(ValueError, match="LAZ"):
        read_las(path)


def test_not_las_rejected(tmp_path):
    p = tmp_path / "x.las"
    p.write_bytes(b"NOPE" + b"\x00" * 300)
    with pytest.raises(ValueError, match="signature"):
        read_las(p)


def test_truncated_file_clamps_count(tmp_path, rng):
    pc = _cloud(rng, n=40)
    path = tmp_path / "t.las"
    write_las(path, pc, point_format=0)
    buf = path.read_bytes()
    point_offset, = struct.unpack_from("<I", buf, 96)
    rec_len, = struct.unpack_from("<H", buf, 105)
    cut = tmp_path / "cut.las"
    cut.write_bytes(buf[:point_offset + 10 * rec_len])
    assert read_las(cut)["X"].size == 10


def test_create_objects_from_las_path(tmp_path, rng):
    """create_objects(pointcloud='x.las'): the file on-ramp for the
    structural/radiometric families (reference stubs these outright)."""
    from obia_tpu.geometry import Affine
    from obia_tpu.handlers.geotif import image_from_array
    from obia_tpu.segmentation.segment_boundaries import create_segments
    from obia_tpu.segmentation.segment_statistics import create_objects

    h = w = 48
    img_np = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    image = image_from_array(
        img_np, Affine(2.0, 0, 500000.0, 0, -2.0, 4000000.0),
        crs="EPSG:32610")
    gdf = create_segments(image, n_segments=9, compactness=8)
    n = 600
    pc = {"X": 500000.0 + rng.uniform(0, 2.0 * w, n),
          "Y": 4000000.0 - rng.uniform(0, 2.0 * h, n),
          "Z": rng.uniform(0, 10, n),
          "Intensity": rng.uniform(0, 255, n)}
    las = tmp_path / "pts.las"
    write_las(las, pc, point_format=1, crs="EPSG:32610")
    objs = create_objects(gdf, image, calculate_structural=True,
                          calculate_radiometric=True, pointcloud=str(las),
                          voxel_resolution=1.0)
    for col in ("pai", "fhd", "ch", "mean_intensity", "variance_intensity"):
        assert col in objs.columns
        assert np.isfinite(objs[col].to_numpy()).any(), col


def test_legacy_classification_overflow_rejected(tmp_path, rng):
    """Review finding: >31 classes don't fit the 5-bit legacy field and
    must not silently corrupt the synthetic/keypoint/withheld flags."""
    pc = _cloud(rng, n=4)
    pc["classification"] = np.array([1, 2, 3, 45], np.uint8)
    with pytest.raises(ValueError, match="5-bit"):
        write_las(tmp_path / "bad.las", pc, point_format=3)
    write_las(tmp_path / "ok.las", pc, point_format=6)  # modern: full byte
    assert read_las(tmp_path / "ok.las")["classification"].tolist() == \
        [1, 2, 3, 45]


def test_create_objects_warns_on_crs_mismatch(tmp_path, rng):
    from obia_tpu.geometry import Affine
    from obia_tpu.handlers.geotif import image_from_array
    from obia_tpu.segmentation.segment_boundaries import create_segments
    from obia_tpu.segmentation.segment_statistics import create_objects

    img_np = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
    image = image_from_array(
        img_np, Affine(2.0, 0, 500000.0, 0, -2.0, 4000000.0),
        crs="EPSG:32610")
    gdf = create_segments(image, n_segments=4, compactness=8)
    pc = {"X": 500000.0 + rng.uniform(0, 64, 50),
          "Y": 4000000.0 - rng.uniform(0, 64, 50),
          "Z": rng.uniform(0, 5, 50)}
    las = tmp_path / "wrong_crs.las"
    write_las(las, pc, point_format=1, crs="EPSG:4326")
    with pytest.warns(UserWarning, match="reproject"):
        create_objects(gdf, image, calculate_spectral=False,
                       calculate_structural=True, pointcloud=str(las),
                       voxel_resolution=1.0)
