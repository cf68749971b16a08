"""CLI wiring tests: every user-facing command parses its options and
drives the real pipeline (the reference imports click but defines no
commands — reference cli: none; SURVEY §5)."""
import json
import os

import numpy as np
import pytest
from click.testing import CliRunner

from obia_tpu.cli import main
from obia_tpu.geometry.affine import Affine
from obia_tpu.io.tiff import write_tiff
from obia_tpu.vector import read_file

T = Affine(2.0, 0.0, 600000.0, 0.0, -2.0, 5100000.0)


@pytest.fixture
def scene_tif(small_rgb, tmp_path):
    path = str(tmp_path / "scene.tif")
    arr = (small_rgb * 255).astype(np.uint8)
    write_tiff(path, arr, transform=T, crs="EPSG:32610")
    return path


def test_cli_segment(scene_tif, tmp_path):
    out = str(tmp_path / "segs.gpkg")
    res = CliRunner().invoke(main, ["segment", scene_tif, out,
                                    "--n-segments", "12"])
    assert res.exit_code == 0, res.output
    gdf = read_file(out)
    assert len(gdf) >= 4
    assert "segment_id" in gdf.columns


def test_cli_tiled_segments(scene_tif, tmp_path):
    outdir = str(tmp_path / "tiles")
    res = CliRunner().invoke(main, ["tiled-segments", scene_tif, outdir,
                                    "--tile-size", "64", "--buffer", "16",
                                    "--n-segments", "8"])
    assert res.exit_code == 0, res.output
    assert os.path.exists(os.path.join(outdir, "segments.gpkg"))
    manifest = json.load(open(os.path.join(outdir, "manifest.json")))
    assert manifest  # resume manifest written


def test_cli_chm_seeds(tmp_path):
    chm = np.zeros((64, 64, 1), np.float32)
    for r, c in ((10, 10), (30, 45), (50, 20)):
        yy, xx = np.mgrid[0:64, 0:64]
        chm[:, :, 0] += 12.0 * np.exp(-((yy - r) ** 2 + (xx - c) ** 2) / 18.0)
    chm_tif = str(tmp_path / "chm.tif")
    write_tiff(chm_tif, chm, transform=T, crs="EPSG:32610")
    out = str(tmp_path / "seeds.gpkg")
    res = CliRunner().invoke(main, ["chm-seeds", chm_tif, out,
                                    "--h-min", "5.0"])
    assert res.exit_code == 0, res.output
    assert 2 <= len(read_file(out)) <= 4


def test_cli_info():
    res = CliRunner().invoke(main, ["info"])
    assert res.exit_code == 0, res.output
    assert "cpu" in res.output.lower() or "device" in res.output.lower()
