"""tile_and_process + deepforest-export tests."""
import json
import os

import numpy as np
import pandas as pd
import pytest

from obia_tpu.geometry import Affine, box
from obia_tpu.io.tiff import write_tiff
from obia_tpu.utils.training import generate_tiles, tile_and_process
from obia_tpu.utils.utils import save_deepforest_predictions_to_gpkg
from obia_tpu.vector import GeoDataFrame, read_file


def test_generate_tiles():
    tiles = list(generate_tiles((0, 0, 100, 100), step=50, tile_size=60))
    assert tiles[0] == (0, 0, 60, 60)
    assert all(t[2] <= 100 and t[3] <= 100 for t in tiles)
    assert len(tiles) == 4


@pytest.fixture
def scene(tmp_path, rng):
    h, w = 120, 160
    arr = (rng.random((h, w, 5)) * 255).astype(np.uint8)
    path = str(tmp_path / "scene.tif")
    t = Affine(1.0, 0, 5000.0, 0, -1.0, 8000.0)
    write_tiff(path, arr, transform=t, crs="EPSG:32633")
    mask = (rng.random((h, w)) > 0.5).astype(np.uint8)
    mpath = str(tmp_path / "mask.tif")
    write_tiff(mpath, mask, transform=t, crs="EPSG:32633")
    boxes = GeoDataFrame(
        {"tree_id": [1, 2]},
        geometry=[box(5010, 7920, 5030, 7950), box(5060, 7900, 5080, 7930)],
        crs="EPSG:32633")
    bpath = str(tmp_path / "boxes.gpkg")
    boxes.to_file(bpath)
    return path, mpath, bpath


def test_tile_and_process_full(scene, tmp_path):
    raster, mask, boxes = scene
    out_dir = str(tmp_path / "tiles")
    tile_and_process(raster, mask_path=mask, boxes_gpkg_path=boxes,
                     output_dir=out_dir, tile_size=60.0, overlap=20.0,
                     selected_bands=(4, 2, 1), feather_radius=5.0,
                     blur_kernel=5, darken_factor=0.5)
    files = os.listdir(out_dir)
    jpgs = [f for f in files if f.endswith(".jpg")]
    assert len(jpgs) >= 4
    assert "annotations.json" in files and "transforms.json" in files
    with open(os.path.join(out_dir, "transforms.json")) as f:
        transforms = json.load(f)
    assert set(transforms) >= set(jpgs)
    first = transforms[jpgs[0]]
    assert len(first["transform"]) == 6
    assert first["crs"] == "EPSG:32633"
    with open(os.path.join(out_dir, "annotations.json")) as f:
        ann = json.load(f)
    total_boxes = sum(len(v["boxes"]) for v in ann.values())
    assert total_boxes >= 1
    for v in ann.values():
        for b in v["boxes"]:
            assert b[0] < b[2] and b[1] < b[3]


def test_tile_and_process_no_mask_no_boxes(scene, tmp_path):
    raster, _, _ = scene
    out_dir = str(tmp_path / "tiles2")
    tile_and_process(raster, output_dir=out_dir, tile_size=80.0,
                     overlap=0.0, selected_bands=(1, 2, 3),
                     apply_clahe_flag=False, rescale=False)
    assert any(f.endswith(".jpg") for f in os.listdir(out_dir))
    assert not os.path.exists(os.path.join(out_dir, "annotations.json"))


def test_save_deepforest_predictions(scene, tmp_path):
    raster, mask, boxes = scene
    out_dir = str(tmp_path / "tiles3")
    tile_and_process(raster, boxes_gpkg_path=boxes, output_dir=out_dir,
                     tile_size=60.0, overlap=20.0, selected_bands=(1, 2, 3))
    tj = os.path.join(out_dir, "transforms.json")
    with open(tj) as f:
        tile_name = list(json.load(f).keys())[0]
    df = pd.DataFrame({"xmin": [5.0], "ymin": [5.0], "xmax": [25.0],
                       "ymax": [30.0], "label": ["Tree"], "score": [0.9]})
    out_gpkg = str(tmp_path / "preds.gpkg")
    save_deepforest_predictions_to_gpkg(df, tile_name, tj, out_gpkg)
    back = read_file(out_gpkg)
    assert len(back) == 1
    assert back["label"][0] == "Tree"
    g = back.geometry[0]
    assert g.area == pytest.approx(20 * 25)


def test_tile_and_process_validates_step_and_bands(tmp_path, scene):
    raster, _, _ = scene

    with pytest.raises(ValueError, match="overlap"):
        tile_and_process(raster, output_dir=str(tmp_path / "o1"),
                         tile_size=50.0, overlap=50.0,
                         selected_bands=(1, 2, 3))
    with pytest.raises(IndexError, match="1-based"):
        tile_and_process(raster, output_dir=str(tmp_path / "o2"),
                         tile_size=80.0, overlap=0.0,
                         selected_bands=(0, 1, 2))


def test_tile_and_process_255_mask(tmp_path, scene):
    """A 0/255-encoded mask must blend like a 0/1 mask — raw 255 values
    wrapped the uint8 blend arithmetic into garbage pixels."""
    import numpy as np

    from obia_tpu.io.tiff import TiffReader

    raster, _, _ = scene
    r = TiffReader(raster)
    H, W = r.height, r.width
    m = np.zeros((H, W, 1), np.uint8)
    m[: H // 2] = 1
    outs = {}
    for name, enc in (("m01", m), ("m255", m * 255)):
        mask_path = str(tmp_path / f"{name}.tif")
        write_tiff(mask_path, enc, transform=r.transform, crs=r.crs)
        out_dir = str(tmp_path / f"out_{name}")
        tile_and_process(raster, mask_path=mask_path, output_dir=out_dir,
                         tile_size=80.0, overlap=0.0,
                         selected_bands=(1, 2, 3), feather_radius=0.0)
        import glob
        outs[name] = sorted(glob.glob(out_dir + "/*.jpg"))
    assert outs["m01"] and len(outs["m01"]) == len(outs["m255"])
    for a, b in zip(outs["m01"], outs["m255"]):
        with open(a, "rb") as fa, open(b, "rb") as fb:
            assert fa.read() == fb.read()
