"""Runnable example: LAS point-cloud object statistics + vector formats.

The reference stubs its structural/radiometric statistics out entirely
(reference segment_statistics.py:301-329 raises NotImplementedError);
this framework computes them natively from a LAS file and exports to any
of the in-repo vector codecs. Run with
`python docs/examples/pointcloud_and_formats.py`.
"""
import os
import tempfile

import numpy as np

from obia_tpu.geometry import Affine
from obia_tpu.handlers.geotif import image_from_array
from obia_tpu.io.las import write_las
from obia_tpu.segmentation.segment_boundaries import create_segments
from obia_tpu.segmentation.segment_statistics import create_objects
from obia_tpu.vector import read_file


def main():
    rng = np.random.default_rng(0)
    out = tempfile.mkdtemp(prefix="obia_pc_")

    # a 96x96 scene at 2 m resolution with a canopy-height point cloud:
    # tall returns on the left half, ground on the right
    h = w = 96
    scene = np.clip(rng.normal(0.4, 0.05, (h, w, 3)), 0, 1).astype(
        np.float32)
    scene[:, : w // 2, 1] += 0.35  # forest (left) is green so the
    scene[:, w // 2:, 0] += 0.25   # segmentation follows the canopy edge
    origin_x, origin_y = 500000.0, 4000000.0
    image = image_from_array(
        scene, Affine(2.0, 0, origin_x, 0, -2.0, origin_y),
        crs="EPSG:32610")

    n = 20000
    xs = origin_x + rng.uniform(0, 2.0 * w, n)
    ys = origin_y - rng.uniform(0, 2.0 * h, n)
    tall = xs < origin_x + w  # left half: 20 m canopy over ground returns
    zs = np.where(tall & (rng.random(n) < 0.6),
                  rng.uniform(15, 22, n), rng.uniform(0, 0.5, n))
    las_path = os.path.join(out, "returns.las")
    write_las(las_path, {
        "X": xs, "Y": ys, "Z": zs,
        "Intensity": rng.uniform(10, 200, n),
    }, point_format=6, crs="EPSG:32610")
    print(f"wrote {n} points -> {las_path}")

    # convert2lab=False: these are multispectral bands, not display RGB,
    # so segment in band space (Lab of a false-colour composite would
    # wash out the canopy edge)
    segments = create_segments(image, n_segments=64, compactness=10,
                               convert2lab=False)
    objects = create_objects(
        segments, image,
        calculate_textural=False,
        calculate_structural=True,   # PAI, FHD, CH from the LAS file
        calculate_radiometric=True,  # per-object intensity moments
        pointcloud=las_path, voxel_resolution=1.0)

    left = objects[objects.geometry.apply(
        lambda g: g.centroid.x < origin_x + w)]
    right = objects[objects.geometry.apply(
        lambda g: g.centroid.x >= origin_x + w)]
    print(f"{len(objects)} objects | canopy height left "
          f"{left['ch'].mean():.1f} m vs right {right['ch'].mean():.1f} m")

    # one table, three interchange formats — extension picks the codec
    for name in ("objects.gpkg", "objects.geojson", "objects.shp"):
        path = os.path.join(out, name)
        objects.to_file(path)
        print(f"{name}: {len(read_file(path))} features re-read OK")


if __name__ == "__main__":
    main()
