"""Runnable quickstart: synthetic scene → segment → classify → export.

The reference ships a quickstart notebook that was never executed and in
fact crashes on its own in-memory Image (SURVEY.md §4); this example runs
end-to-end with `python docs/examples/segmentation_quickstart.py`.
"""
import numpy as np

from obia_tpu.classification.classify import classify
from obia_tpu.geometry import Affine
from obia_tpu.handlers.geotif import image_from_array
from obia_tpu.segmentation.segment import segment
from obia_tpu.utils.utils import label_segments
from obia_tpu.vector import GeoDataFrame


def main():
    # synthetic 128x128 3-band scene with two land covers
    rng = np.random.default_rng(0)
    h = w = 128
    base = np.zeros((h, w, 3), np.float32)
    base[:, : w // 2, 0] = 0.8
    base[:, w // 2:, 1] = 0.7
    scene = np.clip(base + rng.normal(0, 0.05, (h, w, 3)), 0, 1)

    image = image_from_array(scene, Affine(1, 0, 0, 0, -1, h),
                             crs="EPSG:32633")

    s = segment(image, method="slic", n_segments=64, compactness=10)
    print(f"{len(s.segments)} objects, "
          f"{len(s.segments.columns)} feature columns")

    # label a few objects by their position
    pts, cls = [], []
    for i in range(0, len(s.segments), 2):
        c = s.segments.geometry.iloc[i].centroid
        pts.append(c)
        cls.append(1 if c.x < w / 2 else 2)
    training, mixed = label_segments(
        s.segments, GeoDataFrame({"class": cls}, geometry=pts))
    print(f"{len(training)} training objects ({len(mixed)} mixed excluded)")

    result = classify(s.segments, training, method="rf", n_estimators=50,
                      random_state=0, compute_reports=True)
    print(result.report)

    s.write_segments("segments.gpkg")
    GeoDataFrame(result.classified).to_file("classified.gpkg")
    result.write_geotiff("classified.tif")
    print("wrote segments.gpkg, classified.gpkg, classified.tif")


if __name__ == "__main__":
    main()
