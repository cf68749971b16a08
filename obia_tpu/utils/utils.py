"""Training-label join, window/mask helpers, detection-prediction export.

API-parity module for reference obia/utils/utils.py: ``label_segments``
(:12-34), ``crop_image_to_bbox`` (:37-50), ``mask_image_with_polygon``
(:53-67), ``save_deepforest_predictions_to_gpkg`` (:70-145).

Divergences (SURVEY.md §7 quirks):
* #8 — ``label_segments`` creates the ``feature_class`` column up front, so
  an empty spatial join returns an empty frame instead of raising KeyError.
* #9 — ``crop_image_to_bbox`` reads from the in-memory array (no live file
  handle needed).
"""
from __future__ import annotations

import json
from typing import List, Tuple

import numpy as np

from ..geometry.affine import Affine
from ..geometry.geom import Polygon
from ..geometry.rasterize import geometry_mask
from ..vector import GeoDataFrame, sjoin


def label_segments(segments: GeoDataFrame,
                   labelled_points: GeoDataFrame
                   ) -> Tuple[GeoDataFrame, List]:
    """Join labelled points onto segments: unanimous class → that segment's
    ``feature_class``; mixed-class segments are excluded and reported
    (reference utils/utils.py:12-34)."""
    import pandas as pd
    mixed_segments = []
    labelled = segments.copy()
    if "feature_class" not in labelled.columns:
        # quirk #8: create up front (empty joins stay KeyError-free).
        # dtype=object, not float64: strict pandas setitem refuses to put
        # a string class into a NaN-initialised float column.
        labelled["feature_class"] = pd.Series(np.nan, index=labelled.index,
                                              dtype=object)
    inter = sjoin(labelled, labelled_points, how="inner",
                  predicate="intersects")
    if len(inter):
        for polygon_id, group in inter.groupby(inter.index):
            classes = group["class"].unique()
            if len(classes) == 1:
                labelled.loc[polygon_id, "feature_class"] = classes[0]
            else:
                mixed_segments.append(group["segment_id"].values[0])
    labelled = labelled[labelled["feature_class"].notna()]
    # restore the natural dtype (int/float classes back from object) so
    # downstream sklearn label checks see a proper multiclass target
    labelled["feature_class"] = labelled["feature_class"].infer_objects()
    return labelled, mixed_segments


def crop_image_to_bbox(image, geom):
    """Crop the in-memory raster to a geometry's bbox; returns band-first
    (C, h, w) data + the cropped transform (reference :37-50 reads from the
    live rasterio handle; here the array is already resident)."""
    xmin, ymin, xmax, ymax = geom.bounds
    inv = ~image.transform
    c0f, r0f = inv * (xmin, ymax)
    c1f, r1f = inv * (xmax, ymin)
    r0, r1 = sorted((r0f, r1f))
    c0, c1 = sorted((c0f, c1f))
    H, W, _ = image.img_data.shape
    r0i = max(0, int(np.floor(r0 + 1e-9)))
    c0i = max(0, int(np.floor(c0 + 1e-9)))
    r1i = min(H, int(np.ceil(r1 - 1e-9)))
    c1i = min(W, int(np.ceil(c1 - 1e-9)))
    crop = image.img_data[r0i:r1i, c0i:c1i]
    cropped = np.transpose(crop, (2, 0, 1))  # (C, h, w) band-first
    t = image.transform
    cropped_transform = t * Affine.translation(c0i, r0i)
    return cropped, cropped_transform


def mask_image_with_polygon(cropped_img_data, polygon, cropped_transform):
    """NaN outside the polygon; input/output band-first (C, h, w)
    (reference :53-67)."""
    C, h, w = cropped_img_data.shape
    inside = geometry_mask([polygon], (h, w), transform=cropped_transform,
                           invert=True)
    return np.where(inside[None, :, :], cropped_img_data, np.nan)


def save_deepforest_predictions_to_gpkg(df, tile_name, transforms_json,
                                        output_gpkg):
    """Pixel bboxes → georeferenced polygons via the per-tile affine stored
    in transforms.json (reference :70-145)."""
    with open(transforms_json, "r") as f:
        transforms_dict = json.load(f)
    if tile_name not in transforms_dict:
        print(f"Tile '{tile_name}' not found in transforms.json. Skipping.")
        return
    tinfo = transforms_dict[tile_name]
    a, b, c, d, e, f_ = tinfo["transform"]
    tile_affine = Affine(a, b, c, d, e, f_)
    crs_str = tinfo["crs"]

    records = []
    geoms = []
    for _, row in df.iterrows():
        corners_px = [(row["xmin"], row["ymin"]), (row["xmax"], row["ymin"]),
                      (row["xmax"], row["ymax"]), (row["xmin"], row["ymax"])]
        world = [tile_affine * p for p in corners_px]
        geoms.append(Polygon(world + [world[0]]))
        records.append({"label": row.get("label", "Tree"),
                        "score": row.get("score", None)})
    if not records:
        print(f"No predictions to save for tile {tile_name}")
        return
    gdf = GeoDataFrame({
        "label": [r["label"] for r in records],
        "score": [r["score"] for r in records],
    }, geometry=geoms, crs=crs_str)
    gdf.to_file(output_gpkg, driver="GPKG")
