"""Sharded multi-tile mosaic driver: pod-parallel segmentation +
classification (BASELINE.json config 5).

The reference scales out with a sequential checkerboard tile loop and
overlap-buffer seam reconciliation (reference tiling.py:62-291). Here the
mosaic shards 2-D over a ``jax.sharding.Mesh``: SLIC k-means runs with
replicated centers and psum reductions (:mod:`obia_tpu.parallel.sharded`),
so tile seams **never exist during clustering** — every pixel sees the
same global centers, and labels are globally consistent by construction.
Connectivity enforcement then runs block-locally on device with the
cross-block (and hence cross-shard) equivalences merged by the native
union-find. ``seam_overhead`` quantifies the residual boundary deviation
vs a single-device run — the BASELINE 'seam-merge overhead %' metric.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.slic import _grid_shape
from .sharded import make_mesh, sharded_slic_assign


def segment_mosaic(image_data: np.ndarray,
                   n_segments: int = 1000,
                   compactness: float = 10.0,
                   max_num_iter: int = 10,
                   mesh=None,
                   min_size_factor: float = 0.5,
                   max_size_factor: float = 3.0,
                   n_devices: Optional[int] = None
                   ) -> Tuple[np.ndarray, int]:
    """Segment a large raster across all devices of a mesh.

    Args:
      image_data: (H, W, C) float array (normalised bands recommended).
    Returns:
      ((H, W) int32 compact labels 0..K-1, K).
    """
    if mesh is None:
        mesh = make_mesh(n_devices)
    ty, tx = mesh.devices.shape
    H, W, C = image_data.shape
    Hp = ((H + ty - 1) // ty) * ty
    Wp = ((W + tx - 1) // tx) * tx
    img = np.zeros((Hp, Wp, C), np.float32)
    img[:H, :W] = image_data
    if Hp != H:
        img[H:, :W] = image_data[H - 1:H, :]  # edge-extend padding
    if Wp != W:
        img[:, W:] = img[:, W - 1:W]

    labels, _ = sharded_slic_assign(mesh, jnp.asarray(img), n_segments,
                                    compactness=compactness,
                                    max_num_iter=max_num_iter)

    # connectivity + seam-safe merge, all device-resident: the gather-free
    # scan CCL and the adoption sweeps are the same programs the
    # single-chip path runs, so sharded == single-device labels bitwise;
    # only the final compact labels are downloaded
    from ..ops.connectivity import (fastsv_dense_labels, merge_small_device,
                                    scan_ccl_dense_labels)
    from ..ops.slic import download_labels

    # gather the sharded label raster onto one device first: one
    # all-gather over ICI (int32 labels) is far cheaper than letting
    # GSPMD wrap the CCL scans in per-step collectives
    lab_crop = jax.device_put(labels[:H, :W], mesh.devices.flat[0])
    lab_dev, k_dev, conv_dev = scan_ccl_dense_labels(lab_crop)
    K, conv = jax.device_get((k_dev, conv_dev))
    K = int(K)
    if not bool(conv):
        lab_dev, k_dev = fastsv_dense_labels(lab_crop)
        K = int(jax.device_get(k_dev))
    gh, gw = _grid_shape(Hp, Wp, n_segments)
    seg_size = Hp * Wp / (gh * gw)
    min_size = max(1, int(min_size_factor * seg_size))
    max_size = max(min_size + 1, int(max_size_factor * seg_size))
    lab_dev, K = merge_small_device(lab_dev, K, min_size, max_size)
    return download_labels(lab_dev, K), K


def mosaic_pipeline(image, n_segments: int = 1000, compactness: float = 10.0,
                    mesh=None, output_gpkg: Optional[str] = None,
                    training_classes=None, classify_kwargs: Optional[dict] = None,
                    **mosaic_kwargs):
    """Full pod-parallel pipeline (BASELINE config 5): sharded segmentation
    over the mesh → fused per-object features → optional classification →
    GeoPackage out.

    Args:
      image: :class:`obia_tpu.handlers.geotif.Image` (or in-memory Image).
      training_classes: optional labelled objects GeoDataFrame (with
        ``feature_class``) to also classify every object.
    Returns the objects GeoDataFrame (with ``predicted_class`` columns when
    classification ran).
    """
    from ..geometry.geom import affine_transform
    from ..geometry.polygonize import polygonize_labels
    from ..segmentation.segment_boundaries import (LABEL_IDS_ATTR,
                                                   LABEL_RASTER_ATTR,
                                                   TRANSFORM_ATTR,
                                                   SharedArray)
    from ..segmentation.segment_statistics import create_objects
    from ..vector import GeoDataFrame

    norm = image.img_data.astype(np.float32)
    lo = norm.min(axis=(0, 1), keepdims=True)
    rng_ = norm.max(axis=(0, 1), keepdims=True) - lo
    norm = np.where(rng_ > 0, (norm - lo) / np.where(rng_ > 0, rng_, 1), 0.0)

    labels, n_labels = segment_mosaic(norm, n_segments=n_segments,
                                      compactness=compactness, mesh=mesh,
                                      **mosaic_kwargs)

    polys = polygonize_labels(labels)
    geometries = []
    for label in range(n_labels):
        for p in polys.get(label, []):
            geometries.append(
                affine_transform(p, image.affine_transformation))
    gdf = GeoDataFrame(geometry=geometries)
    object.__setattr__(gdf, "crs", image.crs)
    gdf["segment_id"] = range(1, len(gdf) + 1)
    gdf.attrs[LABEL_RASTER_ATTR] = SharedArray(labels)
    gdf.attrs[LABEL_IDS_ATTR] = SharedArray(np.arange(1, n_labels + 1))
    gdf.attrs[TRANSFORM_ATTR] = image.transform

    objects = create_objects(gdf, image)

    if training_classes is not None:
        from ..classification.classify import classify
        result = classify(objects, training_classes,
                          **(classify_kwargs or {}))
        objects = GeoDataFrame(result.classified)
        object.__setattr__(objects, "crs", image.crs)

    if output_gpkg:
        objects.to_file(output_gpkg, layer="segments")
    return objects


def boundary_map(labels: np.ndarray) -> np.ndarray:
    b = np.zeros(labels.shape, bool)
    b[:, 1:] |= labels[:, 1:] != labels[:, :-1]
    b[1:, :] |= labels[1:, :] != labels[:-1, :]
    return b


def seam_overhead(labels_sharded: np.ndarray,
                  labels_single: np.ndarray,
                  tolerance_px: int = 1) -> float:
    """Seam-merge overhead %: fraction of the sharded run's boundary
    pixels that have no single-device boundary within ``tolerance_px``
    (the BASELINE 'seam-merge overhead' metric; 0 = boundaries agree)."""
    from ..ops.filters import maximum_filter

    b_sh = boundary_map(labels_sharded)
    b_si = boundary_map(labels_single)
    if tolerance_px > 0:
        size = 2 * tolerance_px + 1
        dil = np.asarray(maximum_filter(
            jnp.asarray(b_si, jnp.float32), size)) > 0
    else:
        dil = b_si
    n_b = b_sh.sum()
    if n_b == 0:
        return 0.0
    unmatched = (b_sh & ~dil).sum()
    return 100.0 * float(unmatched) / float(n_b)
