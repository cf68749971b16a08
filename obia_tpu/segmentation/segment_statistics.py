"""Per-object feature extraction — fused TPU passes over the label raster.

API-parity module for reference obia/segmentation/segment_statistics.py:
``_create_empty_stats_columns`` (:12-110, column naming ``b{band}_{stat}``
and ordering preserved exactly), ``calculate_spectral_stats`` (:113-176),
``calculate_textural_stats`` (:179-296), ``create_objects`` (:392-511).

Execution model: instead of the reference's per-segment loop (windowed disk
read + polygon mask + scipy/skimage per object — hot loop #2), all objects
are reduced in a handful of XLA passes over the HBM-resident label raster
(:mod:`obia_tpu.ops.stats`, :mod:`obia_tpu.ops.glcm`).

Deliberate divergences (SURVEY.md §7 quirks):
* #2 — GLCM runs on the true (H, W) band plane (the reference indexes the
  band-first masked array as ``[:, :, band]``, feeding GLCM a wrong slice).
* #9 — statistics come from the in-memory array; no live file handle is
  required, so in-memory Images work.
* GLCM pairs are counted within-object only and quantisation uses object
  pixels (the reference includes bbox background zeros).
* Point-cloud (structural/radiometric) statistics are IMPLEMENTED here
  (``calculate_structural_stats`` below, over :mod:`obia_tpu.ops.pointcloud`
  + the in-repo LAS codec) where the current reference stubs them with
  NotImplementedError (:301-329, :435-439); column slots and naming match.
"""
from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np

from ..geometry.rasterize import rasterize
from ..ops.glcm import segment_glcm_props
from ..vector import GeoDataFrame
from .segment_boundaries import (LABEL_DEV_ATTR, LABEL_IDS_ATTR,
                                 LABEL_RASTER_ATTR, SharedArray, unwrap_attr)

SPECTRAL_STATS = ("mean", "variance", "min", "max", "skewness", "kurtosis")
TEXTURAL_STATS = ("contrast", "dissimilarity", "homogeneity", "ASM",
                  "energy", "correlation")
POINTCLOUD_STATS = ("pai", "fhd", "ch", "mean_intensity",
                    "variance_intensity")


def _create_empty_stats_columns(spectral_bands, textural_bands,
                                calc_mean, calc_variance, calc_min, calc_max,
                                calc_skewness, calc_kurtosis,
                                calc_contrast, calc_dissimilarity,
                                calc_homogeneity, calc_ASM, calc_energy,
                                calc_correlation,
                                calc_pai, calc_fhd, calc_ch,
                                calc_mean_intensity, calc_variance_intensity
                                ) -> List[str]:
    """Column list with the reference's exact naming and ordering
    (segment_statistics.py:66-110)."""
    columns = ["segment_id"]
    spectral_flags = dict(zip(SPECTRAL_STATS,
                              (calc_mean, calc_variance, calc_min, calc_max,
                               calc_skewness, calc_kurtosis)))
    textural_flags = dict(zip(TEXTURAL_STATS,
                              (calc_contrast, calc_dissimilarity,
                               calc_homogeneity, calc_ASM, calc_energy,
                               calc_correlation)))
    pc_flags = dict(zip(POINTCLOUD_STATS,
                        (calc_pai, calc_fhd, calc_ch, calc_mean_intensity,
                         calc_variance_intensity)))
    for b in spectral_bands:
        for stat, on in spectral_flags.items():
            if on:
                columns.append(f"b{b}_{stat}")
    for b in textural_bands:
        for stat, on in textural_flags.items():
            if on:
                columns.append(f"b{b}_{stat}")
    for stat, on in pc_flags.items():
        if on:
            columns.append(stat)
    columns.append("geometry")
    return columns


def calculate_spectral_stats(image, statistics_bands,
                             calc_mean=True, calc_variance=True,
                             calc_min=True, calc_max=True,
                             calc_skewness=True, calc_kurtosis=True):
    """Single-object convenience path (reference :113-176): ``image`` is a
    band-first (C, H, W) array with NaN outside the object."""
    arr = np.asarray(image, np.float32)
    stats = {}
    for b in statistics_bands:
        band = arr[b]
        vals = band[~np.isnan(band)]
        prefix = f"b{b}"
        flags = dict(zip(SPECTRAL_STATS,
                         (calc_mean, calc_variance, calc_min, calc_max,
                          calc_skewness, calc_kurtosis)))
        if vals.size == 0:
            for stat, on in flags.items():
                if on:
                    stats[f"{prefix}_{stat}"] = np.nan
            continue
        from scipy import stats as sps
        values = {
            "mean": np.mean(vals), "variance": np.var(vals),
            "min": np.min(vals), "max": np.max(vals),
            "skewness": sps.skew(vals), "kurtosis": sps.kurtosis(vals),
        }
        for stat, on in flags.items():
            if on:
                stats[f"{prefix}_{stat}"] = values[stat]
    return stats


def calculate_textural_stats(image, textural_bands,
                             calc_contrast=True, calc_dissimilarity=True,
                             calc_homogeneity=True, calc_ASM=True,
                             calc_energy=True, calc_correlation=True):
    """Single-object convenience path: ``image`` is band-first (C, H, W)
    with NaN outside the object (axis fixed vs reference — quirk #2)."""
    arr = np.asarray(image, np.float32)
    C, H, W = arr.shape
    stats = {}
    flags = dict(zip(TEXTURAL_STATS,
                     (calc_contrast, calc_dissimilarity, calc_homogeneity,
                      calc_ASM, calc_energy, calc_correlation)))
    for b in textural_bands:
        band = arr[b]
        valid = ~np.isnan(band)
        prefix = f"b{b}"
        if not valid.any():
            for stat, on in flags.items():
                if on:
                    stats[f"{prefix}_{stat}"] = np.nan
            continue
        labels = np.where(valid, 0, -1).astype(np.int32)
        clean = np.where(valid, band, 0.0).astype(np.float32)
        props = segment_glcm_props(
            np.asarray(clean)[:, :, None], labels, 1,
            compute_asm=calc_ASM or calc_energy)
        for stat, on in flags.items():
            if on:
                stats[f"{prefix}_{stat}"] = float(np.asarray(props[stat])[0, 0])
    return stats


def _strict_reference_textural_stats(masked_chw, textural_bands, flags):
    """BUG-COMPATIBLE per-object texture (the ``strict_reference_glcm``
    escape hatch): replicates reference segment_statistics.py:179-296
    exactly, including the axis bug — ``image[:, :, band]`` on the
    band-FIRST (C, Hc, Wc) masked crop yields a (C, Hc) slab at
    column=band — the background-zero fill, the slab-global min-max
    uint8 truncation quantise, and the bbox-crop GLCM over background
    zeros. Use only to reconcile outputs against reference GPKGs."""
    from ..ops.glcm import graycomatrix_reference, graycoprops_reference

    arr = np.asarray(masked_chw, np.float64)
    stats = {}
    for b in textural_bands:
        prefix = f"b{b}"
        if arr.shape[2] <= b:
            # the reference's wrong-axis slice raises IndexError outright
            # when the object's bbox is narrower than the band index
            # (1-3 px slivers); there is no reference value to reconcile
            # against, so emit NaN instead of crashing the whole run
            for stat, on in flags.items():
                if on:
                    stats[f"{prefix}_{stat}"] = np.nan
            continue
        band_data = arr[:, :, b]  # the reference's wrong-axis slice
        valid = ~np.isnan(band_data)
        if not valid.any():
            for stat, on in flags.items():
                if on:
                    stats[f"{prefix}_{stat}"] = np.nan
            continue
        band_clean = band_data.copy()
        band_clean[~valid] = 0
        mn, mx = band_clean.min(), band_clean.max()
        if mx == mn:
            q = np.zeros(band_clean.shape, np.uint8)
        else:
            q = ((band_clean - mn) / (mx - mn) * 255).astype(np.uint8)
        try:
            glcm = graycomatrix_reference(q, distance=2, levels=256)
        except ValueError:
            for stat, on in flags.items():
                if on:
                    stats[f"{prefix}_{stat}"] = np.nan
            continue
        for stat, on in flags.items():
            if on:
                stats[f"{prefix}_{stat}"] = float(
                    np.mean(graycoprops_reference(glcm, stat)))
    return stats


def calculate_structural_stats(pointcloud, voxel_resolution,
                               calc_pai=True, calc_fhd=True, calc_ch=True):
    """Point-cloud structural stats for a single object.

    The reference stubs this out (segment_statistics.py:301-329 raises
    NotImplementedError — "point-cloud dependencies were removed").
    Implemented here natively: CH = max height, FHD = Shannon entropy of
    the dz-layered return distribution, PAI = MacArthur-Horn
    ``ln(N_total / N_ground)`` (see :mod:`obia_tpu.ops.pointcloud`).
    """
    from ..ops.pointcloud import _field
    z = _field(pointcloud, "Z")
    if z is None:
        raise ValueError("point cloud must provide a 'Z' field")
    z = np.asarray(z, np.float64)
    stats = {}
    if z.size == 0:
        for name, on in (("pai", calc_pai), ("fhd", calc_fhd),
                         ("ch", calc_ch)):
            if on:
                stats[name] = np.nan
        return stats
    if (calc_pai or calc_fhd) and voxel_resolution is None:
        raise ValueError("voxel_resolution is required for PAI/FHD")
    if calc_ch:
        stats["ch"] = float(z.max())
    if calc_pai or calc_fhd:
        dz = float(voxel_resolution)
        layer = np.clip(np.floor((z - z.min()) / dz), 0, None).astype(np.int64)
        if calc_pai:
            n_ground = int((layer == 0).sum())
            stats["pai"] = float(np.log(z.size / n_ground))
        if calc_fhd:
            p = np.bincount(layer).astype(np.float64) / z.size
            with np.errstate(divide="ignore", invalid="ignore"):
                stats["fhd"] = float(
                    -np.where(p > 0, p * np.log(p), 0.0).sum())
    return stats


def calculate_radiometric_stats(pointcloud, calc_mean_intensity=True,
                                calc_variance_intensity=True):
    """Point-cloud intensity stats (reference :332-389): NaN when intensity
    is unavailable."""
    stats = {}
    intensities = None
    if isinstance(pointcloud, np.ndarray) and pointcloud.dtype.names:
        if "Intensity" in pointcloud.dtype.names:
            intensities = pointcloud["Intensity"]
    elif isinstance(pointcloud, dict):
        intensities = pointcloud.get("Intensity")
    if intensities is None or np.size(intensities) == 0:
        if calc_mean_intensity:
            stats["mean_intensity"] = np.nan
        if calc_variance_intensity:
            stats["variance_intensity"] = np.nan
        return stats
    if calc_mean_intensity:
        stats["mean_intensity"] = float(np.mean(intensities))
    if calc_variance_intensity:
        stats["variance_intensity"] = float(np.var(intensities))
    return stats


def _label_raster_for(segments: GeoDataFrame, image):
    """Fetch the attached label raster, or rasterise the polygons (row i →
    label i) when the GeoDataFrame came from elsewhere (or was filtered —
    ``len(ids) != len(segments)``). Returns ``(labels, attached)``:
    ``attached`` is False when the raster was re-rasterised, in which case
    any device-resident copy in attrs is STALE and must not be used."""
    lr = unwrap_attr(segments.attrs.get(LABEL_RASTER_ATTR))
    ids = unwrap_attr(segments.attrs.get(LABEL_IDS_ATTR, []))
    if lr is not None and len(ids) == len(segments):
        # the attached contract is POSITIONAL (raster label k belongs to
        # row k) — a reordered frame keeps its length, so also require the
        # id sequence to still line up with the rows
        if ("segment_id" not in segments.columns
                or np.array_equal(np.asarray(ids),
                                  segments["segment_id"].to_numpy())):
            return lr, True
    from .segment_boundaries import resolve_geometry
    resolve_geometry(segments)  # async polygonisation must land first
    H, W, _ = image.img_data.shape
    shapes = [(geom, i) for i, geom in enumerate(segments.geometry)]
    lab = rasterize(shapes, (H, W), transform=image.transform, fill=-1,
                    dtype=np.int32)
    return lab, False


def create_objects(segments: GeoDataFrame, image, ept=None, ept_srs=None,
                   spectral_bands=None, textural_bands=None,
                   voxel_resolution=None,
                   calculate_spectral=True, calculate_textural=True,
                   calculate_structural=False, calculate_radiometric=False,
                   calc_mean=True, calc_variance=True, calc_min=True,
                   calc_max=True, calc_skewness=True, calc_kurtosis=True,
                   calc_contrast=True, calc_dissimilarity=True,
                   calc_homogeneity=True, calc_ASM=True, calc_energy=True,
                   calc_correlation=True,
                   calc_pai=True, calc_fhd=True, calc_ch=True,
                   calc_mean_intensity=True, calc_variance_intensity=True,
                   glcm_levels: int = 256, glcm_distance: int = 2,
                   glcm_angles=None, pointcloud=None,
                   strict_reference_glcm: bool = False,
                   _exec=None) -> GeoDataFrame:
    """Per-object feature table (reference create_objects,
    segment_statistics.py:392-511) via fused passes.

    Beyond the reference: pass ``pointcloud=`` (structured array / dict
    with X, Y, Z[, Intensity] in the image CRS, or a path to a ``.las``
    file read by the in-repo codec :mod:`obia_tpu.io.las`) to enable the
    structural/radiometric families the reference stubs out (:435-439);
    points are assigned to objects through the label raster in one
    vectorised pass (:mod:`obia_tpu.ops.pointcloud`).
    """
    if isinstance(pointcloud, (str, os.PathLike)):
        from ..io.las import read_las
        pointcloud = read_las(pointcloud)
        from ..geometry.crs import CRS
        pc_epsg = pointcloud.crs.to_epsg() if pointcloud.crs else None
        img_crs = CRS.from_user_input(getattr(image, "crs", None))
        img_epsg = img_crs.to_epsg() if img_crs is not None else None
        if pc_epsg and img_epsg and pc_epsg != img_epsg:
            import warnings
            warnings.warn(
                f"point cloud CRS EPSG:{pc_epsg} != image CRS "
                f"EPSG:{img_epsg}; points are joined to the label raster "
                "in image coordinates, so the structural/radiometric "
                "statistics will be wrong — reproject the cloud first",
                stacklevel=2)
    if not (calculate_spectral or calculate_textural or calculate_structural
            or calculate_radiometric):
        raise ValueError(
            "At least one of 'calculate_spectral', 'calculate_textural', "
            "'calculate_structural', or 'calculate_radiometric' must be True.")
    if ept is not None or ((calculate_structural or calculate_radiometric)
                           and pointcloud is None):
        # reference behavior (:435-439): the EPT/PDAL reader path stays
        # unavailable; in-memory point clouds are the supported route
        raise NotImplementedError(
            "Point-cloud workflows are temporarily disabled. "
            "Use spectral/textural statistics only for now.")

    num_bands = image.img_data.shape[2]
    if spectral_bands is None:
        spectral_bands = list(range(num_bands))
    if textural_bands is None:
        textural_bands = list(range(num_bands))

    # the reference passes both band lists to the column builder and runs
    # spectral stats unconditionally regardless of calculate_spectral
    # (segment_statistics.py:470-497); textural columns stay (NaN) even when
    # calculate_textural=False — schema preserved here
    columns = _create_empty_stats_columns(
        spectral_bands, textural_bands,
        calc_mean, calc_variance, calc_min, calc_max, calc_skewness,
        calc_kurtosis, calc_contrast, calc_dissimilarity, calc_homogeneity,
        calc_ASM, calc_energy, calc_correlation,
        calc_pai, calc_fhd, calc_ch, calc_mean_intensity,
        calc_variance_intensity)

    from .. import telemetry

    labels, labels_attached = _label_raster_for(segments, image)
    K = len(segments)
    mp = image.img_data.shape[0] * image.img_data.shape[1] / 1e6

    data = {"segment_id": segments["segment_id"].to_numpy()
            if "segment_id" in segments.columns
            else np.arange(1, K + 1)}

    import jax.numpy as jnp
    img = None
    labels_dev = None
    if _exec is not None and not labels_attached:
        # The sharded closures reduce over the mesh-resident label raster,
        # which is STALE the moment rows and labels desync (a row filter,
        # or a pinched label tracing multiple exterior rings — one gdf row
        # per polygon): _label_raster_for re-rasterised row i -> label i,
        # so fall back to the single-device fused path on that raster.
        _exec = None
    if _exec is None:
        # single cached device upload shared with segmentation
        img = (image.device_array() if hasattr(image, "device_array")
               else np.asarray(image.img_data, np.float32))
        # prefer the device-resident labels attached by create_segments —
        # the raster then never re-crosses the host<->device link. Only
        # valid when the ATTACHED raster is in use: after a row filter the
        # labels were re-rasterised (row i -> label i) and the device copy
        # is stale.
        labels_dev = (unwrap_attr(segments.attrs.get(LABEL_DEV_ATTR))
                      if labels_attached else None)
        if (labels_dev is None
                or getattr(labels_dev, "shape", None) != labels.shape):
            labels_dev = jnp.asarray(np.ascontiguousarray(labels, np.int32))

    if spectral_bands:  # unconditional, like the reference (:490-495)
        with telemetry.stage("objects.spectral", mp):
            # `_exec` supplies sharded-mesh kernels (parallel/mosaic.py);
            # the default is the single-device fused program
            if _exec is not None:
                # packed contract: (names, (n_stats, K, C) host array) —
                # the closure downloads ONE device value and trims on host
                names, packed = _exec["spectral"](K)
            else:
                # ONE device value + ONE download; per-stat device trims
                # and an eager re-stack cost a ~28 ms round trip each on
                # remote-attached TPUs
                from ..ops.stats import spectral_moments_packed
                names, packed = spectral_moments_packed(
                    jnp.asarray(img), labels_dev, K)
            sp = dict(zip(names, packed))
        flags = dict(zip(SPECTRAL_STATS,
                         (calc_mean, calc_variance, calc_min, calc_max,
                          calc_skewness, calc_kurtosis)))
        for stat, on in flags.items():
            if not on:
                continue
            arr = np.asarray(sp[stat])
            for b in spectral_bands:
                data[f"b{b}_{stat}"] = arr[:, b].astype(float)

    if calculate_textural and textural_bands and strict_reference_glcm:
        # bug-compatible host loop (escape hatch mirroring the
        # strict_reference_scaling precedent in classify.py): per-object
        # bbox crop + NaN mask, then the reference's exact texture path
        flags = dict(zip(TEXTURAL_STATS,
                         (calc_contrast, calc_dissimilarity,
                          calc_homogeneity, calc_ASM, calc_energy,
                          calc_correlation)))
        img_np = np.asarray(image.img_data, np.float32)
        lab_np = np.asarray(labels)
        cols = {f"b{b}_{s}": np.full(K, np.nan)
                for b in textural_bands for s in TEXTURAL_STATS}
        ids = unwrap_attr(segments.attrs.get(LABEL_IDS_ATTR))
        ids = (np.asarray(ids) - 1 if (labels_attached and ids is not None
                                       and len(ids) == K)
               else np.arange(K))
        with telemetry.stage("objects.glcm_strict", mp):
            for row, lab_id in enumerate(ids):
                m = lab_np == lab_id
                rows_any = m.any(axis=1)
                cols_any = m.any(axis=0)
                if not rows_any.any():
                    continue
                r0, r1 = np.flatnonzero(rows_any)[[0, -1]]
                c0, c1 = np.flatnonzero(cols_any)[[0, -1]]
                crop = img_np[r0:r1 + 1, c0:c1 + 1, :]
                mcrop = m[r0:r1 + 1, c0:c1 + 1]
                masked = np.where(mcrop[None, :, :],
                                  np.moveaxis(crop, 2, 0), np.nan)
                st = _strict_reference_textural_stats(
                    masked, textural_bands, flags)
                for name, val in st.items():
                    cols[name][row] = val
        for name, on in flags.items():
            if not on:
                continue
            for b in textural_bands:
                data[f"b{b}_{name}"] = cols[f"b{b}_{name}"]
    elif calculate_textural and textural_bands:
        from ..ops.glcm import DEFAULT_ANGLES
        with telemetry.stage("objects.glcm", mp):
            glcm_kw = dict(
                levels=int(glcm_levels), distance=int(glcm_distance),
                angles=(tuple(glcm_angles) if glcm_angles is not None
                        else DEFAULT_ANGLES),
                compute_asm=calc_ASM or calc_energy,
                bands=tuple(textural_bands))
            if _exec is not None:
                # packed contract: (names, (6, K, B) host array)
                names, packed = _exec["glcm"](K, **glcm_kw)
            else:
                from ..ops.glcm import segment_glcm_props_packed
                names, packed = segment_glcm_props_packed(
                    jnp.asarray(img), labels_dev, K, **glcm_kw)
            props = dict(zip(names, packed))
        flags = dict(zip(TEXTURAL_STATS,
                         (calc_contrast, calc_dissimilarity, calc_homogeneity,
                          calc_ASM, calc_energy, calc_correlation)))
        for stat, on in flags.items():
            if not on:
                continue
            arr = np.asarray(props[stat])
            for j, b in enumerate(textural_bands):
                data[f"b{b}_{stat}"] = arr[:, j].astype(float)

    # point-cloud columns: computed when a point cloud is supplied and the
    # family is enabled; otherwise NaN slots matching the reference schema
    pc_stats = {}
    if pointcloud is not None and (calculate_structural
                                   or calculate_radiometric):
        from ..ops.pointcloud import segment_pointcloud_stats
        with telemetry.stage("objects.pointcloud"):
            pc_stats = segment_pointcloud_stats(
                pointcloud, labels, image.transform, K,
                voxel_resolution=voxel_resolution,
                calc_pai=calculate_structural and calc_pai,
                calc_fhd=calculate_structural and calc_fhd,
                calc_ch=calculate_structural and calc_ch,
                calc_mean_intensity=(calculate_radiometric
                                     and calc_mean_intensity),
                calc_variance_intensity=(calculate_radiometric
                                         and calc_variance_intensity))
    for stat, on in zip(POINTCLOUD_STATS,
                        (calc_pai, calc_fhd, calc_ch, calc_mean_intensity,
                         calc_variance_intensity)):
        if on:
            data[stat] = np.asarray(pc_stats.get(stat, np.full(K, np.nan)),
                                    float)

    # join any async polygonisation NOW — every device stage above has
    # been dispatched, so the host-side ring stitching already overlapped
    # the featurisation compute (segment_boundaries._polygonize_geometries)
    from .segment_boundaries import resolve_geometry
    resolve_geometry(segments)
    data["geometry"] = list(segments.geometry)
    with telemetry.stage("objects.assemble"):
        # schema columns without computed values (e.g. textural slots when
        # calculate_textural=False) stay as NaN columns, like the reference
        gdf = GeoDataFrame({c: data.get(c, np.full(K, np.nan))
                            for c in columns})
    object.__setattr__(gdf, "crs", segments.crs)
    gdf.attrs[LABEL_RASTER_ATTR] = SharedArray(labels)
    if labels_attached and LABEL_DEV_ATTR in segments.attrs:
        # only propagate the device copy when it matches the raster in use
        gdf.attrs[LABEL_DEV_ATTR] = segments.attrs[LABEL_DEV_ATTR]
    gdf.attrs[LABEL_IDS_ATTR] = SharedArray(
        unwrap_attr(segments.attrs.get(LABEL_IDS_ATTR, np.arange(1, K + 1)))
        if labels_attached else np.arange(1, K + 1))
    gdf.attrs["obia_transform"] = segments.attrs.get(
        "obia_transform", image.transform)
    return gdf
