"""Image enhancement utilities.

API-parity module for reference obia/utils/image.py (rescale_to_8bit :8-36,
apply_histogram_equalization :39-66, apply_clahe :69-94, rgb_to_gray :97-100,
variance_of_laplacian :103-107, laplacian :110-136). Host-side paths use
OpenCV exactly like the reference; the raster-scale sharpness map
(``laplacian``) also has a TPU/XLA path in :mod:`obia_tpu.ops.filters` used
when the input is already device-resident.
"""
from __future__ import annotations

import numpy as np
import cv2
from scipy.ndimage import uniform_filter

from ..io.tiff import TiffReader, write_tiff


def rescale_to_8bit(image: np.ndarray, min: int = 2, max: int = 98) -> np.ndarray:
    """Percentile-stretch to uint8 [0, 255]; constant inputs map to zeros."""
    p_min, p_max = np.percentile(image, (min, max))
    if p_min == p_max:
        return np.zeros(image.shape, dtype=np.uint8)
    scaled = 255.0 * (image - p_min) / (p_max - p_min)
    return np.clip(scaled, 0, 255).astype(np.uint8)


def apply_histogram_equalization(image: np.ndarray) -> np.ndarray:
    """Global histogram equalization; always returns a 3-channel stack."""
    if image.ndim == 3:
        image_gray = cv2.cvtColor(image, cv2.COLOR_RGB2GRAY)
    else:
        image_gray = image
    equalized = cv2.equalizeHist(image_gray)
    return np.stack((equalized,) * 3, axis=-1)


def apply_clahe(image: np.ndarray) -> np.ndarray:
    """CLAHE (clip 2.0, 8x8 tiles), per-channel for multiband input."""
    clahe = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8))
    if image.ndim == 3:
        channels = cv2.split(image)
        return cv2.merge([clahe.apply(ch) for ch in channels])
    return clahe.apply(image)


def rgb_to_gray(rgb: np.ndarray) -> np.ndarray:
    """ITU-R 601 grayscale (expects float array, any range)."""
    coeffs = np.array([0.299, 0.587, 0.114], dtype=np.float32)
    return (rgb * coeffs).sum(axis=-1)


def variance_of_laplacian(gray: np.ndarray, win: int) -> np.ndarray:
    """Local variance of the 3x3 Laplacian over a win x win window."""
    lap = cv2.Laplacian(gray.astype(np.float32), cv2.CV_32F, ksize=3)
    mean = uniform_filter(lap, size=win)
    mean2 = uniform_filter(lap * lap, size=win)
    return mean2 - mean ** 2


def laplacian(in_path: str, out_path: str, win: int,
              vis_bands=(2, 3, 5)) -> None:
    """Laplacian-variance sharpness raster (reference image.py:103-136):
    read visible bands (1-based), min-max normalise, grayscale,
    Laplacian variance, 2-98 percentile stretch, write float32 GeoTIFF."""
    reader = TiffReader(in_path)
    full = reader.read()
    idx = [b - 1 for b in vis_bands]
    arr = full[:, :, idx].astype(np.float32)

    band_min = arr.min(axis=(0, 1), keepdims=True)
    band_rng = np.ptp(arr, axis=(0, 1)) .reshape(1, 1, -1) + 1e-8
    arr = (arr - band_min) / band_rng

    gray = rgb_to_gray(arr)
    sharp = variance_of_laplacian(gray, win)

    lo, hi = np.percentile(sharp, [2, 98])
    sharp = np.clip((sharp - lo) / (hi - lo + 1e-30), 0, 1)

    write_tiff(out_path, sharp.astype(np.float32),
               transform=reader.transform, crs=reader.crs)
