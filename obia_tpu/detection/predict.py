"""Whole-raster detection inference.

API-parity module for reference obia/detection/predict.py (``predict(model,
image_path, device, score_threshold)`` :14-57): reads the full N-band
raster, global min-max scales to uint8 (:30-34), one forward pass, filters
by score threshold, returns {"boxes", "scores", "labels"} numpy arrays.
Decoding + NMS replace torchvision's internal postprocessing.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..io.tiff import TiffReader
from .anchors import decode_boxes, nms_numpy
from .models import DetectionModel


def predict(model: DetectionModel, image_path: str, device: str = "tpu",
            score_threshold: float = 0.5,
            nms_threshold: float = 0.5) -> Dict[str, np.ndarray]:
    image_array = TiffReader(image_path).read()

    data_min = image_array.min()
    data_max = image_array.max()
    if data_max > data_min:
        image_array = 255 * (image_array - data_min) / \
            (data_max - data_min + 1e-8)
    image_array = np.clip(image_array, 0, 255).astype(np.uint8)

    H, W, C = image_array.shape
    pad_h = ((H + 127) // 128) * 128
    pad_w = ((W + 127) // 128) * 128
    padded = np.zeros((1, pad_h, pad_w, C), np.float32)
    padded[0, :H, :W] = image_array

    cls_logits, box_deltas = model.apply(jnp.asarray(padded), train=False)
    anchors = jnp.asarray(model.anchors((pad_h, pad_w)))
    boxes = np.asarray(decode_boxes(anchors, box_deltas[0]))
    scores_all = np.asarray(jax.nn.sigmoid(cls_logits[0]))  # (N, K)

    # best non-background class per anchor (class slot 0 = background)
    cls_scores = scores_all[:, 1:] if scores_all.shape[1] > 1 else scores_all
    labels = cls_scores.argmax(axis=1) + (1 if scores_all.shape[1] > 1 else 0)
    scores = cls_scores.max(axis=1)

    keep = scores >= score_threshold
    boxes, scores, labels = boxes[keep], scores[keep], labels[keep]
    if len(boxes):
        keep_idx = nms_numpy(boxes, scores, nms_threshold)
        boxes, scores, labels = boxes[keep_idx], scores[keep_idx], labels[keep_idx]
        # clip to raster extent
        boxes[:, 0::2] = np.clip(boxes[:, 0::2], 0, W)
        boxes[:, 1::2] = np.clip(boxes[:, 1::2], 0, H)

    return {"boxes": boxes, "scores": scores, "labels": labels}
