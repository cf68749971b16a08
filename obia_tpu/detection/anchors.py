"""Anchor generation, box encoding, IoU matching for RetinaNet.

Matches the torchvision RetinaNet defaults the reference inherits
(detection/models.py:30): per-level base sizes 32..512 with scales
{2^0, 2^(1/3), 2^(2/3)} and aspect ratios {0.5, 1, 2}; IoU fg/bg thresholds
0.5/0.4; box deltas (dx, dy, dw, dh) normalised by anchor size.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

SCALES = (1.0, 2 ** (1 / 3), 2 ** (2 / 3))
RATIOS = (0.5, 1.0, 2.0)
NUM_ANCHORS = len(SCALES) * len(RATIOS)
LEVEL_STRIDES = (8, 16, 32, 64, 128)
LEVEL_SIZES = (32, 64, 128, 256, 512)


def anchors_for_shape(image_hw: Tuple[int, int]) -> np.ndarray:
    """All anchors (N, 4) xyxy for an image of shape (H, W)."""
    H, W = image_hw
    all_anchors = []
    for stride, size in zip(LEVEL_STRIDES, LEVEL_SIZES):
        fh = (H + stride - 1) // stride
        fw = (W + stride - 1) // stride
        shifts_x = (np.arange(fw) + 0.5) * stride
        shifts_y = (np.arange(fh) + 0.5) * stride
        cx, cy = np.meshgrid(shifts_x, shifts_y)
        base = []
        for scale in SCALES:
            for ratio in RATIOS:
                a = size * scale
                w = a * np.sqrt(1.0 / ratio)
                h = a * np.sqrt(ratio)
                base.append((w, h))
        base = np.asarray(base)  # (A, 2)
        cxy = np.stack([cx, cy], axis=-1).reshape(-1, 1, 2)  # (fh*fw, 1, 2)
        wh = base.reshape(1, -1, 2)
        mins = cxy - wh / 2
        maxs = cxy + wh / 2
        anchors = np.concatenate([mins, maxs], axis=-1).reshape(-1, 4)
        all_anchors.append(anchors)
    return np.concatenate(all_anchors, axis=0).astype(np.float32)


def encode_boxes(anchors: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """gt boxes → (dx, dy, dw, dh) deltas relative to anchors (both xyxy)."""
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    ax = anchors[:, 0] + aw / 2
    ay = anchors[:, 1] + ah / 2
    bw = jnp.maximum(boxes[:, 2] - boxes[:, 0], 1e-6)
    bh = jnp.maximum(boxes[:, 3] - boxes[:, 1], 1e-6)
    bx = boxes[:, 0] + bw / 2
    by = boxes[:, 1] + bh / 2
    return jnp.stack([(bx - ax) / aw, (by - ay) / ah,
                      jnp.log(bw / aw), jnp.log(bh / ah)], axis=1)


def decode_boxes(anchors: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    ax = anchors[:, 0] + aw / 2
    ay = anchors[:, 1] + ah / 2
    bx = deltas[:, 0] * aw + ax
    by = deltas[:, 1] * ah + ay
    bw = jnp.exp(jnp.clip(deltas[:, 2], -10, 6)) * aw
    bh = jnp.exp(jnp.clip(deltas[:, 3], -10, 6)) * ah
    return jnp.stack([bx - bw / 2, by - bh / 2,
                      bx + bw / 2, by + bh / 2], axis=1)


def pairwise_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(N, M) IoU between two xyxy box sets."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.clip((a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1]), 0)
    area_b = jnp.clip((b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1]), 0)
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def match_anchors(anchors: jnp.ndarray, gt_boxes: jnp.ndarray,
                  gt_valid: jnp.ndarray,
                  fg_thresh: float = 0.5, bg_thresh: float = 0.4):
    """Per anchor: (matched_gt_index, label) with label 1 = fg, 0 = bg,
    -1 = ignore. ``gt_boxes`` is padded to fixed length; ``gt_valid``
    masks real rows."""
    iou = pairwise_iou(anchors, gt_boxes)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    best_gt = jnp.argmax(iou, axis=1)
    best_iou = jnp.max(iou, axis=1)
    label = jnp.where(best_iou >= fg_thresh, 1,
                      jnp.where(best_iou < bg_thresh, 0, -1))
    # torchvision Matcher(allow_low_quality_matches=True) parity: every
    # gt's best-overlap anchor(s) are forced positive even below
    # fg_thresh, so small/elongated objects falling between anchor
    # scales still receive a training signal
    best_anchor_iou = jnp.max(iou, axis=0)  # (G,)
    force = ((iou == best_anchor_iou[None, :]) & gt_valid[None, :]
             & (best_anchor_iou[None, :] > 0))
    forced_any = force.any(axis=1)
    best_gt = jnp.where(forced_any, jnp.argmax(force, axis=1), best_gt)
    label = jnp.where(forced_any, 1, label)
    any_gt = gt_valid.any()
    label = jnp.where(any_gt, label, jnp.zeros_like(label))
    return best_gt, label


def nms_numpy(boxes: np.ndarray, scores: np.ndarray,
              iou_threshold: float = 0.5, max_out: int = 300) -> np.ndarray:
    """Greedy host-side NMS; returns kept indices."""
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    areas = np.clip(boxes[:, 2] - boxes[:, 0], 0, None) * \
        np.clip(boxes[:, 3] - boxes[:, 1], 0, None)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        if len(keep) >= max_out:
            break
        lt = np.maximum(boxes[i, :2], boxes[:, :2])
        rb = np.minimum(boxes[i, 2:], boxes[:, 2:])
        wh = np.clip(rb - lt, 0, None)
        inter = wh[:, 0] * wh[:, 1]
        iou = inter / np.maximum(areas[i] + areas - inter, 1e-9)
        suppressed |= iou > iou_threshold
        suppressed[i] = True
    return np.asarray(keep, np.int64)
