"""RetinaNet detection model in Flax.

API-parity module for reference obia/detection/models.py
(``build_detection_model(num_classes=2, in_channels=10)`` :19-62). The
reference performs surgery on torchvision's RetinaNet — replacing the
classification head and the first conv for N-channel input, forcing
image_mean/std to 0/1 (:31-32) and using no pretrained weights (:30). Here
the model is built natively: ResNet-50 + FPN backbone
(:mod:`obia_tpu.detection.backbone`), shared classification and box
regression heads over P3-P7, focal-loss training, batched XLA inference.
``in_channels`` is a constructor argument (no surgery needed) and no
input normalisation is applied (the 0/1 mean/std behavior).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .anchors import (NUM_ANCHORS, anchors_for_shape, decode_boxes,
                      encode_boxes, match_anchors)
from .backbone import FPN, ResNet50


class RetinaNetHead(nn.Module):
    num_classes: int
    num_anchors: int = NUM_ANCHORS
    features: int = 256

    @nn.compact
    def __call__(self, feats):
        cls_outs, box_outs = [], []
        cls_tower = [nn.Conv(self.features, (3, 3), padding=1,
                             name=f"cls_t{i}") for i in range(4)]
        box_tower = [nn.Conv(self.features, (3, 3), padding=1,
                             name=f"box_t{i}") for i in range(4)]
        cls_out = nn.Conv(self.num_anchors * self.num_classes, (3, 3),
                          padding=1, name="cls_out",
                          bias_init=nn.initializers.constant(-4.595))  # focal prior 0.01
        box_out = nn.Conv(self.num_anchors * 4, (3, 3), padding=1,
                          name="box_out")
        for f in feats:
            c = f
            for conv in cls_tower:
                c = nn.relu(conv(c))
            c = cls_out(c)
            cls_outs.append(c.reshape(c.shape[0], -1, self.num_classes))
            b = f
            for conv in box_tower:
                b = nn.relu(conv(b))
            b = box_out(b)
            box_outs.append(b.reshape(b.shape[0], -1, 4))
        return (jnp.concatenate(cls_outs, axis=1),
                jnp.concatenate(box_outs, axis=1))


class RetinaNet(nn.Module):
    num_classes: int = 2
    in_channels: int = 3
    backbone_width: int = 64        # 64 = real ResNet-50
    fpn_channels: int = 256
    stage_sizes: Tuple[int, ...] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, images, train: bool = False):
        """images: (B, H, W, C) float32. Returns (cls_logits (B, N, K),
        box_deltas (B, N, 4))."""
        feats = ResNet50(in_channels=self.in_channels,
                         stage_sizes=self.stage_sizes,
                         width=self.backbone_width)(images, train)
        pyramid = FPN(out_channels=self.fpn_channels)(feats)
        return RetinaNetHead(self.num_classes,
                             features=self.fpn_channels)(pyramid)


def focal_loss(logits, labels, alpha: float = 0.25, gamma: float = 2.0):
    """Sigmoid focal loss. labels: int class per anchor (0 = background,
    >0 = class index 1..K-1 in torchvision convention where class 0 slot
    is unused for background); here one-hot over num_classes with
    background contributing all-zeros targets."""
    num_classes = logits.shape[-1]
    t = jax.nn.one_hot(labels, num_classes)
    # background (label 0) -> zero out target row; class slots are 1..K-1
    t = jnp.where((labels > 0)[..., None], t, 0.0)
    p = jax.nn.sigmoid(logits)
    ce = optax_sigmoid_ce(logits, t)
    p_t = p * t + (1 - p) * (1 - t)
    alpha_t = alpha * t + (1 - alpha) * (1 - t)
    return alpha_t * ((1 - p_t) ** gamma) * ce


def optax_sigmoid_ce(logits, targets):
    return jnp.maximum(logits, 0) - logits * targets + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))


def smooth_l1(x, beta: float = 1.0 / 9.0):
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


def retinanet_loss(cls_logits, box_deltas, anchors, gt_boxes, gt_labels,
                   gt_valid):
    """Per-image RetinaNet loss (focal cls + smooth-L1 box).

    gt_boxes: (M, 4) padded; gt_labels: (M,) int; gt_valid: (M,) bool.
    """
    matched_gt, match_label = match_anchors(anchors, gt_boxes, gt_valid)
    # classification target per anchor: gt label where fg else 0 (bg)
    anchor_cls = jnp.where(match_label == 1, gt_labels[matched_gt], 0)
    cls_l = focal_loss(cls_logits, anchor_cls)
    cls_mask = (match_label >= 0).astype(jnp.float32)[:, None]
    n_pos = jnp.maximum((match_label == 1).sum(), 1)
    cls_total = (cls_l * cls_mask).sum() / n_pos

    target_deltas = encode_boxes(anchors, gt_boxes[matched_gt])
    box_l = smooth_l1(box_deltas - target_deltas).sum(axis=1)
    box_total = (box_l * (match_label == 1)).sum() / n_pos
    return cls_total, box_total


class DetectionModel:
    """Stateful wrapper: Flax module + params/batch_stats (+ anchors cache).
    The facade object ``build_detection_model`` returns; train/predict
    modules operate on it."""

    def __init__(self, num_classes: int, in_channels: int, seed: int = 0,
                 image_size: Tuple[int, int] = (512, 512),
                 backbone_width: int = 64, fpn_channels: int = 256,
                 stage_sizes: Tuple[int, ...] = (3, 4, 6, 3)):
        self.num_classes = num_classes
        self.in_channels = in_channels
        self.module = RetinaNet(num_classes=num_classes,
                                in_channels=in_channels,
                                backbone_width=backbone_width,
                                fpn_channels=fpn_channels,
                                stage_sizes=tuple(stage_sizes))
        self.image_size = image_size
        dummy = jnp.zeros((1, image_size[0], image_size[1], in_channels),
                          jnp.float32)
        variables = self.module.init(jax.random.PRNGKey(seed), dummy,
                                     train=False)
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        self._anchor_cache: Dict[Tuple[int, int], np.ndarray] = {}

    def anchors(self, hw: Tuple[int, int]) -> np.ndarray:
        if hw not in self._anchor_cache:
            self._anchor_cache[hw] = anchors_for_shape(hw)
        return self._anchor_cache[hw]

    def apply(self, images, train: bool = False, mutable: bool = False):
        variables = {"params": self.params, "batch_stats": self.batch_stats}
        if train and mutable:
            out, new_state = self.module.apply(
                variables, images, train=True, mutable=["batch_stats"])
            return out, new_state["batch_stats"]
        return self.module.apply(variables, images, train=train)

    # torch-API compatibility shims (reference train.py:25 calls .to(device))
    def to(self, device):
        return self

    def train(self):
        return self

    def eval(self):
        return self


def build_detection_model(num_classes: int = 2, in_channels: int = 10,
                          **kwargs) -> DetectionModel:
    """Construct a RetinaNet for N-channel imagery (reference
    detection/models.py:19-62)."""
    return DetectionModel(num_classes=num_classes, in_channels=in_channels,
                          **kwargs)
