"""Pallas TPU kernel: fused SLIC assignment.

One kernel evaluates every candidate center per pixel with the center table
resident in VMEM, writing the argmin cluster id — the nine separate
gather+distance passes of the XLA path collapse into a single sweep of the
raster (one HBM read of the image block, one write of the labels block).

Mosaic-native formulation: within an (8, 128) tile the pixels' grid cells
span a small static window of cell rows/cols (n_cy x n_cx, derived from the
tile and cell geometry), so the kernel loops over that window, loads each
candidate center row with a scalar dynamic index (no per-pixel gather,
which Mosaic does not support), and selects per pixel with vector masks.
This evaluates the full 3x3 cell neighbourhood of every pixel exactly like
the XLA path.

The XLA path in :mod:`obia_tpu.ops.slic` remains the default: at bench
sizes SLIC assignment is transfer-bound, not compute-bound. Enable with
``slic(..., use_pallas=True)`` or ``OBIA_SLIC_PALLAS=1``.
"""
from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pallas TPU backend is optional at import time (CPU tests interpret)
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

_FEAT_PAD = 8  # center features padded to (C + 2) <= 8 for clean VMEM rows


def _assign_kernel(img_ref, centers_ref, rowcell_ref, colcell_ref, out_ref,
                   *, gh: int, gw: int, C: int, ratio: float,
                   th: int, tw: int, n_cy: int, n_cx: int):
    i = pl.program_id(0)
    j = pl.program_id(1)

    img = img_ref[...]                      # (TH, TW, C)
    row_cell = rowcell_ref[...]             # (TH, 1) int32 cell row per row
    col_cell = colcell_ref[...]             # (1, TW) int32 cell col per col

    yy = (jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0).astype(jnp.float32)
          + (i * th).astype(jnp.float32))
    xx = (jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1).astype(jnp.float32)
          + (j * tw).astype(jnp.float32))

    # candidate cell window of this tile: [cy0-1, cy0-1+n_cy) x similar
    cy0 = row_cell[0, 0] - 1
    cx0 = col_cell[0, 0] - 1

    best_d = jnp.full((th, tw), jnp.inf, jnp.float32)
    best_k = jnp.zeros((th, tw), jnp.int32)

    for a in range(n_cy):
        for b in range(n_cx):
            cy = jnp.clip(cy0 + a, 0, gh - 1)
            cx = jnp.clip(cx0 + b, 0, gw - 1)
            kid = cy * gw + cx
            cand = centers_ref[pl.ds(kid, 1), :]          # (1, 8)
            # is this center one of the pixel's 3x3 candidates?
            eligible = (jnp.abs(row_cell - cy) <= 1) & \
                       (jnp.abs(col_cell - cx) <= 1)      # (TH,1)&(1,TW)
            d_color = jnp.zeros((th, tw), jnp.float32)
            for c in range(C):
                diff = img[:, :, c] - cand[0, c]
                d_color = d_color + diff * diff
            d_sp = (yy - cand[0, C]) ** 2 + (xx - cand[0, C + 1]) ** 2
            d = d_color + ratio * d_sp
            d = jnp.where(eligible, d, jnp.inf)
            better = d < best_d
            best_d = jnp.where(better, d, best_d)
            best_k = jnp.where(better, kid, best_k)

    out_ref[...] = best_k


@functools.partial(jax.jit,
                   static_argnames=("gh", "gw", "H", "W", "ratio",
                                    "interpret"))
def pallas_slic_assign(img: jnp.ndarray, centers: jnp.ndarray,
                       gh: int, gw: int, H: int, W: int, ratio: float,
                       interpret: bool = False) -> jnp.ndarray:
    """Fused assignment over the full raster.

    Args:
      img: (H, W, C) float32, H % 8 == 0, W % 128 == 0.
      centers: (gh, gw, C+2) float32 center table.
    Returns:
      (H, W) int32 cluster ids.
    """
    C = img.shape[2]
    K = gh * gw
    th, tw = 8, 128
    cent = centers.reshape(K, C + 2)
    cent = jnp.pad(cent, ((0, 0), (0, _FEAT_PAD - (C + 2))))

    row_cell = jnp.clip((jnp.arange(H, dtype=jnp.int32) * gh) // H, 0, gh - 1)
    col_cell = jnp.clip((jnp.arange(W, dtype=jnp.int32) * gw) // W, 0, gw - 1)
    row_cell = row_cell.reshape(H, 1)
    col_cell = col_cell.reshape(1, W)

    # static candidate-cell window per tile: cells the tile's pixels span,
    # plus one on each side for the 3x3 neighbourhood
    n_cy = int(math.ceil(th * gh / H)) + 3
    n_cx = int(math.ceil(tw * gw / W)) + 3
    n_cy = min(n_cy, gh + 2)
    n_cx = min(n_cx, gw + 2)

    grid = (H // th, W // tw)
    kernel = functools.partial(_assign_kernel, gh=gh, gw=gw, C=C,
                               ratio=ratio, th=th, tw=tw,
                               n_cy=n_cy, n_cx=n_cx)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((th, tw, C), lambda i, j: (i, j, 0)),
            pl.BlockSpec((K, _FEAT_PAD), lambda i, j: (0, 0)),
            pl.BlockSpec((th, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((1, tw), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((th, tw), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.int32),
        interpret=interpret,
        compiler_params=(pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024)
            if (_HAS_PLTPU and not interpret) else None),
    )(img, cent, row_cell, col_cell)


def pallas_available() -> bool:
    """True when the pallas TPU backend can compile the kernel here."""
    return _HAS_PLTPU and jax.default_backend() != "cpu"
