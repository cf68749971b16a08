"""Sharded (multi-chip) segmentation + statistics over a device mesh.

The reference has no distributed layer at all (SURVEY.md §2c) — its only
scale-out is the sequential checkerboard tile loop (reference
tiling.py:62-291). This module is the TPU-native replacement: the raster
shards 2-D over a ``jax.sharding.Mesh`` ("ty", "tx"), SLIC cluster centers
stay replicated (they are tiny), and each k-means iteration is

    local assignment  →  local partial sums  →  psum over the mesh  →
    replicated center update

so the only cross-chip traffic is the (K, C+3) partial-sum reduction over
ICI. Pixel assignment needs NO halo exchange (a pixel's candidate centers
depend only on its own global coordinates). Per-object statistics reduce
the same way: per-shard ``segment_sum`` partial moments + ``psum``.

Cross-shard connected-component merging (for connectivity enforcement of
the final label raster) gathers per-shard boundary strips with
``lax.all_gather`` and reduces the label equivalences on the replicated
side — see :func:`sharded_slic_labels`.
"""
from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.slic import (initial_centers, slic_assign_block, slic_update_sums,
                        _grid_shape)


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Tuple[str, str] = ("ty", "tx")) -> Mesh:
    """2-D mesh over the first n devices (most-square factorisation)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    ty = int(math.sqrt(n))
    while n % ty:
        ty -= 1
    tx = n // ty
    return Mesh(np.asarray(devs).reshape(ty, tx), axis_names)


def sharded_slic_assign(mesh: Mesh, image: jnp.ndarray,
                        n_segments: int, compactness: float = 10.0,
                        max_num_iter: int = 10):
    """Run the full SLIC k-means loop sharded over ``mesh``.

    Args:
      image: (H, W, C) float32, H divisible by mesh "ty" size, W by "tx".
    Returns:
      (labels (H, W) int32 in [0, gh*gw), centers (gh, gw, C+2)) with
      labels sharded like the image.
    """
    H, W, C = image.shape
    gh, gw = _grid_shape(H, W, n_segments)
    K = gh * gw
    # same integer grid step as the single-device path (skimage
    # regular_grid semantics) so sharded labels are bit-identical to it
    from ..ops.slic import _grid_half, _grid_step
    step = _grid_step(H, W, n_segments)
    ratio = (compactness / step) ** 2
    ty, tx = mesh.devices.shape
    h_loc, w_loc = H // ty, W // tx

    centers0 = initial_centers(image, gh, gw, step,
                               _grid_half(H, W, n_segments))

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P("ty", "tx", None), P(None, None, None)),
        out_specs=(P("ty", "tx"), P(None, None, None)))
    def run(local_img, centers):
        iy = jax.lax.axis_index("ty")
        ix = jax.lax.axis_index("tx")
        row0 = (iy * h_loc).astype(jnp.float32)
        col0 = (ix * w_loc).astype(jnp.float32)
        valid = jnp.ones(local_img.shape[:2], bool)

        def body(_, c):
            lab = slic_assign_block(local_img, valid, c, row0, col0,
                                    gh, gw, H, W, ratio)
            sums, cnts = slic_update_sums(local_img, lab, row0, col0, K)
            sums = jax.lax.psum(sums, ("ty", "tx"))
            cnts = jax.lax.psum(cnts, ("ty", "tx"))
            means = sums / jnp.maximum(cnts, 1.0)[:, None]
            means = jnp.where((cnts > 0)[:, None], means,
                              c.reshape(K, -1))
            return means.reshape(gh, gw, -1)

        centers_f = jax.lax.fori_loop(0, max_num_iter, body, centers)
        labels = slic_assign_block(local_img, valid, centers_f, row0, col0,
                                   gh, gw, H, W, ratio)
        return labels, centers_f

    return run(image, centers0)


def sharded_segment_moments(mesh: Mesh, image: jnp.ndarray,
                            labels: jnp.ndarray, num_segments: int):
    """Per-object moment accumulation with the raster sharded over the
    mesh: per-shard segment_sum partials + psum (SURVEY.md §5 'global
    per-object moment accumulation')."""
    H, W, C = image.shape
    K = num_segments

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P("ty", "tx", None), P("ty", "tx")),
        out_specs=(P(), P(), P()))
    def run(local_img, local_lab):
        x = local_img.reshape(-1, C)
        lab = local_lab.reshape(-1)
        ok = lab >= 0
        safe = jnp.where(ok, lab, 0)
        w = ok.astype(jnp.float32)[:, None]
        cnt = jax.ops.segment_sum(jnp.broadcast_to(w, x.shape), safe,
                                  num_segments=K)
        s1 = jax.ops.segment_sum(x * w, safe, num_segments=K)
        s2 = jax.ops.segment_sum(x * x * w, safe, num_segments=K)
        return (jax.lax.psum(cnt, ("ty", "tx")),
                jax.lax.psum(s1, ("ty", "tx")),
                jax.lax.psum(s2, ("ty", "tx")))

    cnt, s1, s2 = run(image, labels)
    mean = s1 / jnp.maximum(cnt, 1.0)
    var = jnp.maximum(s2 / jnp.maximum(cnt, 1.0) - mean ** 2, 0.0)
    return cnt, mean, var


def sharded_boundary_merge(mesh: Mesh, comp: jnp.ndarray,
                           cluster: jnp.ndarray) -> np.ndarray:
    """Cross-shard component merge (SURVEY.md §7 hard part #2).

    When connectivity enforcement runs per shard, each shard produces
    locally-unique component ids (``comp``); a segment spanning a shard
    boundary is split. This gathers the one-pixel boundary strips of every
    shard, finds boundary pixel pairs whose underlying SLIC ``cluster`` id
    matches (i.e. the same superpixel continued across the cut), and
    union-finds the component equivalences on the replicated side.

    Returns a dense (max_comp+1,) root LUT mapping component id → merged
    root id.
    """
    ty, tx = mesh.devices.shape
    H, W = comp.shape
    h_loc, w_loc = H // ty, W // tx

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P("ty", "tx"), P("ty", "tx")),
        out_specs=tuple(P(("ty", "tx")) for _ in range(8)))
    def strips(local_comp, local_cluster):
        return (local_comp[:1, :], local_comp[-1:, :],
                local_comp[:, :1].T, local_comp[:, -1:].T,
                local_cluster[:1, :], local_cluster[-1:, :],
                local_cluster[:, :1].T, local_cluster[:, -1:].T)

    (c_top, c_bot, c_lft, c_rgt,
     k_top, k_bot, k_lft, k_rgt) = strips(comp, cluster)

    def grid(a, last):
        return np.asarray(a).reshape(ty, tx, last)

    c_top, c_bot = grid(c_top, w_loc), grid(c_bot, w_loc)
    c_lft, c_rgt = grid(c_lft, h_loc), grid(c_rgt, h_loc)
    k_top, k_bot = grid(k_top, w_loc), grid(k_bot, w_loc)
    k_lft, k_rgt = grid(k_lft, h_loc), grid(k_rgt, h_loc)

    n = int(np.asarray(comp).max()) + 1

    # every seam's equal-label pairs at once (no per-pair Python loop:
    # real strips are millions of pixels long) -> ONE native union-find
    def seam_pairs(ca, cb, ka, kb):
        same = (ka == kb) & (ca >= 0) & (cb >= 0) & (ka >= 0)
        return ca[same], cb[same]

    pa_v, pb_v = seam_pairs(c_bot[:-1], c_top[1:], k_bot[:-1], k_top[1:])
    pa_h, pb_h = seam_pairs(c_rgt[:, :-1], c_lft[:, 1:],
                            k_rgt[:, :-1], k_lft[:, 1:])
    pa = np.concatenate([pa_v.reshape(-1), pa_h.reshape(-1)])
    pb = np.concatenate([pb_v.reshape(-1), pb_h.reshape(-1)])
    from .. import native
    identity = np.arange(max(n, 1), dtype=np.int64)[None, :]
    return native.resolve_components(identity, pa.astype(np.int64),
                                     pb.astype(np.int64))[0]
