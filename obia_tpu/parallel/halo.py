"""Halo exchange over the device mesh (``lax.ppermute`` boundary strips).

SURVEY.md §5: the TPU-native answer to the reference's overlap-buffer
re-reads (tiling.py:155-287) is exchanging one-pixel boundary strips
between mesh neighbours over ICI. SLIC assignment itself needs no halo
(centers are replicated), but neighbourhood-coupled kernels do: the
device-resident distributed CCL here propagates component minima across
shard edges each sweep, so a fully on-device mosaic pipeline never ships
the raster back to host for label merging.

All functions are shard_map bodies or helpers intended to run inside one.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


def exchange_halo_rows(x: jnp.ndarray, axis_name: str) -> Tuple[jnp.ndarray,
                                                                jnp.ndarray]:
    """Inside shard_map: send the first/last row strip to the previous/next
    shard along ``axis_name`` (ring ppermute over ICI). Returns
    (row_from_prev, row_from_next), each shaped (1, W...). Edge shards
    receive the wrapped-around strip; callers mask it with the axis index.
    """
    n = jax.lax.axis_size(axis_name)
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    from_prev = jax.lax.ppermute(x[-1:, ...], axis_name, fwd)
    from_next = jax.lax.ppermute(x[:1, ...], axis_name, bwd)
    return from_prev, from_next


def exchange_halo_cols(x: jnp.ndarray, axis_name: str):
    n = jax.lax.axis_size(axis_name)
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    from_prev = jax.lax.ppermute(x[:, -1:, ...], axis_name, fwd)
    from_next = jax.lax.ppermute(x[:, :1, ...], axis_name, bwd)
    return from_prev, from_next


def distributed_ccl(mesh: Mesh, labels: jnp.ndarray,
                    sweeps_per_round: int = 8,
                    rounds: int = None) -> jnp.ndarray:
    """Device-resident distributed CCL: per-shard min-label propagation with
    pointer jumping, plus a ppermute halo exchange of boundary comp/label
    strips each round so minima flow across shard edges.

    Component ids are GLOBAL linear indices; the result matches a
    single-device CCL up to root identity (roots are global minima).

    Args:
      labels: (H, W) int32, sharded P("ty", "tx"); -1 invalid.
    Returns:
      (H, W) int32 global component roots, same sharding.
    """
    ty, tx = mesh.devices.shape
    H, W = labels.shape
    h_loc, w_loc = H // ty, W // tx
    if rounds is None:
        import math
        rounds = ty + tx + int(math.ceil(math.log2(max(H * W, 2))))

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P("ty", "tx"),), out_specs=P("ty", "tx"))
    def run(lab):
        iy = jax.lax.axis_index("ty")
        ix = jax.lax.axis_index("tx")
        row0 = iy * h_loc
        col0 = ix * w_loc
        gidx = ((jax.lax.broadcasted_iota(jnp.int32, (h_loc, w_loc), 0)
                 + row0) * W
                + jax.lax.broadcasted_iota(jnp.int32, (h_loc, w_loc), 1)
                + col0)
        valid = lab >= 0
        comp0 = jnp.where(valid, gidx, -1)

        def halo_of(arr, fill):
            top, bottom = exchange_halo_rows(arr, "ty")
            lft, rgt = exchange_halo_cols(arr, "tx")
            # mask wrap-around at the physical mesh edges
            top = jnp.where(iy == 0, fill, top)
            bottom = jnp.where(iy == ty - 1, fill, bottom)
            lft = jnp.where(ix == 0, fill, lft)
            rgt = jnp.where(ix == tx - 1, fill, rgt)
            return top, bottom, lft, rgt

        # label halos never change: exchange once
        lt, lb, ll, lr = halo_of(lab, jnp.int32(-2))
        lup = jnp.concatenate([lt, lab[:-1, :]], axis=0)
        ldn = jnp.concatenate([lab[1:, :], lb], axis=0)
        llf = jnp.concatenate([ll, lab[:, :-1]], axis=1)
        lrt = jnp.concatenate([lab[:, 1:], lr], axis=1)

        def jump_local(c):
            """Pointer jump restricted to roots living in this shard."""
            g = c
            lr_ = g // W - row0
            lc_ = g % W - col0
            in_shard = (g >= 0) & (lr_ >= 0) & (lr_ < h_loc) \
                & (lc_ >= 0) & (lc_ < w_loc)
            flat = c.reshape(-1)
            lin = jnp.clip(lr_ * w_loc + lc_, 0, h_loc * w_loc - 1)
            hop = flat[lin.reshape(-1)].reshape(h_loc, w_loc)
            return jnp.where(in_shard & (hop >= 0), jnp.minimum(c, hop), c)

        def round_body(_, comp):
            # comp halos refresh once per round (one ppermute per side)
            ct, cb, cl, cr = halo_of(comp, jnp.int32(-1))

            def sweep(_, c):
                cup = jnp.concatenate([ct, c[:-1, :]], axis=0)
                cdn = jnp.concatenate([c[1:, :], cb], axis=0)
                clf = jnp.concatenate([cl, c[:, :-1]], axis=1)
                crt = jnp.concatenate([c[:, 1:], cr], axis=1)
                best = c
                best = jnp.where((lup == lab) & valid & (cup >= 0),
                                 jnp.minimum(best, cup), best)
                best = jnp.where((ldn == lab) & valid & (cdn >= 0),
                                 jnp.minimum(best, cdn), best)
                best = jnp.where((llf == lab) & valid & (clf >= 0),
                                 jnp.minimum(best, clf), best)
                best = jnp.where((lrt == lab) & valid & (crt >= 0),
                                 jnp.minimum(best, crt), best)
                return jump_local(jump_local(best))

            return jax.lax.fori_loop(0, sweeps_per_round, sweep, comp)

        comp = jax.lax.fori_loop(0, rounds, round_body, comp0)
        return comp

    return run(labels)
