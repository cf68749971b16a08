"""Pallas TPU kernels for quickshift density + parent search.

The XLA quickshift (:mod:`obia_tpu.ops.quickshift`) scans every window
offset as a full-raster shifted read: at the default ``kernel_size=5``
the window radius is ceil(3*5) = 15, i.e. 960 offsets, and each offset
re-reads the whole (H, W, C) raster from HBM — ~960x the raster's
footprint in HBM traffic (at 4096^2 RGB that is ~190 GB against a
~1 GB/s-per-offset effective rate; measured 0.77 MP/s end-to-end).
The arithmetic itself is tiny (~16 VPU ops per pixel-offset), so the
XLA path is memory-bound by ~100x.

These kernels make the offset scan VMEM-resident: the raster is tiled
into (BH, BW) blocks, each block DMAs its halo window
(C, BH+2r, BW+2r) from HBM ONCE, and the 960-offset loop runs entirely
out of VMEM. Shifted reads use an incremental ``pltpu.roll`` carried
through ``fori_loop`` (shift-by-1 per step), so every slice in the loop
body is static — Mosaic's dynamic sublane loads must be 8-aligned and
arbitrary-offset relayouts per offset would double the VPU work; a
1-step roll is a cheap lane/sublane shift and keeps the unrolled
program body tiny (two nested 31-step ``fori_loop`` instead of 960
unrolled slices).

Semantics match the XLA path (and skimage's Cython quickshift,
reference segment_boundaries.py:49): Parzen density
``1 + sum exp(-d2 / (2 k^2))`` over the ceil(3k)-radius window with the
(0,0) self-offset excluded; parent = the window neighbour with strictly
higher (tie-noised) density, within ``max_dist``, minimising the 5-D
distance, ties broken by row-major offset order (strict-< updates in
the same dy,dx order the XLA scan uses). Out-of-image neighbours are
+inf-padded (density/parent-d2 masked through ``isfinite``), matching
the XLA path's padding. Float accumulation order differs from the XLA
chunk-scan, so densities agree to ~1e-6 relative, not bitwise; label
agreement is tested at >= 99.5% (tie flips on plateau pixels).
"""
from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:  # pragma: no cover - import guard for minimal installs
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

BH = 256
BW = 256


def _win_dims(r: int) -> Tuple[int, int]:
    """DMA window shape for halo radius ``r``: HBM slices must be
    8-aligned on the sublane dim and 128-aligned on the lane dim
    (Mosaic `memref_slice` tiling (8, 128) — an unaligned BH+2r slice
    fails to compile on real hardware). The window is over-fetched to
    the aligned shape; the roll-based scan only ever slices rows
    [t, t+BH) / lanes [u, u+BW) with t, u <= 2r, so the extra aligned
    tail is never read."""
    return (BH + -(-2 * r // 8) * 8, BW + -(-2 * r // 128) * 128)


def pallas_available() -> bool:
    return _PALLAS_OK


def _roll_back1(x, axis: int):
    """Circular shift by -1 (pltpu.roll requires non-negative shifts:
    shift by size-1 is the same rotation)."""
    return pltpu.roll(x, x.shape[axis] - 1, axis=axis)


def _d2_at(ctr, sh, off2, C: int):
    """5-D squared distance between the centre block and a shifted block:
    sum_c (ctr_c - sh_c)^2 + dy^2 + dx^2. Channel loop unrolled (C is
    static and small); (bh, bw) f32 blocks throughout."""
    d2 = (ctr[0] - sh[0]) ** 2
    for c in range(1, C):
        d2 = d2 + (ctr[c] - sh[c]) ** 2
    return d2 + off2


def _window_scan(win, r: int, C: int, bh: int, bw: int, body, init):
    """Run ``body(dy, dx, sh, carry) -> carry`` over every offset of the
    (2r+1)^2 window in row-major (dy, dx) order, where ``sh`` is the
    (C, bh, bw) block shifted by (dy, dx), sliced statically from an
    incrementally rolled copy of ``win`` (C, >=bh+2r, >=bw+2r) — the
    window may carry an aligned over-fetch tail (_win_dims) that the
    static slices never touch."""
    D = 2 * r + 1
    Wt = win.shape[2]

    def dy_body(t, carry):
        acc, T = carry
        # rows of T at [r, r+bh) are win rows [t, t+bh) == centre + dy
        rs = jax.lax.slice(T, (0, r, 0), (C, r + bh, Wt))

        def dx_body(u, inner):
            acc2, S = inner
            # lanes of S at [r, r+bw) are rs lanes [u, u+bw) == centre + dx
            sh = jax.lax.slice(S, (0, 0, r), (C, bh, r + bw))
            acc2 = body(t, u, sh, acc2)
            return acc2, _roll_back1(S, 2)

        acc, _ = jax.lax.fori_loop(0, D, dx_body,
                                   (acc, pltpu.roll(rs, r, axis=2)))
        return acc, _roll_back1(T, 1)

    out, _ = jax.lax.fori_loop(0, D, dy_body,
                               (init, pltpu.roll(win, r, axis=1)))
    return out


def _density_kernel(img_hbm, out_ref, win_ref, sem,
                    *, C: int, r: int, inv2k2: float):
    i = pl.program_id(0)
    j = pl.program_id(1)
    rw, cw = _win_dims(r)
    cp = pltpu.make_async_copy(
        img_hbm.at[:, pl.ds(i * BH, rw), pl.ds(j * BW, cw)],
        win_ref, sem)
    cp.start()
    cp.wait()
    win = win_ref[...]
    ctr = jax.lax.slice(win, (0, r, r), (C, r + BH, r + BW))
    rf = jnp.float32(r)

    def body(t, u, sh, acc):
        dy = t.astype(jnp.float32) - rf
        dx = u.astype(jnp.float32) - rf
        d2 = _d2_at(ctr, sh, dy * dy + dx * dx, C)
        is_self = (t == r) & (u == r)
        ok = jnp.isfinite(d2) & jnp.logical_not(is_self)
        return acc + jnp.where(ok, jnp.exp(-d2 * inv2k2), 0.0)

    out_ref[...] = _window_scan(win, r, C, BH, BW, body,
                                jnp.ones((BH, BW), jnp.float32))


def _parent_kernel(img_hbm, rho_hbm, out_d2_ref, out_doff_ref,
                   win_ref, rwin_ref, sems,
                   *, C: int, r: int, max_d2: float, W_img: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    rw, cw = _win_dims(r)
    cp_i = pltpu.make_async_copy(
        img_hbm.at[:, pl.ds(i * BH, rw), pl.ds(j * BW, cw)],
        win_ref, sems.at[0])
    cp_r = pltpu.make_async_copy(
        rho_hbm.at[:, pl.ds(i * BH, rw), pl.ds(j * BW, cw)],
        rwin_ref, sems.at[1])
    cp_i.start()
    cp_r.start()
    cp_i.wait()
    cp_r.wait()
    win = win_ref[...]
    rwin = rwin_ref[...]
    ctr = jax.lax.slice(win, (0, r, r), (C, r + BH, r + BW))
    rho_ctr = jax.lax.slice(rwin, (0, r, r), (1, r + BH, r + BW))[0]
    rf = jnp.float32(r)

    # scan image and density windows together: stack rho as an extra
    # "channel" would force a concat; instead carry both rolled arrays
    D = 2 * r + 1
    Wt = cw

    def dy_body(t, carry):
        (best_d2, best_doff), T, R = carry
        rs = jax.lax.slice(T, (0, r, 0), (C, r + BH, Wt))
        rr = jax.lax.slice(R, (0, r, 0), (1, r + BH, Wt))

        def dx_body(u, inner):
            (b_d2, b_doff), S, Q = inner
            sh = jax.lax.slice(S, (0, 0, r), (C, BH, r + BW))
            rho_sh = jax.lax.slice(Q, (0, 0, r), (1, BH, r + BW))[0]
            dy = t.astype(jnp.float32) - rf
            dx = u.astype(jnp.float32) - rf
            d2 = _d2_at(ctr, sh, dy * dy + dx * dx, C)
            is_self = (t == r) & (u == r)
            ok = ((rho_sh > rho_ctr) & (d2 <= max_d2) & jnp.isfinite(d2)
                  & jnp.logical_not(is_self))
            cand = jnp.where(ok, d2, jnp.inf)
            better = cand < b_d2
            doff = (t - r) * W_img + (u - r)
            b_d2 = jnp.where(better, cand, b_d2)
            b_doff = jnp.where(better, doff, b_doff)
            return ((b_d2, b_doff), _roll_back1(S, 2),
                    _roll_back1(Q, 2))

        (best_d2, best_doff), _, _ = jax.lax.fori_loop(
            0, D, dx_body, ((best_d2, best_doff),
                            pltpu.roll(rs, r, axis=2),
                            pltpu.roll(rr, r, axis=2)))
        return (best_d2, best_doff), _roll_back1(T, 1), \
            _roll_back1(R, 1)

    init = (jnp.full((BH, BW), jnp.inf, jnp.float32),
            jnp.zeros((BH, BW), jnp.int32))
    (best_d2, best_doff), _, _ = jax.lax.fori_loop(
        0, D, dy_body, (init, pltpu.roll(win, r, axis=1),
                        pltpu.roll(rwin, r, axis=1)))
    out_d2_ref[...] = best_d2
    out_doff_ref[...] = best_doff


def _grid_pad(H: int, W: int, r: int) -> Tuple[int, int, int, int]:
    """Grid + padded image dims: the last block's aligned over-fetch
    (_win_dims) must stay inside the padded array."""
    gh = -(-H // BH)
    gw = -(-W // BW)
    rw, cw = _win_dims(r)
    return gh, gw, (gh - 1) * BH + rw, (gw - 1) * BW + cw


@functools.partial(jax.jit, static_argnames=("r", "Hp", "Wp", "fill"))
def _pad_chw(x: jnp.ndarray, r: int, Hp: int, Wp: int, fill: float):
    C, H, W = x.shape
    out = jnp.full((C, Hp, Wp), jnp.float32(fill))
    return jax.lax.dynamic_update_slice(out, x.astype(jnp.float32),
                                        (0, r, r))


@functools.partial(jax.jit, static_argnames=("C", "r", "gh", "gw",
                                             "inv2k2", "interpret"))
def _density_call(img_pad, C: int, r: int, gh: int, gw: int,
                  inv2k2: float, interpret: bool = False):
    return pl.pallas_call(
        functools.partial(_density_kernel, C=C, r=r, inv2k2=inv2k2),
        out_shape=jax.ShapeDtypeStruct((gh * BH, gw * BW), jnp.float32),
        grid=(gh, gw),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((BH, BW), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((C,) + _win_dims(r), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(img_pad)


@functools.partial(jax.jit, static_argnames=("C", "r", "gh", "gw",
                                             "max_d2", "W_img", "interpret"))
def _parent_call(img_pad, rho_pad, C: int, r: int, gh: int, gw: int,
                 max_d2: float, W_img: int, interpret: bool = False):
    return pl.pallas_call(
        functools.partial(_parent_kernel, C=C, r=r, max_d2=max_d2,
                          W_img=W_img),
        out_shape=[jax.ShapeDtypeStruct((gh * BH, gw * BW), jnp.float32),
                   jax.ShapeDtypeStruct((gh * BH, gw * BW), jnp.int32)],
        grid=(gh, gw),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec((BH, BW), lambda i, j: (i, j),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((BH, BW), lambda i, j: (i, j),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=[
            pltpu.VMEM((C,) + _win_dims(r), jnp.float32),
            pltpu.VMEM((1,) + _win_dims(r), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(img_pad, rho_pad)


def quickshift_core_pallas(img: jnp.ndarray, noise: jnp.ndarray,
                           kernel_size: float, max_dist: float,
                           ratio: float, radius: int,
                           interpret: bool = False):
    """Drop-in for the XLA ``_quickshift_core`` (same outputs: root,
    density, parent, dist) with the density and parent window scans on
    the Pallas kernels. ``radius`` is both the density and parent window
    radius (the XLA path uses radius_p == radius_d)."""
    H, W, C = img.shape
    r = int(radius)
    gh, gw, Hp, Wp = _grid_pad(H, W, r)
    scaled_chw = jnp.transpose(img * ratio, (2, 0, 1))
    img_pad = _pad_chw(scaled_chw, r, Hp, Wp, float("inf"))
    inv2k2 = 1.0 / (2.0 * float(kernel_size) * float(kernel_size))

    rho = _density_call(img_pad, C, r, gh, gw, inv2k2,
                        interpret=interpret)
    rho = jax.lax.slice(rho, (0, 0), (H, W)) + noise

    rho_pad = _pad_chw(rho[None], r, Hp, Wp, float("-inf"))
    best_d2, best_doff = _parent_call(
        img_pad, rho_pad, C, r, gh, gw,
        float(max_dist) * float(max_dist), W, interpret=interpret)
    best_d2 = jax.lax.slice(best_d2, (0, 0), (H, W))
    best_doff = jax.lax.slice(best_doff, (0, 0), (H, W))

    idx = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W)
    parent = idx + best_doff

    parent_flat = parent.reshape(-1)
    n_iter = max(1, int(math.ceil(math.log2(max(H * W, 2)))) + 1)
    root = jax.lax.fori_loop(0, n_iter, lambda _, p: p[p], parent_flat)
    return root.reshape(H, W), rho, parent, jnp.sqrt(best_d2)


def use_pallas_quickshift(n_pixels: int) -> bool:
    """Engage the VMEM-resident window scan on TPU. The crossover vs the
    XLA chunk-scan is tiny (the XLA path re-reads the raster ~960x from
    HBM), so any scene past trivial size routes here;
    OBIA_QS_PALLAS=1/0 forces it on/off."""
    import os
    env = os.environ.get("OBIA_QS_PALLAS", "auto").lower()
    if env in ("0", "false", "off"):
        return False
    if not _PALLAS_OK:
        return False
    if env in ("1", "true", "on"):
        return True
    try:
        if jax.devices()[0].platform != "tpu":
            return False
    except Exception:  # pragma: no cover
        return False
    return n_pixels >= (1 << 16)
