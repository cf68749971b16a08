"""Connected-component labelling and small-segment merging on TPU.

The reference inherits connectivity enforcement from skimage's Cython
``_enforce_label_connectivity_cython`` (called inside ``slic``, reference
segment_boundaries.py:51). A sequential BFS doesn't map to the TPU, so this
module implements the equivalent as iterative **min-label propagation with
pointer jumping** inside ``lax.while_loop`` (SURVEY.md §7 hard part #1):

* ``connected_components``: every pixel starts as its own component (its
  linear index); each step takes the min root over 4-neighbours sharing the
  same input label, then compresses paths with two pointer-jumping gathers.
  Converges in O(log diameter) sweeps.
* ``merge_small_components``: components smaller than ``min_size`` adopt the
  component root of an adjacent larger component — decided once per
  component (segment_min over boundary pairs) so fragments are never split
  between neighbours; looped until stable.

Roots are minimum linear indices, so compacting roots in ascending order
reproduces deterministic raster-order first-occurrence labelling.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_NEIGHBOR_OFFSETS_4 = ((-1, 0), (1, 0), (0, -1), (0, 1))


def _shift2d(arr: jnp.ndarray, dr: int, dc: int, fill) -> jnp.ndarray:
    H, W = arr.shape
    pt, pb = max(-dr, 0), max(dr, 0)
    plft, prt = max(-dc, 0), max(dc, 0)
    padded = jnp.pad(arr, ((pt, pb), (plft, prt)), constant_values=fill)
    return jax.lax.dynamic_slice(padded, (pt + dr, plft + dc), (H, W))


def _ccl_iters(n: int) -> int:
    """Fixed sweep count for the FastSV loop: hooking + shortcutting
    converges in O(log n) rounds; a small pad covers the constants. A fixed
    count keeps the whole loop on device — a convergence-checked while_loop
    forces a host sync per iteration, which dominates wall-clock on
    remote-attached TPUs (measured: >20 s of per-iteration tunnel syncs vs
    milliseconds of compute)."""
    import math
    return max(6, math.ceil(math.log2(max(n, 2)))) + 4


@jax.jit
def connected_components(labels: jnp.ndarray) -> jnp.ndarray:
    """4-connected components of a multi-valued label map via FastSV
    (min-based stochastic + aggressive hooking, then shortcutting) —
    guaranteed O(log n) sweeps, all scatter/gather, fixed trip count.

    Args:
      labels: (H, W) int32; negative = invalid (stays its own root).
    Returns:
      (H, W) int32 component roots (min linear index per component);
      invalid pixels get root -1.
    """
    H, W = labels.shape
    n = H * W
    idx = jnp.arange(n, dtype=jnp.int32)
    lab_flat = labels.reshape(-1)
    valid = lab_flat >= 0

    def neighbor_min_grandparent(f):
        """Per pixel: min of f[f[v]] over 4-neighbours v with the same
        label (and the pixel itself)."""
        safe = jnp.where(valid, f, 0)
        gp = jnp.where(valid, f[safe], n)  # grandparent, n = +inf sentinel
        gp2d = gp.reshape(H, W)
        best = gp2d
        for dr, dc in _NEIGHBOR_OFFSETS_4:
            nl = _shift2d(labels, dr, dc, fill=-2)
            ngp = _shift2d(gp2d, dr, dc, fill=n)
            same = (nl == labels)
            best = jnp.minimum(best, jnp.where(same, ngp, n))
        return best.reshape(-1)

    def body(_, f):
        mngf = neighbor_min_grandparent(f)
        fsafe = jnp.where(valid, f, 0)
        # stochastic hooking: f[f[u]] <- min(f[f[u]], mngf[u])
        f = f.at[jnp.where(valid, fsafe, n)].min(
            jnp.where(valid, mngf, n), mode="drop")
        # aggressive hooking: f[u] <- min(f[u], mngf[u])
        f = jnp.where(valid & (mngf < n), jnp.minimum(f, mngf), f)
        # shortcutting: f[u] <- f[f[u]]
        fsafe = jnp.where(valid, f, 0)
        f = jnp.where(valid, f[fsafe], f)
        return f

    f0 = jnp.where(valid, idx, -1)
    f = jax.lax.fori_loop(0, _ccl_iters(n), body, f0)
    # final path compression
    for _ in range(2):
        fsafe = jnp.where(valid, f, 0)
        f = jnp.where(valid, f[fsafe], f)
    return f.reshape(H, W)


@functools.partial(jax.jit, static_argnames=("min_size", "max_iters"))
def merge_small_components(comp: jnp.ndarray,
                           min_size: int,
                           max_iters: int = 8) -> jnp.ndarray:
    """Merge components smaller than ``min_size`` into an adjacent larger
    component (whole-component adoption). Small components with no large
    neighbour (e.g. islands inside masked-out area) keep their root.

    Args:
      comp: (H, W) int32 component roots from :func:`connected_components`.
    Returns:
      (H, W) int32 updated roots.
    """
    H, W = comp.shape
    n = H * W

    def sizes_of(c):
        flat = c.reshape(-1)
        safe = jnp.where(flat >= 0, flat, 0)
        ones = (flat >= 0).astype(jnp.float32)
        return jax.ops.segment_sum(ones, safe, num_segments=n)

    def body(_, c):
        sizes = sizes_of(c)
        flat = c.reshape(-1)
        safe = jnp.where(flat >= 0, flat, 0)
        px_size = jnp.where(flat >= 0, sizes[safe], 0.0).reshape(H, W)
        is_small = (px_size > 0) & (px_size < min_size)

        # per small component: min adjacent root that is NOT small
        INF = jnp.int32(n)
        cand = jnp.full((H, W), INF, jnp.int32)
        for dr, dc in _NEIGHBOR_OFFSETS_4:
            nc = _shift2d(c, dr, dc, fill=-1)
            n_small = _shift2d(is_small, dr, dc, fill=True)
            usable = (nc >= 0) & (~n_small) & (nc != c)
            cand = jnp.where(is_small & usable, jnp.minimum(cand, nc), cand)

        # component-level decision: min candidate over the whole component
        cand_flat = cand.reshape(-1)
        target = jax.ops.segment_min(
            jnp.where(flat >= 0, cand_flat, INF),
            safe, num_segments=n)
        new_root = target[safe]
        adopt = (is_small.reshape(-1)) & (new_root < INF) & (flat >= 0)
        return jnp.where(adopt, new_root, flat).reshape(H, W)

    # fixed sweep count (see _ccl_iters): chains of small components merge
    # one hop per sweep; max_iters bounds the chain length handled
    return jax.lax.fori_loop(0, max_iters, body, comp)


def _ccl_sweep_body(labels, valid, edge_ok, comp):
    """One block-local CCL sweep: 4-neighbor min-propagation (masked at
    block edges) + two pointer-jump hops."""
    H, W = labels.shape
    best = comp
    for dr, dc in _NEIGHBOR_OFFSETS_4:
        nl = _shift2d(labels, dr, dc, fill=-2)
        nc = _shift2d(comp, dr, dc, fill=-1)
        same = (nl == labels) & valid & edge_ok[(dr, dc)]
        best = jnp.where(same & (nc >= 0), jnp.minimum(best, nc), best)
    flat = best.reshape(-1)
    for _ in range(2):
        # pointer-jump: comp values are global linear indices, so the
        # hop is one rank-1 gather (block-local, cache-friendly)
        hop = flat[jnp.clip(flat, 0, H * W - 1)]
        flat = jnp.where(flat >= 0, jnp.minimum(flat, hop), -1)
    return flat.reshape(H, W)


def _ccl_masks(labels, block):
    H, W = labels.shape
    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    rb = yy % block
    cb = xx % block
    edge_ok = {(-1, 0): rb > 0, (1, 0): rb < block - 1,
               (0, -1): cb > 0, (0, 1): cb < block - 1}
    return yy, xx, edge_ok


@functools.partial(jax.jit, static_argnames=("block",))
def _block_local_ccl(labels: jnp.ndarray, block: int) -> jnp.ndarray:
    """Connected components WITHIN each (block x block) tile — scatter-free
    (elementwise shifts + rank-1 pointer-jump gathers) with a fixed trip
    count (block+4 sweeps covers the worst-case serpentine path). Returns
    per-pixel GLOBAL linear index of the tile-local root; cross-tile
    merging happens on host via the native union-find
    (:mod:`obia_tpu.native`). This split exists because global
    scatter-based CCL compiles pathologically on some TPU runtimes while
    this shape compiles in seconds and runs in milliseconds.

    Flat (H, W) formulation with block-boundary masks: an explicit
    (NB, block, block) batched layout puts `block` on the 128-lane minor
    dim (4x padding — ~16 GB live at 100 MP, faulting the worker), while
    2-D rasters tile exactly. Propagation across a block edge is simply
    masked off. At very large rasters use :func:`block_local_ccl_chunked`
    — one device program with 72 chained 1e8-element gathers trips the
    worker's execution limit.
    """
    H, W = labels.shape
    yy, xx, edge_ok = _ccl_masks(labels, block)
    valid = labels >= 0
    comp0 = jnp.where(valid, yy * W + xx, -1)
    # roots are already global linear indices — no local->global remap
    return jax.lax.fori_loop(
        0, block + 4,
        lambda _, c: _ccl_sweep_body(labels, valid, edge_ok, c), comp0)


@functools.partial(jax.jit, static_argnames=("block", "n_sweeps", "init"))
def _ccl_sweeps(labels: jnp.ndarray, comp: jnp.ndarray, block: int,
                n_sweeps: int, init: bool = False) -> jnp.ndarray:
    """n_sweeps CCL sweeps as ONE device program (chunk of the full loop)."""
    H, W = labels.shape
    yy, xx, edge_ok = _ccl_masks(labels, block)
    valid = labels >= 0
    if init:
        comp = jnp.where(valid, yy * W + xx, -1)
    return jax.lax.fori_loop(
        0, n_sweeps,
        lambda _, c: _ccl_sweep_body(labels, valid, edge_ok, c), comp)


# sweeps per device call at large scale: 4 sweeps = 8 chained gathers,
# well inside the proven-safe regime (8 OK / 72 faults at 100 MP)
_CCL_SWEEPS_PER_CALL = 4
_CCL_CHUNK_MIN_PIXELS = 1 << 25


def block_local_ccl_chunked(labels: jnp.ndarray, block: int) -> jnp.ndarray:
    """`_block_local_ccl` split into several short device programs so no
    single execution chains enough 1e8-element gathers to trip the TPU
    worker's execution limit (observed: 8 chained gathers fine, 72 fault
    at 100 MP). The comp raster stays on device between calls."""
    H, W = labels.shape
    if H * W <= _CCL_CHUNK_MIN_PIXELS:
        return _block_local_ccl(labels, block)
    total = block + 4
    comp = _ccl_sweeps(labels, labels, block, _CCL_SWEEPS_PER_CALL,
                       init=True)
    done = _CCL_SWEEPS_PER_CALL
    while done < total:
        n = min(_CCL_SWEEPS_PER_CALL, total - done)
        comp = _ccl_sweeps(labels, comp, block, n)
        done += n
    return comp


def relabel_connected(labels: np.ndarray, block: int = 32
                      ) -> Tuple[np.ndarray, int]:
    """Full CCL of a host label raster: device block-local CCL + native
    cross-block union-find + dense first-occurrence relabel.

    Args:
      labels: (H, W) int; negative = invalid.
    Returns:
      ((H, W) int32 labels 0..K-1 / -1 invalid, K).
    """
    from .. import native

    labels = np.ascontiguousarray(labels, np.int32)
    H, W = labels.shape
    Hp = ((H + block - 1) // block) * block
    Wp = ((W + block - 1) // block) * block
    padded = np.full((Hp, Wp), -1, np.int32)
    padded[:H, :W] = labels
    comp = np.asarray(
        block_local_ccl_chunked(jnp.asarray(padded), block))[:H, :W]
    # padded-grid linear ids -> usable as-is (unique per pixel); fix width
    # mismatch: ids were computed on the padded width
    if Wp != W or Hp != H:
        comp = np.where(comp >= 0,
                        (comp // Wp) * W + np.minimum(comp % Wp, W - 1), -1)
    a, b = native.block_boundary_pairs(comp.astype(np.int64), labels, block)
    merged = native.resolve_components(comp.astype(np.int64), a, b)
    return native.relabel_compact(merged)


def merge_small_labels_host(labels: np.ndarray, min_size: int,
                            max_iters: int = 24,
                            max_size: int = None) -> Tuple[np.ndarray, int]:
    """Host-side small-component merging over COMPACT labels (0..K-1, -1
    invalid): whole-component adoption of an adjacent component (preferring
    non-small ones), vectorised with bincount + minimum.at; ``max_size``
    caps the merged size (skimage's max_size_factor semantics) so heavy
    fragmentation cannot collapse into one blob. Re-compacts labels."""
    from .. import native
    if max_size is None:
        max_size = np.iinfo(np.int64).max // 4
    if native.available():
        return native.merge_small_capped(labels, int(min_size),
                                         int(max_size))
    lab = np.ascontiguousarray(labels, np.int64)
    H, W = lab.shape
    for _ in range(max_iters):
        valid = lab >= 0
        if not valid.any():
            break
        K = int(lab.max()) + 1
        sizes = np.bincount(lab[valid], minlength=K)
        small = sizes < min_size
        if not small[lab[valid]].any():
            break
        pairs_a = []
        pairs_b = []
        for sl_a, sl_b in (((slice(None), slice(None, -1)),
                            (slice(None), slice(1, None))),
                           ((slice(None, -1), slice(None)),
                            (slice(1, None), slice(None)))):
            a = lab[sl_a].reshape(-1)
            b = lab[sl_b].reshape(-1)
            m = (a != b) & (a >= 0) & (b >= 0)
            pairs_a.append(np.concatenate([a[m], b[m]]))
            pairs_b.append(np.concatenate([b[m], a[m]]))
        pa = np.concatenate(pairs_a)
        pb = np.concatenate(pairs_b)
        # prefer adopting a LARGE neighbour; small components with only
        # small neighbours adopt the min small neighbour instead (skimage
        # merges small segments into any adjacent segment — without this,
        # heavily fragmented maps deadlock with every component small)
        fits = sizes[pa] + sizes[pb] <= max_size
        use_large = small[pa] & ~small[pb] & fits
        use_any = small[pa] & fits
        if not use_any.any():
            break
        target = np.full(K, K, np.int64)
        np.minimum.at(target, pa[use_any], pb[use_any])
        target_large = np.full(K, K, np.int64)
        np.minimum.at(target_large, pa[use_large], pb[use_large])
        has_large = target_large < K
        target = np.where(has_large, target_large, target)
        lut = np.arange(K, dtype=np.int64)
        adopt = small & (target < K)
        # avoid two-cycles when both partners are small: only merge
        # into a smaller id (forms a forest toward minima)
        adopt &= (target < np.arange(K)) | has_large
        if not adopt.any():
            break
        lut[adopt] = target[adopt]
        # fully path-compress the lut: partial compression would map
        # chain members to DIFFERENT intermediate nodes and disconnect
        # the merged label
        while True:
            nxt = lut[lut]
            if (nxt == lut).all():
                break
            lut = nxt
        lab = np.where(lab >= 0, lut[np.clip(lab, 0, K - 1)], -1)
    # re-compact (keep first-occurrence order)
    from .. import native
    return native.relabel_compact(lab)


def compact_labels(comp: np.ndarray, start_label: int = 0
                   ) -> Tuple[np.ndarray, int]:
    """Host-side: map component roots to consecutive labels ordered by
    raster-order first occurrence (roots are min linear indices, so sorted
    roots == first-occurrence order). Invalid (-1) pixels map to
    ``start_label - 1``.

    Returns (labels, num_labels).
    """
    comp = np.asarray(comp)
    flat = comp.reshape(-1)
    roots = np.unique(flat[flat >= 0])
    lut = np.full(int(flat.max()) + 2 if flat.size else 1, -1, np.int64)
    lut[roots] = np.arange(len(roots)) + start_label
    out = np.where(flat >= 0, lut[np.clip(flat, 0, lut.size - 1)],
                   start_label - 1)
    return out.reshape(comp.shape).astype(np.int32), len(roots)
