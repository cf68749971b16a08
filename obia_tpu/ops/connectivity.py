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


@jax.jit
def connected_components(labels: jnp.ndarray) -> jnp.ndarray:
    """4-connected components of a multi-valued label map.

    Args:
      labels: (H, W) int32; negative = invalid (stays its own root).
    Returns:
      (H, W) int32 component roots (min linear index per component);
      invalid pixels get root -1.
    """
    H, W = labels.shape
    n = H * W
    idx = jnp.arange(n, dtype=jnp.int32).reshape(H, W)
    valid = labels >= 0
    comp0 = jnp.where(valid, idx, -1)

    def propagate(comp):
        best = comp
        for dr, dc in _NEIGHBOR_OFFSETS_4:
            nl = _shift2d(labels, dr, dc, fill=-2)
            nc = _shift2d(comp, dr, dc, fill=-1)
            same = (nl == labels) & valid
            best = jnp.where(same & (nc >= 0), jnp.minimum(best, nc), best)
        return best

    def jump(comp):
        flat = comp.reshape(-1)
        safe = jnp.clip(flat, 0, n - 1)
        hop = jnp.where(flat >= 0, flat[safe], -1)
        hop = jnp.where(flat >= 0, jnp.minimum(flat, hop), -1)
        return hop.reshape(H, W)

    def body(state):
        comp, _ = state
        new = propagate(comp)
        new = jump(jump(new))
        changed = jnp.any(new != comp)
        return new, changed

    def cond(state):
        return state[1]

    comp, _ = jax.lax.while_loop(cond, body, (comp0, jnp.bool_(True)))
    return comp


@functools.partial(jax.jit, static_argnames=("min_size", "max_iters"))
def merge_small_components(comp: jnp.ndarray,
                           min_size: int,
                           max_iters: int = 16) -> jnp.ndarray:
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

    def body(state):
        c, _ = state
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
        new_flat = jnp.where(adopt, new_root, flat)
        changed = jnp.any(new_flat != flat)
        return new_flat.reshape(H, W), changed

    def cond(state):
        return state[1]

    out, _ = jax.lax.while_loop(cond, body, (comp, jnp.bool_(True)))
    return out


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
