"""Fused per-object spectral statistics on TPU.

Replaces the reference's per-segment Python loop (reference
segment_statistics.py:475-508: windowed disk read + polygon mask + scipy
stats per object — hot loop #2) with ONE pass over the label raster:
per-(segment, band) sums of 1, x, x2, centred x2/x3/x4 via
``jax.ops.segment_sum``, then closed-form mean/variance/min/max/
skewness/kurtosis.

Statistical definitions match scipy defaults used by the reference
(segment_statistics.py:173-175): variance = biased (ddof=0), skewness =
Fisher-Pearson g1 (bias=True), kurtosis = Fisher excess g2 (bias=True).
A two-pass centred-moment formulation keeps float32 accurate.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

SPECTRAL_STAT_NAMES = ("mean", "variance", "min", "max", "skewness", "kurtosis")


def featurewise_segment_sum(feat_rows, seg: jnp.ndarray,
                            num_segments: int) -> jnp.ndarray:
    """segment_sum of F feature rows (an (F, N) array or a sequence of
    (N,) arrays) → (num_segments, F).

    One BATCHED scatter instead of F 1-D scatters: on TPU the scatter's
    index handling dominates, so batching features is ~6x faster at
    F=8, N=16.8M. The payload is stacked FEATURE-MAJOR (F, N) and the
    scatter vmapped over F: an (N, F) payload would put F on the 128-lane
    minor dim and pad it 128/F-fold (8.6 GB at 16.8M — OOMs the compile),
    while (F, N) pads F to 8 sublanes only.
    """
    return _batched_segment_reduce(feat_rows, seg, num_segments,
                                   jax.ops.segment_sum)


# batched scatters internally pad their update minor dim to 128 lanes, so
# the effective footprint is N x 512 B regardless of F — chunk the PIXEL
# axis to bound it (the row count, which sets scatter cost, is unchanged)
_SCATTER_N_CHUNK = 1 << 23


def _batched_segment_reduce(feat_rows, seg, num_segments, reducer):
    rows = list(feat_rows)
    if len(rows) == 1 and rows[0].ndim == 2:
        rows = list(rows[0])
    n = rows[0].shape[0]
    if n <= _SCATTER_N_CHUNK * 2:
        payload = jnp.stack(rows, axis=0)                   # (F, N)
        out = jax.vmap(
            lambda r: reducer(r, seg, num_segments=num_segments))(payload)
        return out.T                                        # (K, F)
    outs = []
    for j in range(0, n, _SCATTER_N_CHUNK):
        payload = jnp.stack([r[j:j + _SCATTER_N_CHUNK] for r in rows],
                            axis=0)
        sj = seg[j:j + _SCATTER_N_CHUNK]
        outs.append(jax.vmap(
            lambda r, s=sj: reducer(r, s, num_segments=num_segments)
        )(payload))
    return functools.reduce(
        lambda a, b: _combine_reduced(a, b, reducer), outs).T


def _combine_reduced(a, b, reducer):
    if reducer is jax.ops.segment_sum:
        return a + b
    if reducer is jax.ops.segment_min:
        return jnp.minimum(a, b)
    return jnp.maximum(a, b)


def pad_num_segments(num_segments: int, bucket: int = 512) -> int:
    """Round the static segment count up to a bucket boundary so compiled
    programs serve any K in the bucket: caches survive the data-dependent
    K jitter between scenes and hot programs can be compile-warmed with a
    synthetic K before memory-heavy runs (the remote compile-helper has
    crashed on big late-session compiles)."""
    return max(bucket, -(-int(num_segments) // bucket) * bucket)


def segment_spectral_moments(image: jnp.ndarray,
                             labels: jnp.ndarray,
                             num_segments: int,
                             valid: Optional[jnp.ndarray] = None):
    """Bucketed-K wrapper around the fused moment program (see
    :func:`pad_num_segments`)."""
    K_pad = pad_num_segments(num_segments)
    out = _segment_spectral_moments(image, labels, K_pad, valid)
    if K_pad == num_segments:
        return out
    return {k: v[:num_segments] for k, v in out.items()}


@functools.partial(jax.jit, static_argnames=("num_segments",))
def _segment_spectral_moments(image: jnp.ndarray,
                              labels: jnp.ndarray,
                              num_segments: int,
                              valid: Optional[jnp.ndarray] = None):
    """Fused moment accumulation.

    Args:
      image: (H, W, C) float32.
      labels: (H, W) int32 segment ids in [0, num_segments); pixels with
        negative labels (masked out) are ignored.
      num_segments: static segment count K.
      valid: optional (H, W) bool of additionally-valid pixels.

    Returns:
      dict of (K, C) arrays: count, mean, variance, min, max, skewness,
      kurtosis. Empty segments yield NaN stats (count 0), matching the
      reference's empty-mask behavior (segment_statistics.py:152-165).
    """
    H, W, C = image.shape
    # per-channel 1-D rows, NEVER a stacked (C, N) value: XLA lays any
    # image-derived (C, N) / (C, H, W) array out channel-minor (C padded
    # to 128 lanes — 51 GB at 100 MP); minor-dim slices fuse cleanly and
    # only small stacked CHUNKS ever materialise (inside the batched
    # scatter helper)
    chans = [image[..., c].reshape(-1) for c in range(C)]
    lab = labels.reshape(-1)
    ok = lab >= 0
    if valid is not None:
        ok = ok & valid.reshape(-1)
    lab_safe = jnp.where(ok, lab, num_segments)  # dump invalid into slot K
    okf = ok.astype(image.dtype)

    # counts + first moments in ONE batched scatter (count rides as an
    # extra feature lane — index handling dominates scatter cost)
    s1c = featurewise_segment_sum(
        [okf] + [v * okf for v in chans],
        lab_safe, num_segments + 1)[:num_segments]
    cnt1 = s1c[:, 0]
    s1 = s1c[:, 1:]
    cnt = jnp.broadcast_to(cnt1[:, None], (num_segments, C))
    safe_cnt = jnp.maximum(cnt, 1.0)
    mean = s1 / safe_cnt

    # second pass: centred moments (numerically stable in f32); the
    # per-channel centred differences are expressions that fuse into
    # their scatters
    lab_c = jnp.clip(lab, 0, num_segments - 1)
    d = [(chans[c] - mean[:, c][lab_c]) * okf for c in range(C)]
    p2 = featurewise_segment_sum(
        [dc * dc for dc in d]
        + [dc * dc * dc for dc in d]
        + [(dc * dc) * (dc * dc) for dc in d],
        lab_safe, num_segments + 1)[:num_segments]
    m2 = p2[:, :C] / safe_cnt
    m3 = p2[:, C:2 * C] / safe_cnt
    m4 = p2[:, 2 * C:] / safe_cnt

    big = jnp.asarray(jnp.finfo(image.dtype).max, image.dtype)
    # batched feature-major min/max scatters (same layout + chunking
    # arguments as featurewise_segment_sum)
    xmin = _batched_segment_reduce(
        [jnp.where(ok, v, big) for v in chans], lab_safe, num_segments + 1,
        jax.ops.segment_min)[:num_segments]
    xmax = _batched_segment_reduce(
        [jnp.where(ok, v, -big) for v in chans], lab_safe, num_segments + 1,
        jax.ops.segment_max)[:num_segments]

    nan = jnp.asarray(jnp.nan, image.dtype)
    empty = cnt == 0
    # scipy.stats.skew(bias=True): g1 = m3 / m2^1.5 ; 0/0 -> 0 per scipy,
    # but scipy returns nan for constant input in recent versions; follow
    # nan-on-zero-variance.
    zero_var = m2 <= 0
    skew = jnp.where(zero_var, nan, m3 / jnp.where(zero_var, 1.0, m2) ** 1.5)
    kurt = jnp.where(zero_var, nan, m4 / jnp.where(zero_var, 1.0, m2) ** 2 - 3.0)

    def mask_empty(a):
        return jnp.where(empty, nan, a)

    return {
        "count": cnt,
        "mean": mask_empty(mean),
        "variance": mask_empty(m2),
        "min": mask_empty(xmin),
        "max": mask_empty(xmax),
        "skewness": mask_empty(skew),
        "kurtosis": mask_empty(kurt),
    }


def spectral_stats_table(image, labels, num_segments: int,
                         valid=None) -> Dict[str, np.ndarray]:
    """Host-friendly wrapper returning numpy arrays."""
    out = segment_spectral_moments(jnp.asarray(image, jnp.float32),
                                   jnp.asarray(labels, jnp.int32),
                                   num_segments,
                                   None if valid is None else jnp.asarray(valid))
    return {k: np.asarray(v) for k, v in out.items()}
