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


def _moment_pass1(chans, lab_safe, okf, K: int) -> jnp.ndarray:
    """Counts + first moments in ONE batched scatter (count rides as an
    extra feature lane — index handling dominates scatter cost).
    Returns (K, 1+C): [count | sum_x per channel]."""
    return featurewise_segment_sum(
        [okf] + [v * okf for v in chans], lab_safe, K + 1)[:K]


def _moment_pass2(chans, mean, lab_c, okf, lab_safe, K: int) -> jnp.ndarray:
    """Centred 2nd/3rd/4th power sums (numerically stable in f32); the
    per-channel centred differences fuse into their scatters.
    Returns (K, 3C)."""
    C = len(chans)
    d = [(chans[c] - mean[:, c][lab_c]) * okf for c in range(C)]
    return featurewise_segment_sum(
        [dc * dc for dc in d]
        + [dc * dc * dc for dc in d]
        + [(dc * dc) * (dc * dc) for dc in d],
        lab_safe, K + 1)[:K]


def _moment_minmax(chans, ok, lab_safe, K: int, dtype):
    """Min AND max in ONE batched scatter (max rides as min of the
    negated rows — scatter cost is index-dominated, so 2C rows cost the
    same as C and the separate max pass is free). Exact regardless of
    reduction order. Returns (xmin, xmax), each (K, C)."""
    C = len(chans)
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    both = _batched_segment_reduce(
        [jnp.where(ok, v, big) for v in chans]
        + [jnp.where(ok, -v, big) for v in chans], lab_safe, K + 1,
        jax.ops.segment_min)[:K]
    return both[:, :C], -both[:, C:]


def _moments_finalize(cnt1, s1, p2, xmin, xmax, C: int, dtype):
    """Reduced moment sums -> the public stats dict (shared by the
    single-device program and the sharded psum path)."""
    K = cnt1.shape[0]
    cnt = jnp.broadcast_to(cnt1[:, None], (K, C))
    safe_cnt = jnp.maximum(cnt, 1.0)
    mean = s1 / safe_cnt
    m2 = p2[:, :C] / safe_cnt
    m3 = p2[:, C:2 * C] / safe_cnt
    m4 = p2[:, 2 * C:] / safe_cnt

    nan = jnp.asarray(jnp.nan, dtype)
    empty = cnt == 0
    # scipy.stats.skew(bias=True): g1 = m3 / m2^1.5 ; 0/0 -> 0 per scipy,
    # but scipy returns nan for constant input in recent versions; follow
    # nan-on-zero-variance.
    zero_var = m2 <= 0
    skew = jnp.where(zero_var, nan, m3 / jnp.where(zero_var, 1.0, m2) ** 1.5)
    kurt = jnp.where(zero_var, nan,
                     m4 / jnp.where(zero_var, 1.0, m2) ** 2 - 3.0)

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
    K = num_segments
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
    lab_safe = jnp.where(ok, lab, K)  # dump invalid into slot K
    okf = ok.astype(image.dtype)

    s1c = _moment_pass1(chans, lab_safe, okf, K)
    cnt1 = s1c[:, 0]
    s1 = s1c[:, 1:]
    mean = s1 / jnp.maximum(cnt1[:, None], 1.0)
    lab_c = jnp.clip(lab, 0, K - 1)
    p2 = _moment_pass2(chans, mean, lab_c, okf, lab_safe, K)
    xmin, xmax = _moment_minmax(chans, ok, lab_safe, K, image.dtype)
    return _moments_finalize(cnt1, s1, p2, xmin, xmax, C, image.dtype)


def spectral_stats_table(image, labels, num_segments: int,
                         valid=None) -> Dict[str, np.ndarray]:
    """Host-friendly wrapper returning numpy arrays."""
    out = segment_spectral_moments(jnp.asarray(image, jnp.float32),
                                   jnp.asarray(labels, jnp.int32),
                                   num_segments,
                                   None if valid is None else jnp.asarray(valid))
    return {k: np.asarray(v) for k, v in out.items()}
