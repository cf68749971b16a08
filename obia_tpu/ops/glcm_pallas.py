"""Pallas TPU kernel for per-object GLCM joint histograms.

The XLA joint-histogram path (:mod:`obia_tpu.ops.glcm`) is floored by TPU
scatter cost: one N-row scatter per angle at ~100 M index-rows/s means
4 angles x 8 bands x 100 M pixels ~= 32 s for the north-star scene
(BASELINE.md round 3). This kernel removes the scatter entirely by
computing each object's (levels, levels) co-occurrence table as a chain
of MXU matmuls over one-hot level matrices built in VMEM:

    hist += onehot(center row)^T-free form:  X (L, TC) @ Y (A*L, TC)^T

where ``X`` one-hot-encodes the center pixels of one tile row on the
LANE dimension (levels on sublanes — built with a broadcast + iota
compare, no reshape/relayout) and ``Y`` stacks the four angles' shifted
neighbour one-hots on the sublane dimension. Pixels outside the object
encode a -1 sentinel that matches no one-hot row, so masking is free.
Each tile row costs ONE (L, TC) x (A*L, TC) lane-contraction int8 matmul
with exact int32 counts — per pixel A * L^2 = 262144 int8 MACs, which at
the v5e's int8 MXU rate prices the whole north-star GLCM core in seconds
instead of the scatter path's ~32 s.

Mosaic constraints shaped the kernel (probed empirically on v5e):
rank-3 ``dot_general`` does not lower (hence per-row 2D matmuls with the
row loop statically unrolled), ``fori_loop`` dynamic sublane loads must
be 8-aligned (hence no dynamic row indexing at all), scalars cannot be
stored to VMEM (the per-segment reduction writes to an SMEM block), and
mixed basic/None indexing routes through an unliftable gather (hence
``lax.slice`` value slicing everywhere).

Work is tiled per OBJECT: a host-built job list enumerates, for every
segment, TRxTC windows covering its bounding box (bboxes from one
batched device scatter). Window row origins are 8-aligned and ANCHORED
to the bbox, and every job carries its valid row count, so row-matmuls
below the bbox are skipped — on the 128-aligned global grid ~25-30% of
the MXU work was row slop at north-star object sizes. Jobs of one
segment are consecutive, so the (L, A*L) histogram accumulates in VMEM
scratch across the segment's windows and is reduced on the segment's
last job to the 8 per-angle sums (pair count, contrast/dissimilarity/
homogeneity numerators, the three correlation moments, and the
symmetric-ASM sum of squares) — elementwise products against
precomputed weight planes, full reductions, SMEM scalar stores. The
sums feed ``ops.glcm._glcm_props_from_sums`` verbatim, so final
semantics are identical to the scatter path (and to the reference's
skimage calls, segment_statistics.py:262-296: distance 2, angles
0/45/90/135 deg, levels=256, symmetric, normed, angle-averaged).

Per-object min-max QUANTISATION is fused into the kernel: windows DMA
the raw float band, and each job's (min, range) scalars ride the scalar
prefetch — the expression mirrors ``ops.glcm.scale_quantise`` term for
term, so levels match the scatter path bitwise. This removes the whole
global quantise stage (a 100 M-row packed per-pixel gather, the
(B, H, W) uint8 stack, and a per-band padded int32 copy at the
north-star scene) for ~4 extra VPU ops per window pixel; the only
full-raster pass left ahead of the kernel is ONE fused bbox+min/max
scatter (``ops.glcm._bbox_minmax`` — the 4 + 2B payload rows share one
label index, so it costs the same as the bbox scatter alone).

Raster windows ride manual DMA (HBM -> VMEM) because the per-job windows
overlap (a one-tile column halo for the +-2 px pair offsets) and
therefore cannot be expressed as a BlockSpec partition.
"""
from __future__ import annotations

import functools
import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:  # pragma: no cover - import guard for minimal installs
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

# tile geometry: global raster grid of TR x TC interior tiles; windows
# fetch (TR + RH) rows x (CHALO + TC + CHALO) cols so every pair offset
# with 0 <= dr <= RH and |dc| <= CHALO reads in-window
TR = 128
TC = 128
RH = 8            # bottom row halo (dr in [0, RH])
CHALO = 128       # column halo on each side (dc in [-CHALO, CHALO])
RW = TR + RH      # window rows
CW = TC + 2 * CHALO  # window cols
LEVELS = 256      # histogram width; levels <= 256 use the low bins

_N_SUMS = 8       # n, sum d^2, sum |d|, sum 1/(1+d^2), sum i+j,
                  # sum i^2+j^2, sum i*j, symmetric-ASM sum of squares

_ROWGRP = 16      # row-skip predication granularity: whole groups of
                  # rows below a segment's bbox are skipped; finer
                  # (per-row) predication measured slower than no skip

# job-metadata packing (scalar-prefetch SMEM is scarce: two int32 rows
# per job instead of five): meta = seg*8 + first*4 + last*2 + valid,
# rc = (r0/8) * 2^17 + (c0/128) * 2^7 + (nrows - 1). Window row origins
# are 8-ALIGNED TO THE SEGMENT'S BBOX (not the global 128 grid) and each
# job carries its valid row count: a bbox of side ~2.2 tiles would pay
# 3.2 grid tiles' matmuls on the 128 grid, but only ~2.3 tiles' worth
# with anchored origins + per-row skip — ~25-30% of the kernel's MXU
# work is row slop at north-star object sizes. Supports rasters up to
# 131072 px per side (14 row-origin bits + 10 col bits + 7 nrow bits).
_META_SEG = 8
_RC_R_SHIFT = 1 << 17
_RC_C_SHIFT = 1 << 7


def pallas_available() -> bool:
    return _PALLAS_OK


def _onehot_row(row: jnp.ndarray, iota: jnp.ndarray) -> jnp.ndarray:
    """(1, TC) int32 levels -> (LEVELS, TC) int8 one-hot (levels on
    sublanes). -1 sentinels match no row."""
    return (jnp.broadcast_to(row, (LEVELS, TC)) == iota).astype(jnp.int8)


def _unpack_meta(meta_ref, rc_ref, j):
    """(seg, first, last, valid, r0, c0, nrows) from the packed per-job
    rows. ``r0`` is the 8-aligned bbox-anchored window row origin,
    ``nrows`` the count of rows actually inside the segment's bbox."""
    meta = meta_ref[j]
    seg = jax.lax.div(meta, _META_SEG)
    first = jax.lax.rem(jax.lax.div(meta, 4), 2)
    last = jax.lax.rem(jax.lax.div(meta, 2), 2)
    valid = jax.lax.rem(meta, 2)
    rc = rc_ref[j]
    r0 = jax.lax.div(rc, _RC_R_SHIFT) * 8
    rest = jax.lax.rem(rc, _RC_R_SHIFT)
    c0 = jax.lax.div(rest, _RC_C_SHIFT) * TC
    nrows = jax.lax.rem(rest, _RC_C_SHIFT) + 1
    return seg, first, last, valid, r0, c0, nrows


def _dma_window(lab_hbm, q_hbm, labwin_ref, qwin_ref, sems, r0, c0):
    cp_lab = pltpu.make_async_copy(
        lab_hbm.at[pl.ds(r0, RW), pl.ds(c0, CW)], labwin_ref, sems.at[0])
    cp_q = pltpu.make_async_copy(
        q_hbm.at[pl.ds(r0, RW), pl.ds(c0, CW)], qwin_ref, sems.at[1])
    cp_lab.start()
    cp_q.start()
    cp_lab.wait()
    cp_q.wait()


def _accumulate_window(labwin_ref, bwin_ref, hist_ref, seg, offsets,
                       valid_hw, r0, c0, nrows, mn, inv, levels):
    """One window's one-hot MXU matmul chain into the (L, A*L) VMEM
    histogram (the kernel core shared by the sums and histogram-emitting
    variants). ``valid_hw`` bounds the CENTER positions: a pair is owned
    by the raster cell holding its center pixel, so in the sharded path
    the halo rows/cols (real neighbour-shard pixels living inside the
    padded window) must never act as centers — without this mask every
    cross-seam pair would be double-counted by the two adjacent shards.
    Single-raster callers pass the crop (H, W), where the mask is inert
    (pad labels are already -1).

    Quantisation is FUSED: ``bwin_ref`` holds the raw float band window
    and ``mn``/``inv`` are this job's segment's min and PRECOMPUTED
    (levels-1)/range scalars (:func:`ops.glcm.quant_inv`, computed in
    the same XLA program as the scatter path's table). The kernel does
    only subtract -> multiply -> floor -> clip — exact IEEE f32 ops that
    round identically in XLA and Mosaic, so levels are bit-identical to
    the scatter path (a division HERE drifted ~1.6e-3 contrast on
    hardware). Fusing removes the global quantise stage (a 100 M-row
    packed gather + a (B, H, W) uint8 materialisation + a per-band
    padded copy at the north-star scene) for ~4 VPU ops per window pixel.

    Row-groups at and past ``nrows`` (below the segment's bbox) are
    skipped in blocks of _ROWGRP — coarse predication keeps the MXU
    matmul chain pipelineable inside a group (a per-row pl.when measured
    SLOWER than the unskipped kernel), while still dropping most of the
    below-bbox row slop.

    All VPU work (quantise, membership mask, one-hots) runs on the
    narrow SLAB of columns the offsets can actually touch
    ([CHALO - spad, CHALO + TC + spad)) — quantising the full CW-wide
    window costs ~3x the VPU ops for bytes only the DMA alignment
    needed."""
    max_dc = max(abs(dc) for _, dc in offsets)
    spad = max(8, -(-max_dc // 8) * 8)
    SW = TC + 2 * spad
    lab = jax.lax.slice(labwin_ref[...], (0, CHALO - spad),
                        (RW, CHALO + TC + spad))
    v = jax.lax.slice(bwin_ref[...], (0, CHALO - spad),
                      (RW, CHALO + TC + spad))
    # per-object min-max quantise (scale_quantise semantics; inv = 0
    # encodes the constant-object -> level 0 rule)
    q = jnp.clip(jnp.floor((v - mn) * inv), 0, levels - 1).astype(jnp.int32)
    # in-object test folded into the level value: -1 matches no
    # one-hot row, so invalid pixels contribute nothing
    qm = jnp.where(lab == seg, q, -1)                    # (RW, SW)
    ctr = jax.lax.slice(qm, (0, spad), (TR, spad + TC))
    ri = jax.lax.broadcasted_iota(jnp.int32, (TR, TC), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (TR, TC), 1)
    ctr = jnp.where((ri < valid_hw[0] - r0) & (ci < valid_hw[1] - c0),
                    ctr, -1)
    nbrs = [jax.lax.slice(qm, (dr, spad + dc),
                          (dr + TR, spad + dc + TC))
            for dr, dc in offsets]                       # A x (TR, TC)
    iota = jax.lax.broadcasted_iota(jnp.int32, (LEVELS, TC), 0)
    for g in range(0, TR, _ROWGRP):
        @pl.when(g < nrows)
        def _():
            for r in range(g, g + _ROWGRP):
                X = _onehot_row(jax.lax.slice(ctr, (r, 0), (r + 1, TC)),
                                iota)
                Y = jnp.concatenate(
                    [_onehot_row(jax.lax.slice(n, (r, 0), (r + 1, TC)),
                                 iota)
                     for n in nbrs], axis=0)             # (A*L, TC)
                hist_ref[...] += jax.lax.dot_general(
                    X, Y, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)


def _kernel(meta_ref, rc_ref, mn_ref, inv_ref,               # scalar prefetch
            lab_hbm, band_hbm, w7_ref,                       # inputs
            out_ref,                                         # (1, A, 8) SMEM
            labwin_ref, bwin_ref, hist_ref, sems,
            *, offsets: Tuple[Tuple[int, int], ...],
            valid_hw: Tuple[int, int], levels: int):
    j = pl.program_id(0)
    seg, first, last, valid, r0, c0, nrows = _unpack_meta(meta_ref, rc_ref, j)
    A = len(offsets)

    _dma_window(lab_hbm, band_hbm, labwin_ref, bwin_ref, sems, r0, c0)

    @pl.when(first != 0)
    def _():
        hist_ref[...] = jnp.zeros(hist_ref.shape, hist_ref.dtype)

    @pl.when(valid != 0)
    def _():
        _accumulate_window(labwin_ref, bwin_ref, hist_ref, seg, offsets,
                           valid_hw, r0, c0, nrows,
                           mn_ref[j], inv_ref[j], levels)

    @pl.when((last != 0) & (valid != 0))
    def _():
        for a in range(A):
            C = hist_ref[:, a * LEVELS:(a + 1) * LEVELS].astype(jnp.float32)
            for s in range(7):
                out_ref[0, a, s] = jnp.sum(C * w7_ref[s])
            Csym = C + C.T
            out_ref[0, a, 7] = jnp.sum(Csym * Csym)

    @pl.when((last == 0) | (valid == 0))
    def _():
        for a in range(A):
            for s in range(_N_SUMS):
                out_ref[0, a, s] = 0.0


def _hist_kernel(meta_ref, rc_ref, slot_ref, mn_ref, inv_ref,  # scalar prefetch
                 lab_hbm, band_hbm,                          # inputs
                 hout_ref,                                   # (S, L, A*L) ANY
                 labwin_ref, bwin_ref, hist_ref, sems,
                 *, offsets: Tuple[Tuple[int, int], ...],
                 valid_hw: Tuple[int, int], levels: int):
    """Histogram-EMITTING variant for the sharded hybrid ASM: identical
    accumulation to :func:`_kernel`, but on a segment's last job the
    (L, A*L) VMEM histogram DMAs to ``hout_ref[slot]`` (the segment's
    compact seam-spanner rank) instead of reducing to the 8 sums. Only
    seam-spanning segments' jobs run through this kernel — their exact
    symmetric ASM needs the GLOBAL histogram, which the caller psums over
    the mesh before squaring. Unvisited slots are left untouched (the
    caller masks them with its host-built per-shard visit mask)."""
    j = pl.program_id(0)
    seg, first, last, valid, r0, c0, nrows = _unpack_meta(meta_ref, rc_ref, j)

    _dma_window(lab_hbm, band_hbm, labwin_ref, bwin_ref, sems, r0, c0)

    @pl.when(first != 0)
    def _():
        hist_ref[...] = jnp.zeros(hist_ref.shape, hist_ref.dtype)

    @pl.when(valid != 0)
    def _():
        _accumulate_window(labwin_ref, bwin_ref, hist_ref, seg, offsets,
                           valid_hw, r0, c0, nrows,
                           mn_ref[j], inv_ref[j], levels)

    @pl.when((last != 0) & (valid != 0))
    def _():
        slot = slot_ref[j]
        cp = pltpu.make_async_copy(hist_ref, hout_ref.at[slot], sems.at[2])
        cp.start()
        cp.wait()


@functools.partial(jax.jit, static_argnames=("num_jobs", "n_slots",
                                             "n_angles", "offsets",
                                             "valid_hw", "levels",
                                             "interpret"))
def _glcm_hist_call(meta, rc, slot, mnj, invj, lab_pad, band_pad,
                    num_jobs: int, n_slots: int, n_angles: int,
                    offsets: Tuple[Tuple[int, int], ...],
                    valid_hw: Tuple[int, int], levels: int,
                    interpret: bool = False):
    """(n_slots, LEVELS, n_angles*LEVELS) int32 per-slot histograms from
    the seam-spanner job list. Slots this shard never writes hold
    UNDEFINED bytes — callers must mask by their visit set."""
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(num_jobs,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((RW, CW), jnp.int32),
            pltpu.VMEM((RW, CW), jnp.float32),
            pltpu.VMEM((LEVELS, n_angles * LEVELS), jnp.int32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_hist_kernel, offsets=offsets,
                          valid_hw=valid_hw, levels=levels),
        out_shape=jax.ShapeDtypeStruct(
            (n_slots, LEVELS, n_angles * LEVELS), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(meta, rc, slot, mnj, invj, lab_pad, band_pad)


def _np_weight_planes() -> np.ndarray:
    """(7, L, L) float32 planes so that sum_ij C_ij * W[s] gives the
    pairwise sums ops.glcm.pair_sum_rows accumulates: [1, d^2, |d|,
    1/(1+d^2), i+j, i^2+j^2, i*j] over ordered (center, neighbour)
    levels."""
    i, j = np.mgrid[0:LEVELS, 0:LEVELS].astype(np.float32)
    d = i - j
    d2 = d * d
    return np.stack([np.ones_like(d), d2, np.abs(d), 1.0 / (1.0 + d2),
                     i + j, i * i + j * j, i * j])


@functools.lru_cache(maxsize=1)
def _weight_planes() -> np.ndarray:
    # cache the HOST array, not a device/traced value: jnp.asarray runs
    # at the call site so each trace gets its own constant (a cached
    # in-trace value would leak a tracer into later traces — seen when
    # the sharded program re-enters _glcm_jobs_call under shard_map)
    return _np_weight_planes()


@functools.partial(jax.jit, static_argnames=("num_jobs", "n_angles",
                                             "offsets", "valid_hw",
                                             "levels", "interpret"))
def _glcm_jobs_call(meta, rc, mnj, invj, lab_pad, band_pad,
                    num_jobs: int, n_angles: int,
                    offsets: Tuple[Tuple[int, int], ...],
                    valid_hw: Tuple[int, int], levels: int,
                    interpret: bool = False):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(num_jobs,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_angles, _N_SUMS),
                               lambda j, *refs: (j, 0, 0),
                               memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((RW, CW), jnp.int32),
            pltpu.VMEM((RW, CW), jnp.float32),
            pltpu.VMEM((LEVELS, n_angles * LEVELS), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, offsets=offsets, valid_hw=valid_hw,
                          levels=levels),
        out_shape=jax.ShapeDtypeStruct((num_jobs, n_angles, _N_SUMS),
                                       jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(meta, rc, mnj, invj, lab_pad, band_pad, jnp.asarray(_weight_planes()))


def padded_shape(H: int, W: int) -> Tuple[int, int]:
    """Raster padding so every job window read is in-bounds: the scene
    shifts right by CHALO cols; window row origins are 8-aligned and
    bbox-anchored (largest possible is floor((H-1)/8)*8), column origins
    are multiples of TC."""
    Hp = ((H - 1) // 8) * 8 + RW
    Wp = ((W - 1) // TC) * TC + CW
    return Hp, Wp


@functools.partial(jax.jit, static_argnames=("Hp", "Wp"))
def pad_labels(labels: jnp.ndarray, Hp: int, Wp: int) -> jnp.ndarray:
    out = jnp.full((Hp, Wp), -1, jnp.int32)
    return jax.lax.dynamic_update_slice(out, labels.astype(jnp.int32),
                                        (0, CHALO))


@functools.partial(jax.jit, static_argnames=("Hp", "Wp"))
def pad_band_f32(image: jnp.ndarray, band, Hp: int, Wp: int) -> jnp.ndarray:
    """One RAW float band from the (H, W, C) image, padded to the window
    grid (quantisation happens inside the kernel). ``band`` is traced:
    one compiled program serves all B calls."""
    v = jax.lax.dynamic_index_in_dim(image, band, 2, keepdims=False)
    out = jnp.zeros((Hp, Wp), jnp.float32)
    return jax.lax.dynamic_update_slice(out, v.astype(jnp.float32),
                                        (0, CHALO))


def segment_bboxes(labels: jnp.ndarray, num_segments: int) -> np.ndarray:
    """(K, 4) int32 [rmin, rmax, cmin, cmax] per segment (host numpy);
    empty segments get rmin > rmax. One batched 4-row scatter (the rows
    share one label index, so this costs the same as a single N-row
    scatter) — band-independent, computed once per scene."""
    from .stats import _batched_segment_reduce
    H, W = labels.shape
    lab = labels.reshape(-1)
    ok = lab >= 0
    lab_safe = jnp.where(ok, lab, num_segments)
    r = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0).reshape(-1)
    c = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1).reshape(-1)
    big = jnp.float32(3e38)
    rows = [jnp.where(ok, r, big), jnp.where(ok, -r, big),
            jnp.where(ok, c, big), jnp.where(ok, -c, big)]
    mins = _batched_segment_reduce(rows, lab_safe, num_segments + 1,
                                   jax.ops.segment_min)  # (K+1, 4)
    mins = np.asarray(mins[:num_segments])
    out = np.empty((num_segments, 4), np.int32)
    empty = mins[:, 0] >= 2e38
    out[:, 0] = np.where(empty, 1, mins[:, 0]).astype(np.int32)
    out[:, 1] = np.where(empty, 0, -mins[:, 1]).astype(np.int32)
    out[:, 2] = np.where(empty, 1, mins[:, 2]).astype(np.int32)
    out[:, 3] = np.where(empty, 0, -mins[:, 3]).astype(np.int32)
    return out


# geometric job buckets: compiled programs are per-bucket, so snap the
# padded job count to ~1.5x steps to bound how many programs ever compile
_BUCKETS = [1024]
while _BUCKETS[-1] < (1 << 22):
    _BUCKETS.append(-(-_BUCKETS[-1] * 3 // 2048) * 1024)


def _bucket(n: int) -> int:
    for b in _BUCKETS:
        if n <= b:
            return b
    return -(-n // 1024) * 1024


def build_jobs(bboxes: np.ndarray):
    """Packed flat job table (meta, rc): for each segment, the TRxTC
    windows covering its bbox, consecutive per segment (the kernel's
    histogram scratch accumulates across a segment's jobs). Window ROW
    origins are anchored to the bbox (rounded down to the 8-sublane DMA
    alignment) and each job carries its valid row count — a bbox of
    2.2 tile-heights costs ~2.3 tiles of row-matmuls instead of the
    global grid's 3.2. Column origins stay on the TC grid: TC == the
    128-lane DMA alignment, so anchoring cannot shrink the column span.
    Window col = tile col (the scene shifts right by CHALO and the
    window starts one CHALO before its tile). Padded to a geometric
    bucket with valid=0 no-op jobs so compiled programs are reused
    across scenes."""
    rmin = bboxes[:, 0]
    rmax = bboxes[:, 1]
    cmin = bboxes[:, 2]
    cmax = bboxes[:, 3]
    nonempty = rmin <= rmax
    r_start = (rmin // 8) * 8
    nr = np.where(nonempty, -(-(rmax - r_start + 1) // TR), 0)
    tc0 = cmin // TC
    tc1 = np.where(nonempty, cmax // TC, tc0 - 1)
    nc = np.maximum(tc1 - tc0 + 1, 0)
    counts = nr * nc
    J = int(counts.sum())
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    segs = np.repeat(np.arange(bboxes.shape[0], dtype=np.int64), counts)
    # per-job window index within its segment's (nr, nc) block
    within = np.arange(J, dtype=np.int64) - np.repeat(starts, counts)
    nc_j = np.repeat(nc, counts)
    r0 = np.repeat(r_start, counts) \
        + within // np.maximum(nc_j, 1) * TR
    tj = np.repeat(tc0, counts) + within % np.maximum(nc_j, 1)
    nrows = np.minimum(np.repeat(rmax, counts) - r0 + 1, TR)
    firsts = within == 0
    lasts = within == np.repeat(counts, counts) - 1
    meta = (segs * _META_SEG + firsts * 4 + lasts * 2 + 1).astype(np.int32)
    rc = ((r0 // 8) * _RC_R_SHIFT + tj * _RC_C_SHIFT
          + (nrows - 1)).astype(np.int32)
    Jp = _bucket(max(J, 1))
    meta_p = np.zeros(Jp, np.int32)
    rc_p = np.zeros(Jp, np.int32)
    meta_p[:J] = meta
    rc_p[:J] = rc
    return meta_p, rc_p, J


@functools.partial(jax.jit, static_argnames=("num_segments",))
def _sums_from_jobs(job_out: jnp.ndarray, meta: jnp.ndarray,
                    num_segments: int):
    """(J, A, 8) per-job rows (only segment-final jobs are nonzero) ->
    (sums_A (A, K, 7), asm_A (A, K)) in ops.glcm._glcm_props_from_sums
    form."""
    J, A, S = job_out.shape
    seg_ids = jax.lax.div(meta, _META_SEG)
    valid = jax.lax.rem(meta, 2)
    key = jnp.where(valid != 0, seg_ids, num_segments)
    per_seg = jax.ops.segment_sum(job_out.reshape(J, A * S), key,
                                  num_segments=num_segments + 1)
    per_seg = per_seg[:num_segments].reshape(num_segments, A, S)
    sums_A = jnp.moveaxis(per_seg[:, :, :7], 0, 1)          # (A, K, 7)
    n = sums_A[:, :, 0]
    asm_A = jnp.moveaxis(per_seg[:, :, 7], 0, 1) \
        / jnp.maximum(2.0 * n, 1.0) ** 2                    # (A, K)
    return sums_A, asm_A


def _sums_sumsq_from_jobs(job_out: jnp.ndarray, meta: jnp.ndarray,
                          num_segments: int):
    """Raw per-shard variant of :func:`_sums_from_jobs` for the sharded
    path: (sums_A (A, K, 7), sumsq_A (A, K)) — the sum of squared
    SYMMETRIC histogram counts, NOT yet normalised to ASM. The 7 sums
    are additive across shards (psum). The sumsq is additive only for
    objects wholly on one shard (the other shards' histograms are empty
    so their sumsq is 0); seam-spanners are overridden from the psum'd
    compact histogram."""
    J, A, S = job_out.shape
    seg_ids = jax.lax.div(meta, _META_SEG)
    valid = jax.lax.rem(meta, 2)
    key = jnp.where(valid != 0, seg_ids, num_segments)
    per_seg = jax.ops.segment_sum(job_out.reshape(J, A * S), key,
                                  num_segments=num_segments + 1)
    per_seg = per_seg[:num_segments].reshape(num_segments, A, S)
    sums_A = jnp.moveaxis(per_seg[:, :, :7], 0, 1)          # (A, K, 7)
    sumsq_A = jnp.moveaxis(per_seg[:, :, 7], 0, 1)          # (A, K)
    return sums_A, sumsq_A


def glcm_pallas_supported(distance: int,
                          angles: Sequence[float],
                          levels: int) -> bool:
    """The kernel handles offsets with 0 <= dr <= RH and |dc| <= CHALO
    (the reference's distance-2 four-angle set trivially qualifies) and
    up to 256 grey levels."""
    if not _PALLAS_OK or levels > LEVELS:
        return False
    from .glcm import angle_offsets
    return all(0 <= dr <= RH and abs(dc) <= CHALO
               for dr, dc in angle_offsets(distance, tuple(angles)))


@functools.partial(jax.jit, static_argnames=("num_segments",))
def job_min_inv(meta, mn_k: jnp.ndarray, inv_k: jnp.ndarray,
                num_segments: int):
    """Per-JOB (min, quant-inverse) scalars from the per-segment (K,)
    tables (:func:`ops.glcm.quant_inv`) — one tiny (J,)-row gather
    (J ~ 10^4-5). Invalid padding jobs read segment 0's record; they
    never touch the histogram."""
    segs = jnp.clip(jax.lax.div(meta, _META_SEG), 0, num_segments - 1)
    return jnp.take(mn_k, segs), jnp.take(inv_k, segs)


def glcm_pallas_band(band_pad: jnp.ndarray, lab_pad: jnp.ndarray,
                     jobs, mn_k: jnp.ndarray, inv_k: jnp.ndarray,
                     num_segments: int,
                     distance: int, angles: Tuple[float, ...],
                     valid_hw: Tuple[int, int], levels: int = LEVELS,
                     interpret: bool = False):
    """One band's (sums_A, asm_A) via the Pallas kernel. ``jobs`` is the
    (meta, rc) pair from build_jobs (device or numpy arrays); ``band_pad``
    the RAW float band in window layout; ``mn_k``/``inv_k`` the band's
    per-segment min and quant-inverse ((K,) device arrays, ops.glcm.
    quant_inv); ``valid_hw`` the (H, W) crop bound on center positions."""
    from .glcm import angle_offsets
    offsets = angle_offsets(distance, tuple(angles))
    meta, rc = jobs
    meta = jnp.asarray(meta)
    J = int(meta.shape[0])
    mnj, invj = job_min_inv(meta, mn_k, inv_k, num_segments)
    job_out = _glcm_jobs_call(
        meta, jnp.asarray(rc), mnj, invj, lab_pad, band_pad,
        num_jobs=J, n_angles=len(offsets), offsets=offsets,
        valid_hw=valid_hw, levels=levels, interpret=interpret)
    return _sums_from_jobs(job_out, meta, num_segments)


# measured-model constants for the profitability gate: effective
# per-job kernel time (MXU one-hot matmul chain + window DMA) and the
# XLA scatter path's index-row rate
_PALLAS_JOB_S = 3.0e-5
_SCATTER_ROW_RATE = 1.0e8


def use_pallas_glcm(n_pixels: int, num_segments: int, levels: int,
                    distance: int, angles: Sequence[float]) -> bool:
    """Cheap first-stage gate: engage the MXU histogram kernel when its
    estimated job count (per-segment bbox tiles, bbox side estimated as
    sqrt(2 N / K)) beats the scatter path's ~100 M index-rows/s floor
    with margin. Favours big scenes with compact objects (the north-star
    regime: 100 MP, ~2.6k objects) and leaves small/many-object scenes
    on the dispatch-lean scatter path. OBIA_GLCM_PALLAS=1/0 forces it
    on/off; the final decision re-checks with the real job count
    (:func:`pallas_profitable`)."""
    env = os.environ.get("OBIA_GLCM_PALLAS", "auto").lower()
    if env in ("0", "false", "off"):
        return False
    if not glcm_pallas_supported(distance, angles, levels):
        return False
    if env in ("1", "true", "on"):
        return True
    if jax.devices()[0].platform != "tpu":
        return False
    if n_pixels < (1 << 24):
        return False
    side = (2.0 * n_pixels / max(num_segments, 1)) ** 0.5
    est_jobs = num_segments * (side / TR + 1) * (side / TC + 1)
    pallas_s = est_jobs * _PALLAS_JOB_S
    scatter_s = len(tuple(angles)) * n_pixels / _SCATTER_ROW_RATE
    return pallas_s < 0.7 * scatter_s


def pallas_profitable(num_jobs: int, n_pixels: int,
                      angles: Sequence[float]) -> bool:
    """Final gate with the REAL job count (known once bboxes are down)."""
    env = os.environ.get("OBIA_GLCM_PALLAS", "auto").lower()
    if env in ("1", "true", "on"):
        return True
    pallas_s = num_jobs * _PALLAS_JOB_S
    scatter_s = len(tuple(angles)) * n_pixels / _SCATTER_ROW_RATE
    return pallas_s < 0.9 * scatter_s
