"""Sharded Pallas MXU GLCM: the per-object joint-histogram kernel
(:mod:`obia_tpu.ops.glcm_pallas`) run PER SHARD over a device mesh.

The sharded scatter-histogram path (:func:`..parallel.sharded.
sharded_glcm_props`) pays 4 angle scatters x B bands per shard — ~5-7 s
per chip at the north-star shape, which is why the round-4 v5e-8 scaling
model stalled at ~13-14 s while the single chip graduated to the Pallas
kernel (BASELINE.md round 4c). This module closes that gap:

* a PRE-PASS program computes, in one shard_map launch, the global
  per-object bounding boxes (per-shard batched segment_min + pmin) and
  the seam-spanner set (objects present on >1 shard) — everything the
  host needs to build PER-SHARD job lists;
* the host intersects each object's bbox with each shard's region and
  builds per-shard (meta, rc) job tables in LOCAL tile coordinates
  (reusing :func:`ops.glcm_pallas.build_jobs`), padded to one common
  bucket so every shard runs the same compiled program;
* the MAIN program computes the global per-object quantisation bounds
  (one batched per-shard scatter + a (K, 2B) pmin over ICI; the kernel
  quantises in-window from per-job scalars — no per-pixel gather),
  halo-exchanges ``distance`` pixels of label/band context so
  cross-seam pairs are counted by the shard owning the CENTER pixel
  (single-device semantics exactly), and
  runs the MXU one-hot matmul kernel per shard per band. The seven
  pairwise sums psum additively; exact symmetric ASM is hybrid — an
  object wholly on one shard contributes its (exact) local sum of
  squared symmetric counts, while seam-spanners' (LEVELS, A*LEVELS)
  histograms are DMA'd by the kernel into compact rank slots
  (:func:`ops.glcm_pallas._glcm_hist_call`), psum'd over ICI, and
  squared on the replicated side.

Reference semantics: skimage graycomatrix/graycoprops with distance 2,
angles 0/45/90/135 deg, levels=256, symmetric, normed, angle-averaged
(reference segment_statistics.py:262-296), per-object min-max
quantisation (:256-260) — identical to both single-device paths.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_AXES = ("ty", "tx")


def _glcm_prepass_factory(mesh: Mesh, K: int):
    """One shard_map program -> (n_multi, (K,) multi mask, (K, 4) packed
    bbox mins): per-shard batched segment_min of [r, -r, c, -c] in GLOBAL
    raster coordinates + pmin, and the shard-presence count that defines
    the seam-spanner set."""

    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(P("ty", "tx"),),
                       out_specs=(P(), P(), P()))
    def run(lab_loc):
        from ..ops.stats import _batched_segment_reduce

        h, w = lab_loc.shape
        iy = jax.lax.axis_index("ty")
        ix = jax.lax.axis_index("tx")
        rr = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
              + iy * h).reshape(-1).astype(jnp.float32)
        cc = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
              + ix * w).reshape(-1).astype(jnp.float32)
        lab_flat = lab_loc.reshape(-1)
        ok = lab_flat >= 0
        lab_safe = jnp.where(ok, lab_flat, K)
        big = jnp.float32(3e38)
        rows = [jnp.where(ok, rr, big), jnp.where(ok, -rr, big),
                jnp.where(ok, cc, big), jnp.where(ok, -cc, big)]
        mins = _batched_segment_reduce(rows, lab_safe, K + 1,
                                       jax.ops.segment_min)  # (K+1, 4)
        mins = jax.lax.pmin(mins[:K], _AXES)

        cnt_loc = jax.ops.segment_sum(ok.astype(jnp.float32), lab_safe,
                                      num_segments=K + 1)[:K]
        n_sh = jax.lax.psum((cnt_loc > 0).astype(jnp.int32), _AXES)
        multi = n_sh > 1
        return multi.sum().astype(jnp.int32), multi, mins

    return run


_EMPTY_BBOX = np.array([1, 0, 1, 0], np.int32)  # rmin > rmax marks empty


def _bboxes_from_mins(mins: np.ndarray, K: int) -> np.ndarray:
    """(K, 4) [rmin, rmax, cmin, cmax] from the packed [r,-r,c,-c] mins
    (same decode as ops.glcm_pallas.segment_bboxes)."""
    out = np.empty((K, 4), np.int32)
    empty = mins[:, 0] >= 2e38
    out[:, 0] = np.where(empty, 1, mins[:, 0]).astype(np.int32)
    out[:, 1] = np.where(empty, 0, -mins[:, 1]).astype(np.int32)
    out[:, 2] = np.where(empty, 1, mins[:, 2]).astype(np.int32)
    out[:, 3] = np.where(empty, 0, -mins[:, 3]).astype(np.int32)
    return out


def _clip_local(bboxes: np.ndarray, r0: int, c0: int,
                h: int, w: int) -> np.ndarray:
    """Global bboxes -> this shard's LOCAL-coordinate bboxes (empty-marked
    where the bbox misses the shard region)."""
    loc = np.empty_like(bboxes)
    loc[:, 0] = np.maximum(bboxes[:, 0] - r0, 0)
    loc[:, 1] = np.minimum(bboxes[:, 1] - r0, h - 1)
    loc[:, 2] = np.maximum(bboxes[:, 2] - c0, 0)
    loc[:, 3] = np.minimum(bboxes[:, 3] - c0, w - 1)
    bad = ((bboxes[:, 0] > bboxes[:, 1]) | (loc[:, 0] > loc[:, 1])
           | (loc[:, 2] > loc[:, 3]))
    loc[bad] = _EMPTY_BBOX
    return loc


def build_shard_jobs(bboxes: np.ndarray, multi: np.ndarray,
                     mrank: np.ndarray, ty: int, tx: int,
                     h_loc: int, w_loc: int, mcap: int):
    """Per-shard job tables (host): for every shard, the tile jobs of the
    objects whose bbox intersects its region (main sums kernel), plus the
    seam-spanners' jobs with their compact rank slots (histogram kernel)
    and the per-shard slot visit mask. All shards pad to ONE bucket so
    one compiled program serves the mesh.

    Returns (meta (S, Jp), rc (S, Jp), hmeta (S, HJp), hrc (S, HJp),
    hslot (S, HJp), hmask (S, mcap or 1), total_jobs)."""
    from ..ops import glcm_pallas as gp

    S = ty * tx
    metas, rcs, hmetas, hrcs, hslots, hmasks = [], [], [], [], [], []
    total = 0
    for i in range(ty):
        for j in range(tx):
            loc = _clip_local(bboxes, i * h_loc, j * w_loc, h_loc, w_loc)
            meta_p, rc_p, J = gp.build_jobs(loc)
            total += J
            metas.append(meta_p)
            rcs.append(rc_p)

            loch = loc.copy()
            loch[~multi.astype(bool)] = _EMPTY_BBOX
            hmeta_p, hrc_p, _ = gp.build_jobs(loch)
            hseg = hmeta_p // gp._META_SEG
            hvalid = (hmeta_p % 2) > 0
            slot_p = np.where(hvalid, mrank[hseg], 0).astype(np.int32)
            hmetas.append(hmeta_p)
            hrcs.append(hrc_p)
            hslots.append(slot_p)
            mask = np.zeros((max(mcap, 1),), np.int32)
            mask[slot_p[hvalid]] = 1
            hmasks.append(mask)

    def stack(parts):
        Jp = max(p.shape[0] for p in parts)
        out = np.zeros((S, Jp), np.int32)
        for s, p in enumerate(parts):
            out[s, :p.shape[0]] = p
        return out

    return (stack(metas), stack(rcs), stack(hmetas), stack(hrcs),
            stack(hslots), np.stack(hmasks), total)


@functools.lru_cache(maxsize=8)
def _make_program(mesh: Mesh, K: int, levels: int, distance: int,
                  angles: Tuple[float, ...], band_ids: Tuple[int, ...],
                  mcap: int, Jp: int, HJp: int, compute_asm: bool,
                  interpret: bool):
    """The jittable sharded device program (everything after the host job
    build). Cached by its statics so repeat scenes reuse the compiled
    executable; tools/compile_check_v5e8.py AOT-lowers it directly."""
    from ..ops import glcm_pallas as gp
    from ..ops.glcm import (_glcm_props_from_sums, angle_offsets,
                            quant_inv)
    from ..ops.stats import _batched_segment_reduce
    from .sharded import _halo2d

    offs = angle_offsets(distance, angles)
    A = len(offs)

    L = levels
    LV = gp.LEVELS  # kernel histograms are always 256-wide (low bins)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P("ty", "tx", None), P("ty", "tx"),
                  P(("ty", "tx")), P(("ty", "tx")),
                  P(("ty", "tx")), P(("ty", "tx")), P(("ty", "tx")),
                  P(("ty", "tx")), P(), P()),
        out_specs=P(),
        # pallas_call out_shapes carry no varying-mesh-axes annotation;
        # the replicated-output contract is enforced by the psums above
        check_vma=False)
    def run(img_loc, lab_loc, meta, rc, hmeta, hrc, hslot, hmask,
            multi, mrank):
        h, w, _ = img_loc.shape
        d = distance
        lab_flat = lab_loc.reshape(-1)
        ok = lab_flat >= 0
        lab_safe = jnp.where(ok, lab_flat, K)
        big = jnp.float32(3e38)

        # global per-object quantisation bounds: ALL bands' min/max ride
        # ONE batched per-shard scatter (2B payload rows share the label
        # index) + a (K, 2B) pmin over ICI. The per-pixel quantise gather
        # is GONE — the kernel quantises in-window from these per-job
        # scalars (ops.glcm_pallas._accumulate_window)
        rows = []
        for b in band_ids:
            v = img_loc[..., b].reshape(-1)
            rows.append(jnp.where(ok, v, big))
            rows.append(jnp.where(ok, -v, big))
        both = _batched_segment_reduce(rows, lab_safe, K + 1,
                                       jax.ops.segment_min)
        both = jax.lax.pmin(both[:K], _AXES)                # (K, 2B)
        mn = both[:, 0::2].T                                # (B, K)
        inv = quant_inv(-both[:, 1::2].T - mn, L)           # (B, K)
        b_stack = jnp.stack([img_loc[..., b].astype(jnp.float32)
                             for b in band_ids])            # (B, h, w)

        # halo'd label window, shared across bands: bottom d rows +/-
        # left/right d cols of neighbour context (pairs look down/right
        # only — angle offsets have dr >= 0), placed in the kernel's
        # padded window layout so the local block stays the center region
        Hp, Wp = gp.padded_shape(h, w)
        lab_ext = _halo2d(lab_loc, d, jnp.int32(-1))[d:, :]  # (h+d, w+2d)
        lab_pad = jax.lax.dynamic_update_slice(
            jnp.full((Hp, Wp), -1, jnp.int32), lab_ext, (0, gp.CHALO - d))

        mrank_c = jnp.clip(mrank, 0, max(mcap, 1) - 1)

        def one_band(carry, band_in):
            v_b, mn_b, inv_b = band_in
            v_ext = _halo2d(v_b, d, jnp.float32(0.0))[d:, :]
            band_pad = jax.lax.dynamic_update_slice(
                jnp.zeros((Hp, Wp), jnp.float32), v_ext, (0, gp.CHALO - d))

            mnj, invj = gp.job_min_inv(meta, mn_b, inv_b, K)
            job_out = gp._glcm_jobs_call(
                meta, rc, mnj, invj, lab_pad, band_pad, num_jobs=Jp,
                n_angles=A, offsets=offs, valid_hw=(h, w), levels=L,
                interpret=interpret)
            s_loc, sq_loc = gp._sums_sumsq_from_jobs(job_out, meta, K)
            sums_A = jax.lax.psum(s_loc, _AXES)             # (A, K, 7)
            # objects wholly on one shard: every other shard's histogram
            # is empty, so the psum of local sumsq is already exact
            sumsq = jax.lax.psum(sq_loc, _AXES)             # (A, K)

            if compute_asm and mcap > 0:
                hmnj, hinvj = gp.job_min_inv(hmeta, mn_b, inv_b, K)
                hout = gp._glcm_hist_call(
                    hmeta, hrc, hslot, hmnj, hinvj, lab_pad, band_pad,
                    num_jobs=HJp, n_slots=mcap, n_angles=A, offsets=offs,
                    valid_hw=(h, w), levels=L,
                    interpret=interpret)                    # (M, LV, A*LV)
                # unvisited slots hold undefined bytes: mask by the
                # host-built per-shard visit set before the psum
                hist_g = jax.lax.psum(hout * hmask[:, None, None], _AXES)
                sq_m = []
                for a in range(A):
                    Cm = jax.lax.slice(
                        hist_g, (0, 0, a * LV),
                        (mcap, LV, (a + 1) * LV)).astype(jnp.float32)
                    Cs = Cm + Cm.transpose(0, 2, 1)
                    sq_m.append((Cs * Cs).sum((1, 2)))
                sq_m = jnp.stack(sq_m)                      # (A, M)
                sumsq = jnp.where(multi[None, :], sq_m[:, mrank_c], sumsq)

            if compute_asm:
                asm_A = sumsq / jnp.maximum(
                    2.0 * sums_A[:, :, 0], 1.0) ** 2
            else:
                asm_A = jnp.full((A, K), jnp.nan, jnp.float32)
            return carry, _glcm_props_from_sums(sums_A, asm_A,
                                                compute_asm)

        _, per_band = jax.lax.scan(one_band, jnp.int32(0),
                                   (b_stack, mn, inv))
        return per_band                                     # (B, 6, K)

    return jax.jit(run)


def sharded_glcm_props_pallas(mesh: Mesh, image: jnp.ndarray,
                              labels: jnp.ndarray, num_segments: int,
                              levels: int = 256, distance: int = 2,
                              angles: Optional[Sequence[float]] = None,
                              compute_asm: bool = True,
                              bands: Optional[Tuple[int, ...]] = None,
                              packed: bool = False,
                              interpret: bool = False):
    """Sharded Pallas GLCM entry (same signature/contract as
    :func:`..parallel.sharded.sharded_glcm_props`): pre-pass for bboxes +
    seam-spanners, host job build, then the cached device program."""
    from .. import telemetry
    from ..ops.glcm import DEFAULT_ANGLES, _check_levels, GLCM_PROP_NAMES

    levels = _check_levels(levels)
    if not jnp.issubdtype(jnp.asarray(image).dtype, jnp.floating):
        image = jnp.asarray(image, jnp.float32)
    angles = tuple(angles) if angles is not None else DEFAULT_ANGLES
    band_ids = (tuple(bands) if bands is not None
                else tuple(range(image.shape[2])))
    K = num_segments
    ty, tx = mesh.devices.shape
    Hp, Wp = labels.shape
    h_loc, w_loc = Hp // ty, Wp // tx

    with telemetry.stage("glcm.prepass"):
        n_multi, multi, mins = _glcm_prepass_factory(mesh, K)(labels)
        n_multi, multi, mins = jax.device_get((n_multi, multi, mins))
        n_multi = int(n_multi)

    # compact seam-spanner ranks (replicated, MCAP sentinel elsewhere);
    # bucket the cap so the compiled program survives per-scene jitter
    mcap = 0 if (n_multi == 0 or not compute_asm) \
        else max(64, -(-n_multi // 64) * 64)
    multi = np.asarray(multi).astype(bool)
    midx = np.cumsum(multi) - 1
    mrank = np.where(multi, midx, max(mcap, 1)).astype(np.int32)

    with telemetry.stage("glcm.jobs"):
        bboxes = _bboxes_from_mins(np.asarray(mins), K)
        meta, rc, hmeta, hrc, hslot, hmask, _ = build_shard_jobs(
            bboxes, multi, mrank, ty, tx, h_loc, w_loc, mcap)
        sh1 = NamedSharding(mesh, P(("ty", "tx")))
        put = lambda a: jax.device_put(a.reshape(-1), sh1)
        rep = NamedSharding(mesh, P())
        args = (put(meta), put(rc), put(hmeta), put(hrc), put(hslot),
                put(hmask), jax.device_put(multi, rep),
                jax.device_put(mrank, rep))

    run = _make_program(mesh, K, levels, distance, angles, band_ids,
                        mcap, meta.shape[1], hmeta.shape[1],
                        compute_asm, interpret)
    out = run(image, labels, *args)                         # (B, 6, K)
    if packed:
        return GLCM_PROP_NAMES, out
    return {name: out[:, i, :].T for i, name in enumerate(GLCM_PROP_NAMES)}
