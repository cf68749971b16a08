"""Micro-benchmark of the Pallas GLCM jobs kernel alone (one band).

Times `_glcm_jobs_call` warm on a synthetic scene whose object/bbox
statistics mirror the north-star regime (K compact objects of side
~sqrt(2N/K)), isolating kernel-time-per-job from the pipeline. Use to
compare kernel variants (e.g. row-skip on/off) and to anchor the
roofline numbers in BASELINE.md.

Usage: python tools/bench_glcm_kernel.py [size] [K]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import numpy as np  # noqa: E402


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 3000
    import jax
    import jax.numpy as jnp

    from obia_tpu.ops import glcm
    from obia_tpu.ops import glcm_pallas as gp
    from obia_tpu.ops.stats import pad_num_segments

    H = W = size
    rng = np.random.default_rng(0)
    # Voronoi-ish compact objects: nearest of K jittered grid seeds
    g = int(np.sqrt(K))
    ys = (np.arange(g) + 0.5) * (H / g)
    xs = (np.arange(g) + 0.5) * (W / g)
    seeds = np.stack(np.meshgrid(ys, xs, indexing="ij"), -1).reshape(-1, 2)
    seeds += rng.normal(0, H / g / 4, seeds.shape)
    yy, xx = np.mgrid[0:H, 0:W]
    cell_y = np.clip((yy / (H / g)).astype(int), 0, g - 1)
    cell_x = np.clip((xx / (W / g)).astype(int), 0, g - 1)
    lab = (cell_y * g + cell_x).astype(np.int32)
    Kr = g * g
    K_pad = pad_num_segments(Kr)
    img = rng.integers(0, 256, (H, W, 1)).astype(np.float32)
    image = jnp.asarray(img)
    labels = jnp.asarray(lab)

    mins = glcm._bbox_minmax(image, labels, K_pad, (0,))
    bh = np.asarray(mins[:, :4])
    bb = np.empty((K_pad, 4), np.int32)
    empty = bh[:K_pad, 0] >= 2e38
    bb[:, 0] = np.where(empty, 1, bh[:K_pad, 0])
    bb[:, 1] = np.where(empty, 0, -bh[:K_pad, 1])
    bb[:, 2] = np.where(empty, 1, bh[:K_pad, 2])
    bb[:, 3] = np.where(empty, 0, -bh[:K_pad, 3])
    meta, rc, J = gp.build_jobs(bb)
    nrows_tot = int(((rc[:J] % gp._RC_R_SHIFT) % gp._RC_C_SHIFT + 1).sum())
    Hp, Wp = gp.padded_shape(H, W)
    lab_pad = gp.pad_labels(labels, Hp, Wp)
    band_pad = gp.pad_band_f32(image, jnp.int32(0), Hp, Wp)
    mn = mins[:K_pad, 4]
    inv = glcm.quant_inv(-mins[:K_pad, 5] - mn, 256)
    offs = glcm.angle_offsets(2, glcm.DEFAULT_ANGLES)
    mnj, invj = gp.job_min_inv(jnp.asarray(meta), mn, inv, K_pad)

    def run():
        out = gp._glcm_jobs_call(
            jnp.asarray(meta), jnp.asarray(rc), mnj, invj, lab_pad,
            band_pad, num_jobs=int(meta.shape[0]), n_angles=len(offs),
            offsets=offs, valid_hw=(H, W), levels=256)
        return jax.block_until_ready(out)

    t0 = time.time()
    run()
    first = time.time() - t0
    best = np.inf
    for _ in range(4):
        t0 = time.time()
        run()
        best = min(best, time.time() - t0)
    # per row-matmul: X (256, TC=128) contracted with Y (A*256, 128)
    # -> 256 * (A*256) * 128 int8 MACs; row-groups of _ROWGRP mean the
    # executed rows round up to the group size per job
    grp = gp._ROWGRP
    rows_exec = int((( (rc[:J] % gp._RC_R_SHIFT) % gp._RC_C_SHIFT + grp)
                     // grp * grp).sum())
    macs = rows_exec * 256 * (len(offs) * 256) * 128
    print(f"size={size} K={Kr} jobs={J} bucket={meta.shape[0]} "
          f"rows={nrows_tot} first={first:.1f}s warm={best * 1000:.0f}ms "
          f"tops={2 * macs / best / 1e12:.0f} "
          f"us_per_job={best / max(J, 1) * 1e6:.1f}")


if __name__ == "__main__":
    main()
