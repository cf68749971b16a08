"""On-chip isolation probe for the fused-quantise Pallas GLCM mismatch.

Compares, on one 2048^2 single-band scene with grid labels:
  A. scatter path (XLA joint histogram) — the truth for cross-path parity
  B. Pallas kernel, fused quantise (raw f32 band + per-job mn/inv)
  C. Pallas kernel, IDENTITY quantise (band := precomputed q as f32,
     mn=0, inv=1) — quantisation mathematically exact, so any residual
     is the counting/reduction path, not the quantiser
Prints per-prop max-rel for B vs A and C vs A.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import numpy as np  # noqa: E402


def main():
    import jax.numpy as jnp

    from obia_tpu.ops import glcm
    from obia_tpu.ops import glcm_pallas as gp
    from obia_tpu.ops.stats import pad_num_segments

    H = W = 2048
    rng = np.random.default_rng(3)
    block = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    intvals = len(sys.argv) > 2 and sys.argv[2] == "int"
    img = (np.sin(np.mgrid[0:H, 0:W][0] / 37.0)
           + rng.normal(0, 0.3, (H, W))).astype(np.float32)[..., None]
    if intvals:  # uint8-like integer-valued band (floor-boundary heavy)
        lo, hi = img.min(), img.max()
        img = np.floor(255.0 * (img - lo) / (hi - lo)).astype(np.float32)
    lab = (np.arange(H)[:, None] // block * (W // block)
           + np.arange(W)[None, :] // block).astype(np.int32)
    lab = np.roll(lab, (5, 3), (0, 1))  # unalign bboxes from the 8/128 grid
    print(f"block={block} int={intvals} K={lab.max()+1}", flush=True)
    K = int(lab.max()) + 1
    K_pad = pad_num_segments(K)
    image = jnp.asarray(img)
    labels = jnp.asarray(lab)

    q_all = glcm._quantize_bands(image, labels, K_pad, 256, (0,))
    valid_stack = glcm._glcm_valid_stack(labels, 2, glcm.DEFAULT_ANGLES)
    ref = np.asarray(glcm._glcm_from_q_jit(
        q_all, jnp.int32(0), labels, K_pad, 256, 2, glcm.DEFAULT_ANGLES,
        True, valid_stack))[:, :K]

    mins = glcm._bbox_minmax(image, labels, K_pad, (0,))
    bbox_host = np.asarray(mins[:, :4])
    bboxes = np.empty((K_pad, 4), np.int32)
    empty = bbox_host[:K_pad, 0] >= 2e38
    bboxes[:, 0] = np.where(empty, 1, bbox_host[:K_pad, 0])
    bboxes[:, 1] = np.where(empty, 0, -bbox_host[:K_pad, 1])
    bboxes[:, 2] = np.where(empty, 1, bbox_host[:K_pad, 2])
    bboxes[:, 3] = np.where(empty, 0, -bbox_host[:K_pad, 3])
    meta, rc, J = gp.build_jobs(bboxes)
    Hp, Wp = gp.padded_shape(H, W)
    lab_pad = gp.pad_labels(labels, Hp, Wp)
    jobs = (jnp.asarray(meta), jnp.asarray(rc))

    mn = mins[:K_pad, 4]
    inv = glcm.quant_inv(-mins[:K_pad, 5] - mn, 256)

    def props(band_pad, mn_k, inv_k):
        sums_A, asm_A = gp.glcm_pallas_band(
            band_pad, lab_pad, jobs, mn_k, inv_k, K_pad, 2,
            glcm.DEFAULT_ANGLES, valid_hw=(H, W), levels=256)
        return np.asarray(glcm._glcm_props_from_sums(sums_A, asm_A,
                                                     True))[:, :K]

    band_pad = gp.pad_band_f32(image, jnp.int32(0), Hp, Wp)
    out_B = props(band_pad, mn, inv)

    qf = q_all[0].astype(jnp.float32)[..., None]
    qband_pad = gp.pad_band_f32(qf, jnp.int32(0), Hp, Wp)
    out_C = props(qband_pad, jnp.zeros((K_pad,), jnp.float32),
                  jnp.ones((K_pad,), jnp.float32))

    names = glcm.GLCM_PROP_NAMES
    for tag, out in (("B-fused", out_B), ("C-preq", out_C)):
        rels = []
        for i, nme in enumerate(names):
            a, b = out[i], ref[i]
            rel = np.nanmax(np.abs(a - b) / np.maximum(np.abs(b), 1e-9))
            rels.append(f"{nme}={rel:.2e}")
        print(tag, " ".join(rels), flush=True)


if __name__ == "__main__":
    main()
