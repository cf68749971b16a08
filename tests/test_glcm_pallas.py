"""Pallas MXU GLCM kernel: job-table invariants + interpret-mode parity.

The compiled kernel is exercised on real TPU hardware by the bench; here
the job builder's invariants are checked on host and the kernel itself
runs in Pallas interpret mode on a tiny scene against the XLA scatter
path (reference semantics: segment_statistics.py:262-296)."""
import numpy as np
import pytest
import jax.numpy as jnp

from obia_tpu.ops import glcm
from obia_tpu.ops import glcm_pallas as gp
from obia_tpu.ops.stats import pad_num_segments


def _grid_labels(H, W, block):
    lab = (np.arange(H)[:, None] // block * (W // block)
           + np.arange(W)[None, :] // block)
    return lab.astype(np.int32)


def test_build_jobs_invariants():
    rng = np.random.default_rng(7)
    K = 40
    boxes = np.empty((K, 4), np.int32)
    for k in range(K):
        r0 = rng.integers(0, 900)
        c0 = rng.integers(0, 900)
        boxes[k] = [r0, r0 + rng.integers(0, 400),
                    c0, c0 + rng.integers(0, 400)]
    boxes[5] = [1, 0, 1, 0]  # empty segment: rmin > rmax
    meta, rc, J = gp.build_jobs(boxes)
    assert meta.shape == rc.shape and meta.shape[0] >= J
    seg = meta[:J] // gp._META_SEG
    first = (meta[:J] // 4) % 2
    last = (meta[:J] // 2) % 2
    valid = meta[:J] % 2
    assert (valid == 1).all()
    assert (meta[J:] % 2 == 0).all()          # padding is invalid
    # jobs of one segment are consecutive; exactly one first/last each
    changes = np.flatnonzero(np.diff(seg)) + 1
    starts = np.concatenate([[0], changes])
    ends = np.concatenate([changes - 1, [J - 1]])
    assert len(np.unique(seg)) == len(starts)
    assert (first[starts] == 1).all() and (last[ends] == 1).all()
    assert first.sum() == len(starts) and last.sum() == len(starts)
    # window row spans exactly cover the bbox rows (8-aligned anchored
    # origins, per-job valid row counts); column tiles cover the bbox
    r0 = rc[:J] // gp._RC_R_SHIFT * 8
    rest = rc[:J] % gp._RC_R_SHIFT
    tj = rest // gp._RC_C_SHIFT
    nrows = rest % gp._RC_C_SHIFT + 1
    assert (r0 % 8 == 0).all() and (1 <= nrows).all() and (nrows <= gp.TR).all()
    for k in np.unique(seg):
        m = seg == k
        rmin, rmax, cmin, cmax = boxes[k]
        assert rmin <= rmax
        # every bbox row is inside some job's [r0, r0 + nrows) span, and
        # no span extends below the bbox
        covered = np.zeros(rmax + 2, bool)
        for a, n in zip(r0[m], nrows[m]):
            assert a <= rmax and a + n - 1 <= rmax
            covered[a:a + n] = True
        assert covered[rmin:rmax + 1].all()
        assert set(tj[m].tolist()) == set(
            range(cmin // gp.TC, cmax // gp.TC + 1))
    assert 5 not in seg  # empty segment emits no jobs


def test_segment_bboxes():
    lab = np.full((70, 90), -1, np.int32)
    lab[3:9, 10:40] = 0
    lab[50:70, 0:5] = 2  # label 1 is empty
    boxes = gp.segment_bboxes(jnp.asarray(lab), 3)
    assert boxes[0].tolist() == [3, 8, 10, 39]
    assert boxes[1, 0] > boxes[1, 1]
    assert boxes[2].tolist() == [50, 69, 0, 4]


@pytest.mark.slow
def test_pallas_kernel_interpret_parity():
    """Interpret-mode kernel vs the XLA scatter path on one 128x128
    scene: identical quantised input, per-prop tolerance equality."""
    rng = np.random.default_rng(0)
    H = W = 128
    img = rng.integers(0, 256, (H, W, 1)).astype(np.float32)
    lab = _grid_labels(H, W, 32)  # 16 compact segments in one tile
    lab[:2, :2] = -1
    K = int(lab.max()) + 1
    K_pad = pad_num_segments(K)
    image = jnp.asarray(img)
    labels = jnp.asarray(lab)

    # scatter-path truth via the shared quantiser
    q_all = glcm._quantize_bands(image, labels, K_pad, 256, (0,))
    valid_stack = glcm._glcm_valid_stack(labels, 2, glcm.DEFAULT_ANGLES)
    ref = np.asarray(glcm._glcm_from_q_jit(
        q_all, jnp.int32(0), labels, K_pad, 256, 2, glcm.DEFAULT_ANGLES,
        True, valid_stack))[:, :K]

    boxes = gp.segment_bboxes(labels, K_pad)
    meta, rc, J = gp.build_jobs(boxes)
    meta, rc = meta[:J], rc[:J]  # tiny grid: no bucket padding needed
    Hp, Wp = gp.padded_shape(H, W)
    lab_pad = gp.pad_labels(labels, Hp, Wp)
    # quantisation bounds from the fused pre-pass (the kernel quantises
    # in-window; levels must match the scatter path's q_all bitwise)
    mins = glcm._bbox_minmax(image, labels, K_pad, (0,))
    mn = mins[:K_pad, 4]
    inv = glcm.quant_inv(-mins[:K_pad, 5] - mn, 256)
    band_pad = gp.pad_band_f32(image, jnp.int32(0), Hp, Wp)
    sums_A, asm_A = gp.glcm_pallas_band(
        band_pad, lab_pad, (jnp.asarray(meta), jnp.asarray(rc)),
        mn, inv, K_pad, 2, glcm.DEFAULT_ANGLES, valid_hw=(H, W),
        levels=256, interpret=True)
    out = np.asarray(glcm._glcm_props_from_sums(sums_A, asm_A, True))[:, :K]
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=1e-5)
