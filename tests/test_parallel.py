"""Multi-device tests on the virtual 8-device CPU mesh: sharded SLIC
equivalence, distributed moments, cross-shard merge, full sharded train
step (the driver's dryrun path)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from obia_tpu.ops.slic import _grid_shape, _slic_iterate
from obia_tpu.parallel.sharded import (make_mesh, sharded_boundary_merge,
                                       sharded_segment_moments,
                                       sharded_slic_assign)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return make_mesh(8)


def test_mesh_shape(mesh):
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("ty", "tx")


def test_sharded_slic_matches_single_device(mesh, rng):
    H, W, C = 64, 96, 3
    img = jnp.asarray(rng.random((H, W, C)), jnp.float32)
    n_segments = 24
    gh, gw = _grid_shape(H, W, n_segments)
    labels_sharded, centers = sharded_slic_assign(mesh, img, n_segments,
                                                  compactness=10.0,
                                                  max_num_iter=5)
    labels_single = _slic_iterate(img, jnp.ones((H, W), bool), gh, gw,
                                  10.0, 5)
    np.testing.assert_array_equal(np.asarray(labels_sharded),
                                  np.asarray(labels_single))


def test_sharded_moments(mesh, rng):
    H, W, C = 32, 48, 2
    img = jnp.asarray(rng.random((H, W, C)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 10, (H, W)), jnp.int32)
    cnt, mean, var = sharded_segment_moments(mesh, img, labels, 10)
    img_np, lab_np = np.asarray(img), np.asarray(labels)
    for s in range(10):
        m = lab_np == s
        if not m.any():
            continue
        np.testing.assert_allclose(np.asarray(cnt)[s, 0], m.sum(), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(mean)[s, 0],
                                   img_np[:, :, 0][m].mean(), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(var)[s, 0],
                                   img_np[:, :, 0][m].var(), rtol=1e-4,
                                   atol=1e-6)


def test_sharded_boundary_merge(mesh):
    # one SLIC cluster spanning all shards, but per-shard components are
    # uniquely numbered -> merge should unify them
    H, W = 16, 32  # shards of 8x8 on a 2x4 mesh
    ty, tx = mesh.devices.shape
    cluster = jnp.zeros((H, W), jnp.int32)  # single superpixel everywhere
    comp = np.zeros((H, W), np.int32)
    h_loc, w_loc = H // ty, W // tx
    cid = 0
    for iy in range(ty):
        for ix in range(tx):
            comp[iy * h_loc:(iy + 1) * h_loc,
                 ix * w_loc:(ix + 1) * w_loc] = cid
            cid += 1
    lut = sharded_boundary_merge(mesh, jnp.asarray(comp), cluster)
    assert (lut == 0).all()  # everything merges to root 0


def test_dryrun_multichip_entry():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)  # must not raise


def test_flagship_entry_compiles():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    logits, labels = jax.jit(fn)(*args)
    assert logits.shape[1] == 8
    assert labels.shape == (512, 512)


def test_distributed_helpers():
    from obia_tpu.parallel.distributed import (initialize, is_coordinator,
                                               process_info)
    initialize()  # single-process no-op
    info = process_info()
    assert info["process_count"] == 1 and is_coordinator()
    assert info["global_devices"] >= 8
