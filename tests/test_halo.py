"""Halo exchange + distributed CCL on the 8-device CPU mesh."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from obia_tpu.parallel.halo import exchange_halo_cols, exchange_halo_rows
from obia_tpu.parallel.sharded import make_mesh


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)  # 2 x 4


def test_exchange_halo_rows(mesh):
    ty, tx = mesh.devices.shape
    H, W = 8 * ty, 4 * tx

    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(P("ty", "tx"),),
                       out_specs=(P("ty", "tx"), P("ty", "tx")))
    def run(x):
        prev, nxt = exchange_halo_rows(x, "ty")
        # broadcast strips to the local block shape for inspection
        return (jnp.broadcast_to(prev, x.shape),
                jnp.broadcast_to(nxt, x.shape))

    x = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W)
    prev, nxt = run(x)
    prev, nxt = np.asarray(prev), np.asarray(nxt)
    h_loc = H // ty
    # shard row 1 receives shard row 0's LAST row
    np.testing.assert_array_equal(prev[h_loc], np.asarray(x)[h_loc - 1])
    # shard row 0 receives shard row 1's FIRST row
    np.testing.assert_array_equal(nxt[0], np.asarray(x)[h_loc])
