"""Pallas kernels vs the XLA reference path (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp
import pytest

from obia_tpu.ops.pallas.slic_kernel import pallas_slic_assign
from obia_tpu.ops.slic import initial_centers, slic_assign_block


def test_pallas_assign_matches_xla(rng):
    H, W, C = 32, 256, 3
    gh, gw = 4, 8
    img = jnp.asarray(rng.random((H, W, C)), jnp.float32)
    centers = initial_centers(img, gh, gw)
    ratio = (10.0 / np.sqrt(H * W / (gh * gw))) ** 2

    want = slic_assign_block(img, jnp.ones((H, W), bool), centers,
                             0.0, 0.0, gh, gw, H, W, ratio)
    got = pallas_slic_assign(img, centers, gh, gw, H, W, float(ratio),
                             interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pallas_assign_multiband(rng):
    H, W, C = 16, 128, 5
    gh, gw = 2, 4
    img = jnp.asarray(rng.random((H, W, C)), jnp.float32)
    centers = initial_centers(img, gh, gw)
    ratio = 0.01
    want = slic_assign_block(img, jnp.ones((H, W), bool), centers,
                             0.0, 0.0, gh, gw, H, W, ratio)
    got = pallas_slic_assign(img, centers, gh, gw, H, W, ratio,
                             interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
