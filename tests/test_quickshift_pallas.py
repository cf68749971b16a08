"""Quickshift Pallas kernels: interpret-mode parity vs the XLA core.

The VMEM-resident window-scan kernels (ops/quickshift_pallas.py) must
reproduce the XLA chunk-scan core (ops/quickshift.py `_quickshift_core`)
— same density (to float-accumulation-order tolerance), same parent
links and tie-breaks (strict-< updates in identical row-major offset
order), same roots. Runs in Pallas interpret mode so CI (CPU) covers the
kernel logic; the on-chip measurement lives in BASELINE.md.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from obia_tpu.ops import quickshift as qs
from obia_tpu.ops import quickshift_pallas as qsp


@pytest.mark.skipif(not qsp.pallas_available(), reason="pallas unavailable")
@pytest.mark.parametrize("shape,k,md", [
    ((64, 48, 3), 2.0, 4.0),     # multi-block in neither dim
    ((70, 300, 3), 1.0, 3.0),    # multi-block in W, ragged edges
    ((96, 80, 1), 2.0, 6.0),     # single channel
])
def test_interpret_parity_vs_xla_core(shape, k, md):
    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.random(shape), jnp.float32)
    H, W, _ = shape
    noise = qs._tie_noise(42, (H, W))
    r = max(1, int(np.ceil(3 * k)))

    root_x, rho_x, par_x, dist_x = qs._quickshift_core(
        img, noise, k, md, 1.0, r, r)
    root_p, rho_p, par_p, dist_p = qsp.quickshift_core_pallas(
        img, noise, k, md, 1.0, r, interpret=True)

    rho_x = np.asarray(rho_x)
    rho_p = np.asarray(rho_p)
    np.testing.assert_allclose(rho_p, rho_x, rtol=1e-5)

    # parent/root ties can flip only where summation order changes the
    # density comparison; on random data that is measure-zero — require
    # near-total agreement and identical finite-distance structure
    par_agree = (np.asarray(par_x) == np.asarray(par_p)).mean()
    root_agree = (np.asarray(root_x) == np.asarray(root_p)).mean()
    assert par_agree >= 0.995, par_agree
    assert root_agree >= 0.995, root_agree
    d_x = np.asarray(dist_x)
    d_p = np.asarray(dist_p)
    same = np.asarray(par_x) == np.asarray(par_p)
    assert (np.isfinite(d_x) == np.isfinite(d_p))[same].all()
    both = np.isfinite(d_x) & np.isfinite(d_p) & same
    np.testing.assert_allclose(d_p[both], d_x[both], rtol=1e-5, atol=1e-6)


@pytest.mark.skipif(not qsp.pallas_available(), reason="pallas unavailable")
def test_interpret_parity_uniform_plateau():
    """Constant image: every pixel density is identical pre-noise, so
    parents are decided purely by the tie noise — the regime where
    accumulation-order differences would surface if the noise did not
    dominate them (noise 1e-5 vs identical sums)."""
    img = jnp.ones((64, 64, 3), jnp.float32) * 0.5
    noise = qs._tie_noise(3, (64, 64))
    r = 6
    root_x, _, par_x, _ = qs._quickshift_core(img, noise, 2.0, 5.0, 1.0,
                                              r, r)
    root_p, _, par_p, _ = qsp.quickshift_core_pallas(
        img, noise, 2.0, 5.0, 1.0, r, interpret=True)
    assert (np.asarray(par_x) == np.asarray(par_p)).mean() >= 0.995
    assert (np.asarray(root_x) == np.asarray(root_p)).mean() >= 0.995


def test_gate_respects_env(monkeypatch):
    monkeypatch.setenv("OBIA_QS_PALLAS", "0")
    assert not qsp.use_pallas_quickshift(1 << 24)
    monkeypatch.setenv("OBIA_QS_PALLAS", "1")
    assert qsp.use_pallas_quickshift(16) == qsp.pallas_available()
