"""Fused-kernel VMEM capacity guard and automatic XLA fallback."""

import jax.numpy as jnp
import numpy as np

from heston_tpu.config import GridSpec, SolverConfig
from heston_tpu.models import douglas
from heston_tpu.pallas import fused_do


def test_fits_vmem_heuristic():
    assert fused_do.fits_vmem(GridSpec(m1=50, m2=25))
    assert not fused_do.fits_vmem(GridSpec(m1=100, m2=75))


def test_large_grid_falls_back_to_xla(params):
    """engine='pallas' on an oversized grid silently uses the XLA path
    (identical results, works on any backend)."""
    p = params
    spec = GridSpec(m1=100, m2=75)
    ks = jnp.array([95.0, 100.0])
    args = (100.0, p.kappa, p.eta, p.sigma, p.rho, p.v0, p.r_d, p.r_f)
    want = np.array(douglas.price_batch(
        spec, SolverConfig(n_steps=4, a2_variant="central"), ks, *args))
    got = np.array(douglas.price_batch(
        spec, SolverConfig(n_steps=4, a2_variant="central",
                           solver_engine="pallas"), ks, *args))
    np.testing.assert_allclose(got, want, rtol=0, atol=0)
