"""Fused-kernel VMEM capacity guard and automatic XLA fallback."""

import jax.numpy as jnp
import numpy as np

from heston_tpu.config import GridSpec, SolverConfig
from heston_tpu.models import douglas
from heston_tpu.pallas import fused_do


def test_fits_vmem_heuristic():
    # both reference grids run in the fused kernel (verified on v5e)
    assert fused_do.fits_vmem(GridSpec(m1=50, m2=25))
    assert fused_do.fits_vmem(GridSpec(m1=100, m2=75))
    # the m1=300 convergence-study grid does not
    assert not fused_do.fits_vmem(GridSpec(m1=300, m2=150))


def test_large_grid_falls_back_to_xla(params):
    """engine='pallas' on an oversized grid silently uses the XLA path
    (identical results, works on any backend)."""
    p = params
    spec = GridSpec(m1=260, m2=40)
    ks = jnp.array([95.0, 100.0])
    args = (100.0, p.kappa, p.eta, p.sigma, p.rho, p.v0, p.r_d, p.r_f)
    assert not fused_do.fits_vmem(spec)
    want = np.array(douglas.price_batch(
        spec, SolverConfig(n_steps=4, a2_variant="central"), ks, *args))
    got = np.array(douglas.price_batch(
        spec, SolverConfig(n_steps=4, a2_variant="central",
                           solver_engine="pallas"), ks, *args))
    np.testing.assert_allclose(got, want, rtol=0, atol=0)
