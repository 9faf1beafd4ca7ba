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


def test_fits_vmem_tangent_aware():
    """The forward-mode kernel holds ~3 extra fields per tangent: the
    golden grid fits the PRIMAL working set in f32 but NOT the 5-tangent
    Jacobian variant (29 fields) — AD callers must gate with
    n_tangents=5 or Mosaic rejects the kernel on hardware."""
    assert fused_do.fits_vmem(GridSpec(m1=100, m2=75), 4)
    assert not fused_do.fits_vmem(GridSpec(m1=100, m2=75), 4, n_tangents=5)
    # the production grid fits even with all five tangents
    assert fused_do.fits_vmem(GridSpec(m1=50, m2=25), 4, n_tangents=5)


def test_use_fused_predicate():
    """Single dispatch predicate: pallas engine + DO scheme + VMEM fit."""
    import dataclasses

    spec = GridSpec(m1=50, m2=25)
    pal = SolverConfig(n_steps=4, solver_engine="pallas")
    assert fused_do.use_fused(spec, pal)
    assert not fused_do.use_fused(spec, dataclasses.replace(pal, scheme="cs"))
    assert not fused_do.use_fused(spec, dataclasses.replace(pal, scheme="mcs"))
    assert not fused_do.use_fused(
        spec, dataclasses.replace(pal, solver_engine="scan"))
    assert not fused_do.use_fused(GridSpec(m1=300, m2=150), pal)


def test_pick_tile_strict_raises_when_oversized():
    """Skipping the fits_vmem gate must fail loudly (strict mode) instead
    of handing Mosaic an oversized kernel; interpret mode (no real VMEM)
    keeps the loose minimum-tile fallback."""
    import pytest

    big = GridSpec(m1=300, m2=150)
    with pytest.raises(ValueError, match="exceeds VMEM"):
        fused_do.pick_tile(big, 128, 4)
    assert fused_do.pick_tile(big, 128, 4, strict=False) == 128
