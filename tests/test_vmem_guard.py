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
    """Single dispatch predicate: pallas engine + DO/CS/MCS scheme +
    VMEM fit — forward-mode tangents included for all three schemes,
    with the CS/MCS correctors' extra live fields (primal AND the
    tangent phase's z2p/z1c) counted against the budget."""
    import dataclasses

    spec = GridSpec(m1=50, m2=25)
    pal = SolverConfig(n_steps=4, solver_engine="pallas")
    cs = dataclasses.replace(pal, scheme="cs")
    assert fused_do.use_fused(spec, pal)
    assert fused_do.use_fused(spec, cs)
    # CS forward mode is dispatchable where its larger working set fits
    # (production grid in the test dtype) ...
    assert fused_do.use_fused(spec, cs, n_tangents=5)
    mcs = dataclasses.replace(pal, scheme="mcs")
    assert fused_do.use_fused(spec, mcs)
    assert fused_do.use_fused(spec, mcs, n_tangents=5)
    # ... and correctly gated out where it does not: a grid in the
    # window that fits the 4-tangent DO Jacobian in f32 but NOT the CS
    # one (27 fields = 62.8 MiB <= 64 < 31 fields = 72.1 MiB)
    window = GridSpec(m1=70, m2=63)
    assert fused_do.fits_vmem(window, 4, n_tangents=4)
    assert not fused_do.fits_vmem(
        window, 4, n_tangents=4,
        extra_fields=fused_do._scheme_tangent_extra_fields("cs", 4))
    assert not fused_do.use_fused(
        spec, dataclasses.replace(pal, solver_engine="scan"))
    assert not fused_do.use_fused(GridSpec(m1=300, m2=150), pal)
    assert not fused_do.use_fused(GridSpec(m1=300, m2=150), cs)


def test_pick_tile_strict_raises_when_oversized():
    """Skipping the fits_vmem gate must fail loudly (strict mode) instead
    of handing Mosaic an oversized kernel; interpret mode (no real VMEM)
    keeps the loose minimum-tile fallback."""
    import pytest

    big = GridSpec(m1=300, m2=150)
    with pytest.raises(ValueError, match="exceeds VMEM"):
        fused_do.pick_tile(big, 128, 4)
    assert fused_do.pick_tile(big, 128, 4, strict=False) == 128


def test_vmem_capacity_model_boundaries():
    """The budget scales with the chip's physical VMEM (budget =
    physical/2): pick_tile/fits_vmem must flip EXACTLY where the model
    says, for the measured v5e parameters and for a second chip's.
    Uses the explicit vmem_physical override so the test is deterministic
    on any backend."""
    v5e = 128 * 1024 * 1024
    v3 = 16 * 1024 * 1024
    spec = GridSpec(m1=50, m2=25)          # field = 51*32*128*4 bytes/tile128
    field128 = fused_do._field_bytes(spec, 128, 4)
    n_fields = fused_do._FIELDS_RESIDENT

    # v5e: production grid fits at wide tiles; exact flip when the
    # budget crosses n_fields * field(tile). The preference order caps
    # at 256 lanes (measured optimum on v5e, see pick_tile docstring).
    for tile in (256, 128):
        need = n_fields * fused_do._field_bytes(spec, tile, 4)
        if need <= v5e // 2:
            assert fused_do.pick_tile(spec, 2048, 4,
                                      vmem_physical=v5e) >= tile
            break
    # shrink physical until even the minimum tile fails: flip point is
    # 2 * n_fields * field128 exactly
    phys_edge = 2 * n_fields * field128
    assert fused_do.fits_vmem(spec, 4, vmem_physical=phys_edge)
    assert not fused_do.fits_vmem(spec, 4, vmem_physical=phys_edge - 2)

    # v3-class chip (16 MiB VMEM): production grid still fits the primal
    # (needs ~11.2 MiB > 8 MiB budget? compute, don't guess)
    fits_v3 = n_fields * field128 <= v3 // 2
    assert fused_do.fits_vmem(spec, 4, vmem_physical=v3) == fits_v3
    # the golden grid must NOT fit a v3-class budget
    assert not fused_do.fits_vmem(GridSpec(m1=100, m2=75), 4,
                                  vmem_physical=v3)


def test_vmem_budget_device_derivation():
    """On CPU backends the device-kind lookup falls back to the v5e-class
    default, keeping the gate identical to the measured constants."""
    assert fused_do._vmem_budget_bytes() == 64 * 1024 * 1024
    assert fused_do._vmem_limit_bytes() == 100 * 1024 * 1024


def test_exercise_tangent_extra_fields_model():
    """Per-tangent remap/floor temporaries for American/dividend
    forward-mode kernels (calibrated from the 2026-08-20 real-v5e
    compile failure: the amer+div ladder Jacobian at tile 256 needed
    108.8 MiB scoped VMEM against the old model's 45 MiB -> the model
    must size that config down to tile 128, which fits)."""
    from heston_tpu.config import GOLDEN_DIVIDENDS

    # no tangents or no exercise features -> no extra fields
    assert fused_do._exercise_tangent_extra_fields(0, True,
                                                   GOLDEN_DIVIDENDS) == 0
    assert fused_do._exercise_tangent_extra_fields(4, False, None) == 0
    # 4 tangents, American + 4 events -> (3+4)*4 = 28
    assert fused_do._exercise_tangent_extra_fields(
        4, True, GOLDEN_DIVIDENDS) == 28

    # f32-only: the calibration was measured at the production on-chip
    # dtype; f64 interpret/test paths keep the historical model
    assert fused_do._exercise_tangent_extra_fields(
        4, True, GOLDEN_DIVIDENDS, dtype_bytes=8) == 0

    spec = GridSpec(m1=50, m2=25)
    extra = fused_do._exercise_tangent_extra_fields(4, True,
                                                    GOLDEN_DIVIDENDS)
    # the failing config now sizes to the 128-lane tile (fits on-chip,
    # verified by a real-v5e compile after the fix); the plain Jacobian
    # keeps its wider tile
    assert fused_do.pick_tile(spec, 200, 4, 4, extra_fields=extra) == 128
    assert fused_do.pick_tile(spec, 200, 4, 4) == 256
    # the f32 model still admits the production grid at tile 128...
    assert fused_do.fits_vmem(spec, 4, n_tangents=4, extra_fields=extra)
    # ...but gates OFF the golden grid, where even tile 128 cannot hold
    # the amer+div tangent working set
    assert not fused_do.fits_vmem(GridSpec(m1=100, m2=75), 4,
                                  n_tangents=4, extra_fields=extra)
