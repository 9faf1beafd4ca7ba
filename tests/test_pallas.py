"""Fused Pallas kernel correctness (interpret mode on CPU).

The real-TPU timing/cross-check runs in bench.py; here the kernel logic is
verified against the XLA path in interpret mode on a small configuration.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heston_tpu.config import GOLDEN_DIVIDENDS, GridSpec, SolverConfig
from heston_tpu.models import douglas
from heston_tpu.pallas import fused_do

SPEC = GridSpec(m1=10, m2=8)
SOLVER = SolverConfig(n_steps=4, a2_variant="upwind")


@pytest.mark.parametrize("kw", [
    dict(),
    dict(american=True),
    dict(american=True, dividends=GOLDEN_DIVIDENDS),
])
def test_fused_kernel_matches_xla(params, kw):
    p = params
    ks = jnp.linspace(80.0, 120.0, 6, dtype=jnp.float32)
    args32 = tuple(jnp.float32(a) for a in (
        100.0, p.kappa, p.eta, p.sigma, p.rho, p.v0, p.r_d, p.r_f))
    want = np.array(douglas.price_batch(SPEC, SOLVER, ks, *args32, **kw))
    got = np.array(jax.jit(
        lambda k: fused_do.fused_price_batch(
            SPEC, SOLVER, k, 100.0, p.kappa, p.eta, p.sigma, p.rho, p.v0,
            p.r_d, p.r_f, interpret=True, **kw))(ks))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-4)


@pytest.mark.slow
def test_fused_kernel_golden_grid(params):
    """Fused-vs-XLA equality at the reference's golden grid m1=100, m2=75
    (ref: src/solver.cpp:348) — the config that previously fell back to
    XLA for VMEM and now runs fused on-chip. Few steps: interpret mode."""
    p = params
    spec = GridSpec(m1=100, m2=75)
    solver = SolverConfig(n_steps=3, a2_variant="central")
    ks = jnp.array([95.0, 100.0, 105.0], dtype=jnp.float64)
    args = tuple(jnp.float64(a) for a in (
        100.0, p.kappa, p.eta, p.sigma, p.rho, p.v0, p.r_d, p.r_f))
    assert fused_do.fits_vmem(spec)
    want = np.array(douglas.price_batch(spec, solver, ks, *args))
    got = np.array(jax.jit(
        lambda k: fused_do.fused_price_batch(
            spec, solver, k, *args, interpret=True))(ks))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-11)


def test_fused_kernel_multi_tile(params):
    """Batch spanning several pallas-grid tiles (the single-launch path
    iterates TILE-blocks via the grid). f64 must match the XLA path to
    solver-roundoff exactly; interpret mode on CPU."""
    p = params
    kw = dict(american=True, dividends=GOLDEN_DIVIDENDS)
    ks = jnp.linspace(70.0, 130.0, 300, dtype=jnp.float64)  # 3 tiles
    args = tuple(jnp.float64(a) for a in (
        100.0, p.kappa, p.eta, p.sigma, p.rho, p.v0, p.r_d, p.r_f))
    want = np.array(douglas.price_batch(SPEC, SOLVER, ks, *args, **kw))
    got = np.array(jax.jit(
        lambda k: fused_do.fused_price_batch(
            SPEC, SOLVER, k, *args, interpret=True, **kw))(ks))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-11)


@pytest.mark.parametrize("kw", [
    dict(),
    dict(american=True),
    dict(american=True, dividends=GOLDEN_DIVIDENDS),
])
def test_fused_theta_jacobian_matches_xla_ad(params, kw):
    """Forward-mode AD THROUGH the fused kernel == jax.jacfwd through the
    XLA path, in f64 (v0_mode="ad": the kernel carries all 5 tangent
    surfaces through the time loop, including the grid-motion v0
    direction; solves reuse the primal factorization via
    dx = T^-1 (dr - dT x)). Covers American LCP tangents (maximum-JVP
    tie handling) and the linear dividend re-map of tangents."""
    p = params
    tv = jnp.array([p.kappa, p.eta, p.sigma, p.rho, p.v0],
                   dtype=jnp.float64)
    ks = jnp.linspace(85.0, 115.0, 6, dtype=jnp.float64)

    def price_xla(t):
        def one(k):
            return douglas.price_option(
                SPEC, SOLVER, k, 100.0, t[0], t[1], t[2], t[3], t[4],
                p.r_d, p.r_f, **kw)
        return jax.vmap(one)(ks)

    want_base = np.array(price_xla(tv))
    want_jac = np.array(jax.jacfwd(price_xla)(tv))
    base, jac = jax.jit(lambda t: fused_do.fused_theta_jacobian(
        SPEC, SOLVER, ks, 100.0, t, p.r_d, p.r_f, interpret=True,
        v0_mode="ad", **kw))(tv)
    np.testing.assert_allclose(np.array(base), want_base, rtol=0, atol=1e-11)
    np.testing.assert_allclose(np.array(jac), want_jac, rtol=0, atol=1e-9)


@pytest.mark.parametrize("scheme", ["cs", "mcs", "hv"])
@pytest.mark.parametrize("kw", [dict(), dict(american=True)])
def test_fused_theta_jacobian_cs_mcs_matches_xla_ad(params, scheme, kw):
    """Forward-mode AD through the fused CRAIG-SNEYD / modified-CS /
    Hundsdorfer-Verwer kernels == jax.jacfwd through the XLA steppers
    of the same scheme in f64: the corrector tangent re-runs both
    staged tangent solves against the corrector's primal increments
    (z1c, final z2 — w2c for HV) with the dA0(z2p)/dL(z2p) product-rule
    terms (ref: src/solver.hpp:678-778 is the primal CS corrector being
    differentiated; HV is a framework extension)."""
    import dataclasses

    p = params
    sol = dataclasses.replace(SOLVER, scheme=scheme)
    tv = jnp.array([p.kappa, p.eta, p.sigma, p.rho, p.v0],
                   dtype=jnp.float64)
    ks = jnp.linspace(85.0, 115.0, 5, dtype=jnp.float64)

    def price_xla(t):
        def one(k):
            return douglas.price_option(
                SPEC, sol, k, 100.0, t[0], t[1], t[2], t[3], t[4],
                p.r_d, p.r_f, **kw)
        return jax.vmap(one)(ks)

    want_base = np.array(price_xla(tv))
    want_jac = np.array(jax.jacfwd(price_xla)(tv))
    base, jac = jax.jit(lambda t: fused_do.fused_theta_jacobian(
        SPEC, sol, ks, 100.0, t, p.r_d, p.r_f, interpret=True,
        v0_mode="ad", **kw))(tv)
    np.testing.assert_allclose(np.array(base), want_base, rtol=0,
                               atol=1e-11)
    np.testing.assert_allclose(np.array(jac), want_jac, rtol=0, atol=1e-9)


@pytest.mark.parametrize("kw", [
    dict(),
    dict(american=True),
    dict(american=True, dividends=GOLDEN_DIVIDENDS),
])
def test_fused_theta_jacobian_stencil_matches_xla_stencil(params, kw):
    """Default v0_mode="stencil" (4 kernel tangents + the surface
    v-stencil v0 column) == the XLA-engine stencil formulation
    (calibration.jacobian_and_prices_ad) in f64 — the production
    formulation is engine-independent."""
    import dataclasses

    from heston_tpu.models import calibration as calib

    p = params
    tv = jnp.array([p.kappa, p.eta, p.sigma, p.rho, p.v0],
                   dtype=jnp.float64)
    ks = jnp.linspace(85.0, 115.0, 6, dtype=jnp.float64)
    scan = dataclasses.replace(SOLVER, solver_engine="scan")
    want_jac, want_base = calib.jacobian_and_prices_ad(
        SPEC, scan, ks, 100.0, tv, p.r_d, p.r_f, **kw)
    base, jac = jax.jit(lambda t: fused_do.fused_theta_jacobian(
        SPEC, SOLVER, ks, 100.0, t, p.r_d, p.r_f, interpret=True, **kw))(tv)
    np.testing.assert_allclose(np.array(base), np.array(want_base),
                               rtol=0, atol=1e-11)
    np.testing.assert_allclose(np.array(jac), np.array(want_jac),
                               rtol=0, atol=1e-9)


def test_v0_stencil_consistent_with_grid_motion_ad(params):
    """The two dP/dv0 estimators — surface v-stencil vs AD through the
    grid motion — agree to the O(h^2) discretization difference in f64
    (measured 2.5e-3 normalized on the reference grid; they are NOT the
    same discrete quantity, which is why the strict equality tests pin
    each formulation against its own counterpart). Runs on the REFERENCE
    grid — on the deliberately tiny SPEC the O(h^2) gap is O(1)."""
    from heston_tpu.models import calibration as calib

    p = params
    spec = GridSpec(m1=50, m2=25)
    scan = SolverConfig(n_steps=20, theta=0.8, maturity=1.0,
                        a2_variant="upwind", solver_engine="scan")
    tv = jnp.array([p.kappa, p.eta, p.sigma, p.rho, p.v0],
                   dtype=jnp.float64)
    ks = jnp.linspace(85.0, 115.0, 6, dtype=jnp.float64)
    jac_st, _ = calib.jacobian_and_prices_ad(
        spec, scan, ks, 100.0, tv, p.r_d, p.r_f, v0_mode="stencil")
    jac_ad, _ = calib.jacobian_and_prices_ad(
        spec, scan, ks, 100.0, tv, p.r_d, p.r_f, v0_mode="ad")
    a, b = np.array(jac_st)[:, 4], np.array(jac_ad)[:, 4]
    rel = np.abs(a - b) / np.maximum(1.0, np.abs(b))
    assert rel.max() < 2e-2, rel
    # the other four columns are the SAME formulation in both modes
    np.testing.assert_allclose(np.array(jac_st)[:, :4],
                               np.array(jac_ad)[:, :4], rtol=0, atol=1e-9)


def test_calibrate_device_pallas_engine_matches_scan(params):
    """The fully on-chip LM with solver_engine='pallas' (fused AD Jacobian
    + fused trial pricing) reproduces the scan-engine run to roundoff —
    the flagship calibration path now exercises the Pallas kernel for
    both the Jacobian fleet and the trial solves."""
    import dataclasses

    from heston_tpu.config import CalibrationConfig
    from heston_tpu.models import bs, calibration as calib

    p = params
    spec = GridSpec(m1=12, m2=8)
    strikes = jnp.linspace(85.0, 115.0, 8)
    market = bs.generate_market_data(100.0, 1.0, p.r_d, strikes)
    init = jnp.array([1.2, 0.05, 0.4, -0.5, 0.05])
    cfg = CalibrationConfig(max_iter=6, tol=1e-10, jacobian_mode="ad")
    res = {}
    for eng in ("scan", "pallas"):
        solver = SolverConfig(n_steps=6, a2_variant="upwind",
                              solver_engine=eng)
        tv, info = calib.calibrate_device(
            spec, solver, strikes, market, 100.0, init, p.r_d, p.r_f,
            cfg=cfg, american=True)
        res[eng] = np.asarray(tv)
    # rtol absorbs roundoff-order differences between the fused-kernel
    # and scan-engine Jacobians amplified through the LM iterations
    np.testing.assert_allclose(res["pallas"], res["scan"], rtol=1e-9,
                               atol=1e-10)


@pytest.mark.parametrize("american", [False, True])
def test_per_lane_steps_match_per_group_launches(params, american):
    """One-launch mixed-maturity pricing (per-lane step counts) is
    BITWISE-equal to pricing each maturity group in its own launch:
    a frozen lane performs identical arithmetic up to its own n_i and
    none after (ref packs per-point time_steps the same way,
    ref: src/heston_calibration.cpp:2165-2213)."""
    import dataclasses

    p = params
    dt = SOLVER.delta_t
    groups = [(0, 3, 2), (3, 6, 4)]
    ks = jnp.array([95.0, 100.0, 105.0] * 2, dtype=jnp.float64)
    nst = jnp.array([2, 2, 2, 4, 4, 4])
    args = (100.0, p.kappa, p.eta, p.sigma, p.rho, p.v0, p.r_d, p.r_f)
    want = []
    for (a, b, n) in groups:
        sol = dataclasses.replace(SOLVER, n_steps=n, maturity=n * dt)
        want.append(np.array(fused_do.fused_price_batch(
            spec=SPEC, solver=sol, strikes=ks[a:b], s0=args[0],
            kappa=args[1], eta=args[2], sigma=args[3], rho=args[4],
            v0=args[5], r_d=args[6], r_f=args[7], american=american,
            interpret=True)))
    got = np.array(fused_do.fused_price_batch(
        spec=SPEC, solver=SOLVER, strikes=ks, s0=args[0], kappa=args[1],
        eta=args[2], sigma=args[3], rho=args[4], v0=args[5], r_d=args[6],
        r_f=args[7], american=american, interpret=True, n_steps_per=nst))
    np.testing.assert_array_equal(got, np.concatenate(want))


def test_per_lane_steps_jacobian_matches_per_group(params):
    """Forward-mode per-lane-steps kernel: one launch carries the whole
    mixed-maturity Jacobian; equals the per-group launches bitwise."""
    import dataclasses

    p = params
    dt = SOLVER.delta_t
    groups = [(0, 2, 2), (2, 4, 4)]
    ks = jnp.array([95.0, 105.0, 95.0, 105.0], dtype=jnp.float64)
    nst = jnp.array([2, 2, 4, 4])
    tv = jnp.array(p.bumpable())
    wb, wj = [], []
    for (a, b, n) in groups:
        sol = dataclasses.replace(SOLVER, n_steps=n, maturity=n * dt)
        bb, jj = fused_do.fused_theta_jacobian(
            SPEC, sol, ks[a:b], 100.0, tv, p.r_d, p.r_f, interpret=True)
        wb.append(np.array(bb))
        wj.append(np.array(jj))
    gb, gj = fused_do.fused_theta_jacobian(
        SPEC, SOLVER, ks, 100.0, tv, p.r_d, p.r_f, interpret=True,
        n_steps_per=nst)
    np.testing.assert_array_equal(np.array(gb), np.concatenate(wb))
    np.testing.assert_array_equal(np.array(gj), np.concatenate(wj))


def test_per_lane_steps_with_dividends_match_per_group(params):
    """One-launch mixed-maturity pricing AND Jacobian WITH a dividend
    schedule: events keep their shared step index (the date-window
    convention is maturity-independent under shared dt — the
    reference's per-point window check behaves the same,
    ref: src/device_solver.hpp:433-437) and lanes whose maturity ends
    before an event get identity remap rows; bitwise-equal to
    per-maturity-group launches (the reference's american+dividend
    multi-maturity packing, ref: src/heston_calibration.cpp:2936-3243)."""
    import dataclasses

    p = params
    dt = SOLVER.delta_t          # 0.25: GOLDEN dates .4/.6/.8 hit steps
    groups = [(0, 2, 2), (2, 4, 4)]   # 1/2/3; the n=2 group sees 1/2 only
    ks = jnp.array([95.0, 105.0, 95.0, 105.0], dtype=jnp.float64)
    nst = jnp.array([2, 2, 4, 4])
    tv = jnp.array(p.bumpable())
    want, wb, wj = [], [], []
    for (a, b, n) in groups:
        sol = dataclasses.replace(SOLVER, n_steps=n, maturity=n * dt)
        want.append(np.array(fused_do.fused_price_batch(
            SPEC, sol, ks[a:b], 100.0, p.kappa, p.eta, p.sigma, p.rho,
            p.v0, p.r_d, p.r_f, american=True,
            dividends=GOLDEN_DIVIDENDS, interpret=True)))
        bb, jj = fused_do.fused_theta_jacobian(
            SPEC, sol, ks[a:b], 100.0, tv, p.r_d, p.r_f, american=True,
            dividends=GOLDEN_DIVIDENDS, interpret=True)
        wb.append(np.array(bb))
        wj.append(np.array(jj))
    got = np.array(fused_do.fused_price_batch(
        SPEC, SOLVER, ks, 100.0, p.kappa, p.eta, p.sigma, p.rho,
        p.v0, p.r_d, p.r_f, american=True, dividends=GOLDEN_DIVIDENDS,
        interpret=True, n_steps_per=nst))
    np.testing.assert_array_equal(got, np.concatenate(want))
    gb, gj = fused_do.fused_theta_jacobian(
        SPEC, SOLVER, ks, 100.0, tv, p.r_d, p.r_f, american=True,
        dividends=GOLDEN_DIVIDENDS, interpret=True, n_steps_per=nst)
    np.testing.assert_array_equal(np.array(gb), np.concatenate(wb))
    np.testing.assert_array_equal(np.array(gj), np.concatenate(wj))


@pytest.mark.parametrize("kw", [
    dict(),
    dict(american=True),
    dict(american=True, dividends=GOLDEN_DIVIDENDS),
    dict(option_type="put"),
])
def test_fused_cs_scheme_matches_xla(params, kw):
    """Fused Craig-Sneyd (in-kernel corrector: one extra A0 apply +
    re-run of both staged solves, ref: src/solver.hpp:678-778) equals
    the XLA CS path at solver roundoff in f64 — scheme='cs' no longer
    pays the ~20x XLA fallback."""
    import dataclasses

    p = params
    solver = dataclasses.replace(SOLVER, scheme="cs",
                                 solver_engine="pallas")
    assert fused_do.use_fused(SPEC, solver)
    ks = jnp.linspace(80.0, 120.0, 6, dtype=jnp.float64)
    args = tuple(jnp.float64(a) for a in (
        100.0, p.kappa, p.eta, p.sigma, p.rho, p.v0, p.r_d, p.r_f))
    xla_solver = dataclasses.replace(solver, solver_engine="scan")
    want = np.array(douglas.price_batch(SPEC, xla_solver, ks, *args, **kw))
    got = np.array(jax.jit(
        lambda k, kw=kw: fused_do.fused_price_batch(
            SPEC, solver, k, *args, interpret=True, **kw))(ks))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-11)
    # and price_batch itself now dispatches CS to the fused kernel
    via_dispatch = np.array(jax.jit(
        lambda k, kw=kw: douglas.price_batch(
            SPEC, solver, k, *args, **kw))(ks))
    np.testing.assert_allclose(via_dispatch, want, rtol=0, atol=1e-11)


def test_use_fused_cs_mcs_tangent_budget():
    """CS/MCS/HV forward-mode kernels are dispatchable, and their VMEM
    gate charges the corrector's extra live tangent-phase fields (z2p,
    z1c — plus w2c for HV) on top of the scheme's primal extras."""
    spec = GridSpec(m1=50, m2=25)
    for scheme, tg_extra in (("cs", 2), ("mcs", 2), ("hv", 3)):
        sol = SolverConfig(n_steps=4, scheme=scheme,
                           solver_engine="pallas")
        assert fused_do.use_fused(spec, sol, n_tangents=4)
        extra = fused_do._scheme_tangent_extra_fields(scheme, 4)
        assert extra == fused_do._scheme_extra_fields(scheme) + tg_extra
        assert fused_do._scheme_tangent_extra_fields(scheme, 0) == \
            fused_do._scheme_extra_fields(scheme)
    assert fused_do._scheme_tangent_extra_fields("do", 4) == 0


@pytest.mark.parametrize("kw", [
    dict(),
    dict(american=True),
    dict(option_type="put"),
    dict(american=True, option_type="put"),
    dict(scheme="cs"),
    dict(scheme="mcs"),
    dict(scheme="hv"),
    dict(dividends=GOLDEN_DIVIDENDS),
    dict(american=True, dividends=GOLDEN_DIVIDENDS),
    dict(american=True, dividends=GOLDEN_DIVIDENDS, option_type="put"),
    dict(scheme="hv", dividends=GOLDEN_DIVIDENDS),
])
def test_single_option_kernel_matches_xla(params, kw):
    """The latency kernel (2-D [nv, ns] layout + log-depth PCR along s,
    pallas/fused_single.py) equals the XLA path at solver roundoff in
    f64. PCR reorders the tridiagonal elimination, so equality is at
    rounding level rather than bitwise."""
    import dataclasses

    from heston_tpu.pallas import fused_single

    p = params
    kw = dict(kw)
    solver = (dataclasses.replace(SOLVER, scheme=kw.pop("scheme"))
              if "scheme" in kw else SOLVER)
    solver = dataclasses.replace(solver, solver_engine="pallas")
    assert fused_single.use_single(SPEC, solver, 1)
    args = tuple(jnp.float64(a) for a in (
        100.0, p.kappa, p.eta, p.sigma, p.rho, p.v0, p.r_d, p.r_f))
    xla_solver = dataclasses.replace(solver, solver_engine="scan")
    want = float(douglas.price_option(SPEC, xla_solver, jnp.float64(97.0),
                                      *args, **kw))
    got = float(jax.jit(
        lambda k, kw=kw: fused_single.fused_price_single(
            SPEC, solver, k, *args, interpret=True, **kw))(
            jnp.float64(97.0)))
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-9)


def test_price_batch_dispatches_single(params, monkeypatch):
    """price_batch with ONE strike routes through the latency kernel
    (the unjitted function is traced directly so the spy cannot be
    defeated by an earlier test's jit-cache entry)."""
    import dataclasses

    from heston_tpu.pallas import fused_single

    p = params
    solver = dataclasses.replace(SOLVER, solver_engine="pallas")
    called = {}
    orig = fused_single.fused_price_single

    def spy(*a, **k):
        called["yes"] = True
        return orig(*a, **k)

    monkeypatch.setattr(fused_single, "fused_price_single", spy)
    ks = jnp.array([100.0], dtype=jnp.float64)
    args = tuple(jnp.float64(a) for a in (
        100.0, p.kappa, p.eta, p.sigma, p.rho, p.v0, p.r_d, p.r_f))
    got = np.array(douglas._price_batch_impl.__wrapped__(
        SPEC, solver, ks, *args))
    assert called.get("yes")
    xla_solver = dataclasses.replace(solver, solver_engine="scan")
    want = np.array(douglas.price_batch(SPEC, xla_solver, ks, *args))
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-9)


@pytest.mark.parametrize("kw", [
    dict(),
    dict(american=True),
    dict(american=True, dividends=GOLDEN_DIVIDENDS),
    dict(option_type="put"),
])
def test_fused_mcs_scheme_matches_xla(params, kw):
    """Fused modified Craig-Sneyd (in-kernel corrector:
    td*A0(z2) + (1/2-theta)*dt*(L z2 + boundary drift) on top of the
    predictor rhs) equals the XLA MCS path at solver roundoff in f64 —
    the last scheme that paid the ~20x XLA fallback. The reference's own
    MCS is marked broken (ref: src/solver.hpp:915); the XLA oracle here
    is the working in 't Hout-Foulon form (models.douglas._do_step)."""
    import dataclasses

    p = params
    solver = dataclasses.replace(SOLVER, scheme="mcs",
                                 solver_engine="pallas")
    assert fused_do.use_fused(SPEC, solver)
    ks = jnp.linspace(80.0, 120.0, 6, dtype=jnp.float64)
    args = tuple(jnp.float64(a) for a in (
        100.0, p.kappa, p.eta, p.sigma, p.rho, p.v0, p.r_d, p.r_f))
    xla_solver = dataclasses.replace(solver, solver_engine="scan")
    want = np.array(douglas.price_batch(SPEC, xla_solver, ks, *args, **kw))
    got = np.array(jax.jit(
        lambda k, kw=kw: fused_do.fused_price_batch(
            SPEC, solver, k, *args, interpret=True, **kw))(ks))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-11)


@pytest.mark.parametrize("kw", [
    dict(),
    dict(american=True),
    dict(american=True, dividends=GOLDEN_DIVIDENDS),
    dict(option_type="put"),
])
def test_fused_hv_scheme_matches_xla(params, kw):
    """Fused Hundsdorfer-Verwer (framework extension — in-kernel
    corrector: T1 w1 = predictor rhs at the HV boundary coefficients
    + 0.5*dt*L(z2) - z2, T2 w2 = w1, relative to y2) equals the XLA HV
    path at solver roundoff in f64, and price_batch dispatches it to
    the fused kernel."""
    import dataclasses

    p = params
    solver = dataclasses.replace(SOLVER, scheme="hv",
                                 solver_engine="pallas")
    assert fused_do.use_fused(SPEC, solver)
    ks = jnp.linspace(80.0, 120.0, 6, dtype=jnp.float64)
    args = tuple(jnp.float64(a) for a in (
        100.0, p.kappa, p.eta, p.sigma, p.rho, p.v0, p.r_d, p.r_f))
    xla_solver = dataclasses.replace(solver, solver_engine="scan")
    want = np.array(douglas.price_batch(SPEC, xla_solver, ks, *args, **kw))
    got = np.array(jax.jit(
        lambda k, kw=kw: fused_do.fused_price_batch(
            SPEC, solver, k, *args, interpret=True, **kw))(ks))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-11)
    via_dispatch = np.array(jax.jit(
        lambda k, kw=kw: douglas.price_batch(
            SPEC, solver, k, *args, **kw))(ks))
    np.testing.assert_allclose(via_dispatch, want, rtol=0, atol=1e-11)


def test_per_lane_early_exit_multi_tile_bitwise(params):
    """A mixed book spanning >1 lane tile: short-maturity tiles bound
    their time loop by their OWN max step count (per-tile early exit) —
    still bitwise-equal to per-maturity-group launches. 140 options pad
    to two 128-lane tiles; tile 0 is all n=3 lanes (exits at step 3),
    tile 1 all n=6."""
    import dataclasses

    p = params
    spec = GridSpec(m1=10, m2=6)
    sol = SolverConfig(n_steps=6, theta=0.8, maturity=1.0,
                       a2_variant="upwind")
    ks = jnp.concatenate([jnp.linspace(80.0, 120.0, 128),
                          jnp.linspace(85.0, 115.0, 12)])
    nst = jnp.concatenate([jnp.full(128, 3), jnp.full(12, 6)])
    got = np.array(fused_do.fused_price_batch(
        spec, sol, ks, 100.0, p.kappa, p.eta, p.sigma, p.rho, p.v0,
        p.r_d, p.r_f, american=True, interpret=True, n_steps_per=nst))
    want = []
    for (a, b, n) in ((0, 128, 3), (128, 140, 6)):
        sg = dataclasses.replace(sol, n_steps=n, maturity=n * sol.delta_t)
        want.append(np.array(fused_do.fused_price_batch(
            spec, sg, ks[a:b], 100.0, p.kappa, p.eta, p.sigma, p.rho,
            p.v0, p.r_d, p.r_f, american=True, interpret=True)))
    np.testing.assert_array_equal(got, np.concatenate(want))


@pytest.mark.slow
def test_per_lane_early_exit_multi_tile_jacobian_bitwise(params):
    """Jacobian arm of the multi-tile early-exit contract (slow tier:
    the 6 tangent fields make this the most expensive interpret run in
    the suite; the price arm above covers the early-exit logic fast)."""
    import dataclasses

    p = params
    spec = GridSpec(m1=10, m2=6)
    sol = SolverConfig(n_steps=6, theta=0.8, maturity=1.0,
                       a2_variant="upwind")
    ks = jnp.concatenate([jnp.linspace(80.0, 120.0, 128),
                          jnp.linspace(85.0, 115.0, 12)])
    nst = jnp.concatenate([jnp.full(128, 3), jnp.full(12, 6)])
    tv = jnp.array(p.bumpable())
    gb, gj = fused_do.fused_theta_jacobian(
        spec, sol, ks, 100.0, tv, p.r_d, p.r_f, american=True,
        interpret=True, n_steps_per=nst)
    wb, wj = [], []
    for (a, b, n) in ((0, 128, 3), (128, 140, 6)):
        sg = dataclasses.replace(sol, n_steps=n, maturity=n * sol.delta_t)
        bb, jj = fused_do.fused_theta_jacobian(
            spec, sg, ks[a:b], 100.0, tv, p.r_d, p.r_f, american=True,
            interpret=True)
        wb.append(np.array(bb))
        wj.append(np.array(jj))
    np.testing.assert_array_equal(np.array(gb), np.concatenate(wb))
    np.testing.assert_array_equal(np.array(gj), np.concatenate(wj))


@pytest.mark.parametrize("scheme", ["cs", "mcs", "hv"])
def test_per_lane_steps_cs_mcs_match_per_group(params, scheme):
    """Per-lane step counts compose with the Craig-Sneyd / modified-CS /
    Hundsdorfer-Verwer correctors: one mixed-maturity launch ==
    per-group launches, bitwise (the corrector re-solves ride the same
    per-lane freeze)."""
    import dataclasses

    p = params
    sol = dataclasses.replace(SOLVER, scheme=scheme)
    ks = jnp.array([95.0, 105.0, 95.0, 105.0], dtype=jnp.float64)
    nst = jnp.array([2, 2, 4, 4])
    got = np.array(fused_do.fused_price_batch(
        SPEC, sol, ks, 100.0, p.kappa, p.eta, p.sigma, p.rho, p.v0,
        p.r_d, p.r_f, american=True, interpret=True, n_steps_per=nst))
    want = []
    for (a, b, n) in ((0, 2, 2), (2, 4, 4)):
        sg = dataclasses.replace(sol, n_steps=n, maturity=n * sol.delta_t)
        want.append(np.array(fused_do.fused_price_batch(
            SPEC, sg, ks[a:b], 100.0, p.kappa, p.eta, p.sigma, p.rho,
            p.v0, p.r_d, p.r_f, american=True, interpret=True)))
    np.testing.assert_array_equal(got, np.concatenate(want))
