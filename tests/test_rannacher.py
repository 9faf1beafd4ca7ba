"""Rannacher start-up damping (framework extension — no reference
analog; Rannacher 1984, in 't Hout & Wyns 2016 for ADI-on-Heston).

solver.rannacher_steps = R replaces each of the first R steps by two
half-dt fully-implicit (theta=1) Douglas sub-steps. Key conventions
pinned here: the damped sub-steps share the MAIN phase's boundary-vector
e^{-rate*dt*(N-1)} convention via absolute-time scaling, and a dividend
of main step n <= R fires before damp sub-step 2n-1 (the same absolute
tau as the undamped run)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heston_tpu.config import (
    DividendSchedule,
    GOLDEN_DIVIDENDS,
    GridSpec,
    SolverConfig,
)
from heston_tpu.models import douglas
from heston_tpu.pallas import fused_do, fused_single

from oracle_dense import (
    boundary_vectors,
    build_grid_np,
    dense_a0,
    dense_a1,
    dense_a2,
    rannacher_dense_loop,
)

M1, M2, N = 10, 8, 6


@pytest.fixture(scope="module")
def dense_setup(params):
    p = params
    vs, vv, ds, dv = build_grid_np(M1, M2, 100.0, 100.0, p.v0)
    a1 = dense_a1(vs, vv, ds, p.r_d, p.r_f)
    a2 = dense_a2(vs, vv, dv, p.r_d, p.kappa, p.eta, p.sigma, upwind=False)
    a0 = dense_a0(vs, vv, ds, dv, p.rho, p.sigma)
    dt = 1.0 / N
    b1, b2 = boundary_vectors(vs, M1, M2, p.r_d, p.r_f, N, dt)
    u0 = (np.maximum(vs[None, :] - 100.0, 0.0)
          * np.ones((M2 + 1, 1))).reshape(-1)
    return p, a0, a1, a2, b1, b2, u0, dt


@pytest.mark.parametrize("american", [False, True])
@pytest.mark.parametrize("rann", [2, N + 3])
def test_damped_loop_matches_dense_oracle(params, dense_setup, american,
                                          rann):
    """The damped time loop == a dense-solve numpy oracle at 1e-10:
    pins the theta=1 dt/2 sub-step algebra, the absolute-time boundary
    scaling and the American lambda updates through the phase switch.
    rann > n_steps exercises the whole-horizon clamp."""
    p, a0, a1, a2, b1, b2, u0, dt = dense_setup
    want = rannacher_dense_loop(M1, M2, N, rann, dt, 0.8, p.r_f,
                                a0, a1, a2, b1 + b2, b1, b2, u0,
                                american=american)
    spec = GridSpec(m1=M1, m2=M2)
    solver = SolverConfig(n_steps=N, theta=0.8, maturity=1.0,
                          a2_variant="central", rannacher_steps=rann)
    inst = douglas.prepare_instance(
        spec, solver, 100.0, 100.0, p.kappa, p.eta, p.sigma, p.rho, p.v0,
        p.r_d, p.r_f)
    got = np.array(douglas.run_time_loop(inst, solver, p.r_f,
                                         american=american))
    np.testing.assert_allclose(got, want.reshape(M2 + 1, M1 + 1),
                               rtol=0, atol=1e-10)


def test_phase_plan_interleaving():
    """The static plan: damped window sub-steps 1..2R with main-step-n
    dividends at sub-step 2n-1 (same absolute tau as undamped), main
    phase from R+1 with its own events."""
    solver = SolverConfig(n_steps=10, maturity=1.0, rannacher_steps=3)
    # dt = 0.1: date 0.2 -> step 2 (damped; fires before sub-step 3),
    # date 0.65 -> step 6 (main)
    div = DividendSchedule(dates=(0.2, 0.65), amounts=(0.5, 0.3),
                           percentages=(0.0, 0.0))
    plan = douglas._phase_plan(solver, div)
    assert plan == [
        ("run", "damp", 1, 3),
        ("div", 0.5, 0.0),
        ("run", "damp", 3, 7),
        ("run", "main", 4, 6),
        ("div", 0.3, 0.0),
        ("run", "main", 6, 11),
    ]
    # no damping, no dividends: one main range
    assert douglas._phase_plan(SolverConfig(n_steps=10), None) == [
        ("run", "main", 1, 11)]


def test_rannacher_validation(params):
    p = params
    spec = GridSpec(m1=8, m2=6)
    with pytest.raises(ValueError, match="rannacher"):
        douglas.price_option(
            spec, SolverConfig(n_steps=4, rannacher_steps=-1),
            100.0, 100.0, p.kappa, p.eta, p.sigma, p.rho, p.v0,
            p.r_d, p.r_f)
    # an instance prepared WITHOUT damping must refuse a damped run
    solver = SolverConfig(n_steps=4)
    inst = douglas.prepare_instance(
        spec, solver, 100.0, 100.0, p.kappa, p.eta, p.sigma, p.rho, p.v0,
        p.r_d, p.r_f)
    with pytest.raises(ValueError, match="damping operators"):
        douglas.run_time_loop(
            inst, dataclasses.replace(solver, rannacher_steps=2), p.r_f)


def test_native_engine_damped_matches_xla(params):
    """The native C++ engine runs the damped window too (theta=1
    sub-steps at dt/2, same phase plan) — an INDEPENDENT oracle for the
    Rannacher implementation, agreeing with the XLA path at solver
    roundoff."""
    from heston_tpu.utils import native

    p = params
    spec = GridSpec(m1=20, m2=10)
    sol = SolverConfig(n_steps=8, rannacher_steps=2)
    ks = np.array([90.0, 100.0, 110.0])
    args = (100.0, p.kappa, p.eta, p.sigma, p.rho, p.v0, p.r_d, p.r_f)
    for kw in (dict(), dict(american=True, dividends=GOLDEN_DIVIDENDS)):
        want = np.array(douglas.price_batch(
            spec, sol, jnp.asarray(ks), *args, **kw))
        got = native.price_batch_cpu(spec, sol, ks, *args, **kw)
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-11,
                                   err_msg=str(kw))


@pytest.mark.parametrize("kw", [
    dict(),
    dict(american=True),
    dict(american=True, dividends=GOLDEN_DIVIDENDS),
    dict(option_type="put"),
    dict(scheme="hv"),
])
def test_fused_damped_matches_xla(params, kw):
    """The fused engine runs the Rannacher window as its own launches of
    the same kernel at (theta=1, dt/2) — equal to the XLA damped path at
    solver roundoff in f64 for every variant. n_steps=20 with
    GOLDEN_DIVIDENDS puts event 0.2 at step 4 > R=2 (main window);
    rann=6 pulls it INSIDE the damped window (sub-step 7)."""
    p = params
    kw = dict(kw)
    scheme = kw.pop("scheme", "do")
    for rann in (2, 6):
        solver = SolverConfig(n_steps=20, scheme=scheme,
                              rannacher_steps=rann,
                              solver_engine="pallas")
        spec = GridSpec(m1=12, m2=8)
        assert fused_do.use_fused(spec, solver)
        ks = jnp.linspace(85.0, 115.0, 4, dtype=jnp.float64)
        args = tuple(jnp.float64(a) for a in (
            100.0, p.kappa, p.eta, p.sigma, p.rho, p.v0, p.r_d, p.r_f))
        want = np.array(douglas.price_batch(
            spec, dataclasses.replace(solver, solver_engine="scan"),
            ks, *args, **kw))
        got = np.array(jax.jit(
            lambda k, kw=kw: fused_do.fused_price_batch(
                spec, solver, k, *args, interpret=True, **kw))(ks))
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-11)


def test_fused_damped_jacobian_matches_xla_ad(params):
    """Forward-mode AD through the fused kernels with a damped window:
    the tangent state crosses the damp->main launch boundary like the
    primal; equal to jax.jacfwd of the XLA damped path in f64."""
    import jax

    p = params
    spec = GridSpec(m1=16, m2=8)
    solver = SolverConfig(n_steps=6, rannacher_steps=2,
                          solver_engine="pallas")
    ks = jnp.linspace(90.0, 110.0, 3, dtype=jnp.float64)
    tv = jnp.array([p.kappa, p.eta, p.sigma, p.rho, p.v0], jnp.float64)

    base, jac = jax.jit(lambda t: fused_do.fused_theta_jacobian(
        spec, solver, ks, 100.0, t, p.r_d, p.r_f, american=True,
        interpret=True))(tv)
    xla = dataclasses.replace(solver, solver_engine="scan")

    def prices(t):
        return douglas.price_batch(spec, xla, ks, 100.0, t[0], t[1],
                                   t[2], t[3], t[4], p.r_d, p.r_f,
                                   american=True)

    want = np.array(prices(tv))
    # the fused Jacobian's v0 column is the surface stencil; compare the
    # four AD columns to jacfwd and the prices exactly
    want_jac = np.array(jax.jacfwd(prices)(tv))
    np.testing.assert_allclose(np.array(base), want, rtol=0, atol=1e-11)
    np.testing.assert_allclose(np.array(jac)[:, :4], want_jac[:, :4],
                               rtol=0, atol=1e-9)


def test_single_kernel_damped_matches_xla(params):
    """The latency kernel's two-phase damped run == the XLA damped path
    (batch==1 dispatch included)."""
    p = params
    spec = GridSpec(m1=20, m2=10)
    args = tuple(jnp.float64(a) for a in (
        100.0, p.kappa, p.eta, p.sigma, p.rho, p.v0, p.r_d, p.r_f))
    for kw in (dict(), dict(american=True), dict(scheme="mcs")):
        kw = dict(kw)
        scheme = kw.pop("scheme", "do")
        solver = SolverConfig(n_steps=6, scheme=scheme, rannacher_steps=2,
                              solver_engine="pallas")
        assert fused_single.use_single(spec, solver, 1)
        want = float(douglas.price_batch(
            spec, dataclasses.replace(solver, solver_engine="scan"),
            jnp.array([100.0], jnp.float64), *args, **kw)[0])
        got = float(jax.jit(
            lambda kw=kw: fused_single.fused_price_single(
                spec, solver, jnp.float64(100.0), *args,
                interpret=True, **kw))())
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-11)


def test_per_lane_damped_matches_per_group(params):
    """One damped mixed-maturity launch == per-group damped launches,
    bitwise: lane i damps 2*min(n_i, R) sub-steps, whose freeze /
    remap-identity comparisons are exactly the per-group ones."""
    p = params
    spec = GridSpec(m1=16, m2=8)
    dt = 0.05
    groups = ((0, 3, 4), (3, 6, 10))    # n=4 < R+? and n=10
    rann = 6                            # > short group's n: clamps there
    ks = jnp.linspace(85.0, 115.0, 6, dtype=jnp.float64)
    args = tuple(jnp.float64(a) for a in (
        100.0, p.kappa, p.eta, p.sigma, p.rho, p.v0, p.r_d, p.r_f))
    nst = jnp.concatenate([jnp.full(e - a, n, jnp.int32)
                           for a, e, n in groups])
    solver = SolverConfig(n_steps=10, maturity=10 * dt,
                          rannacher_steps=rann, solver_engine="pallas")
    kw = dict(american=True, dividends=GOLDEN_DIVIDENDS)
    got = np.array(jax.jit(lambda k: fused_do.fused_price_batch(
        spec, solver, k, *args, interpret=True, n_steps_per=nst,
        **kw))(ks))
    want = []
    for a, e, n in groups:
        sol_g = dataclasses.replace(solver, n_steps=n, maturity=n * dt)
        want.append(np.array(jax.jit(
            lambda k, sol_g=sol_g: fused_do.fused_price_batch(
                spec, sol_g, k, *args, interpret=True, **kw))(ks[a:e])))
    np.testing.assert_array_equal(got, np.concatenate(want))


def test_damped_price_stays_near_undamped_and_golden(params):
    """Damping perturbs the price only at O(dt^2)-ish start-up scale:
    the golden-config European call stays within 2e-2 of the converged
    golden and within 5e-3 of the undamped price (measured: see
    test body); dividends + American compose."""
    p = params
    golden = 8.8943383103218502
    spec = GridSpec(m1=100, m2=75)
    base = SolverConfig(n_steps=50, a2_variant="central")
    damped = dataclasses.replace(base, rannacher_steps=2)
    args = (100.0, 100.0, p.kappa, p.eta, p.sigma, p.rho, p.v0,
            p.r_d, p.r_f)
    p_plain = float(douglas.price_option(spec, base, *args))
    p_damp = float(douglas.price_option(spec, damped, *args))
    assert abs(p_damp - golden) < 2e-2
    assert abs(p_damp - p_plain) < 5e-3
    # American + dividends (event dates 0.2/0.4/0.6/0.8 at dt=0.02 all
    # land OUTSIDE the damped window; rann=12 pulls 0.2 inside it)
    spec2 = GridSpec(m1=50, m2=25)
    for rann in (2, 12):
        sol2 = SolverConfig(n_steps=50, rannacher_steps=rann)
        q_damp = float(douglas.price_option(
            spec2, sol2, *args, american=True,
            dividends=GOLDEN_DIVIDENDS))
        q_plain = float(douglas.price_option(
            spec2, dataclasses.replace(sol2, rannacher_steps=0), *args,
            american=True, dividends=GOLDEN_DIVIDENDS))
        assert abs(q_damp - q_plain) < 5e-3, (rann, q_damp, q_plain)


def test_tracking_keeps_full_dt_contract(params):
    """solve_with_tracking under damping still returns [N+1] surfaces —
    the damped window records the full-dt boundaries (even sub-steps) —
    and the terminal row equals run_time_loop's surface exactly."""
    p = params
    spec = GridSpec(m1=20, m2=10)
    solver = SolverConfig(n_steps=8, rannacher_steps=3)
    inst = douglas.prepare_instance(
        spec, solver, 95.0, 100.0, p.kappa, p.eta, p.sigma, p.rho, p.v0,
        p.r_d, p.r_f)
    surfaces, lambdas = douglas.solve_with_tracking(
        inst, solver, p.r_f, american=True, dividends=GOLDEN_DIVIDENDS)
    assert surfaces.shape == (solver.n_steps + 1, 11, 21)
    np.testing.assert_array_equal(np.array(surfaces[0]), np.array(inst.u0))
    want_u, want_lam = douglas.run_time_loop(
        inst, solver, p.r_f, american=True, dividends=GOLDEN_DIVIDENDS,
        with_lambda=True)
    np.testing.assert_allclose(np.array(surfaces[-1]), np.array(want_u),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.array(lambdas[-1]), np.array(want_lam),
                               rtol=0, atol=1e-12)


def test_greeks_and_jacobian_compose_with_damping(params):
    """Book risk and both calibration Jacobians ride the damped loop
    (XLA path): greeks are financially sane and the exact-AD Jacobian —
    which differentiates THROUGH the damped sub-steps and the theta=1
    operator build — matches finite differences."""
    from heston_tpu.models import calibration, greeks

    p = params
    spec = GridSpec(m1=30, m2=15)
    solver = SolverConfig(n_steps=8, rannacher_steps=2)
    ks = jnp.array([95.0, 105.0])
    out = greeks.batch_greeks(
        spec, solver, ks, 100.0, p.kappa, p.eta, p.sigma, p.rho, p.v0,
        p.r_d, p.r_f, american=True, param_jacobian=True)
    assert np.all((np.array(out["delta"]) > 0)
                  & (np.array(out["delta"]) < 1))
    assert np.all(np.array(out["gamma"]) > 0)
    assert np.all(np.isfinite(np.array(out["param_jacobian"])))
    tv = jnp.array([p.kappa, p.eta, p.sigma, p.rho, p.v0])
    jac_fd, pr_fd = calibration.jacobian_and_prices(
        spec, solver, ks, 100.0, tv, p.r_d, p.r_f)
    jac_ad, pr_ad = calibration.jacobian_and_prices_ad(
        spec, solver, ks, 100.0, tv, p.r_d, p.r_f)
    np.testing.assert_allclose(np.array(pr_ad), np.array(pr_fd),
                               rtol=0, atol=1e-8)
    # rtol covers the v0 column, where the exact-AD path reads the
    # surface v-stencil while FD bumps the grid — the two estimators
    # agree only to O(h^2) ~ 2.5e-3 (see douglas.price_and_v0_stencil)
    np.testing.assert_allclose(np.array(jac_ad), np.array(jac_fd),
                               rtol=5e-3, atol=1e-4)


@pytest.mark.slow
def test_damping_restores_smooth_hv_convergence(params):
    """The payoff kink excites the second-order schemes' weakly damped
    modes; two Rannacher steps remove the start-up pollution. Pin the
    value proposition: damped HV's time error at N=20 is no worse than
    undamped, and the damped N=20 -> N=40 error ratio is consistent
    with second order (>= 3x reduction; clean h^2 would be 4x)."""
    from heston_tpu import benchmarks

    def err(n, rann):
        rows = benchmarks.run_timestep_study(
            n_values=(n, 640), scheme="hv", rannacher_steps=rann)
        return abs(rows[0]["price"] - rows[-1]["price"])

    e20_damp = err(20, 2)
    e20_plain = err(20, 0)
    e40_damp = err(40, 2)
    assert e20_damp <= 1.5 * e20_plain
    assert e20_damp / max(e40_damp, 1e-14) > 3.0
