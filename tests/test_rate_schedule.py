"""Piecewise-constant rate term structures (config.RateSchedule) — a
framework extension; the reference prices at flat rates only
(hardcoded const r_d/r_f per scenario, ref: src/solver.cpp:322-341).

Correctness pillars:
  1. dense per-step oracle — a numpy DO loop that rebuilds A1/A2/b from
     each step's own rates and scales boundaries by the exact running
     integral exp(I(n) - I(N-1)), I = dt * cumsum(per-step boundary
     rate). The jitted loop must match at 1e-10 (euro AND American).
  2. flat reduction — a schedule that is constant in time must
     reproduce the flat-rate price exactly (same operator set).
  3. continuum oracle — for EUROPEAN payoffs deterministic rates enter
     only through the discount factor and the forward, so the curve
     price equals the flat-average-rate price up to discretization
     error; both must converge to the same CF value.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heston_tpu.config import (
    GOLDEN_DIVIDENDS,
    GridSpec,
    HestonParams,
    RateSchedule,
    SolverConfig,
)
from heston_tpu.models import douglas, heston_cf
from heston_tpu.ops import operators

from oracle_dense import (
    boundary_vectors,
    build_grid_np,
    dense_a0,
    dense_a1,
    dense_a2,
)

P = HestonParams()
M1, M2, N = 10, 8, 6


# ---------------------------------------------------------------- config

def test_rate_schedule_validation():
    with pytest.raises(ValueError, match="strictly increasing"):
        RateSchedule(times=(0.5, 0.5), r_d=(0.01,) * 3, r_f=(0.0,) * 3)
    with pytest.raises(ValueError, match="len"):
        RateSchedule(times=(0.5,), r_d=(0.01,), r_f=(0.0, 0.0))
    with pytest.raises(ValueError, match="> 0"):
        RateSchedule(times=(0.0, 0.5), r_d=(0.01,) * 3, r_f=(0.0,) * 3)


def test_value_at_and_step_segments():
    rs = RateSchedule(times=(0.25, 0.75), r_d=(0.01, 0.03, 0.02),
                      r_f=(0.0, 0.005, 0.0))
    assert rs.value_at(0.1) == (0.01, 0.0)
    assert rs.value_at(0.25) == (0.03, 0.005)   # right-continuous
    assert rs.value_at(0.9) == (0.02, 0.0)
    # N=4, dt=0.25, T=1: step n covers calendar [1-n*dt, 1-(n-1)*dt],
    # midpoints 0.875, 0.625, 0.375, 0.125 -> segments 2, 1, 1, 0.
    per = rs.step_rates(4, 0.25, 1.0)
    assert per == ((0.02, 0.0), (0.03, 0.005), (0.03, 0.005),
                   (0.01, 0.0))
    segs = rs.step_segments(4, 0.25, 1.0)
    assert segs == ((1, 1, 0.02, 0.0), (2, 3, 0.03, 0.005),
                    (4, 4, 0.01, 0.0))


def test_average_rates():
    rs = RateSchedule(times=(0.25, 0.75), r_d=(0.01, 0.03, 0.02),
                      r_f=(0.0, 0.004, 0.0))
    rd, rf = rs.average_rates(1.0)
    assert np.isclose(rd, 0.25 * 0.01 + 0.5 * 0.03 + 0.25 * 0.02)
    assert np.isclose(rf, 0.5 * 0.004)
    # breakpoints past maturity are ignored
    rd2, rf2 = rs.average_rates(0.25)
    assert np.isclose(rd2, 0.01) and rf2 == 0.0


# ------------------------------------------------- dense per-step oracle

def _dense_curve_do(m1, m2, n_steps, delta_t, theta, per_step, s0, strike,
                    v0, american=False):
    """Dense DO loop with per-step (r_d, r_f): step n's operators and raw
    boundary vectors use its own rates; boundary scaling is the exact
    running-integral generalization exp(I(n) - I(N-1)),
    I(n) = dt * sum_{m<=n} b_rate_m (b_rate = r_f for calls)."""
    vs, vv, ds, dv = build_grid_np(m1, m2, s0, strike, v0)
    m = (m1 + 1) * (m2 + 1)
    eye = np.eye(m)
    brates = [rf for (_, rf) in per_step]           # calls: rate = r_f
    ivals = delta_t * np.concatenate([[0.0], np.cumsum(brates)])
    # extend I to n = n_steps (cumsum covers it) and anchor at N-1
    anchor = ivals[n_steps - 1]

    def e_of(n):
        return np.exp(ivals[n] - anchor)

    per_seg = {}
    for n in range(1, n_steps + 1):
        rd, rf = per_step[n - 1]
        if (rd, rf) not in per_seg:
            a1 = dense_a1(vs, vv, ds, rd, rf)
            a2 = dense_a2(vs, vv, dv, rd, P.kappa, P.eta, P.sigma,
                          upwind=True)
            a0 = dense_a0(vs, vv, ds, dv, P.rho, P.sigma)
            # raw (unscaled) boundary vectors: n_steps=1 makes efac=1
            b1, b2 = boundary_vectors(vs, m1, m2, rd, rf, 1, delta_t)
            per_seg[(rd, rf)] = (
                a0, a1, a2, b1, b2,
                np.linalg.inv(eye - theta * delta_t * a1),
                np.linalg.inv(eye - theta * delta_t * a2))
    u = (np.maximum(vs[None, :] - strike, 0.0)
         * np.ones((m2 + 1, 1))).reshape(-1)
    u0 = u.copy()
    lam = np.zeros(m)
    for n in range(1, n_steps + 1):
        a0, a1, a2, b1, b2, inv1, inv2 = per_seg[per_step[n - 1]]
        b = b1 + b2
        e0, e1 = e_of(n - 1), e_of(n)
        a0r, a1r, a2r = a0 @ u, a1 @ u, a2 @ u
        y0 = u + delta_t * (a0r + a1r + a2r + b * e0)
        if american:
            y0 = y0 + delta_t * lam
        y1 = inv1 @ (y0 + theta * delta_t * (b1 * e1 - (a1r + b1 * e0)))
        u_bar = inv2 @ (y1 + theta * delta_t * (b2 * e1 - (a2r + b2 * e0)))
        if american:
            u = np.maximum(u_bar - delta_t * lam, u0)
            lam = np.maximum(0.0, lam + (u0 - u_bar) / delta_t)
            lam[m1::m1 + 1] = 0.0
        else:
            u = u_bar
    return u.reshape(m2 + 1, m1 + 1), vs, vv


RS = RateSchedule(times=(1.0 / 3.0, 2.0 / 3.0),
                  r_d=(0.02, 0.035, 0.025), r_f=(0.0, 0.01, 0.004))


@pytest.mark.parametrize("american", [False, True])
def test_curve_matches_dense_per_step_oracle(american):
    spec = GridSpec(m1=M1, m2=M2)
    solver = SolverConfig(n_steps=N, a2_variant="upwind")
    per_step = RS.step_rates(N, solver.delta_t, solver.maturity)
    want, _, _ = _dense_curve_do(M1, M2, N, solver.delta_t, 0.8,
                                 per_step, 100.0, 100.0, P.v0,
                                 american=american)
    inst = douglas.prepare_instance(
        spec, solver, 100.0, 100.0, P.kappa, P.eta, P.sigma, P.rho,
        P.v0, 0.0, 0.0, rate_schedule=RS)
    got = np.array(douglas.run_time_loop(
        inst, solver, 0.0, american=american, rate_schedule=RS))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-10)


def test_constant_schedule_reduces_to_flat():
    spec = GridSpec(m1=M1, m2=M2)
    solver = SolverConfig(n_steps=N)
    flat = RateSchedule(times=(0.3, 0.6), r_d=(0.025,) * 3,
                        r_f=(0.01,) * 3)
    args = (100.0, P.kappa, P.eta, P.sigma, P.rho, P.v0)
    for kw in (dict(), dict(american=True),
               dict(american=True, dividends=GOLDEN_DIVIDENDS)):
        want = douglas.price_option(spec, solver, 100.0, *args,
                                    0.025, 0.01, **kw)
        got = douglas.price_option(spec, solver, 100.0, *args, 0.0, 0.0,
                                   rate_schedule=flat, **kw)
        np.testing.assert_allclose(np.array(got), np.array(want),
                                   rtol=0, atol=1e-12)


def test_curve_price_converges_to_cf_at_average_rate():
    """European r_f=0 curve: the PDE curve price and the CF price at the
    average rate agree to discretization error (the continuum prices
    are IDENTICAL: deterministic rates enter only via the discount and
    the forward)."""
    rs = RateSchedule(times=(0.25, 0.75), r_d=(0.01, 0.04, 0.02),
                      r_f=(0.0, 0.0, 0.0))
    spec = GridSpec(m1=100, m2=50)
    solver = SolverConfig(n_steps=40)
    got = float(douglas.price_option(
        spec, solver, 100.0, 100.0, P.kappa, P.eta, P.sigma, P.rho,
        P.v0, 0.0, 0.0, rate_schedule=rs))
    rd_avg, _ = rs.average_rates(1.0)
    cf = float(heston_cf.call_price(
        100.0, 100.0, P.v0, P.kappa, P.eta, P.sigma, P.rho, rd_avg, 1.0))
    # flat-rate PDE at the same resolution vs its own CF — the curve
    # run must be no worse than ~2x that discretization error
    flat = float(douglas.price_option(
        spec, solver, 100.0, 100.0, P.kappa, P.eta, P.sigma, P.rho,
        P.v0, rd_avg, 0.0))
    assert abs(got - cf) <= 2.0 * abs(flat - cf) + 2e-3


def test_rannacher_composes_with_schedule():
    """rannacher_steps > 0 + a curve: the damped sub-steps take their
    segment's rates. Constant-curve reduction must be exact; a real
    curve must stay within convergence distance of the undamped run."""
    spec = GridSpec(m1=M1, m2=M2)
    solver = SolverConfig(n_steps=N, rannacher_steps=2)
    args = (100.0, P.kappa, P.eta, P.sigma, P.rho, P.v0)
    flat = RateSchedule(times=(0.5,), r_d=(0.025,) * 2, r_f=(0.01,) * 2)
    want = douglas.price_option(spec, solver, 100.0, *args, 0.025, 0.01,
                                american=True)
    got = douglas.price_option(spec, solver, 100.0, *args, 0.0, 0.0,
                               rate_schedule=flat, american=True)
    np.testing.assert_allclose(np.array(got), np.array(want), rtol=0,
                               atol=1e-12)
    # real curve: runs and lands near the undamped curve price
    undamped = douglas.price_option(
        spec, SolverConfig(n_steps=N), 100.0, *args, 0.0, 0.0,
        rate_schedule=RS, american=True)
    damped = douglas.price_option(spec, solver, 100.0, *args, 0.0, 0.0,
                                  rate_schedule=RS, american=True)
    assert abs(float(damped) - float(undamped)) < 0.05


def test_tracking_with_schedule():
    spec = GridSpec(m1=M1, m2=M2)
    solver = SolverConfig(n_steps=N)
    inst = douglas.prepare_instance(
        spec, solver, 100.0, 100.0, P.kappa, P.eta, P.sigma, P.rho,
        P.v0, 0.0, 0.0, rate_schedule=RS)
    surf, lam = douglas.solve_with_tracking(
        inst, solver, 0.0, american=True, rate_schedule=RS)
    assert surf.shape == (N + 1, M2 + 1, M1 + 1)
    final = douglas.run_time_loop(inst, solver, 0.0, american=True,
                                  rate_schedule=RS)
    np.testing.assert_allclose(np.array(surf[-1]), np.array(final),
                               rtol=0, atol=1e-12)


def test_price_batch_engines_agree_and_vmap():
    """The fused kernel's per-segment launches == the XLA path, for the
    full composition (curve x American x dividends x Rannacher)."""
    spec = GridSpec(m1=M1, m2=M2)
    ks = jnp.linspace(80.0, 120.0, 5)
    args = (100.0, P.kappa, P.eta, P.sigma, P.rho, P.v0, 0.0, 0.0)
    for rann in (0, 2):
        outs = {}
        for engine in ("scan", "pallas"):
            solver = SolverConfig(n_steps=N, solver_engine=engine,
                                  rannacher_steps=rann)
            outs[engine] = np.array(douglas.price_batch(
                spec, solver, ks, *args, rate_schedule=RS,
                american=True, dividends=GOLDEN_DIVIDENDS))
        np.testing.assert_allclose(outs["pallas"], outs["scan"], rtol=0,
                                   atol=1e-10)
        assert np.all(np.diff(outs["scan"]) < 0)   # calls decrease in K


def test_fused_kernel_curve_all_variants():
    """fused_price_batch(rate_schedule=...) == XLA at 1e-10 in interpret
    mode for euro / american / dividends, calls and puts, plus the
    mixed-maturity + schedule rejection."""
    import jax as _jax
    from heston_tpu.pallas import fused_do

    spec = GridSpec(m1=M1, m2=M2)
    solver = SolverConfig(n_steps=N)
    ks = jnp.linspace(85.0, 115.0, 4)
    args = (100.0, P.kappa, P.eta, P.sigma, P.rho, P.v0, 0.0, 0.0)
    for kw in (dict(), dict(american=True),
               dict(dividends=GOLDEN_DIVIDENDS),
               dict(option_type="put", american=True)):
        want = np.array(douglas.price_batch(
            spec, SolverConfig(n_steps=N, solver_engine="scan"), ks,
            *args, rate_schedule=RS, **kw))
        got = np.array(_jax.jit(
            lambda k: fused_do.fused_price_batch(
                spec, solver, k, *args, interpret=True,
                rate_schedule=RS, **kw))(ks))
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-10)
    with pytest.raises(ValueError, match="per-lane"):
        fused_do.fused_price_batch(
            spec, solver, ks, *args, interpret=True, rate_schedule=RS,
            n_steps_per=jnp.array([N, N, N - 2, N - 2]))


def test_mismatched_instance_schedule_raises():
    spec = GridSpec(m1=M1, m2=M2)
    solver = SolverConfig(n_steps=N)
    inst = douglas.prepare_instance(
        spec, solver, 100.0, 100.0, P.kappa, P.eta, P.sigma, P.rho,
        P.v0, 0.025, 0.0)       # flat instance
    with pytest.raises(ValueError, match="rate schedule"):
        douglas.run_time_loop(inst, solver, 0.0, rate_schedule=RS)


def test_book_risk_with_schedule():
    """batch_greeks composes with curves: engine equivalence (the fused
    per-segment surfaces == XLA), exact constant-curve reduction incl.
    the param Jacobian, theta vs a tracking finite difference, and the
    documented rejections."""
    from heston_tpu.models import greeks

    spec = GridSpec(m1=M1, m2=M2)
    ks = jnp.linspace(85.0, 115.0, 4)
    args = (100.0, P.kappa, P.eta, P.sigma, P.rho, P.v0, 0.0, 0.0)
    outs = {}
    for engine in ("scan", "pallas"):
        solver = SolverConfig(n_steps=N, solver_engine=engine)
        outs[engine] = greeks.batch_greeks(
            spec, solver, ks, *args, american=True,
            dividends=GOLDEN_DIVIDENDS, param_jacobian=True,
            rate_schedule=RS)
    for key, want in outs["scan"].items():
        np.testing.assert_allclose(
            np.array(outs["pallas"][key]), np.array(want), rtol=0,
            atol=1e-9, err_msg=key)

    # constant curve == flat scalars, bitwise formulation
    solver = SolverConfig(n_steps=N)
    flat_sched = RateSchedule(times=(0.5,), r_d=(0.025,) * 2,
                              r_f=(0.01,) * 2)
    flat_args = (100.0, P.kappa, P.eta, P.sigma, P.rho, P.v0)
    want = greeks.batch_greeks(spec, solver, ks, *flat_args, 0.025, 0.01,
                               param_jacobian=True)
    got = greeks.batch_greeks(spec, solver, ks, *flat_args, 0.0, 0.0,
                              param_jacobian=True,
                              rate_schedule=flat_sched)
    for key, w in want.items():
        np.testing.assert_allclose(np.array(got[key]), np.array(w),
                                   rtol=0, atol=1e-11, err_msg=key)

    with pytest.raises(ValueError, match="group_steps"):
        greeks.batch_greeks(spec, solver, ks, *args, rate_schedule=RS,
                            group_steps=((0, 2, N), (2, 4, N - 2)))
    with pytest.raises(ValueError, match="rates"):
        greeks.batch_greeks(spec, solver, ks, *args, rate_schedule=RS,
                            rates=True)


def test_theta_with_schedule_vs_tracking_fd():
    """The curve theta epilogue (last segment's operators + boundary
    rate) agrees with the tracking surface's backward difference
    -(u_N - u_{N-1})/dt to O(dt)."""
    from heston_tpu.models import greeks

    spec = GridSpec(m1=40, m2=20)
    solver = SolverConfig(n_steps=32)
    th = float(greeks.pde_theta(
        spec, solver, 100.0, 100.0, P.kappa, P.eta, P.sigma, P.rho,
        P.v0, 0.0, 0.0, rate_schedule=RS))
    inst = douglas.prepare_instance(
        spec, solver, 100.0, 100.0, P.kappa, P.eta, P.sigma, P.rho,
        P.v0, 0.0, 0.0, rate_schedule=RS)
    surf, _ = douglas.solve_with_tracking(inst, solver, 0.0,
                                          rate_schedule=RS)
    fd = -float((surf[-1] - surf[-2])[inst.idx_v, inst.idx_s]
                / solver.delta_t)
    assert abs(th - fd) < 0.05 * max(abs(th), 1.0)


def test_price_and_greeks_with_schedule():
    from heston_tpu.models import greeks

    spec = GridSpec(m1=M1, m2=M2)
    solver = SolverConfig(n_steps=N)
    flat_sched = RateSchedule(times=(0.5,), r_d=(0.025,) * 2,
                              r_f=(0.01,) * 2)
    args = (100.0, 100.0, P.kappa, P.eta, P.sigma, P.rho, P.v0)
    want = greeks.price_and_greeks(spec, solver, *args, 0.025, 0.01)
    got = greeks.price_and_greeks(spec, solver, *args, 0.0, 0.0,
                                  rate_schedule=flat_sched)
    assert "rho_rd" not in got and "rho_rf" not in got   # documented
    for key, val in got.items():
        np.testing.assert_allclose(np.array(val), np.array(want[key]),
                                   rtol=0, atol=1e-11, err_msg=key)


def test_cli_rate_curve(capsys):
    import json
    from heston_tpu import cli

    base = ["price", "--strikes", "100", "--m1", "12", "--m2", "8",
            "--n-steps", "4"]
    assert cli.main(base + ["--r-d", "0.02"]) == 0
    flat = json.loads(capsys.readouterr().out)["price"]
    curve_args = ["--rate-times", "0.5", "--rate-rd", "0.02", "0.02"]
    assert cli.main(base + curve_args) == 0
    curve = json.loads(capsys.readouterr().out)["price"]
    assert abs(curve - flat) < 1e-12        # constant curve == flat
    with pytest.raises(SystemExit):
        cli.main(base + ["--rate-times", "0.5", "--rate-rd", "0.02"])


def test_boundary_anchor_override():
    """operators.build_boundary_vectors(anchor=...) replaces the baked
    e^{-rate dt (N-1)} factor verbatim."""
    from heston_tpu.ops.grid import make_grid

    spec = GridSpec(m1=M1, m2=M2)
    grid = make_grid(spec, 100.0, 100.0, P.v0)
    b1a, b2a, _ = operators.build_boundary_vectors(
        grid, 0.025, 0.01, N, 1.0 / N)
    want = float(np.exp(-0.01 * (1.0 / N) * (N - 1)))
    b1b, b2b, _ = operators.build_boundary_vectors(
        grid, 0.025, 0.01, N, 1.0 / N, anchor=want)
    np.testing.assert_allclose(np.array(b1a), np.array(b1b), rtol=0,
                               atol=1e-15)
    np.testing.assert_allclose(np.array(b2a), np.array(b2b), rtol=0,
                               atol=1e-15)
