"""Digital (cash-or-nothing) option tests — framework extension; the
reference prices vanilla calls only (ref: src/solver.cpp:322-341).

The digital payoff rides the SAME discretization as puts do: an
injection-free boundary treatment (b1 = b2 = 0) with the full -r_d
reaction (operators.build_a2_bands), so the flat far fields decay to
exactly e^{-r_d tau}. Validation is against the semi-analytic CF
digital e^{-rT}*P2 (models/heston_cf.py), the BS closed form in the
deterministic-vol limit, discrete cash parity, and Monte-Carlo."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heston_tpu.config import GOLDEN_DIVIDENDS, GridSpec, SolverConfig
from heston_tpu.models import bs, douglas, heston_cf, mc
from heston_tpu.ops import operators

R = 0.025


def _args(p):
    return (100.0, p.kappa, p.eta, p.sigma, p.rho, p.v0, p.r_d, p.r_f)


def test_option_type_validation():
    with pytest.raises(ValueError, match="unknown option_type"):
        operators.is_put("digital")
    with pytest.raises(ValueError, match="vanilla-only"):
        operators.intrinsic_value(jnp.arange(3.0), 1.0, "digital_call")
    s = jnp.array([80.0, 100.0, 120.0])
    np.testing.assert_array_equal(
        np.array(operators.payoff_value(s, 100.0, "digital_call")),
        [0.0, 0.0, 1.0])
    np.testing.assert_array_equal(
        np.array(operators.payoff_value(s, 100.0, "digital_put")),
        [1.0, 0.0, 0.0])
    assert operators.is_put("digital_put")
    assert not operators.is_put("digital_call")
    assert operators.is_digital("digital_call")
    assert not operators.is_digital("call")
    assert operators.is_injection_free("digital_call")
    assert not operators.is_injection_free("call")


@pytest.mark.parametrize("option_type", ["digital_call", "digital_put"])
def test_digital_pde_matches_cf(params, option_type):
    """Converged PDE digital == semi-analytic e^{-rT}*P2 (the payoff
    discontinuity sits where the sinh grid clusters; Rannacher damping
    restores smooth time convergence for the non-smooth payoff)."""
    p = params
    spec = GridSpec(m1=160, m2=40)
    solver = SolverConfig(n_steps=64, theta=0.8, maturity=1.0,
                          a2_variant="central", rannacher_steps=2)
    ks = jnp.array([90.0, 100.0, 110.0], jnp.float64)
    got = np.array(douglas.price_batch(
        spec, solver, ks, *map(jnp.float64, _args(p)),
        option_type=option_type))
    want = np.array(heston_cf.price_chain(
        100.0, ks, p.v0, p.kappa, p.eta, p.sigma, p.rho, p.r_d, 1.0,
        option_type=option_type))
    # digital values are O(0.5); discretization error budget 3e-3
    np.testing.assert_allclose(got, want, rtol=0, atol=3e-3)


def test_digital_cash_parity(params):
    """digital_call + digital_put == the all-cash solution at the
    DISCRETE level (the cell-averaged payoffs complement to exactly 1
    at every node; both payoffs share the injection-free full-reaction
    operators, so their sum evolves as the discrete all-cash value —
    strike-INDEPENDENT to solver roundoff, and equal to e^{-r_d T} up
    to the theta-scheme's O((r dt)^2 / step) rational-vs-exponential
    time error, measured 1.5e-5 at N=12)."""
    p = params
    spec = GridSpec(m1=40, m2=12)
    solver = SolverConfig(n_steps=12, theta=0.8, maturity=1.0)
    ks = jnp.array([97.0, 104.0], jnp.float64)
    a = _args(p)
    c = np.array(douglas.price_batch(spec, solver, ks,
                                     *map(jnp.float64, a),
                                     option_type="digital_call"))
    q = np.array(douglas.price_batch(spec, solver, ks,
                                     *map(jnp.float64, a),
                                     option_type="digital_put"))
    s = c + q
    # the sum is the SAME discrete all-cash number for every strike
    np.testing.assert_allclose(s[0], s[1], rtol=0, atol=1e-11)
    # and matches e^{-r_d T} up to the time-discretization error
    np.testing.assert_allclose(s, np.exp(-p.r_d * 1.0), rtol=0,
                               atol=1e-4)


def test_digital_bs_limit():
    """sigma -> 0, eta = v0: variance is frozen at v0, Heston degenerates
    to Black-Scholes at vol sqrt(v0) — PDE digital vs bs.digital_price."""
    spec = GridSpec(m1=120, m2=30)
    solver = SolverConfig(n_steps=48, theta=0.8, maturity=1.0,
                          a2_variant="central", rannacher_steps=2)
    ks = jnp.array([95.0, 105.0], jnp.float64)
    got = np.array(douglas.price_batch(
        spec, solver, ks, 100.0, 1.5, 0.04, 1e-4, 0.0, 0.04, R, 0.0,
        option_type="digital_call"))
    want = np.array(bs.digital_price(100.0, ks, R, 0.2, 1.0,
                                     option_type="digital_call"))
    np.testing.assert_allclose(got, want, rtol=0, atol=3e-3)


@pytest.mark.parametrize("kw", [
    dict(),
    dict(option_type_put=True),
    dict(american=True),
    dict(american=True, dividends=GOLDEN_DIVIDENDS),
    dict(dividends=GOLDEN_DIVIDENDS, option_type_put=True),
    dict(scheme="hv"),
    dict(rannacher=2, american=True),
])
def test_digital_fused_matches_xla(params, kw):
    """Batched fused kernel == XLA stepper for digitals at solver
    roundoff in f64 (incl. the one-touch American floor, in-kernel
    dividend re-maps, HV corrector and Rannacher damp launches)."""
    from heston_tpu.pallas import fused_do

    p = params
    kw = dict(kw)
    ot = "digital_put" if kw.pop("option_type_put", False) \
        else "digital_call"
    solver = SolverConfig(n_steps=4, a2_variant="upwind",
                          scheme=kw.pop("scheme", "do"),
                          rannacher_steps=kw.pop("rannacher", 0))
    spec = GridSpec(m1=10, m2=8)
    ks = jnp.linspace(80.0, 120.0, 6, dtype=jnp.float64)
    args = tuple(jnp.float64(a) for a in _args(p))
    want = np.array(douglas.price_batch(spec, solver, ks, *args,
                                        option_type=ot, **kw))
    got = np.array(jax.jit(
        lambda k: fused_do.fused_price_batch(
            spec, solver, k, *args, interpret=True, option_type=ot,
            **kw))(ks))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-11)


def test_digital_latency_kernel_matches_xla(params):
    """Single-option latency kernel prices digitals (incl. American
    one-touch + dividends)."""
    from heston_tpu.pallas import fused_single

    p = params
    spec = GridSpec(m1=20, m2=10)
    args = tuple(jnp.float64(a) for a in _args(p))
    for kw in (dict(option_type="digital_call"),
               dict(option_type="digital_put", american=True,
                    dividends=GOLDEN_DIVIDENDS)):
        solver = SolverConfig(n_steps=6, solver_engine="pallas")
        assert fused_single.use_single(spec, solver, 1,
                                       kw.get("dividends"))
        want = float(douglas.price_option(
            spec, dataclasses.replace(solver, solver_engine="scan"),
            jnp.float64(100.0), *args, **kw))
        got = float(jax.jit(
            lambda kw=kw, solver=solver: fused_single.fused_price_single(
                spec, solver, jnp.float64(100.0), *args,
                interpret=True, **kw))())
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-11)


def test_digital_fused_jacobian_matches_xla(params):
    """Forward-mode AD through the fused kernel with a digital payoff
    == the XLA jacfwd (the 0/1 floor is parameter-independent; tangents
    ride the same projection masks as vanillas)."""
    from heston_tpu.models import calibration

    p = params
    spec = GridSpec(m1=10, m2=8)
    sol = SolverConfig(n_steps=4, a2_variant="upwind")
    pal = dataclasses.replace(sol, solver_engine="pallas")
    ks = jnp.array([95.0, 105.0], jnp.float64)
    tv = jnp.array([p.kappa, p.eta, p.sigma, p.rho, p.v0], jnp.float64)
    j_f, b_f = calibration.jacobian_and_prices_ad(
        spec, pal, ks, 100.0, tv, p.r_d, p.r_f,
        option_type="digital_call")
    j_x, b_x = calibration.jacobian_and_prices_ad(
        spec, sol, ks, 100.0, tv, p.r_d, p.r_f,
        option_type="digital_call")
    np.testing.assert_allclose(np.array(b_f), np.array(b_x), atol=1e-11)
    np.testing.assert_allclose(np.array(j_f), np.array(j_x), atol=1e-9)


def test_digital_mc_confirms_pde(params):
    """MC digital (QE scheme) within CI of the CF oracle, and the
    one-touch American digital dominates the European."""
    p = params
    key = jax.random.PRNGKey(7)
    mean, ci = mc.price_european_call_mc(
        key, 100.0, p.v0, 100.0, p.r_d, p.r_f, p.kappa, p.eta,
        p.sigma, p.rho, 1.0, num_paths=60_000, n_steps=16, scheme="qe",
        option_type="digital_call", antithetic=True)
    want = float(heston_cf.digital_price(
        100.0, 100.0, p.v0, p.kappa, p.eta, p.sigma, p.rho, p.r_d, 1.0))
    assert abs(float(mean) - want) < 3.0 * float(ci) + 1e-3
    # American one-touch >= European digital; <= undiscounted 1
    spec = GridSpec(m1=60, m2=20)
    solver = SolverConfig(n_steps=20, theta=0.8, maturity=1.0)
    a = tuple(map(jnp.float64, _args(p)))
    ks = jnp.array([100.0], jnp.float64)
    eu = float(douglas.price_batch(spec, solver, ks, *a,
                                   option_type="digital_call")[0])
    am = float(douglas.price_batch(spec, solver, ks, *a, american=True,
                                   option_type="digital_call")[0])
    assert am >= eu - 1e-12
    assert am <= 1.0 + 1e-9


def test_digital_book_risk_engines_agree(params):
    """batch_greeks on an American digital book: the fused epilogue's
    complementarity lambda (active set = exact payoff equality) matches
    the XLA fallback per greek, and theta reads ~0 where the pin binds
    (a deep-ITM one-touch is constant in time)."""
    from heston_tpu.models import greeks

    p = params
    spec = GridSpec(m1=20, m2=10)
    sol = SolverConfig(n_steps=6)
    pal = dataclasses.replace(sol, solver_engine="pallas")
    ks = jnp.array([90.0, 100.0, 120.0], jnp.float64)
    args = tuple(jnp.float64(a) for a in _args(p))
    out_x = greeks.batch_greeks(spec, sol, ks, *args, american=True,
                                option_type="digital_call",
                                param_jacobian=True)
    out_f = greeks.batch_greeks(spec, pal, ks, *args, american=True,
                                option_type="digital_call",
                                param_jacobian=True)
    for k in out_x:
        np.testing.assert_allclose(
            np.array(out_f[k]), np.array(out_x[k]), rtol=0, atol=1e-9,
            err_msg=k)
    # K=90 < s0=100: the spot node is pinned at payoff 1 — price exactly
    # 1, theta exactly 0 (complementarity kills the spurious +r_d)
    assert float(out_x["price"][0]) == 1.0
    assert abs(float(out_x["theta"][0])) < 1e-12


def test_digital_guards():
    """Vanilla-only consumers reject digitals loudly."""
    from heston_tpu.models.calibration import (CalibrationTargets,
                                               vega_weights)

    tg = CalibrationTargets(
        strikes=np.array([100.0]), prices=np.array([0.5]),
        maturities=np.array([1.0]), s0=100.0, r_d=R, r_f=0.0,
        option_type="digital_call")
    with pytest.raises(ValueError, match="vanilla-only"):
        vega_weights(tg)
