"""DO-scheme end-to-end tests: dense-oracle equivalence, golden values,
convergence toward the reference prices, American LCP properties, dividends.

Golden values and their provenance:
* 8.8943383103218502 (ref: src/solver.cpp:399) and 3.839290124997349
  (ref: src/solver.cpp:834) are CONVERGED reference prices (the reference
  itself prints a nonzero 'Relative error' of its own scheme output against
  them). Our scheme output converges to them under grid/timestep refinement
  (verified here) and matches the reference's discretization exactly
  (verified against an independent dense-matrix transliteration oracle).
* Scheme-level regression constants below (8.869179918466847, ...) are our
  own float64 outputs at the reference's test configurations; they pin down
  the exact discretization (any change in operator assembly or the DO
  sequencing breaks them at 1e-12).
* 5.285130942409008 (ref: src/solver.cpp:1091) is likewise a CONVERGED
  American-dividend price: our solver's output converges to it under
  refinement (5.4303 @ 50x25x20 -> 5.3149 @ 100x50x80 -> 5.2829 @
  200x100x320; asserted in test_american_dividend_golden_high_resolution).
  A round-1 docstring here wrongly claimed this constant violated
  no-arbitrage; that was based on a miscomputed European+dividend price
  and is retracted (euro+div at K=100 is ~3.85 < 5.285 — ordering holds).
  The K=95 scheme pin 8.510573074266677 remains as a regression constant.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heston_tpu.config import (
    GOLDEN_DIVIDENDS,
    GridSpec,
    HestonParams,
    SolverConfig,
)
from heston_tpu.models import douglas

from oracle_dense import (
    boundary_vectors,
    build_grid_np,
    dense_a0,
    dense_a1,
    dense_a2,
    do_scheme_dense,
)

GOLDEN_EURO = 8.8943383103218502          # converged (ref: src/solver.cpp:399)
GOLDEN_DIV = 3.839290124997349            # converged (ref: src/solver.cpp:834)
GOLDEN_AMER_DIV = 5.285130942409008       # converged (ref: src/solver.cpp:1091)
SCHEME_EURO_100x75x20 = 8.869179918466847     # our scheme @ ref config
SCHEME_DIV_50x25x20 = 3.85096222593301        # our scheme @ ref config
SCHEME_AMER_DIV_50x25x20 = 8.510573074266677  # our scheme @ ref config (K=95)


def _price(spec, solver, k, p, **kw):
    fn = jax.jit(
        lambda kk: douglas.price_option(
            spec, solver, kk, 100.0, p.kappa, p.eta, p.sigma, p.rho, p.v0,
            p.r_d, p.r_f, **kw,
        )
    )
    return float(fn(k))


def test_do_loop_matches_dense_oracle(params, rng):
    """Full 2-factor cross-check of the complete DO loop (incl. American)
    against the dense transliteration of the reference."""
    m1, m2, n = 10, 8, 6
    spec = GridSpec(m1=m1, m2=m2)
    solver = SolverConfig(n_steps=n, theta=0.8, maturity=1.0,
                          a2_variant="upwind")
    p = params
    vs, vv, ds, dv = build_grid_np(m1, m2, 100.0, 100.0, p.v0)
    a1 = dense_a1(vs, vv, ds, p.r_d, p.r_f)
    a2 = dense_a2(vs, vv, dv, p.r_d, p.kappa, p.eta, p.sigma, upwind=True)
    a0 = dense_a0(vs, vv, ds, dv, p.rho, p.sigma)
    b1, b2 = boundary_vectors(vs, m1, m2, p.r_d, p.r_f, n, solver.delta_t)
    u0 = (np.maximum(vs[None, :] - 100.0, 0.0)
          * np.ones((m2 + 1, 1))).reshape(-1)

    for american in (False, True):
        want = do_scheme_dense(m1, m2, n, solver.delta_t, 0.8, p.r_f,
                               a0, a1, a2, b1 + b2, b1, b2, u0,
                               american=american)
        inst = douglas.prepare_instance(
            spec, solver, 100.0, 100.0, p.kappa, p.eta, p.sigma, p.rho,
            p.v0, p.r_d, p.r_f)
        got = np.array(jax.jit(lambda i, a=american: douglas.run_time_loop(
            i, solver, p.r_f, american=a))(inst))
        np.testing.assert_allclose(
            got, want.reshape(m2 + 1, m1 + 1), rtol=0, atol=1e-10)


def test_european_scheme_regression(params):
    """Exact scheme output at the reference's golden-test configuration
    (ref: src/solver.cpp:319-405)."""
    spec = GridSpec(m1=100, m2=75)
    solver = SolverConfig(n_steps=20, theta=0.8, maturity=1.0,
                          a2_variant="central")
    got = _price(spec, solver, 100.0, params)
    assert abs(got - SCHEME_EURO_100x75x20) < 1e-10


def test_european_converges_to_golden(params):
    """Refinement drives the price toward the converged reference value."""
    diffs = []
    for m1, m2, n in [(100, 75, 20), (100, 75, 100)]:
        spec = GridSpec(m1=m1, m2=m2)
        solver = SolverConfig(n_steps=n, theta=0.8, maturity=1.0,
                              a2_variant="central")
        diffs.append(abs(_price(spec, solver, 100.0, params) - GOLDEN_EURO))
    assert diffs[1] < diffs[0]
    assert diffs[1] < 1e-2


@pytest.mark.slow
def test_european_golden_high_resolution(params):
    spec = GridSpec(m1=200, m2=150)
    solver = SolverConfig(n_steps=2000, theta=0.8, maturity=1.0,
                          a2_variant="central")
    got = _price(spec, solver, 100.0, params)
    assert abs(got - GOLDEN_EURO) < 2e-3


def test_dividend_scheme_regression(params):
    """Dividend path at the reference config (ref: src/solver.cpp:735-841)."""
    spec = GridSpec(m1=50, m2=25)
    solver = SolverConfig(n_steps=20, theta=0.8, maturity=1.0,
                          a2_variant="upwind")
    got = _price(spec, solver, 100.0, params, dividends=GOLDEN_DIVIDENDS)
    assert abs(got - SCHEME_DIV_50x25x20) < 1e-10
    # scheme error vs the converged golden is small at this resolution
    assert abs(got - GOLDEN_DIV) < 2e-2


@pytest.mark.slow
def test_dividend_golden_high_resolution(params):
    spec = GridSpec(m1=300, m2=150)
    solver = SolverConfig(n_steps=800, theta=0.8, maturity=1.0,
                          a2_variant="upwind")
    got = _price(spec, solver, 100.0, params, dividends=GOLDEN_DIVIDENDS)
    assert abs(got - GOLDEN_DIV) < 5e-4


def test_american_dividend_converges_to_golden(params):
    """Refinement drives the American-dividend price toward the converged
    reference constant (ref: src/solver.cpp:1091). Mirrors
    test_european_converges_to_golden."""
    diffs = []
    for m1, m2, n in [(50, 25, 20), (100, 50, 80)]:
        spec = GridSpec(m1=m1, m2=m2)
        solver = SolverConfig(n_steps=n, theta=0.8, maturity=1.0,
                              a2_variant="upwind")
        diffs.append(abs(_price(spec, solver, 100.0, params, american=True,
                                dividends=GOLDEN_DIVIDENDS)
                         - GOLDEN_AMER_DIV))
    assert diffs[1] < diffs[0]
    assert diffs[1] < 5e-2


@pytest.mark.slow
def test_american_dividend_golden_high_resolution(params):
    spec = GridSpec(m1=200, m2=100)
    solver = SolverConfig(n_steps=320, theta=0.8, maturity=1.0,
                          a2_variant="upwind")
    got = _price(spec, solver, 100.0, params, american=True,
                 dividends=GOLDEN_DIVIDENDS)
    assert abs(got - GOLDEN_AMER_DIV) < 5e-3


def test_american_call_without_dividends_equals_european(params):
    """No early exercise for a call on a non-dividend-paying stock — the
    reference validates its American path the same way
    (ref: src/solver.cpp:519-609 compares against the European golden,
    src/solver.cpp:612 test_lambda_american_call)."""
    spec = GridSpec(m1=50, m2=25)
    solver = SolverConfig(n_steps=20, theta=0.8, maturity=1.0,
                          a2_variant="upwind")
    amer = _price(spec, solver, 100.0, params, american=True)
    euro = _price(spec, solver, 100.0, params)
    assert abs(amer - euro) < 1e-3
    assert amer >= euro - 1e-9


def test_american_dividend_regression_and_no_arbitrage(params):
    spec = GridSpec(m1=50, m2=25)
    solver = SolverConfig(n_steps=20, theta=0.8, maturity=1.0,
                          a2_variant="upwind")
    amer_div = _price(spec, solver, 95.0, params, american=True,
                      dividends=GOLDEN_DIVIDENDS)
    euro_div = _price(spec, solver, 95.0, params, dividends=GOLDEN_DIVIDENDS)
    euro_nodiv = _price(spec, solver, 95.0, params)
    # algorithm regression pin
    assert abs(amer_div - SCHEME_AMER_DIV_50x25x20) < 1e-10
    # no-arbitrage ordering: euro+div <= amer+div <= euro no-div
    assert euro_div - 1e-9 <= amer_div <= euro_nodiv + 1e-9


def test_american_exercise_floor(params):
    """American surface never falls below intrinsic value anywhere."""
    spec = GridSpec(m1=30, m2=15)
    solver = SolverConfig(n_steps=10, theta=0.8, maturity=1.0,
                          a2_variant="upwind")
    p = params
    inst = douglas.prepare_instance(
        spec, solver, 90.0, 100.0, p.kappa, p.eta, p.sigma, p.rho, p.v0,
        p.r_d, p.r_f)
    # jit the whole loop: eager mode compiles every lax.scan per call and
    # none of it lands in the persistent cache
    u = jax.jit(lambda i: douglas.run_time_loop(
        i, solver, p.r_f, american=True, dividends=GOLDEN_DIVIDENDS))(inst)
    assert float(jnp.min(u - inst.u0)) >= -1e-12


def test_batch_matches_sequential(params):
    spec = GridSpec(m1=30, m2=15)
    solver = SolverConfig(n_steps=10, theta=0.8, maturity=1.0,
                          a2_variant="upwind")
    p = params
    strikes = jnp.array([80.0, 95.0, 100.0, 110.0, 130.0])
    batch = douglas.price_batch(
        spec, solver, strikes, 100.0, p.kappa, p.eta, p.sigma, p.rho, p.v0,
        p.r_d, p.r_f)
    seq = [_price(spec, solver, float(k), p) for k in strikes]
    np.testing.assert_allclose(np.array(batch), seq, rtol=0, atol=1e-11)


def test_price_monotone_in_strike(params):
    spec = GridSpec(m1=40, m2=20)
    solver = SolverConfig(n_steps=16, theta=0.8, maturity=1.0,
                          a2_variant="upwind")
    p = params
    strikes = jnp.linspace(70.0, 130.0, 7)
    prices = np.array(douglas.price_batch(
        spec, solver, strikes, 100.0, p.kappa, p.eta, p.sigma, p.rho, p.v0,
        p.r_d, p.r_f))
    assert np.all(np.diff(prices) < 0)  # call price decreasing in strike


def test_solver_engines_agree_end_to_end(params):
    spec = GridSpec(m1=30, m2=15)
    p = params
    res = {}
    for engine in ("scan", "pcr"):
        solver = SolverConfig(n_steps=10, theta=0.8, maturity=1.0,
                              a2_variant="upwind", solver_engine=engine)
        res[engine] = _price(spec, solver, 100.0, p, american=True,
                             dividends=GOLDEN_DIVIDENDS)
    assert abs(res["scan"] - res["pcr"]) < 1e-9
