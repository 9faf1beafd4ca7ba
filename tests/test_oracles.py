"""Black-Scholes and Monte-Carlo oracle tests (the reference's oracle
comparisons, ref: src/bs.cpp:45-55, src/MC_hes.cpp:165-198)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heston_tpu.config import GridSpec, SolverConfig
from heston_tpu.models import bs, mc


def test_bs_round_trip():
    """price -> implied vol -> vol (ref: src/bs.cpp:45-55)."""
    strikes = jnp.array([70.0, 90.0, 100.0, 115.0, 140.0])
    prices = bs.generate_market_data(100.0, 1.0, 0.025, strikes)
    ivs = np.array(bs.implied_vol_chain(prices, 100.0, strikes, 0.025, 1.0))
    np.testing.assert_allclose(ivs, 0.2, atol=1e-6)


def test_bs_vega_matches_fd():
    eps = 1e-6
    v = 0.3
    fd = (float(bs.call_price(100.0, 95.0, 0.02, v + eps, 0.7))
          - float(bs.call_price(100.0, 95.0, 0.02, v - eps, 0.7))) / (2 * eps)
    vega = float(bs.call_vega(100.0, 95.0, 0.02, v, 0.7))
    assert abs(fd - vega) < 1e-5


def test_bs_dividend_adjusted_chain():
    strikes = jnp.array([90.0, 100.0, 110.0])
    plain = np.array(bs.generate_market_data(100.0, 1.0, 0.025, strikes))
    with_div = np.array(bs.generate_market_data_with_dividends(
        100.0, 1.0, 0.025, strikes, (0.5,), (1.0,), (0.02,)))
    assert np.all(with_div < plain)   # dividends lower call prices
    # a dividend after maturity is ignored (ref: src/bs.hpp:94)
    late = np.array(bs.generate_market_data_with_dividends(
        100.0, 1.0, 0.025, strikes, (1.5,), (5.0,), (0.0,)))
    np.testing.assert_array_equal(late, plain)


def test_mc_feller_condition(params):
    assert not mc.feller_condition(params.kappa, params.eta, params.sigma) \
        or 2 * params.kappa * params.eta > params.sigma ** 2


def test_mc_scheme_auto_dispatch(params):
    """scheme='auto' applies the reference's Feller-driven selection
    (ref: src/MC_hes.cpp:18-20, 102): truncation when 2*kappa*eta >
    sigma^2, reflection when violated — and matches the explicit scheme
    bitwise."""
    p = params
    # default params satisfy Feller -> truncation
    assert mc.select_scheme(p.kappa, p.eta, p.sigma) == "truncation"
    # sigma large enough to violate it -> reflection
    assert mc.select_scheme(p.kappa, p.eta, 10.0 * p.sigma) == "reflection"
    args = (jax.random.PRNGKey(1), 100.0, p.v0, 100.0, p.r_d, p.r_f,
            p.kappa, p.eta, p.sigma, p.rho, 1.0)
    auto, _ = mc.price_european_call_mc(*args, num_paths=4_000, n_steps=20)
    expl, _ = mc.price_european_call_mc(*args, num_paths=4_000, n_steps=20,
                                        scheme="truncation")
    assert float(auto) == float(expl)


def test_mc_antithetic_tightens_ci(params):
    """Antithetic variates: same path budget, ~half the CI, price inside
    the plain estimator's band (pair-mean variance estimator)."""
    p = params
    args = (jax.random.PRNGKey(5), 100.0, p.v0, 100.0, p.r_d, p.r_f,
            p.kappa, p.eta, p.sigma, p.rho, 1.0)
    plain, h_plain = mc.price_european_call_mc(
        *args, num_paths=40_000, n_steps=50)
    anti, h_anti = mc.price_european_call_mc(
        *args, num_paths=40_000, n_steps=50, antithetic=True)
    assert float(h_anti) < 0.75 * float(h_plain), (
        float(h_anti), float(h_plain))
    assert abs(float(anti) - float(plain)) < 2.0 * (
        float(h_plain) + float(h_anti))
    with pytest.raises(ValueError, match="even num_paths"):
        mc.price_european_call_mc(*args, num_paths=4_001, n_steps=10,
                                  antithetic=True)


def test_mc_matches_pde_reference(params):
    """MC price consistent with the converged PDE/golden value 8.894
    (ref MC oracle value 8.8948693600540167, src/solver.cpp:1666)."""
    p = params
    price, ci = mc.price_european_call_mc(
        jax.random.PRNGKey(7), 100.0, p.v0, 100.0, p.r_d, p.r_f,
        p.kappa, p.eta, p.sigma, p.rho, 1.0, num_paths=60_000)
    assert abs(float(price) - 8.8943383103218502) < max(4 * float(ci), 0.15)
    assert 0.0 < float(ci) < 0.2


def test_lsmc_american_put_matches_pde(params):
    """Longstaff-Schwartz MC — a fully independent American pricer —
    agrees with the PDE's lambda-multiplier LCP American put (the
    extension has no upstream golden; this is its external oracle).
    Tolerance = MC half-width + Euler bias + LSMC policy bias."""
    import jax

    from heston_tpu.config import GridSpec, SolverConfig
    from heston_tpu.models import douglas, mc

    price, half = mc.price_american_lsmc(
        jax.random.PRNGKey(0), 100.0, params.v0, 100.0, params.r_d,
        params.r_f, params.kappa, params.eta, params.sigma, params.rho,
        1.0, num_paths=60_000, n_steps=50)
    pde = float(douglas.price_option(
        GridSpec(m1=100, m2=50), SolverConfig(n_steps=80), 100.0, 100.0,
        params.kappa, params.eta, params.sigma, params.rho, params.v0,
        params.r_d, params.r_f, american=True, option_type="put"))
    assert abs(float(price) - pde) < 2.0 * float(half) + 0.08, (
        float(price), float(half), pde)


def test_lsmc_american_call_equals_european(params):
    """No dividends, r_f = 0: early exercise of a call is never optimal,
    so the LSMC American call must track the European CF price (low bias
    from the suboptimal policy + Euler only)."""
    import jax

    from heston_tpu.models import heston_cf, mc

    price, half = mc.price_american_lsmc(
        jax.random.PRNGKey(3), 100.0, params.v0, 100.0, params.r_d,
        params.r_f, params.kappa, params.eta, params.sigma, params.rho,
        1.0, num_paths=60_000, n_steps=50, option_type="call")
    euro = float(heston_cf.call_price(
        100.0, 100.0, params.v0, params.kappa, params.eta, params.sigma,
        params.rho, params.r_d, 1.0))
    assert euro - 2.0 * float(half) - 0.15 < float(price) < euro \
        + 2.0 * float(half) + 0.05, (float(price), euro)


def test_lsmc_deep_itm_put_is_intrinsic(params):
    """Deep-ITM American put: immediate exercise dominates -> intrinsic."""
    import jax

    from heston_tpu.models import mc

    price, _ = mc.price_american_lsmc(
        jax.random.PRNGKey(2), 100.0, params.v0, 130.0, params.r_d,
        params.r_f, params.kappa, params.eta, params.sigma, params.rho,
        1.0, num_paths=20_000, n_steps=50)
    assert float(price) >= 30.0 - 1e-9
    assert float(price) < 31.5


@pytest.mark.slow
def test_mc_euro_dividend_golden(params):
    """On-path dividend jumps: MC reproduces the reference's
    European-dividend golden 3.839290124997349 (src/solver.cpp:834)
    within its confidence band + Euler bias."""
    import jax

    from heston_tpu.config import GOLDEN_DIVIDENDS
    from heston_tpu.models import mc

    p, h = mc.price_european_call_mc(
        jax.random.PRNGKey(0), 100.0, params.v0, 100.0, params.r_d,
        params.r_f, params.kappa, params.eta, params.sigma, params.rho,
        1.0, num_paths=800_000, n_steps=400, dividends=GOLDEN_DIVIDENDS,
        antithetic=True)
    assert float(h) <= 0.012, float(h)    # r2 CI was +-0.028
    assert abs(float(p) - 3.839290124997349) < 2.0 * float(h) + 0.02, (
        float(p), float(h))


@pytest.mark.slow
def test_lsmc_american_dividend_golden(params):
    """FULLY INDEPENDENT confirmation of the reference's
    American-dividend golden 5.285130942409008 (src/solver.cpp:1091) —
    the constant an earlier revision wrongly rejected: Longstaff-Schwartz
    MC (different algorithm, different discretization, no shared code
    with the PDE) lands within one standard error of it."""
    import jax

    from heston_tpu.config import GOLDEN_DIVIDENDS
    from heston_tpu.models import mc

    p, h = mc.price_american_lsmc(
        jax.random.PRNGKey(0), 100.0, params.v0, 100.0, params.r_d,
        params.r_f, params.kappa, params.eta, params.sigma, params.rho,
        1.0, num_paths=600_000, n_steps=100, option_type="call",
        dividends=GOLDEN_DIVIDENDS, antithetic=True)
    assert float(h) <= 0.014, float(h)    # r2 CI was +-0.028
    assert abs(float(p) - 5.285130942409008) < 2.0 * float(h) + 0.02, (
        float(p), float(h))


def test_mc_qe_low_bias_at_coarse_steps(params):
    """Andersen QE (framework extension): at 16 steps/year — where Euler
    carries visible discretization bias — QE prices to within its own MC
    noise of the closed-form CF oracle."""
    from heston_tpu.models import heston_cf, mc

    p = params
    truth = float(heston_cf.call_price(
        100.0, 100.0, p.v0, p.kappa, p.eta, p.sigma, p.rho, p.r_d, 1.0))
    qe, h = mc.price_european_call_mc(
        jax.random.PRNGKey(11), 100.0, p.v0, 100.0, p.r_d, p.r_f,
        p.kappa, p.eta, p.sigma, p.rho, 1.0, num_paths=200_000,
        n_steps=16, scheme="qe", antithetic=True)
    assert abs(float(qe) - truth) <= 3.0 * float(h) + 0.01, (
        float(qe), truth, float(h))
    assert 0.0 < float(h) < 0.1


def test_mc_qe_beats_euler_bias(params):
    """Same budget (4 steps/year, shared seed): |QE - CF| << |Euler - CF|.
    Measured at this seed/path count: Euler err +0.067 (~3.5x its MC
    half-width 0.019), QE err +0.0005 — the 0.02 margin makes the
    comparison a stable regression pin, not a statistical race."""
    from heston_tpu.models import heston_cf, mc

    p = params
    truth = float(heston_cf.call_price(
        100.0, 100.0, p.v0, p.kappa, p.eta, p.sigma, p.rho, p.r_d, 1.0))
    common = dict(num_paths=400_000, n_steps=4, antithetic=True)
    qe, _ = mc.price_european_call_mc(
        jax.random.PRNGKey(13), 100.0, p.v0, 100.0, p.r_d, p.r_f,
        p.kappa, p.eta, p.sigma, p.rho, 1.0, scheme="qe", **common)
    eu, _ = mc.price_european_call_mc(
        jax.random.PRNGKey(13), 100.0, p.v0, 100.0, p.r_d, p.r_f,
        p.kappa, p.eta, p.sigma, p.rho, 1.0, scheme="truncation",
        **common)
    assert abs(float(qe) - truth) + 0.02 < abs(float(eu) - truth), (
        float(qe), float(eu), truth)


def test_mc_qe_dividends_and_puts(params):
    """QE composes with the on-path dividend jumps and put payoffs:
    QE + GOLDEN_DIVIDENDS at 32 steps hits the European-dividend golden
    the Euler path needs 400 steps for, and the QE put obeys put-call
    parity against the QE call within joint MC noise."""
    from heston_tpu.config import GOLDEN_DIVIDENDS
    from heston_tpu.models import mc

    p = params
    c, hc = mc.price_european_call_mc(
        jax.random.PRNGKey(4), 100.0, p.v0, 100.0, p.r_d, p.r_f,
        p.kappa, p.eta, p.sigma, p.rho, 1.0, num_paths=200_000,
        n_steps=32, scheme="qe", dividends=GOLDEN_DIVIDENDS,
        antithetic=True)
    assert abs(float(c) - 3.839290124997349) < 3.0 * float(hc) + 0.01, (
        float(c), float(hc))
    # parity on the SAME paths (same key): C - P = e^{-r_f T} S0 - K e^{-r_d T}
    pput, hp = mc.price_european_call_mc(
        jax.random.PRNGKey(6), 100.0, p.v0, 100.0, p.r_d, p.r_f,
        p.kappa, p.eta, p.sigma, p.rho, 1.0, num_paths=200_000,
        n_steps=32, scheme="qe", option_type="put", antithetic=True)
    call2, hc2 = mc.price_european_call_mc(
        jax.random.PRNGKey(6), 100.0, p.v0, 100.0, p.r_d, p.r_f,
        p.kappa, p.eta, p.sigma, p.rho, 1.0, num_paths=200_000,
        n_steps=32, scheme="qe", antithetic=True)
    fwd = 100.0 * np.exp(-p.r_f) - 100.0 * np.exp(-p.r_d)
    assert abs((float(call2) - float(pput)) - fwd) <= float(hc2) + float(hp)


def test_lsmc_qe_american_put_matches_pde(params):
    """LSMC on QE panels: the American put agrees with the PDE LCP at
    LSMC's coarse exercise grid (QE removes the Euler transition bias,
    leaving only policy bias)."""
    from heston_tpu.config import GridSpec, SolverConfig
    from heston_tpu.models import douglas, mc

    p = params
    spec = GridSpec(m1=100, m2=75)
    solver = SolverConfig(n_steps=40)
    pde = float(douglas.price_batch(
        spec, solver, jnp.array([100.0]), 100.0, p.kappa, p.eta,
        p.sigma, p.rho, p.v0, p.r_d, p.r_f, american=True,
        option_type="put")[0])
    lsmc, h = mc.price_american_lsmc(
        jax.random.PRNGKey(9), 100.0, p.v0, 100.0, p.r_d, p.r_f,
        p.kappa, p.eta, p.sigma, p.rho, 1.0, num_paths=120_000,
        n_steps=50, scheme="qe", antithetic=True)
    # LSMC's policy is suboptimal -> slightly low-biased
    assert pde - (4.0 * float(h) + 0.05) <= float(lsmc) <= pde + 2.0 * float(h), (
        float(lsmc), pde, float(h))
