"""Semi-analytic Heston oracle tests.

Key finding: the reference's 'MC oracle convergence ref' constant
8.8948693600540167 (ref: src/solver.cpp:1666) is reproduced by the
characteristic-function price to ~1e-12 — it is the TRUE Heston value.
The FD golden 8.8943383103218502 sits 5.3e-4 below it: the residual bias
of the reference discretization's domain truncation / boundary treatment,
which our solver reproduces exactly."""

import jax.numpy as jnp
import numpy as np

from heston_tpu.models import heston_cf

P = dict(s0=100.0, v0=0.04, kappa=1.5, eta=0.04, sigma=0.3, rho=-0.9,
         r=0.025, t=1.0)

TRUE_HESTON = 8.8948693600540167    # ref: src/solver.cpp:1666
FD_GOLDEN = 8.8943383103218502      # ref: src/solver.cpp:399


def test_cf_reproduces_reference_true_value():
    got = float(heston_cf.call_price(
        P["s0"], 100.0, P["v0"], P["kappa"], P["eta"], P["sigma"],
        P["rho"], P["r"], P["t"]))
    assert abs(got - TRUE_HESTON) < 1e-10


def test_fd_golden_is_truncation_biased_true_value():
    got = float(heston_cf.call_price(
        P["s0"], 100.0, P["v0"], P["kappa"], P["eta"], P["sigma"],
        P["rho"], P["r"], P["t"]))
    assert abs(got - FD_GOLDEN) < 1e-3   # small, systematic FD-domain bias


def test_cf_degenerates_to_black_scholes():
    """sigma -> 0 with v0 = eta makes Heston collapse to BS(vol=sqrt(v0))."""
    from heston_tpu.models import bs

    got = float(heston_cf.call_price(
        100.0, 105.0, 0.04, 2.0, 0.04, 1e-4, 0.0, 0.02, 0.8, n_quad=384))
    want = float(bs.call_price(100.0, 105.0, 0.02, 0.2, 0.8))
    assert abs(got - want) < 1e-4


def test_cf_chain_monotone_and_positive():
    ks = jnp.linspace(60.0, 150.0, 10)
    prices = np.array(heston_cf.price_chain(
        P["s0"], ks, P["v0"], P["kappa"], P["eta"], P["sigma"], P["rho"],
        P["r"], P["t"]))
    assert np.all(prices > 0)
    assert np.all(np.diff(prices) < 0)


def test_cf_calibration_fits_synthetic_heston_market():
    """The device LM with the semi-analytic pricer fits a chain generated
    from known Heston parameters. (Parameter recovery itself is not
    asserted: the (kappa, eta) direction is famously near-degenerate, so LM
    may land elsewhere in the shallow valley with an equally good fit.)"""
    from heston_tpu.config import (
        CalibrationConfig, GridSpec, SolverConfig)
    from heston_tpu.models import calibration as calib

    strikes = jnp.linspace(80.0, 120.0, 20)
    market = heston_cf.price_chain(
        100.0, strikes, 0.06, 2.0, 0.05, 0.4, -0.6, 0.025, 1.0)
    init = jnp.array([1.0, 0.03, 0.2, -0.3, 0.03])
    cfg = CalibrationConfig(max_iter=25, tol=1e-10, jacobian_mode="ad")
    tv, info = calib.calibrate_device(
        GridSpec(m1=10, m2=6), SolverConfig(n_steps=2),  # unused by cf
        strikes, market, 100.0, init, 0.025, 0.0, cfg=cfg, pricer="cf")
    fitted = np.asarray(info["fitted_prices"])
    rms = float(np.sqrt(np.mean((fitted - np.asarray(market)) ** 2)))
    assert rms < 2e-2
    assert float(info["final_error"]) < 1e-2


def test_pde_converges_to_cf_modulo_truncation():
    """High-resolution PDE price lands between the FD golden and the true
    value, far closer to the golden (same discretization family)."""
    import jax

    from heston_tpu.config import GridSpec, SolverConfig
    from heston_tpu.models import douglas

    spec = GridSpec(m1=100, m2=75)
    solver = SolverConfig(n_steps=200, a2_variant="central")
    price = float(douglas.price_option(
        spec, solver, 100.0, 100.0, P["kappa"], P["eta"], P["sigma"],
        P["rho"], P["v0"], P["r"], 0.0))
    assert abs(price - FD_GOLDEN) < abs(price - TRUE_HESTON) + 1e-3
    assert abs(price - TRUE_HESTON) < 2e-2
