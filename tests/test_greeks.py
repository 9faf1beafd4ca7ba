"""AD Greeks tests: against finite differences and financial sanity."""

import jax.numpy as jnp
import numpy as np

from heston_tpu.config import GridSpec, SolverConfig
from heston_tpu.models import douglas, greeks

SPEC = GridSpec(m1=30, m2=15)
SOLVER = SolverConfig(n_steps=10, a2_variant="upwind")


def _price(params, k, s0=100.0, **over):
    vals = dict(kappa=params.kappa, eta=params.eta, sigma=params.sigma,
                rho=params.rho, v0=params.v0)
    vals.update(over)
    return float(douglas.price_option(
        SPEC, SOLVER, k, s0, vals["kappa"], vals["eta"], vals["sigma"],
        vals["rho"], vals["v0"], params.r_d, params.r_f))


def test_greeks_match_central_differences(params):
    g = {k: float(v) for k, v in greeks.price_and_greeks(
        SPEC, SOLVER, 100.0, 100.0, params.kappa, params.eta, params.sigma,
        params.rho, params.v0, params.r_d, params.r_f).items()}
    eps = 1e-5
    fd_delta = (_price(params, 100.0, s0=100.0 + eps)
                - _price(params, 100.0, s0=100.0 - eps)) / (2 * eps)
    assert abs(g["delta"] - fd_delta) < 1e-3 * max(1.0, abs(fd_delta))
    fd_vega = (_price(params, 100.0, v0=params.v0 + eps)
               - _price(params, 100.0, v0=params.v0 - eps)) / (2 * eps)
    assert abs(g["vega_v0"] - fd_vega) < 1e-2 * max(1.0, abs(fd_vega))


def test_greeks_financial_sanity(params):
    g = greeks.price_and_greeks(
        SPEC, SOLVER, 100.0, 100.0, params.kappa, params.eta, params.sigma,
        params.rho, params.v0, params.r_d, params.r_f)
    assert 0.3 < float(g["delta"]) < 0.9      # ATM call delta
    assert float(g["vega_v0"]) > 0.0          # more variance -> dearer call
    assert float(g["d_eta"]) > 0.0            # higher long-run var -> dearer
    assert float(g["price"]) > 0.0


def test_greeks_pallas_engine_matches_scan(params):
    """engine='pallas' greeks: parameter sensitivities through the fused
    kernel's forward-mode variant, delta through the XLA tangent — all
    equal to the pure-XLA AD greeks to roundoff."""
    import dataclasses

    p = params
    spec = GridSpec(m1=16, m2=10)
    want = greeks.price_and_greeks(
        spec, SolverConfig(n_steps=6), 100.0, 100.0, p.kappa, p.eta,
        p.sigma, p.rho, p.v0, p.r_d, p.r_f, american=True)
    got = greeks.price_and_greeks(
        spec, SolverConfig(n_steps=6, solver_engine="pallas"), 100.0,
        100.0, p.kappa, p.eta, p.sigma, p.rho, p.v0, p.r_d, p.r_f,
        american=True)
    for k in want:
        np.testing.assert_allclose(float(got[k]), float(want[k]),
                                   rtol=1e-9, atol=1e-10, err_msg=k)
