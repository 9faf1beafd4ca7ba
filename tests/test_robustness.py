"""Extreme-parameter robustness: prices stay finite and ordered across
Feller-violating, boundary-correlation and tiny/huge-variance regimes."""

import jax.numpy as jnp
import numpy as np
import pytest

from heston_tpu.config import GOLDEN_DIVIDENDS, GridSpec, SolverConfig
from heston_tpu.models import douglas

SPEC = GridSpec(m1=30, m2=15)
SOLVER = SolverConfig(n_steps=12, a2_variant="upwind")

REGIMES = {
    "feller_violating": dict(kappa=0.5, eta=0.02, sigma=0.9, rho=-0.7,
                             v0=0.04),
    "rho_plus_one": dict(kappa=1.5, eta=0.04, sigma=0.3, rho=1.0, v0=0.04),
    "rho_minus_one": dict(kappa=1.5, eta=0.04, sigma=0.3, rho=-1.0,
                          v0=0.04),
    "tiny_v0": dict(kappa=2.0, eta=0.09, sigma=0.2, rho=-0.5, v0=1e-3),
    "high_v0": dict(kappa=2.0, eta=0.09, sigma=0.2, rho=-0.5, v0=1.5),
    "fast_reversion": dict(kappa=15.0, eta=0.04, sigma=0.5, rho=-0.9,
                           v0=0.04),
}


@pytest.mark.parametrize("engine", ["scan", "pallas"])
@pytest.mark.parametrize("name", list(REGIMES))
def test_extreme_regimes_finite_and_ordered(params, name, engine):
    import dataclasses

    r = REGIMES[name]
    solver = dataclasses.replace(SOLVER, solver_engine=engine)
    strikes = jnp.array([70.0, 90.0, 100.0, 115.0, 140.0])
    prices = np.array(douglas.price_batch(
        SPEC, solver, strikes, 100.0, r["kappa"], r["eta"], r["sigma"],
        r["rho"], r["v0"], params.r_d, params.r_f,
        american=True, dividends=GOLDEN_DIVIDENDS))
    assert np.all(np.isfinite(prices)), f"{name}: non-finite prices"
    assert np.all(np.diff(prices) < 0), f"{name}: not decreasing in strike"
    # deep ITM at least intrinsic-ish after dividends, deep OTM near zero
    assert prices[0] > 10.0
    assert prices[-1] < prices[0]
