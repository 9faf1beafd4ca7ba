"""Calibration fit-quality tests at reference sizes for all six scenarios.

The reference's acceptance bar for each of its six LM drivers is actual
fit quality after <= 15 iterations at the production sizes (60 strikes,
ref: src/heston_calibration.cpp:58, :443-461; 10x20 / 4x20 maturity
ladders, :2460-2494, :3245). These tests raise that bar: the market is a
*Heston* market — the semi-analytic CF pricer for European scenarios
(cross-model), the PDE solver itself at the true parameters for
American/dividend scenarios (self-consistent) — the fit starts from a
perturbed parameter vector, and we assert both SSE collapse and recovery
of the identifiable parameters. rho, sigma and v0 are well identified by
a vanilla chain; kappa and eta are notoriously weakly identified (their
product with maturity is what matters at T <= 1), so they only get sanity
bounds.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from heston_tpu.config import (
    CalibrationConfig,
    GridSpec,
    HestonParams,
    SolverConfig,
)
from heston_tpu.models import calibration as calib
from heston_tpu.models import heston_cf
from heston_tpu.scenarios import SCENARIOS

TRUE = HestonParams()  # kappa=1.5 eta=0.04 sigma=0.3 rho=-0.9 v0=0.04
INIT = dataclasses.replace(
    TRUE, kappa=1.2, eta=0.06, sigma=0.45, rho=-0.5, v0=0.06)
SPEC = GridSpec(m1=50, m2=25)          # ref: src/heston_calibration.cpp:48
SOLVER = SolverConfig(n_steps=20)
SPY = 20                               # steps per year for ladders


def _heston_market(targets):
    """Market prices from the TRUE Heston parameters: CF for European
    no-dividend chains, the PDE itself otherwise."""
    prices = np.zeros_like(targets.prices)
    euro_vanilla = (not targets.american) and targets.dividends is None
    for t in np.unique(targets.maturities):
        idx = targets.maturities == t
        ks = jnp.asarray(targets.strikes[idx])
        if euro_vanilla:
            prices[idx] = np.asarray(heston_cf.price_chain(
                targets.s0, ks, TRUE.v0, TRUE.kappa, TRUE.eta, TRUE.sigma,
                TRUE.rho, targets.r_d, float(t)))
        else:
            n = max(1, int(round(SPY * float(t))))
            sol = dataclasses.replace(SOLVER, n_steps=n, maturity=float(t))
            prices[idx] = np.asarray(calib.base_prices(
                SPEC, sol, ks, targets.s0, jnp.asarray(TRUE.bumpable()),
                targets.r_d, targets.r_f, american=targets.american,
                dividends=targets.dividends))
    return prices


def _run(name):
    sc = SCENARIOS[name]
    targets = sc.build_targets()
    targets = dataclasses.replace(targets, prices=_heston_market(targets))
    cfg = CalibrationConfig(max_iter=15, tol=1e-8)
    result = calib.calibrate(targets, SPEC, SOLVER, INIT, cfg,
                             steps_per_year=SPY)
    sse0 = result.history[0]["sse"]
    return result, sse0


# Two regimes, measured empirically:
#  * self-consistent scenarios (market = the PDE itself at TRUE): the
#    global SSE minimum is exactly TRUE, and the LM finds it -- recovery
#    is essentially exact (kappa 1.500, sigma 0.300, rho -0.900 observed),
#    so the bounds are tight;
#  * CF-market scenarios (market = semi-analytic Heston): the ~1e-2
#    PDE-discretization error at the reference's 50x25x20 grid interacts
#    with the classic kappa/sigma/rho identifiability ridge (LM absorbs
#    model error by sliding along it, e.g. rho -> -1 with sigma inflated),
#    so only the well-identified v0 gets a parameter bound; the fit-
#    quality bar (the reference's own acceptance criterion,
#    ref: src/heston_calibration.cpp:443-461) still applies. The ridge is
#    a property of single-surface Heston calibration, not of this
#    implementation -- test_cf_pricer_recovers_exactly shows the same LM
#    recovers exactly when pricer and market agree.
SELF_CONSISTENT = {
    #                       sse drop, |drho|, |dsigma|, |dv0|
    "american":               (1e4, 0.01, 0.01, 0.001),
    "dividends":              (1e4, 0.01, 0.01, 0.001),
    "american_dividends":     (1e4, 0.01, 0.01, 0.001),
    "american_dividends_multi": (1e4, 0.01, 0.01, 0.001),
}
CF_MARKET = {
    #                       sse drop, |dv0|
    "european":               (100.0, 0.01),
    "european_multi":         (100.0, 0.01),
}


@pytest.mark.slow
@pytest.mark.parametrize("name", list(SELF_CONSISTENT))
def test_scenario_recovers_parameters(name):
    drop, tol_rho, tol_sigma, tol_v0 = SELF_CONSISTENT[name]
    result, sse0 = _run(name)
    p = result.params
    assert result.final_error < sse0 / drop, (
        f"SSE only {sse0:.4g} -> {result.final_error:.4g}")
    assert abs(p.rho - TRUE.rho) < tol_rho, p
    assert abs(p.sigma - TRUE.sigma) < tol_sigma, p
    assert abs(p.v0 - TRUE.v0) < tol_v0, p
    assert abs(p.kappa - TRUE.kappa) < 0.05 and abs(p.eta - TRUE.eta) < 0.005


@pytest.mark.slow
@pytest.mark.parametrize("name", list(CF_MARKET))
def test_scenario_fits_cf_market(name):
    drop, tol_v0 = CF_MARKET[name]
    result, sse0 = _run(name)
    p = result.params
    assert result.final_error < sse0 / drop, (
        f"SSE only {sse0:.4g} -> {result.final_error:.4g}")
    assert abs(p.v0 - TRUE.v0) < tol_v0, p
    # ridge-mobile params must still land in a sane region
    assert 0.1 < p.kappa < 10.0 and 0.005 < p.eta < 0.5, p
    assert 0.05 < p.sigma < 1.0 and -1.0 <= p.rho < 0.0, p


@pytest.mark.slow
def test_cf_pricer_recovers_exactly():
    """Model-consistent control for the CF-market cases: when the LM's
    pricer IS the CF pricer, the 60-strike chain recovers the full
    parameter vector -- isolating the CF-market bias above as pricer/market
    model mismatch, not an LM defect. Runs the fully on-chip LM
    (calibrate_device, pricer='cf')."""
    import jax.numpy as jnp

    from heston_tpu.scenarios import SCENARIOS

    sc = SCENARIOS["european"]
    targets = sc.build_targets()
    market = _heston_market(targets)
    cfg = CalibrationConfig(max_iter=25, tol=1e-12)
    tv, info = calib.calibrate_device(
        SPEC, SOLVER, jnp.asarray(targets.strikes), jnp.asarray(market),
        targets.s0, jnp.asarray(INIT.bumpable()), targets.r_d, targets.r_f,
        cfg=cfg, pricer="cf")
    tv = np.asarray(tv)
    want = np.asarray(TRUE.bumpable())
    # kappa rides the flat kappa/eta direction a little even at SSE ~4e-9
    # (measured recovery: 1.5103, 0.03959, 0.30023, -0.90005, 0.04038)
    atol = np.array([5e-2, 2e-3, 1e-3, 1e-3, 1e-3])
    assert np.all(np.abs(tv - want) < atol), tv
