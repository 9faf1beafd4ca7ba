"""Calibration scenario presets mirroring the reference's six drivers.

The reference hardcodes six `test_calibration_*` functions (European,
American, dividends, American+dividends, and European / American+dividend
multi-maturity chains; ref: src/heston_calibration.cpp:26, :515, :1036,
:1588, :2428, :3245). Here each scenario is a config preset over one generic
runner: synthetic Black-Scholes market at flat vol 0.2, LM fit of the five
Heston parameters, CSV export with implied-vol differences.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import numpy as np
import jax.numpy as jnp

from heston_tpu.config import (
    CalibrationConfig,
    DividendSchedule,
    GridSpec,
    HestonParams,
    SolverConfig,
)
from heston_tpu.models import bs
from heston_tpu.models import calibration as calib
from heston_tpu.utils import io as hio

# Dividend schedule used by the reference's dividend calibrations
# (ref: src/heston_calibration.cpp:1090-1092)
CALIB_DIVIDENDS = DividendSchedule(
    dates=(0.25, 0.75), amounts=(0.5, 0.5), percentages=(0.01, 0.01))

# "True" market parameters for self-consistent PDE-generated markets
# (market="pde"): American-put chains have no BS/European analog that the
# model could fit exactly — a flat-vol EUROPEAN BS target chain would
# leave an irreducible early-exercise-premium residual — so the market is
# the framework's own pricer at these (documented) parameters and the
# scenario is a parameter-recovery exercise from the perturbed default
# init. Generated on the scenario's own spec/solver inside run_scenario,
# so model and market share one discretization.
PDE_MARKET_PARAMS = HestonParams(
    kappa=2.0, eta=0.06, sigma=0.45, rho=-0.6, v0=0.06)


@dataclasses.dataclass(frozen=True)
class Scenario:
    name: str
    num_strikes: int = 60
    maturities: tuple = (1.0,)
    strikes_per_maturity: Optional[int] = None
    american: bool = False
    dividends: Optional[DividendSchedule] = None
    s0: float = 100.0
    r_d: float = 0.025
    r_f: float = 0.0
    max_iter: int = 15
    tol: float = 0.1
    option_type: str = "call"   # "put" = framework extension (the
                                # reference's six drivers are calls-only)
    market: str = "bs"          # "pde": self-consistent chain priced by
                                # the framework at PDE_MARKET_PARAMS

    def build_targets(self, spec: Optional[GridSpec] = None,
                      solver: Optional[SolverConfig] = None,
                      steps_per_year: int = 20) -> calib.CalibrationTargets:
        if len(self.maturities) == 1:
            # single maturity: strikes 0.7*S0 + i (ref:
            # src/heston_calibration.cpp:62)
            strikes = np.array(
                [self.s0 * 0.7 + i for i in range(self.num_strikes)])
            mats = np.full(self.num_strikes, self.maturities[0])
        else:
            # multi-maturity ladder (ref: src/heston_calibration.cpp:2465)
            per = self.strikes_per_maturity or 20
            ks = np.array([self.s0 * 0.8 + i * 0.4 * self.s0 / per
                           for i in range(per)])
            strikes = np.tile(ks, len(self.maturities))
            mats = np.repeat(np.asarray(self.maturities), per)
        prices = np.zeros_like(strikes)
        if self.market == "pde":
            if spec is None or solver is None:
                raise ValueError("market='pde' targets need spec and solver")
            from heston_tpu.models import douglas  # lazy: heavy import

            for t in np.unique(mats):
                idx = mats == t
                sol_t = dataclasses.replace(
                    solver,
                    n_steps=max(1, int(round(steps_per_year * float(t)))),
                    maturity=float(t))
                prices[idx] = np.asarray(douglas.price_batch_params(
                    spec, sol_t, jnp.asarray(strikes[idx]), self.s0,
                    dataclasses.replace(PDE_MARKET_PARAMS, r_d=self.r_d,
                                        r_f=self.r_f),
                    american=self.american, dividends=self.dividends,
                    option_type=self.option_type))
            return calib.CalibrationTargets(
                strikes=strikes, maturities=mats, prices=prices, s0=self.s0,
                r_d=self.r_d, r_f=self.r_f, american=self.american,
                dividends=self.dividends, option_type=self.option_type)
        for t in np.unique(mats):
            idx = mats == t
            if self.dividends is not None:
                prices[idx] = np.asarray(bs.generate_market_data_with_dividends(
                    self.s0, float(t), self.r_d, jnp.asarray(strikes[idx]),
                    self.dividends.dates, self.dividends.amounts,
                    self.dividends.percentages,
                    option_type=self.option_type))
            else:
                prices[idx] = np.asarray(bs.generate_market_data(
                    self.s0, float(t), self.r_d, jnp.asarray(strikes[idx]),
                    option_type=self.option_type))
        return calib.CalibrationTargets(
            strikes=strikes, maturities=mats, prices=prices, s0=self.s0,
            r_d=self.r_d, r_f=self.r_f, american=self.american,
            dividends=self.dividends, option_type=self.option_type)


SCENARIOS = {
    "european": Scenario("european"),
    "american": Scenario("american", american=True),
    "dividends": Scenario("dividends", dividends=CALIB_DIVIDENDS),
    "american_dividends": Scenario(
        "american_dividends", american=True, dividends=CALIB_DIVIDENDS),
    "european_multi": Scenario(
        "european_multi",
        maturities=(0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0),
        strikes_per_maturity=20),
    "american_dividends_multi": Scenario(
        "american_dividends_multi", american=True,
        dividends=CALIB_DIVIDENDS,
        maturities=(0.25, 0.5, 0.75, 1.0), strikes_per_maturity=20),
    # framework extensions (no reference analog; the reference is
    # calls-only). european_puts fits a flat-vol BS put chain — exactly
    # consistent, like the reference's European call scenario.
    # american_puts is a parameter-recovery fit against a
    # SELF-CONSISTENT American-put chain priced by the framework at
    # PDE_MARKET_PARAMS: American puts carry a strictly positive
    # early-exercise premium, so a European BS target chain would leave
    # an irreducible residual and bias the fit.
    # tol: these two are recovery exercises, so the delta-norm stop must
    # be tight enough to let LM actually iterate (the reference's 0.1 is
    # tuned for its BS-market misfit floor)
    "european_puts": Scenario("european_puts", option_type="put",
                              tol=1e-4),
    "american_puts": Scenario(
        "american_puts", american=True, option_type="put", market="pde",
        tol=1e-4),
}


def _group_steps(targets, steps_per_year: int):
    """Static (start, end, n_steps) slices per maturity group, assuming the
    targets are ordered by maturity (build_targets guarantees this)."""
    out = []
    mats = targets.maturities
    start = 0
    for i in range(1, len(mats) + 1):
        if i == len(mats) or mats[i] != mats[start]:
            n = max(1, int(round(steps_per_year * float(mats[start]))))
            out.append((start, i, n))
            start = i
    return tuple(out)


def run_scenario(
    name: str,
    spec: GridSpec = GridSpec(m1=50, m2=25),
    solver: SolverConfig = SolverConfig(n_steps=20),
    init: HestonParams = HestonParams(),
    steps_per_year: Optional[int] = 20,
    csv_path: Optional[str] = None,
    pricing_fns=None,
    verbose: bool = True,
    device_loop: bool = False,
    weighting: str = "none",
):
    """device_loop=True runs the fully on-chip LM (calibrate_device) —
    one jitted while_loop, no host round-trips per iteration.

    weighting="vega" fits with the market-standard 1/vega^2 weights
    (implied-vol objective to first order; calibration.vega_weights) —
    framework extension over the reference's unweighted price SSE."""
    scenario = SCENARIOS[name]
    targets = scenario.build_targets(
        spec=spec, solver=solver,
        steps_per_year=steps_per_year or solver.n_steps)
    if weighting == "vega":
        targets = dataclasses.replace(
            targets, weights=calib.vega_weights(targets))
    elif weighting != "none":
        raise ValueError(f"unknown weighting {weighting!r}")
    cfg = CalibrationConfig(max_iter=scenario.max_iter, tol=scenario.tol)
    import jax

    if not jax.config.read("jax_enable_x64"):
        # float32: a 1e-6 FD bump drowns in rounding noise — use the
        # exact AD Jacobian (host loop and device loop alike)
        cfg = dataclasses.replace(cfg, jacobian_mode="ad")
    t0 = time.perf_counter()
    if device_loop:
        import jax.numpy as jnp

        groups = _group_steps(targets, steps_per_year or solver.n_steps)
        if len(groups) == 1:
            groups = ()
        tv, info = calib.calibrate_device(
            spec, solver, jnp.asarray(targets.strikes),
            jnp.asarray(targets.prices), targets.s0,
            jnp.asarray(init.bumpable()), targets.r_d, targets.r_f,
            cfg=cfg, american=targets.american,
            dividends=targets.dividends, group_steps=groups,
            option_type=targets.option_type,
            weights=None if targets.weights is None
            else jnp.asarray(targets.weights))
        tv = np.asarray(tv)
        result = calib.CalibrationResult(
            params=dataclasses.replace(
                init, kappa=float(tv[0]), eta=float(tv[1]),
                sigma=float(tv[2]), rho=float(tv[3]), v0=float(tv[4])),
            initial_params=init,
            final_error=float(info["final_error"]),
            iterations=int(info["iterations"]),
            converged=bool(info["converged"]),
            fitted_prices=np.asarray(info["fitted_prices"]),
            market_prices=np.asarray(targets.prices),
            strikes=np.asarray(targets.strikes),
            history=[],
            total_pde_solves=len(targets.strikes) * 7
            * int(info["iterations"]),
        )
    else:
        result = calib.calibrate(
            targets, spec, solver, init, cfg, steps_per_year=steps_per_year,
            verbose=verbose, pricing_fns=pricing_fns)
    wall = time.perf_counter() - t0
    if verbose:
        p = result.params
        print(f"[{name}] {result.iterations} iters, "
              f"sse={result.final_error:.6e}, wall={wall:.3f}s, "
              f"kappa={p.kappa:.4f} eta={p.eta:.4f} sigma={p.sigma:.4f} "
              f"rho={p.rho:.4f} v0={p.v0:.4f}")
    if csv_path:
        hio.export_calibration_fit(
            csv_path, result, scenario.s0, max(scenario.maturities),
            scenario.r_d, dividends=scenario.dividends,
            option_type=scenario.option_type,
            # multi-maturity: each point's IV inverts at its own maturity
            maturities=(targets.maturities
                        if len(scenario.maturities) > 1 else None))
    return result, wall
