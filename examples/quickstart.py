"""End-to-end worked example: price a book, compute Greeks, calibrate to a
synthetic market, export the fit.

Runs on CPU or TPU:  python examples/quickstart.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from heston_tpu import GridSpec, HestonParams, SolverConfig, GOLDEN_DIVIDENDS
from heston_tpu.models import bs, calibration, douglas, greeks
from heston_tpu.ops.grid import validate_book
from heston_tpu.utils import io as hio


def main():
    params = HestonParams()          # canonical reference parameter set
    spec = GridSpec(m1=50, m2=25)    # production grid
    solver = SolverConfig(n_steps=20)
    s0 = 100.0

    # --- 1. price a mixed book -------------------------------------------
    strikes = jnp.linspace(80.0, 120.0, 9)
    validate_book(spec, s0, strikes)
    euro = douglas.price_batch_params(spec, solver, strikes, s0, params)
    amer_div = douglas.price_batch_params(
        spec, solver, strikes, s0, params,
        american=True, dividends=GOLDEN_DIVIDENDS)
    print("European:         ", np.round(np.asarray(euro), 4))
    print("American+dividends:", np.round(np.asarray(amer_div), 4))

    # --- 1b. puts (framework extension; the reference is calls-only) -----
    amer_puts = douglas.price_batch_params(
        spec, solver, strikes, s0, params, american=True,
        option_type="put")
    print("American puts:     ", np.round(np.asarray(amer_puts), 4))

    # --- 2. Greeks via AD through the PDE solve --------------------------
    g = greeks.price_and_greeks(
        spec, solver, 100.0, s0, params.kappa, params.eta, params.sigma,
        params.rho, params.v0, params.r_d, params.r_f)
    print("ATM delta %.4f  vega(v0) %.2f" % (g["delta"], g["vega_v0"]))

    # --- 2b. whole-book risk in one batched solve -------------------------
    risk = greeks.batch_greeks(
        spec, solver, strikes, s0, params.kappa, params.eta, params.sigma,
        params.rho, params.v0, params.r_d, params.r_f,
        american=True, dividends=GOLDEN_DIVIDENDS)
    print("book delta:", np.round(np.asarray(risk["delta"]), 4))
    print("book gamma:", np.round(np.asarray(risk["gamma"]), 5))

    # --- 2c. MIXED-maturity book: group_steps = (start, end, n_steps)
    # slices under the shared-dt convention T_i = n_i * delta_t; with the
    # pallas engine the whole ladder runs in ONE fused launch
    mixed = greeks.batch_greeks(
        spec, solver, strikes, s0, params.kappa, params.eta, params.sigma,
        params.rho, params.v0, params.r_d, params.r_f, american=True,
        group_steps=((0, 5, 10), (5, len(strikes), 20)))  # T=0.5 and T=1.0
    print("mixed-book theta:", np.round(np.asarray(mixed["theta"]), 4))

    # --- 3. calibrate to a synthetic flat-vol market ----------------------
    chain = jnp.linspace(70.0, 129.0, 30)
    market = bs.generate_market_data(s0, 1.0, params.r_d, chain)
    init = jnp.array([1.0, 0.05, 0.4, -0.5, 0.05])
    from heston_tpu.config import CalibrationConfig

    mode = "ad" if not jax.config.read("jax_enable_x64") else "fd"
    tv, info = calibration.calibrate_device(
        spec, solver, chain, market, s0, init, params.r_d, params.r_f,
        cfg=CalibrationConfig(max_iter=10, tol=0.1, jacobian_mode=mode))
    print("calibrated (kappa, eta, sigma, rho, v0):",
          np.round(np.asarray(tv), 4),
          "sse %.4e in %d iterations" % (float(info["final_error"]),
                                         int(info["iterations"])))

    # --- 4. export a fit CSV ----------------------------------------------
    import dataclasses

    result = calibration.CalibrationResult(
        params=dataclasses.replace(
            params, kappa=float(tv[0]), eta=float(tv[1]),
            sigma=float(tv[2]), rho=float(tv[3]), v0=float(tv[4])),
        initial_params=params,
        final_error=float(info["final_error"]),
        iterations=int(info["iterations"]),
        converged=bool(info["converged"]),
        fitted_prices=np.asarray(info["fitted_prices"]),
        market_prices=np.asarray(market), strikes=np.asarray(chain),
        history=[], total_pde_solves=0)
    path = hio.export_calibration_fit("/tmp/quickstart_fit.csv", result,
                                      s0, 1.0, params.r_d)
    print("fit exported to", path)

    # --- 5. native C++ CPU engine (no accelerator needed) -----------------
    from heston_tpu.utils import native

    cpu = native.price_batch_cpu(
        spec, solver, strikes, s0, params.kappa, params.eta, params.sigma,
        params.rho, params.v0, params.r_d, params.r_f,
        american=True, dividends=GOLDEN_DIVIDENDS)
    print("CPU engine max |diff| vs device:",
          float(np.max(np.abs(cpu - np.asarray(amer_div, np.float64)))))


if __name__ == "__main__":
    main()
