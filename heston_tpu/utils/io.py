"""CSV exporters for surfaces, convergence studies and calibration fits.

Covers the reference's reporting surface: ResultsExporter price surfaces
(ref: src/solver.cpp:17-48), ConvergenceExporter grid/timestep sweeps
(ref: src/solver.cpp:50-312) and the calibration fit export with implied-vol
differences (ref: src/heston_calibration.cpp:463-511)."""

from __future__ import annotations

import csv
from pathlib import Path
from typing import Optional, Sequence

import numpy as np


def export_surface(path, grid, surface, metadata: Optional[dict] = None):
    """Write (s, v, U) triplets. Layout mirrors the reference exporter:
    one row per node with the grid coordinates (ref: src/solver.cpp:17-48).
    """
    path = Path(path)
    vec_s = np.asarray(grid.vec_s)
    vec_v = np.asarray(grid.vec_v)
    u = np.asarray(surface)
    with path.open("w", newline="") as f:
        w = csv.writer(f)
        if metadata:
            f.write("# " + ", ".join(f"{k}={v}" for k, v in metadata.items())
                    + "\n")
        w.writerow(["s", "v", "price"])
        for j, v in enumerate(vec_v):
            for i, s in enumerate(vec_s):
                w.writerow([s, v, u[j, i]])
    return path


def export_convergence(path, rows: Sequence[dict], reference_price: float):
    """Write a convergence table (m1, m2, n_steps, price, error, runtime),
    the reference's ConvergenceExporter format (ref: src/solver.cpp:281-311).
    """
    path = Path(path)
    with path.open("w", newline="") as f:
        w = csv.writer(f)
        f.write(f"# reference_price={reference_price!r}\n")
        w.writerow(["m1", "m2", "n_steps", "price", "abs_error",
                    "runtime_s"])
        for r in rows:
            w.writerow([r["m1"], r["m2"], r["n_steps"], r["price"],
                        abs(r["price"] - reference_price),
                        r.get("runtime_s", "")])
    return path


def export_book_risk(path, strikes, risk: dict, metadata=None,
                     maturities=None):
    """Write one row per option of a batch_greeks risk report: strike
    [, maturity], price, delta, gamma, theta, vega_v0, vanna, volga
    [, the five parameter sensitivities when risk carries
    'param_jacobian']. The production book-risk artifact (no reference
    analog — the reference exports only surfaces/convergence/fit
    CSVs)."""
    path = Path(path)
    strikes = np.asarray(strikes)
    # fetch each column ONCE up front: converting per row would cost one
    # full device->host transfer per row per column for jnp inputs
    # (~29 ms each through this machine's TPU tunnel)
    risk = {k: np.asarray(v) for k, v in risk.items()}
    if maturities is not None:
        maturities = np.asarray(maturities)
    cols = ["strike"] + (["maturity"] if maturities is not None else [])
    value_cols = ["price", "delta", "gamma", "theta"]
    value_cols += [k for k in ("vega_v0", "vanna", "volga",
                               "rho_rd", "rho_rf") if k in risk]
    cols += value_cols
    jac = risk.get("param_jacobian")
    if jac is not None:
        cols += ["d_kappa", "d_eta", "d_sigma", "d_rho", "d_v0"]
    with path.open("w", newline="") as f:
        w = csv.writer(f)
        if metadata:
            f.write("# " + ", ".join(f"{k}={v}" for k, v in metadata.items())
                    + "\n")
        w.writerow(cols)
        for i, k in enumerate(strikes):
            row = [k]
            if maturities is not None:
                row.append(maturities[i])
            row += [float(risk[c][i]) for c in value_cols]
            if jac is not None:
                row += [float(v) for v in jac[i]]
            w.writerow(row)
    return path


def export_calibration_fit(path, result, s0: float, t: float, r_d: float,
                           iv_epsilon: float = 0.01, dividends=None,
                           option_type: str = "call", maturities=None):
    """Write strike / market / fitted / IV-difference rows plus a metadata
    header with initial & final parameters
    (ref: src/heston_calibration.cpp:468-511).

    When the scenario has discrete dividends, the implied-vol inversion
    uses the escrowed-dividend-adjusted spot, exactly like the reference's
    dividend calibration exports (S_adjusted fed to reverse_BS,
    ref: src/heston_calibration.cpp:1500-1529, src/bs.hpp:131-160) —
    inverting against the raw spot would price the IVs off the wrong
    forward.

    `maturities` (optional [n]): per-point maturities of a multi-maturity
    chain — each point's IV inverts at its OWN maturity (and its own
    escrowed spot), the reference's per-point reverse_BS convention
    (ref: src/heston_calibration.cpp:2800-2860). Without it every point
    uses the scalar `t`."""
    from heston_tpu.models import bs  # lazy: jax import
    from heston_tpu.ops import operators

    import jax.numpy as jnp

    if operators.is_digital(option_type):
        raise ValueError(
            "export_calibration_fit inverts BS implied vols — "
            "vanilla chains only (digital quotes have no IV column)")
    path = Path(path)
    strikes = np.asarray(result.strikes)
    market = np.asarray(result.market_prices)
    fitted = np.asarray(result.fitted_prices)
    mats = (np.full(len(strikes), float(t)) if maturities is None
            else np.asarray(maturities, dtype=float))

    iv_mkt = np.zeros(len(strikes))
    iv_fit = np.zeros(len(strikes))
    for tm in sorted(set(mats.tolist())):
        idx = mats == tm
        s_iv = s0
        if dividends is not None and len(dividends) > 0:
            s_iv = float(bs.escrowed_spot(
                s0, tm, r_d, dividends.dates, dividends.amounts,
                dividends.percentages))
        ks_g = jnp.asarray(strikes[idx])
        mkt_c = jnp.asarray(market[idx])
        fit_c = jnp.asarray(fitted[idx])
        if bs.is_put(option_type):
            # put chains (framework extension): convert to
            # parity-equivalent call prices against the same (adjusted)
            # spot so the call-based Newton inversion applies. Exact for
            # European puts; for AMERICAN puts this is the standard
            # European-BS quoting of American prices (the early-exercise
            # premium inflates both columns identically, so the
            # IV-difference fit metric stays meaningful)
            mkt_c = bs.put_to_call_parity(mkt_c, s_iv, ks_g, r_d, tm)
            fit_c = bs.put_to_call_parity(fit_c, s_iv, ks_g, r_d, tm)
        iv_mkt[idx] = np.asarray(bs.implied_vol_chain(
            mkt_c, s_iv, ks_g, r_d, tm))
        iv_fit[idx] = np.asarray(bs.implied_vol_chain(
            fit_c, s_iv, ks_g, r_d, tm))

    init = result.initial_params
    fin = result.params
    meta = {
        "n_options": len(strikes),
        "final_error": result.final_error,
        "iterations": result.iterations,
        "total_pde_solves": result.total_pde_solves,
        "init_kappa": init.kappa, "init_eta": init.eta,
        "init_sigma": init.sigma, "init_rho": init.rho, "init_v0": init.v0,
        "kappa": fin.kappa, "eta": fin.eta, "sigma": fin.sigma,
        "rho": fin.rho, "v0": fin.v0,
    }
    with path.open("w", newline="") as f:
        f.write("# " + ", ".join(f"{k}={v}" for k, v in meta.items()) + "\n")
        w = csv.writer(f)
        # single-maturity schema stays byte-identical to the reference's
        # exporter; multi-maturity splices one Maturity column in
        header = ["Strike", "MarketPrice", "FittedPrice", "IVDifference"]
        if maturities is not None:
            header.insert(1, "Maturity")
        w.writerow(header)
        for i, k in enumerate(strikes):
            row = [k, market[i], fitted[i], abs(iv_mkt[i] - iv_fit[i])]
            if maturities is not None:
                row.insert(1, mats[i])
            w.writerow(row)
    return path


def export_benchmark(path, rows: Sequence[dict]):
    """Benchmark CSV: instances, total_runtime, runtime_per_instance,
    throughput (ref: src/perfomance_test.cpp:214-221)."""
    path = Path(path)
    with path.open("w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["m1", "m2", "n_steps", "instances", "total_runtime_s",
                    "runtime_per_instance_s", "throughput_per_s"])
        for r in rows:
            w.writerow([r["m1"], r["m2"], r["n_steps"], r["instances"],
                        r["total_runtime_s"],
                        r["total_runtime_s"] / r["instances"],
                        r["instances"] / r["total_runtime_s"]])
    return path
