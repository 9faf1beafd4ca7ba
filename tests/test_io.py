"""Exporter tests (surface / convergence / calibration / benchmark CSVs)."""

import csv

import jax.numpy as jnp
import numpy as np

from heston_tpu.config import GridSpec, HestonParams, SolverConfig
from heston_tpu.models import douglas
from heston_tpu.utils import io as hio


def test_export_surface(tmp_path, params):
    spec = GridSpec(m1=6, m2=4)
    solver = SolverConfig(n_steps=2)
    u, grid = douglas.price_surface(spec, solver, 100.0, 100.0, params)
    path = hio.export_surface(tmp_path / "surf.csv", grid, u,
                              metadata={"m1": 6})
    rows = list(csv.reader(path.open()))
    # comment + header + (m1+1)*(m2+1) rows
    assert rows[1] == ["s", "v", "price"]
    assert len(rows) == 2 + 7 * 5
    assert float(rows[2][2]) >= 0.0


def test_export_convergence(tmp_path):
    rows = [dict(m1=10, m2=5, n_steps=4, price=8.0, runtime_s=0.1),
            dict(m1=20, m2=10, n_steps=8, price=8.5, runtime_s=0.2)]
    path = hio.export_convergence(tmp_path / "conv.csv", rows, 8.89)
    lines = path.read_text().splitlines()
    assert lines[0].startswith("# reference_price=")
    assert len(lines) == 4


def test_export_calibration_fit(tmp_path, params):
    from heston_tpu.models import bs, calibration as calib

    strikes = np.linspace(90.0, 110.0, 5)
    market = np.asarray(bs.generate_market_data(
        100.0, 1.0, params.r_d, jnp.asarray(strikes)))
    res = calib.CalibrationResult(
        params=params, initial_params=params, final_error=0.01,
        iterations=3, converged=True, fitted_prices=market * 1.001,
        market_prices=market, strikes=strikes, history=[],
        total_pde_solves=100)
    path = hio.export_calibration_fit(tmp_path / "fit.csv", res,
                                      100.0, 1.0, params.r_d)
    lines = path.read_text().splitlines()
    assert "kappa=" in lines[0]
    assert lines[1].split(",")[0] == "Strike"
    assert len(lines) == 2 + 5


def test_export_calibration_fit_dividend_adjusted_iv(tmp_path, params):
    """Dividend scenarios must invert IVs against the escrowed-adjusted
    spot (ref: src/heston_calibration.cpp:1500-1529): a market generated
    with dividends at flat vol 0.2 then round-trips to IV differences of
    ~0 only under the adjusted spot; the raw spot gives a systematic
    skew."""
    from heston_tpu.config import DividendSchedule
    from heston_tpu.models import bs, calibration as calib

    div = DividendSchedule(dates=(0.25, 0.75), amounts=(0.5, 0.5),
                           percentages=(0.01, 0.01))
    strikes = np.linspace(90.0, 110.0, 5)
    market = np.asarray(bs.generate_market_data_with_dividends(
        100.0, 1.0, params.r_d, jnp.asarray(strikes),
        div.dates, div.amounts, div.percentages))
    res = calib.CalibrationResult(
        params=params, initial_params=params, final_error=0.0,
        iterations=1, converged=True, fitted_prices=market,
        market_prices=market, strikes=strikes, history=[],
        total_pde_solves=1)

    path = hio.export_calibration_fit(tmp_path / "fit_div.csv", res,
                                      100.0, 1.0, params.r_d,
                                      dividends=div)
    rows = list(csv.reader(path.open()))[2:]
    # market == fitted -> IV difference identically ~0 regardless of spot;
    # the real check: market IV under the adjusted spot recovers 0.2 flat
    s_adj = float(bs.escrowed_spot(100.0, 1.0, params.r_d, div.dates,
                                   div.amounts, div.percentages))
    iv_adj = np.asarray(bs.implied_vol_chain(
        jnp.asarray(market), s_adj, jnp.asarray(strikes), params.r_d, 1.0))
    np.testing.assert_allclose(iv_adj, 0.2, atol=1e-6)
    iv_raw = np.asarray(bs.implied_vol_chain(
        jnp.asarray(market), 100.0, jnp.asarray(strikes), params.r_d, 1.0))
    assert np.max(np.abs(iv_raw - 0.2)) > 1e-3  # raw spot is wrong forward
    assert all(abs(float(r[3])) < 1e-9 for r in rows)


def test_export_benchmark(tmp_path):
    rows = [dict(m1=50, m2=25, n_steps=20, instances=500,
                 total_runtime_s=0.011)]
    path = hio.export_benchmark(tmp_path / "bench.csv", rows)
    lines = path.read_text().splitlines()
    assert len(lines) == 2
    vals = lines[1].split(",")
    assert abs(float(vals[-1]) - 500 / 0.011) < 1.0


def test_export_calibration_fit_multi_maturity_iv(tmp_path, params):
    """Per-point maturities: a flat-0.2-vol BS chain over two maturities
    must show ~zero IV difference for EVERY point when each inverts at
    its own maturity (inverting everything at max T, the old behavior,
    skews the short-maturity IVs by >1e-2)."""
    import dataclasses

    from heston_tpu.models import bs, calibration as calib

    strikes = np.linspace(90.0, 110.0, 6)
    mats = np.array([0.25, 0.25, 0.25, 1.0, 1.0, 1.0])

    def chain(vol):
        return np.concatenate([
            np.asarray(bs.generate_market_data(
                100.0, 0.25, params.r_d, jnp.asarray(strikes[:3]),
                vol=vol)),
            np.asarray(bs.generate_market_data(
                100.0, 1.0, params.r_d, jnp.asarray(strikes[3:]),
                vol=vol)),
        ])

    # market at flat vol 0.2, fitted at flat 0.25: the IVDifference
    # column must read ~0.05 at EVERY point — only true when each point
    # inverts at its own maturity (a single-T inversion distorts the
    # short-maturity half's difference, so identical-price fixtures
    # could not catch that regression)
    market = chain(0.2)
    result = calib.CalibrationResult(
        params=params, initial_params=params, final_error=0.0,
        iterations=1, converged=True, fitted_prices=chain(0.25),
        market_prices=market, strikes=strikes, history=[],
        total_pde_solves=0)
    path = hio.export_calibration_fit(
        tmp_path / "fit.csv", result, 100.0, 1.0, params.r_d,
        maturities=mats)
    body = [l for l in path.read_text().splitlines()
            if not l.startswith("#")]
    header = body[0].split(",")
    assert header[:2] == ["Strike", "Maturity"]
    rows = [l.split(",") for l in body[1:]]
    assert [float(r[1]) for r in rows] == mats.tolist()
    for r in rows:
        assert abs(float(r[4]) - 0.05) < 1e-6, r
