"""All six reference calibration scenarios run end-to-end (tiny configs).

The reference implements these as six hand-written drivers
(ref: src/heston_calibration.cpp:26, :515, :1036, :1588, :2428, :3245)."""

import dataclasses

import numpy as np
import pytest

from heston_tpu import scenarios
from heston_tpu.config import GridSpec, HestonParams, SolverConfig

SPEC = GridSpec(m1=14, m2=8)
SOLVER = SolverConfig(n_steps=4)


def _shrunk(name):
    base = scenarios.SCENARIOS[name]
    kw = dict(num_strikes=5, max_iter=1, tol=1e-9)
    if len(base.maturities) > 1:
        kw["strikes_per_maturity"] = 3
        kw["maturities"] = base.maturities[:2]
    return dataclasses.replace(base, **kw)


@pytest.mark.parametrize("name", list(scenarios.SCENARIOS))
def test_scenario_preset_runs(name, monkeypatch):
    monkeypatch.setitem(scenarios.SCENARIOS, name, _shrunk(name))
    result, wall = scenarios.run_scenario(
        name, spec=SPEC, solver=SOLVER, steps_per_year=4, verbose=False)
    assert result.iterations == 1
    assert np.isfinite(result.final_error)
    assert len(result.market_prices) == len(result.fitted_prices)


def test_scenario_market_data_variants():
    """Dividend scenarios generate cheaper synthetic chains than plain ones
    (escrowed-dividend adjustment, ref: src/bs.hpp:78-114)."""
    plain = scenarios.SCENARIOS["european"].build_targets()
    div = dataclasses.replace(
        scenarios.SCENARIOS["dividends"], num_strikes=60).build_targets()
    assert np.all(div.prices < plain.prices)
    multi = scenarios.SCENARIOS["european_multi"].build_targets()
    assert len(set(multi.maturities.tolist())) == 10
    assert len(multi.strikes) == 200   # reference: 10 maturities x 20 strikes
