"""Dividend-schedule edge cases.

The host reference processes ALL dividends whose dates fall inside one
step window with a while-loop (ref: src/solver.hpp:363); two dividends in
the same window must compose sequentially."""

import jax.numpy as jnp
import numpy as np

from heston_tpu.config import DividendSchedule, GridSpec, SolverConfig
from heston_tpu.models import douglas

SPEC = GridSpec(m1=20, m2=10)
SOLVER = SolverConfig(n_steps=4, a2_variant="upwind")  # dt = 0.25


def _price(params, divs):
    return float(douglas.price_option(
        SPEC, SOLVER, 100.0, 100.0, params.kappa, params.eta, params.sigma,
        params.rho, params.v0, params.r_d, params.r_f, dividends=divs))


def test_two_dividends_in_one_window(params):
    both = DividendSchedule(dates=(0.5, 0.6), amounts=(1.0, 2.0),
                            percentages=(0.0, 0.0))
    # both dates fall in [0.5, 0.75) -> window of step n=2, applied in order
    p_both = _price(params, both)
    single_sum = DividendSchedule(dates=(0.5,), amounts=(3.0,),
                                  percentages=(0.0,))
    p_sum = _price(params, single_sum)
    # sequential cash dividends of 1 then 2 equal one of 3 up to the
    # interpolation error of the double re-map (coarse 21x11 grid)
    assert abs(p_both - p_sum) < 0.08
    # and strictly cheaper than no dividends
    p_none = _price(params, None)
    assert p_both < p_none


def test_dividend_order_in_window_matters_for_pct(params):
    """cash-then-pct differs from pct-then-cash; events must apply in
    schedule order."""
    a = DividendSchedule(dates=(0.5, 0.6), amounts=(5.0, 0.0),
                         percentages=(0.0, 0.10))
    b = DividendSchedule(dates=(0.5, 0.6), amounts=(0.0, 5.0),
                         percentages=(0.10, 0.0))
    pa = _price(params, a)
    pb = _price(params, b)
    # S*(1-p)-c != (S-c)*(1-p) -> prices must differ measurably
    assert abs(pa - pb) > 1e-3


def test_dividend_at_time_zero_window(params):
    """A dividend dated inside the first step's window applies before any
    diffusion step."""
    d = DividendSchedule(dates=(0.3,), amounts=(2.0,), percentages=(0.0,))
    p = _price(params, d)
    assert 0 < p < _price(params, None)
