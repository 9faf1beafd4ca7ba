"""Convergence studies as tests (the reference's ConvergenceExporter style,
ref: src/solver.cpp:61-312, test_convergence :1653-1741)."""

import numpy as np
import pytest

from heston_tpu import benchmarks

GOLDEN = 8.8943383103218502


def test_spatial_refinement_reduces_error():
    rows = benchmarks.run_convergence_study(
        m2_values=(15, 25, 40), n_steps=60)
    errs = [abs(r["price"] - GOLDEN) for r in rows]
    assert errs[-1] < errs[0]
    assert errs[-1] < 2e-2


def test_timestep_first_order_douglas():
    """Douglas with theta != 1/2 is first order in time: halving dt should
    roughly halve the time error (measured against a small-dt anchor)."""
    rows = benchmarks.run_timestep_study(n_values=(10, 20, 40, 320))
    p10, p20, p40, p_ref = [r["price"] for r in rows]
    e10, e20, e40 = (abs(p10 - p_ref), abs(p20 - p_ref), abs(p40 - p_ref))
    r1 = e10 / e20
    r2 = e20 / e40
    assert 1.5 < r1 < 3.0, f"unexpected convergence ratio {r1}"
    assert 1.5 < r2 < 3.0, f"unexpected convergence ratio {r2}"


@pytest.mark.slow
def test_mcs_hv_time_error_much_smaller_than_do():
    """The modified Craig-Sneyd and Hundsdorfer-Verwer schemes are second
    order in time for any theta, so their N=20 time error is an order of
    magnitude below DO's (measured: DO 1.9e-2, CS 2.3e-2, MCS 1.3e-3).
    CS's corrector only targets the mixed term and at theta=0.8 does not
    beat DO."""
    e = {}
    for scheme in ("do", "cs", "mcs", "hv"):
        rows = benchmarks.run_timestep_study(n_values=(20, 640),
                                             scheme=scheme)
        e[scheme] = abs(rows[0]["price"] - rows[-1]["price"])
    assert e["mcs"] < 0.2 * e["do"]
    assert e["hv"] < 0.2 * e["do"]
    assert e["cs"] < 2.0 * e["do"]
