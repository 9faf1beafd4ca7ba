"""Property-based fuzzing of the config-validation layer (VERDICT r3 #7).

Round 3 added loud validation (validate_group_steps, validate_book, config
__post_init__ guards); these tests drive randomized configurations through
them asserting the raise-or-correct-price contract: every generated config
either raises ValueError at validation time or produces a finite,
arbitrage-consistent price — no silent mispricing path.

Fast tier: cheap pure-validation properties run hundreds of cases;
pricing-backed properties run a handful on a tiny grid (each distinct
static config is a fresh XLA compile). The slow tier widens the sweeps.
"""

import dataclasses

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from heston_tpu.config import (
    Barrier,
    DividendSchedule,
    GridSpec,
    RateSchedule,
    SolverConfig,
)
from heston_tpu.models import calibration as calib
from heston_tpu.models import douglas
from heston_tpu.ops import grid as gridmod

FAST = settings(max_examples=200, deadline=None, derandomize=True,
                suppress_health_check=[HealthCheck.too_slow])
# priced properties compile XLA per example: 4 examples in the fast tier,
# the slow tier (-m slow) widens each priced property via _WIDE below
PRICED = settings(max_examples=4, deadline=None, derandomize=True,
                  suppress_health_check=[HealthCheck.too_slow,
                                         HealthCheck.data_too_large])
WIDE = settings(max_examples=25, deadline=None, derandomize=True,
                suppress_health_check=[HealthCheck.too_slow,
                                       HealthCheck.data_too_large])


# ---------------------------------------------------------------------------
# group_steps tiling: validate_group_steps must raise exactly when the
# tuples fail to tile [0, n) contiguously in order
# ---------------------------------------------------------------------------

@st.composite
def group_tuples(draw):
    n = draw(st.integers(1, 40))
    k = draw(st.integers(1, 5))
    triples = tuple(
        (draw(st.integers(-2, n + 2)), draw(st.integers(-2, n + 2)),
         draw(st.integers(-1, 30)))
        for _ in range(k))
    # half the time, generate a VALID tiling so both branches are hit
    if draw(st.booleans()):
        cuts = sorted(draw(st.sets(st.integers(1, max(1, n - 1)),
                                   max_size=min(4, n - 1))))
        bounds = [0] + cuts + [n]
        triples = tuple(
            (a, b, draw(st.integers(1, 30)))
            for a, b in zip(bounds, bounds[1:]))
    return n, triples


def _tiling_is_valid(n, triples):
    prev = 0
    for a, e, g in triples:
        if a != prev or e <= a or g < 1:
            return False
        prev = e
    return prev == n


@FAST
@given(group_tuples())
def test_validate_group_steps_raises_iff_invalid(case):
    n, triples = case
    valid = _tiling_is_valid(n, triples)
    try:
        calib.validate_group_steps(triples, n)
        assert valid, f"accepted invalid tiling {triples} for n={n}"
    except ValueError:
        assert not valid, f"rejected valid tiling {triples} for n={n}"


# ---------------------------------------------------------------------------
# dividend windows: every date is processed by exactly one step window —
# including dates landing EXACTLY on step boundaries (the reference's
# window convention t <= date < t+dt, ref: src/solver.hpp:363) — and dates
# outside [dt, (N+1)dt) by none
# ---------------------------------------------------------------------------

@FAST
@given(
    n_steps=st.integers(1, 60),
    maturity=st.floats(0.05, 3.0, allow_nan=False, allow_infinity=False),
    raw=st.lists(st.floats(-0.5, 1.5), min_size=1, max_size=6),
    on_edge=st.lists(st.integers(0, 61), min_size=0, max_size=4),
)
def test_dividend_each_date_processed_once(n_steps, maturity, raw, on_edge):
    dt = maturity / n_steps
    dates = [r * maturity for r in raw] + [k * dt for k in on_edge]
    sched = DividendSchedule(
        dates=tuple(dates), amounts=(0.1,) * len(dates),
        percentages=(0.01,) * len(dates))
    counts = np.zeros(len(dates), dtype=int)
    for n in range(1, n_steps + 1):
        t = n * dt
        got = sched.events_for_step(n, dt)
        # count by membership re-derivation (events lose identity)
        for i, d in enumerate(dates):
            if t <= d < (n + 1) * dt:
                counts[i] += 1
        assert len(got) == sum(1 for d in dates if t <= d < (n + 1) * dt)
    for i, d in enumerate(dates):
        expect = 1 if (dt <= d < (n_steps + 1) * dt) else 0
        # float boundaries: membership in exactly-one window can shift a
        # date at a representability edge, but never DOUBLE-process it
        assert counts[i] <= 1, f"date {d} processed {counts[i]} times"
        if expect == 1 and not any(
                abs(d - k * dt) < 1e-12 * max(1.0, abs(d))
                for k in range(n_steps + 2)):
            assert counts[i] == 1, f"interior date {d} never processed"


# ---------------------------------------------------------------------------
# rate schedules: constructor raises on malformed input; on success, the
# per-step segment view tiles 1..N and matches value_at, including
# breakpoints colliding exactly with step boundaries
# ---------------------------------------------------------------------------

@FAST
@given(
    times=st.lists(st.floats(-0.5, 2.0), min_size=0, max_size=5),
    n_steps=st.integers(1, 40),
    maturity=st.floats(0.1, 2.0),
    collide=st.integers(0, 40),
)
def test_rate_schedule_segments_tile_and_match(times, n_steps, maturity,
                                               collide):
    dt = maturity / n_steps
    times = sorted(set(times)) + [collide * dt]  # force a boundary collision
    times = sorted(set(times))
    k = len(times)
    rd = tuple(0.01 + 0.01 * i for i in range(k + 1))
    rf = tuple(0.002 * i for i in range(k + 1))
    ok = all(t2 > t1 for t1, t2 in zip(times, times[1:])) and (
        not times or times[0] > 0.0)
    try:
        rs = RateSchedule(times=tuple(times), r_d=rd, r_f=rf)
        assert ok, f"accepted malformed times {times}"
    except ValueError:
        assert not ok, f"rejected well-formed times {times}"
        return
    segs = rs.step_segments(n_steps, dt, maturity)
    covered = []
    for lo, hi, srd, srf in segs:
        assert 1 <= lo <= hi <= n_steps
        covered.extend(range(lo, hi + 1))
        for n in range(lo, hi + 1):
            want = rs.value_at(maturity - (n - 0.5) * dt)
            assert (srd, srf) == want
    assert covered == list(range(1, n_steps + 1)), "segments must tile 1..N"
    # average_rates equals the numeric integral of value_at
    ts = np.linspace(0, maturity, 20001)
    mid = 0.5 * (ts[:-1] + ts[1:])
    rd_num = np.mean([rs.value_at(float(t))[0] for t in mid[::100]])
    ad, _ = rs.average_rates(maturity)
    assert abs(ad - rd_num) < 5e-3  # coarse subsample of a step function


# ---------------------------------------------------------------------------
# constructor guards: random Barrier / DividendSchedule args either raise
# ValueError or build an object satisfying its own invariants
# ---------------------------------------------------------------------------

@FAST
@given(
    kind=st.sampled_from(["up-out", "down-out", "double-out", "up-in", ""]),
    level=st.floats(-10.0, 500.0),
    level_hi=st.one_of(st.none(), st.floats(-10.0, 900.0)),
)
def test_barrier_constructor_guards(kind, level, level_hi):
    try:
        b = Barrier(kind, level, level_hi)
    except ValueError:
        return
    assert b.kind in ("up-out", "down-out", "double-out")
    assert b.level > 0
    if b.kind == "double-out":
        assert b.level_hi > b.level
    else:
        assert b.level_hi is None
    assert b.lo < b.hi(1e9)


# ---------------------------------------------------------------------------
# priced properties (tiny grid, few examples): validate_book +
# barrier/spot/strike orderings — accepted books price finite, within
# no-arbitrage bounds, monotone in strike; rejected books raise
# ---------------------------------------------------------------------------

_TINY = dict(m1=10, m2=6)
_SOLVER = SolverConfig(n_steps=3, theta=0.8, maturity=1.0,
                       a2_variant="upwind")


_GIVEN_BOOK = given(
    s0=st.floats(10.0, 900.0),
    k_lo=st.floats(20.0, 150.0),
    kind=st.sampled_from([None, "up-out", "down-out"]),
    level_mult=st.floats(0.3, 3.0),
)


def _prop_book_validation(s0, k_lo, kind, level_mult):
    strikes = np.linspace(k_lo, k_lo * 1.5, 4)
    barrier = (None if kind is None
               else Barrier(kind, float(level_mult * s0)))
    spec = GridSpec(barrier=barrier, **_TINY)
    try:
        gridmod.validate_book(spec, s0, strikes)
    except ValueError:
        return  # loud rejection is a correct outcome
    prices = np.array(douglas.price_batch(
        spec, _SOLVER, strikes, s0, 1.5, 0.04, 0.3, -0.9, 0.04,
        0.025, 0.0))
    assert np.all(np.isfinite(prices)), (spec, s0, strikes, prices)
    # no-arbitrage up to DISCRETIZATION error: the theta-ADI schemes are
    # not positivity-preserving, so deep-OTM calls on this deliberately
    # ultra-coarse fuzz grid (m1=10) undershoot 0 by O(h^2) — observed
    # -5e-4*s0 at s0=10, K in [2K..3K]; the refinement companion test
    # below pins that this is discretization, not mispricing
    assert np.all(prices >= -1e-2 * s0), (prices, s0, strikes)
    assert np.all(prices <= s0 * (1 + 1e-6))
    # monotone nonincreasing in strike on the POSITIVE part (in the
    # undershoot regime negative prices legitimately rise back toward 0)
    assert np.all(np.diff(np.maximum(prices, 0.0)) <= 1e-4 * s0), (
        prices, s0, strikes)


test_book_validation_raise_or_correct_price = PRICED(
    _GIVEN_BOOK(_prop_book_validation))
test_book_validation_fuzz_wide = pytest.mark.slow(
    WIDE(_GIVEN_BOOK(_prop_book_validation)))


def test_deep_otm_negative_undershoot_vanishes_under_refinement():
    """Companion to the fuzz bound above: the falsifying example the
    fuzzer found (s0=10, strikes 2x-3x spot, m1=10, N=3 -> price
    ~ -4.6e-3) is coarse-grid undershoot of a non-positivity-preserving
    scheme: refining the grid shrinks it by >10x into rounding scale."""
    s0, strikes = 10.0, np.linspace(20.0, 30.0, 4)
    coarse = np.array(douglas.price_batch(
        GridSpec(**_TINY), _SOLVER, strikes, s0, 1.5, 0.04, 0.3, -0.9,
        0.04, 0.025, 0.0))
    fine = np.array(douglas.price_batch(
        GridSpec(m1=50, m2=25),
        dataclasses.replace(_SOLVER, n_steps=20), strikes, s0,
        1.5, 0.04, 0.3, -0.9, 0.04, 0.025, 0.0))
    worst_coarse = float(np.minimum(coarse, 0.0).min())
    worst_fine = float(np.minimum(fine, 0.0).min())
    assert worst_coarse < -1e-4  # the fuzz finding reproduces
    assert worst_fine > -1e-4, (worst_coarse, worst_fine)
    assert worst_fine > worst_coarse / 10.0


_GIVEN_DIV = given(
    dates=st.lists(st.floats(0.0, 1.4), min_size=1, max_size=4),
    edge_step=st.integers(0, 4),
    amount=st.floats(0.0, 5.0),
    pct=st.floats(0.0, 0.2),
)


def _prop_dividend_edges(dates, edge_step, amount, pct):
    """Dividend dates at segment edges (exactly k*dt), at 0, at/after
    maturity: every schedule the constructor accepts must price finite
    and within call bounds on every engine-relevant path."""
    sol = _SOLVER
    dt = sol.maturity / sol.n_steps
    all_dates = tuple(sorted(dates + [edge_step * dt]))
    sched = DividendSchedule(
        dates=all_dates, amounts=(float(amount),) * len(all_dates),
        percentages=(float(pct),) * len(all_dates))
    spec = GridSpec(**_TINY)
    strikes = np.array([80.0, 100.0, 120.0])
    for kw in (dict(dividends=sched),
               dict(dividends=sched, american=True)):
        prices = np.array(douglas.price_batch(
            spec, sol, strikes, 100.0, 1.5, 0.04, 0.3, -0.9, 0.04,
            0.025, 0.0, **kw))
        assert np.all(np.isfinite(prices)), (all_dates, kw, prices)
        assert np.all(prices >= -1e-6)
        assert np.all(prices <= 100.0 * (1 + 1e-6))
        assert np.all(np.diff(prices) <= 1e-4), (all_dates, kw, prices)


test_dividend_edge_configs_price_sane = PRICED(
    _GIVEN_DIV(_prop_dividend_edges))
test_dividend_edge_fuzz_wide = pytest.mark.slow(
    WIDE(_GIVEN_DIV(_prop_dividend_edges)))


_GIVEN_RATE = given(
    brk=st.lists(st.floats(0.01, 0.99), min_size=1, max_size=3),
    collide=st.integers(1, 3),
)


def _prop_rate_breakpoints(brk, collide):
    """RateSchedule breakpoints colliding exactly with step boundaries
    must not double-count or skip a segment: price stays within the
    prices of the min-rate and max-rate flat curves (monotonicity of the
    European call PDE price in r_d at r_f=0)."""
    sol = _SOLVER
    dt = sol.maturity / sol.n_steps
    times = sorted(set([round(b, 2) for b in brk] + [collide * dt]))
    times = [t for t in times if 0 < t]
    rd = tuple(0.01 + 0.015 * i for i in range(len(times) + 1))
    rf = (0.0,) * (len(times) + 1)
    rs = RateSchedule(times=tuple(times), r_d=rd, r_f=rf)
    spec = GridSpec(**_TINY)
    strikes = np.array([90.0, 100.0, 110.0])
    args = (1.5, 0.04, 0.3, -0.9, 0.04)
    priced = np.array(douglas.price_batch(
        spec, sol, strikes, 100.0, *args, 0.025, 0.0, rate_schedule=rs))
    lo = np.array(douglas.price_batch(
        spec, sol, strikes, 100.0, *args, min(rd), 0.0))
    hi = np.array(douglas.price_batch(
        spec, sol, strikes, 100.0, *args, max(rd), 0.0))
    assert np.all(np.isfinite(priced))
    assert np.all(priced >= lo - 1e-8)
    assert np.all(priced <= hi + 1e-8)


test_rate_breakpoints_on_step_boundaries_price_sane = PRICED(
    _GIVEN_RATE(_prop_rate_breakpoints))
test_rate_breakpoints_fuzz_wide = pytest.mark.slow(
    WIDE(_GIVEN_RATE(_prop_rate_breakpoints)))
