"""Knock-out barrier options (framework extension — the reference prices
vanillas only).

Truth source: the Black-Scholes limit of Heston (sigma_volofvol = 0,
eta = v0 keeps the variance constant at v0) against the Reiner-Rubinstein
closed forms; plus vanilla-limit, monotonicity, dividend re-knock and
engine-dispatch pins.
"""

import math
from statistics import NormalDist

import jax.numpy as jnp
import numpy as np
import pytest

from heston_tpu.config import (
    Barrier,
    DividendSchedule,
    GridSpec,
    SolverConfig,
)
from heston_tpu.models import douglas, greeks

R = 0.025
V0 = 0.04
SIG = math.sqrt(V0)
# second-order scheme + start-up damping: the barrier kink at the domain
# edge excites exactly the modes Rannacher damping kills
SOLVER = SolverConfig(n_steps=24, scheme="hv", rannacher_steps=2)


def bs_knockout(s, k, b, t, kind, option_type, r=R, sig=SIG):
    """Reiner-Rubinstein knock-out price (q = 0): up-out call (K < B)
    and down-out put (K > B)."""
    N = NormalDist().cdf
    phi = -1.0 if option_type == "put" else 1.0
    et = 1.0 if kind == "down-out" else -1.0
    sg = sig * math.sqrt(t)
    lam = (r - 0.5 * sig * sig) / (sig * sig) + 1.0
    x1 = math.log(s / k) / sg + lam * sg
    x2 = math.log(s / b) / sg + lam * sg
    y1 = math.log(b * b / (s * k)) / sg + lam * sg
    y2 = math.log(b / s) / sg + lam * sg

    def vanilla(x):
        return (phi * s * N(phi * x)
                - phi * k * math.exp(-r * t) * N(phi * x - phi * sg))

    def reflect(y):
        return (phi * s * (b / s) ** (2 * lam) * N(et * y)
                - phi * k * math.exp(-r * t) * (b / s) ** (2 * lam - 2)
                * N(et * y - et * sg))

    return vanilla(x1) - vanilla(x2) + reflect(y1) - reflect(y2)


def _price_bs_limit(spec, strike, s0, option_type):
    """Heston degenerate to BS: sigma = 0, eta = v0."""
    return float(douglas.price_option(
        spec, SOLVER, strike, s0, 1.5, V0, 0.0, 0.0, V0, R, 0.0,
        option_type=option_type))


@pytest.mark.parametrize("kind,level,option_type", [
    ("up-out", 130.0, "call"),
    ("down-out", 80.0, "put"),
])
def test_barrier_matches_bs_closed_form(kind, level, option_type):
    """PDE knock-out price converges to the Reiner-Rubinstein closed
    form in the Black-Scholes limit of Heston (measured 2026-08-18:
    up-out -7.0e-3 -> -1.4e-3, down-out -1.7e-2 -> -4.1e-3)."""
    truth = bs_knockout(100.0, 100.0, level, 1.0, kind, option_type)
    errs = []
    for (m1, m2, n) in [(60, 16, 24), (120, 32, 48)]:
        spec = GridSpec(m1=m1, m2=m2, barrier=Barrier(kind, level))
        sol = SolverConfig(n_steps=n, scheme="hv", rannacher_steps=2)
        p = float(douglas.price_option(
            spec, sol, 100.0, 100.0, 1.5, V0, 0.0, 0.0, V0, R, 0.0,
            option_type=option_type))
        errs.append(abs(p - truth))
    assert errs[1] < errs[0], errs          # converging
    assert errs[1] < 8e-3, (errs, truth)    # and close


def test_barrier_grid_pins_the_barrier_node():
    """The knocked boundary node sits EXACTLY at the barrier level even
    after the S_0 insertion (the vanilla insert's drop-the-max quirk
    must not move an up-out's barrier)."""
    from heston_tpu.ops import grid as G

    up = G.make_grid(GridSpec(barrier=Barrier("up-out", 130.0)),
                     100.0, 100.0, V0)
    assert float(up.vec_s[-1]) == 130.0
    assert float(up.vec_s[0]) == 0.0
    assert np.any(np.isclose(np.array(up.vec_s), 100.0))  # s0 inserted
    down = G.make_grid(GridSpec(barrier=Barrier("down-out", 80.0)),
                       100.0, 100.0, V0)
    assert float(down.vec_s[0]) == 80.0
    assert np.any(np.isclose(np.array(down.vec_s), 100.0))
    # strictly ascending (insertion kept order on the truncated domain)
    for g in (up, down):
        assert np.all(np.diff(np.array(g.vec_s)) > 0)


def test_barrier_far_limit_recovers_vanilla():
    """A barrier far from the action reproduces the vanilla price to
    grid-truncation accuracy (different s-domains, same physics)."""
    sol = SolverConfig(n_steps=24)
    args = (100.0, 100.0, 1.5, 0.04, 0.3, -0.9, 0.04, R, 0.0)
    vanilla = float(douglas.price_option(GridSpec(m1=100, m2=25),
                                         sol, *args))
    far_down = float(douglas.price_option(
        GridSpec(m1=100, m2=25, barrier=Barrier("down-out", 20.0)),
        sol, *args))
    assert abs(far_down - vanilla) < 5e-3 * vanilla


def test_barrier_monotonic_in_level():
    """Up-out value rises as the barrier moves away (higher level);
    down-out value rises as the barrier moves down. Both bounded by the
    vanilla."""
    sol = SolverConfig(n_steps=24)
    args = (100.0, 100.0, 1.5, 0.04, 0.3, -0.9, 0.04, R, 0.0)
    vanilla = float(douglas.price_option(GridSpec(m1=60, m2=16), sol,
                                         *args))
    ups = [float(douglas.price_option(
        GridSpec(m1=60, m2=16, barrier=Barrier("up-out", b)), sol, *args))
        for b in (120.0, 150.0, 200.0)]
    # the vanilla bound carries a tolerance: the barrier grids resolve
    # [0, level] with the same node count the vanilla spends on [0, 8K],
    # so the two discretization errors differ at the ~0.1% level
    assert ups[0] < ups[1] < ups[2] < vanilla * (1.0 + 5e-3)
    downs = [float(douglas.price_option(
        GridSpec(m1=60, m2=16, barrier=Barrier("down-out", b)), sol,
        *args, option_type="put"))
        for b in (90.0, 70.0, 50.0)]
    vanilla_put = float(douglas.price_option(
        GridSpec(m1=60, m2=16), sol, *args, option_type="put"))
    assert downs[0] < downs[1] < downs[2] < vanilla_put


def test_barrier_knocked_column_stays_zero():
    """The barrier column of the solution surface is identically zero
    through the whole solve — American + dividends + up-out included
    (the dividend re-map must re-knock the top node, and the masked
    exercise floor must not resurrect it)."""
    divs = DividendSchedule(dates=(0.3, 0.7), amounts=(1.0, 1.0),
                            percentages=(0.01, 0.0))
    spec = GridSpec(m1=40, m2=12, barrier=Barrier("up-out", 140.0))
    sol = SolverConfig(n_steps=10)
    inst = douglas.prepare_instance(
        spec, sol, 100.0, 100.0, 1.5, 0.04, 0.3, -0.9, 0.04, R, 0.0,
        "call")
    surfaces, _ = douglas.solve_with_tracking(
        inst, sol, 0.0, american=True, dividends=divs,
        option_type="call")
    assert np.max(np.abs(np.array(surfaces)[:, :, -1])) == 0.0
    # interior is alive
    assert float(surfaces[-1][inst.idx_v, inst.idx_s]) > 0.0
    # and the dividend re-knock matters: without it the top node refills
    u_div = douglas.apply_dividend(surfaces[-2], inst.grid.vec_s, 1.0,
                                   0.01, "call")
    assert float(u_div[5, -1]) != 0.0
    u_div_b = douglas.apply_dividend(surfaces[-2], inst.grid.vec_s, 1.0,
                                     0.01, "call", spec.barrier)
    assert float(u_div_b[5, -1]) == 0.0


def test_barrier_american_above_european():
    """American up-out put >= European up-out put (early exercise adds
    value), both positive and below the vanilla American put."""
    spec = GridSpec(m1=60, m2=16, barrier=Barrier("up-out", 130.0))
    sol = SolverConfig(n_steps=24)
    args = (100.0, 100.0, 1.5, 0.04, 0.3, -0.9, 0.04, R, 0.0)
    eur = float(douglas.price_option(spec, sol, *args,
                                     option_type="put"))
    amer = float(douglas.price_option(spec, sol, *args, american=True,
                                      option_type="put"))
    van = float(douglas.price_option(GridSpec(m1=60, m2=16), sol, *args,
                                     american=True, option_type="put"))
    assert 0.0 < eur <= amer + 1e-12
    # tolerance: an up-out at 130 barely truncates a put's value, and
    # the barrier grid resolves [0, 130] finer than the vanilla's
    # [0, 8K] — the two discretization errors differ at the ~0.05% level
    assert amer < van * (1.0 + 2e-3)


@pytest.mark.parametrize("barrier", [
    Barrier("up-out", 140.0),
    Barrier("down-out", 70.0),
    Barrier("double-out", 70.0, 140.0),
], ids=lambda b: b.kind)
@pytest.mark.parametrize("variant", ["euro", "amer", "div", "amer_div"])
def test_barrier_fused_matches_xla(barrier, variant):
    """The fused batched kernel prices knock-out books: equality with
    the XLA scan engine at 1e-11 for every variant, and the knocked
    column(s) of the fused surface are identically zero (the in-kernel
    American floor and dividend re-map must not resurrect them)."""
    import dataclasses

    import jax

    from heston_tpu.pallas import fused_do

    spec = GridSpec(m1=40, m2=12, barrier=barrier)
    sol = SolverConfig(n_steps=10)
    pal = dataclasses.replace(sol, solver_engine="pallas")
    assert fused_do.use_fused(spec, pal)
    american = "amer" in variant
    divs = (DividendSchedule(dates=(0.35,), amounts=(1.0,),
                             percentages=(0.01,))
            if "div" in variant else None)
    ks = jnp.array([95.0, 105.0])
    args = (100.0, 1.5, 0.04, 0.3, -0.9, 0.04, R, 0.0)
    a = douglas.price_batch(spec, sol, ks, *args, american=american,
                            dividends=divs)
    b = douglas.price_batch(spec, pal, ks, *args, american=american,
                            dividends=divs)
    np.testing.assert_allclose(np.array(a), np.array(b), rtol=0,
                               atol=1e-11)
    u = jax.jit(lambda: fused_do.fused_surface_batch(
        spec, pal, ks, *args, american=american, dividends=divs)[0])()
    if barrier.knock_top:                              # u [B, nv, ns]
        assert float(jnp.max(jnp.abs(u[:, :, -1]))) == 0.0
    if barrier.knock_bottom:
        assert float(jnp.max(jnp.abs(u[:, :, 0]))) == 0.0


def test_barrier_fused_jacobian_and_latency_kernel():
    """Forward-mode AD through the fused kernel on a barrier spec
    matches the XLA jacfwd; the single-option latency kernel dispatches
    and agrees."""
    import dataclasses

    from heston_tpu.models import calibration
    from heston_tpu.pallas import fused_single

    spec = GridSpec(m1=40, m2=12, barrier=Barrier("up-out", 140.0))
    sol = SolverConfig(n_steps=8)
    pal = dataclasses.replace(sol, solver_engine="pallas")
    ks = jnp.array([95.0, 105.0])
    args = (100.0, 1.5, 0.04, 0.3, -0.9, 0.04, R, 0.0)
    theta_vec = jnp.array([1.5, 0.04, 0.3, -0.9, 0.04])
    b_f, j_f = calibration.jacobian_and_prices_ad(
        spec, pal, ks, 100.0, theta_vec, R, 0.0)
    b_x, j_x = calibration.jacobian_and_prices_ad(
        spec, sol, ks, 100.0, theta_vec, R, 0.0)
    np.testing.assert_allclose(np.array(b_f), np.array(b_x), atol=1e-11)
    np.testing.assert_allclose(np.array(j_f), np.array(j_x), atol=1e-9)
    # latency kernel: batch of one dispatches fused_single
    assert fused_single.use_single(spec, pal, 1)
    one = douglas.price_batch(spec, pal, jnp.array([100.0]), *args,
                              american=True)
    ref = douglas.price_batch(spec, sol, jnp.array([100.0]), *args,
                              american=True)
    np.testing.assert_allclose(np.array(one), np.array(ref), atol=1e-11)


def test_barrier_validation():
    """Bad barrier configs and knocked-out spots fail loudly."""
    from heston_tpu.ops.grid import validate_book

    with pytest.raises(ValueError, match="kind"):
        Barrier("up-in", 130.0)
    with pytest.raises(ValueError, match="level"):
        Barrier("up-out", -1.0)
    with pytest.raises(ValueError, match="knocked out"):
        validate_book(GridSpec(barrier=Barrier("up-out", 90.0)), 100.0,
                      [100.0])
    with pytest.raises(ValueError, match="knocked out"):
        validate_book(GridSpec(barrier=Barrier("down-out", 110.0)),
                      100.0, [100.0])
    # alive spot passes
    validate_book(GridSpec(barrier=Barrier("up-out", 130.0)), 100.0,
                  [100.0])


@pytest.mark.parametrize("kind,level,option_type", [
    ("up-out", 130.0, "call"),
    ("down-out", 80.0, "put"),
])
def test_barrier_pde_vs_mc_full_heston(kind, level, option_type):
    """Independent cross-check under FULL Heston dynamics (the closed
    form only covers the BS limit): PDE knock-out vs Brownian-bridge
    survival-weighted Monte-Carlo. Measured 2026-08-18: up-out PDE
    6.6253 vs MC 6.694 +- 0.024; down-out 0.9191 vs 0.9279 +- 0.012
    (the residual gap is Euler/bridge bias at v_t-frozen local variance
    plus PDE truncation at m1=120 — both shrink under refinement)."""
    import jax

    from heston_tpu.models import mc

    args = (100.0, 100.0, 1.5, 0.04, 0.3, -0.9, 0.04, R, 0.0)
    spec = GridSpec(m1=120, m2=32, barrier=Barrier(kind, level))
    sol = SolverConfig(n_steps=48, scheme="hv", rannacher_steps=2)
    pde = float(douglas.price_option(spec, sol, *args,
                                     option_type=option_type))
    price, half = mc.price_european_call_mc(
        jax.random.PRNGKey(7), 100.0, 0.04, 100.0, R, 0.0, 1.5, 0.04,
        0.3, -0.9, 1.0, num_paths=200_000, n_steps=350,
        scheme="truncation", option_type=option_type,
        antithetic=True, barrier=Barrier(kind, level))
    # 3-sigma MC noise + a small PDE/Euler discretization margin
    assert abs(pde - float(price)) < 3.0 * float(half) + 0.03, (
        pde, float(price), float(half))


def test_barrier_mc_bridge_beats_endpoint_check():
    """The bridge survival weight prices BELOW a discrete endpoint-only
    check would (crossings between samples are captured), i.e. at coarse
    MC steps the bridge price must not exceed the fine-step price by
    more than noise — and the vanilla (barrier=None) path is untouched
    bitwise."""
    import jax

    from heston_tpu.models import mc

    key = jax.random.PRNGKey(3)
    margs = (100.0, 0.04, 100.0, R, 0.0, 1.5, 0.04, 0.3, -0.9, 1.0)
    coarse, h_c = mc.price_european_call_mc(
        key, *margs, num_paths=100_000, n_steps=25, scheme="truncation",
        barrier=Barrier("up-out", 130.0))
    fine, h_f = mc.price_european_call_mc(
        key, *margs, num_paths=100_000, n_steps=350, scheme="truncation",
        barrier=Barrier("up-out", 130.0))
    assert abs(float(coarse) - float(fine)) < 3.0 * (float(h_c)
                                                     + float(h_f)) + 0.05
    # barrier=None reproduces the pre-barrier vanilla estimator exactly
    v1 = mc.price_european_call_mc(key, *margs, num_paths=20_000,
                                   n_steps=50)
    v2 = mc.price_european_call_mc(key, *margs, num_paths=20_000,
                                   n_steps=50, barrier=None)
    assert float(v1[0]) == float(v2[0])


def test_double_barrier_grid_and_bounds():
    """Double-out: both endpoint nodes pinned bitwise at the barriers,
    S_0 inserted, price below BOTH one-sided knock-outs, and it
    converges to the one-sided price as the other barrier recedes."""
    from heston_tpu.ops import grid as G

    g = G.make_grid(GridSpec(barrier=Barrier("double-out", 70.0, 140.0)),
                    100.0, 100.0, V0)
    vs = np.array(g.vec_s)
    assert vs[0] == 70.0 and vs[-1] == 140.0
    assert np.any(np.isclose(vs, 100.0))
    assert np.all(np.diff(vs) > 0)

    sol = SolverConfig(n_steps=24)
    args = (100.0, 100.0, 1.5, 0.04, 0.3, -0.9, 0.04, R, 0.0)

    def price(b):
        return float(douglas.price_option(
            GridSpec(m1=60, m2=16, barrier=b), sol, *args))

    dbl = price(Barrier("double-out", 70.0, 140.0))
    up = price(Barrier("up-out", 140.0))
    down = price(Barrier("down-out", 70.0))
    # 0.5% tolerance: each barrier config resolves a DIFFERENT domain
    # with the same node budget, so the discretization errors differ at
    # the few-per-mille level (same as the vanilla-bound tests above)
    assert 0.0 < dbl < min(up, down) * (1.0 + 5e-3)
    # lower barrier pushed far away -> the up-out price (same top
    # domain; ~0.1% discretization difference from the changed node
    # placement)
    far = price(Barrier("double-out", 5.0, 140.0))
    assert abs(far - up) < 5e-3 * up


def test_double_barrier_knocked_columns_stay_zero():
    """American + dividends + double-out: BOTH barrier columns stay
    identically zero through the whole tracked solve."""
    divs = DividendSchedule(dates=(0.3, 0.7), amounts=(1.0, 1.0),
                            percentages=(0.01, 0.0))
    spec = GridSpec(m1=40, m2=12,
                    barrier=Barrier("double-out", 60.0, 150.0))
    sol = SolverConfig(n_steps=10)
    inst = douglas.prepare_instance(
        spec, sol, 100.0, 100.0, 1.5, 0.04, 0.3, -0.9, 0.04, R, 0.0,
        "call")
    surfaces, _ = douglas.solve_with_tracking(
        inst, sol, 0.0, american=True, dividends=divs,
        option_type="call")
    assert np.max(np.abs(np.array(surfaces)[:, :, -1])) == 0.0
    assert np.max(np.abs(np.array(surfaces)[:, :, 0])) == 0.0
    assert float(surfaces[-1][inst.idx_v, inst.idx_s]) > 0.0


def test_double_barrier_pde_vs_mc_full_heston():
    """Double knock-out under full Heston: PDE vs the product-of-
    one-sided Brownian-bridge survival MC."""
    import jax

    from heston_tpu.models import mc

    b = Barrier("double-out", 80.0, 130.0)
    args = (100.0, 100.0, 1.5, 0.04, 0.3, -0.9, 0.04, R, 0.0)
    spec = GridSpec(m1=120, m2=32, barrier=b)
    sol = SolverConfig(n_steps=48, scheme="hv", rannacher_steps=2)
    pde = float(douglas.price_option(spec, sol, *args))
    price, half = mc.price_european_call_mc(
        jax.random.PRNGKey(11), 100.0, 0.04, 100.0, R, 0.0, 1.5, 0.04,
        0.3, -0.9, 1.0, num_paths=200_000, n_steps=350,
        scheme="truncation", antithetic=True, barrier=b)
    assert abs(pde - float(price)) < 3.0 * float(half) + 0.03, (
        pde, float(price), float(half))


def test_barrier_gap_spot_rejected():
    """A spot between the highest interior s-node and a top-knocked
    barrier cannot be inserted (the pinned barrier node must not move)
    — the book must be rejected LOUDLY instead of pricing the s=0
    column (~0) via find_node's index-0 fallback."""
    spec = GridSpec(m1=40, m2=12, barrier=Barrier("up-out", 130.0))
    sol = SolverConfig(n_steps=8)
    args = (1.5, 0.04, 0.3, -0.9, 0.04, R, 0.0)
    with pytest.raises(ValueError, match="highest interior"):
        douglas.price_option(spec, sol, 100.0, 128.5, *args)
    with pytest.raises(ValueError, match="highest interior"):
        douglas.price_batch(spec, sol, jnp.array([100.0]), 128.5, *args)
    # a resolvable spot passes, and a finer grid resolves the same spot
    douglas.price_option(spec, sol, 100.0, 126.0, *args)
    fine = GridSpec(m1=200, m2=12, barrier=Barrier("up-out", 130.0))
    p = float(douglas.price_option(fine, sol, 100.0, 128.5, *args))
    assert p > 0.0


def test_barrier_native_cpu_engine_matches():
    """The native C++ OpenMP engine prices knock-out books (barrier-
    aware operator assembly + the remap re-knock flag) equal to the XLA
    path at 1e-12."""
    from heston_tpu.utils import native

    sol = SolverConfig(n_steps=10)
    args = (100.0, 1.5, 0.04, 0.3, -0.9, 0.04, R, 0.0)
    ks = jnp.array([95.0, 105.0])
    divs = DividendSchedule(dates=(0.35,), amounts=(1.0,),
                            percentages=(0.01,))
    for b in (Barrier("up-out", 140.0), Barrier("down-out", 70.0),
              Barrier("double-out", 70.0, 140.0)):
        spec = GridSpec(m1=40, m2=12, barrier=b)
        want = np.array(douglas.price_batch(
            spec, sol, ks, *args, american=True, dividends=divs))
        got = native.price_batch_cpu(
            spec, sol, np.array(ks), *args, american=True,
            dividends=divs)
        np.testing.assert_allclose(got, want, atol=1e-12, err_msg=b.kind)
    # the re-knock flag is what keeps the top column dead: without it
    # the native remap refills it
    u = np.zeros((5, 8)); u[:, :-1] = 50.0; u[:, -1] = 0.0
    vec_s = np.linspace(60.0, 130.0, 8)
    out = native.apply_dividend(u, vec_s, 5.0, 0.0, knock_top=True)
    assert np.all(out[:, -1] == 0.0)
    out2 = native.apply_dividend(u, vec_s, 5.0, 0.0)
    assert np.any(out2[:, -1] != 0.0)


def test_knock_in_parity_and_limits():
    """Knock-IN via in-out parity: MC(KI) + MC(KO) == MC(vanilla)
    EXACTLY at the same seed (same paths, complementary weights); the
    PDE KI matches the MC KI under full Heston; and the limits hold
    (trigger near the spot -> KI ~ vanilla; trigger far -> KI ~ 0)."""
    import jax

    from heston_tpu.models import mc

    b = Barrier("up-out", 130.0)
    key = jax.random.PRNGKey(5)
    margs = (100.0, 0.04, 100.0, R, 0.0, 1.5, 0.04, 0.3, -0.9, 1.0)
    kw = dict(num_paths=100_000, n_steps=350, scheme="truncation")
    ko, _ = mc.price_european_call_mc(key, *margs, **kw, barrier=b)
    ki, ki_half = mc.price_european_call_mc(key, *margs, **kw, barrier=b,
                                            knock_in=True)
    van, _ = mc.price_european_call_mc(key, *margs, **kw)
    assert float(ki) + float(ko) == pytest.approx(float(van), abs=1e-12)

    # PDE KI (two-leg parity with per-leg grids) vs the MC KI
    spec = GridSpec(m1=120, m2=32, barrier=b)
    sol = SolverConfig(n_steps=48, scheme="hv", rannacher_steps=2)
    pde_ki = float(douglas.price_knock_in(
        spec, sol, jnp.array([100.0]), 100.0, 1.5, 0.04, 0.3, -0.9,
        0.04, R, 0.0)[0])
    assert abs(pde_ki - float(ki)) < 3.0 * float(ki_half) + 0.05, (
        pde_ki, float(ki))

    # limits (coarser grids suffice)
    csol = SolverConfig(n_steps=24)
    van_pde = float(douglas.price_batch(
        GridSpec(m1=60, m2=16), csol, jnp.array([100.0]), 100.0, 1.5,
        0.04, 0.3, -0.9, 0.04, R, 0.0)[0])
    near = float(douglas.price_knock_in(
        GridSpec(m1=60, m2=16, barrier=Barrier("up-out", 104.0)), csol,
        jnp.array([100.0]), 100.0, 1.5, 0.04, 0.3, -0.9, 0.04, R,
        0.0)[0])
    far = float(douglas.price_knock_in(
        GridSpec(m1=60, m2=16, barrier=Barrier("up-out", 400.0)), csol,
        jnp.array([100.0]), 100.0, 1.5, 0.04, 0.3, -0.9, 0.04, R,
        0.0)[0])
    assert abs(near - van_pde) < 0.05 * van_pde
    # `far` can dip slightly NEGATIVE: the parity's two legs discretize
    # different domains (KO on [0, 400] resolves finer than the
    # vanilla's [0, 8K]), so the ~0 true KI is swamped by the
    # few-per-mille leg mismatch the docstring warns about
    assert abs(far) < 0.01 * van_pde

    with pytest.raises(ValueError, match="barrier"):
        douglas.price_knock_in(GridSpec(m1=60, m2=16), csol,
                               jnp.array([100.0]), 100.0, 1.5, 0.04,
                               0.3, -0.9, 0.04, R, 0.0)
    with pytest.raises(ValueError, match="knock_in"):
        mc.price_european_call_mc(key, *margs, num_paths=1000,
                                  n_steps=10, scheme="truncation",
                                  knock_in=True)


def test_double_barrier_validation():
    with pytest.raises(ValueError, match="level_hi"):
        Barrier("double-out", 100.0)
    with pytest.raises(ValueError, match="level_hi"):
        Barrier("double-out", 100.0, 90.0)
    with pytest.raises(ValueError, match="level_hi"):
        Barrier("up-out", 100.0, 120.0)
    from heston_tpu.ops.grid import validate_book
    with pytest.raises(ValueError, match="knocked out"):
        validate_book(
            GridSpec(barrier=Barrier("double-out", 50.0, 90.0)),
            100.0, [100.0])
    with pytest.raises(ValueError, match="knocked out"):
        validate_book(
            GridSpec(barrier=Barrier("double-out", 110.0, 190.0)),
            100.0, [100.0])
    validate_book(GridSpec(barrier=Barrier("double-out", 50.0, 190.0)),
                  100.0, [100.0])


def test_barrier_book_risk_engine_equivalence():
    """batch_greeks auto-dispatches the fused surface path for barrier
    specs now — every risk column must match the XLA engine."""
    import dataclasses

    spec = GridSpec(m1=40, m2=12, barrier=Barrier("up-out", 140.0))
    sol = SolverConfig(n_steps=10)
    pal = dataclasses.replace(sol, solver_engine="pallas")
    ks = jnp.array([95.0, 105.0])
    args = (110.0, 1.5, 0.04, 0.3, -0.9, 0.04, R, 0.0)
    a = greeks.batch_greeks(spec, sol, ks, *args, american=True)
    b = greeks.batch_greeks(spec, pal, ks, *args, american=True)
    for k in greeks.RISK_KEYS:
        np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                   atol=1e-9, err_msg=k)


def test_barrier_book_risk():
    """batch_greeks on a knock-out book: near the up-out barrier the
    call delta goes NEGATIVE (the knock-out dominates), gamma flips
    sign, and all columns stay finite."""
    spec = GridSpec(m1=60, m2=16, barrier=Barrier("up-out", 130.0))
    sol = SolverConfig(n_steps=24)
    out = greeks.batch_greeks(
        spec, sol, jnp.array([100.0]), 125.0, 1.5, 0.04, 0.3, -0.9,
        0.04, R, 0.0)
    for k in greeks.RISK_KEYS:
        assert np.all(np.isfinite(np.asarray(out[k]))), k
    assert float(out["delta"][0]) < 0.0   # spot near the barrier
    # far from the barrier the delta is a normal call delta
    out2 = greeks.batch_greeks(
        spec, sol, jnp.array([100.0]), 95.0, 1.5, 0.04, 0.3, -0.9,
        0.04, R, 0.0)
    assert 0.0 < float(out2["delta"][0]) < 1.0
