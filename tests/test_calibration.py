"""LM calibration tests: Jacobian correctness, recovery of a synthetic
market (the reference's own acceptance test,
ref: src/heston_calibration.cpp:26-512), multi-maturity chains, and the
sharded pricing path plugged into the same driver."""

import jax.numpy as jnp
import numpy as np
import pytest

from heston_tpu.config import (
    CalibrationConfig,
    GridSpec,
    HestonParams,
    SolverConfig,
)
from heston_tpu.models import bs
from heston_tpu.models import calibration as calib
from heston_tpu.parallel import make_mesh, sharded_pricing_fns

SPEC = GridSpec(m1=30, m2=15)
# smaller config for ENGINE-PARITY tests (trajectory equality is grid-
# independent; fit-quality tests keep the resolution above)
SPEC_EQ = GridSpec(m1=16, m2=10)
SOLVER = SolverConfig(n_steps=10, theta=0.8, maturity=1.0, a2_variant="upwind")
SOLVER_EQ = SolverConfig(n_steps=6, theta=0.8, maturity=1.0, a2_variant="upwind")


def test_jacobian_matches_manual_fd(params):
    strikes = jnp.array([95.0, 100.0, 105.0])
    tv = jnp.array(params.bumpable())
    eps = 1e-6
    jac, base = calib.jacobian_and_prices(
        SPEC, SOLVER, strikes, 100.0, tv, params.r_d, params.r_f, eps=eps)
    for p_idx in range(5):
        tv_b = tv.at[p_idx].add(eps)
        bumped = calib.base_prices(SPEC, SOLVER, strikes, 100.0, tv_b,
                                   params.r_d, params.r_f)
        manual = (np.array(bumped) - np.array(base)) / eps
        # batched-vmap vs unbatched execution reorders float ops; a ~1e-12
        # price difference divided by eps=1e-6 shows up as ~1e-6 in J
        np.testing.assert_allclose(np.array(jac[:, p_idx]), manual,
                                   rtol=1e-4, atol=1e-5)


def test_v0_jacobian_column_nonzero(params):
    """The v0 bump rebuilds the variance grid and must produce a sensible
    vega-like sensitivity (ref: src/jacobian_computation.cpp:331-361)."""
    strikes = jnp.array([100.0])
    tv = jnp.array(params.bumpable())
    jac, _ = calib.jacobian_and_prices(
        SPEC, SOLVER, strikes, 100.0, tv, params.r_d, params.r_f)
    assert float(jac[0, 4]) > 1.0  # dPrice/dv0 strongly positive ATM


def _make_targets(params, n_strikes=12):
    strikes = np.array([100.0 * 0.7 + i * 60.0 / n_strikes
                        for i in range(n_strikes)])
    market = np.asarray(bs.generate_market_data(
        100.0, 1.0, params.r_d, jnp.asarray(strikes)))
    return calib.CalibrationTargets(
        strikes=strikes, maturities=np.full(n_strikes, 1.0),
        prices=market, s0=100.0, r_d=params.r_d, r_f=params.r_f)


def test_calibration_reduces_error(params):
    """Fit the 5 Heston params to a flat-vol-0.2 BS chain; SSE must drop by
    orders of magnitude (reference scenario,
    ref: src/heston_calibration.cpp:77-83)."""
    targets = _make_targets(params)
    init = HestonParams(kappa=1.5, eta=0.04, sigma=0.3, rho=-0.9, v0=0.04)
    cfg = CalibrationConfig(max_iter=8, tol=1e-4)
    res = calib.calibrate(targets, SPEC, SOLVER, init, cfg)

    init_prices = np.asarray(calib.base_prices(
        SPEC, SOLVER, jnp.asarray(targets.strikes), 100.0,
        jnp.array(init.bumpable()), params.r_d, params.r_f))
    init_sse = float(np.sum((targets.prices - init_prices) ** 2))
    assert res.final_error < init_sse * 1e-2
    assert res.iterations <= 8
    # clamps respected
    assert res.params.kappa >= 1e-3 and res.params.v0 >= 1e-2
    assert -1.0 <= res.params.rho <= 1.0


def test_calibration_multi_maturity(params):
    """Per-maturity step counts (ref: src/heston_calibration.cpp:2165-2213):
    each maturity group gets N = round(steps_per_year * T)."""
    strikes = np.tile(np.linspace(90.0, 110.0, 4), 2)
    mats = np.repeat([0.5, 1.0], 4)
    market = np.concatenate([
        np.asarray(bs.generate_market_data(100.0, t, params.r_d,
                                           jnp.asarray(strikes[:4])))
        for t in (0.5, 1.0)])
    targets = calib.CalibrationTargets(
        strikes=strikes, maturities=mats, prices=market,
        s0=100.0, r_d=params.r_d, r_f=params.r_f)
    init = HestonParams()
    cfg = CalibrationConfig(max_iter=3, tol=1e-6)
    res = calib.calibrate(targets, SPEC, SOLVER, init, cfg,
                          steps_per_year=10)
    assert res.iterations >= 1
    assert np.isfinite(res.final_error)
    h0 = res.history[0]
    assert h0["sse"] > res.final_error or h0["accepted"]


def test_device_lm_matches_host_lm(params):
    """The fully device-resident LM loop (one lax.while_loop) reproduces the
    host-driven loop exactly."""
    import jax.numpy as jnp

    strikes = jnp.linspace(80.0, 120.0, 9)
    market = bs.generate_market_data(100.0, 1.0, params.r_d, strikes)
    init_vec = jnp.array([1.0, 0.05, 0.4, -0.5, 0.05])
    cfg = CalibrationConfig(max_iter=5, tol=1e-6)

    tv, info = calib.calibrate_device(
        SPEC, SOLVER, strikes, market, 100.0, init_vec,
        params.r_d, params.r_f, cfg=cfg)

    targets = calib.CalibrationTargets(
        strikes=np.array(strikes), maturities=np.ones(9),
        prices=np.array(market), s0=100.0, r_d=params.r_d, r_f=params.r_f)
    init = HestonParams(kappa=1.0, eta=0.05, sigma=0.4, rho=-0.5, v0=0.05)
    res = calib.calibrate(targets, SPEC, SOLVER, init, cfg)

    np.testing.assert_allclose(np.array(tv),
                               np.array(res.params.bumpable()), rtol=1e-9)
    assert int(info["iterations"]) == res.iterations
    assert abs(float(info["final_error"]) - res.final_error) < 1e-9


def test_device_lm_multi_maturity_groups(params):
    """group_steps gives each maturity slice its own step count."""
    import jax.numpy as jnp

    strikes = jnp.concatenate([jnp.linspace(90., 110., 4)] * 2)
    market = jnp.concatenate([
        bs.generate_market_data(100.0, 0.5, params.r_d, strikes[:4]),
        bs.generate_market_data(100.0, 1.0, params.r_d, strikes[4:]),
    ])
    init_vec = jnp.array(params.bumpable())
    cfg = CalibrationConfig(max_iter=2, tol=1e-8)
    tv, info = calib.calibrate_device(
        SPEC_EQ, SOLVER_EQ, strikes, market, 100.0, init_vec,
        params.r_d, params.r_f, cfg=cfg,
        group_steps=((0, 4, 3), (4, 8, 6)))
    assert np.all(np.isfinite(np.array(tv)))
    assert int(info["iterations"]) >= 1


def test_device_lm_multi_maturity_dividends_one_launch(params):
    """Mixed-maturity AD calibration WITH a dividend schedule: the
    pallas engine rides the ONE-LAUNCH per-lane path (events at shared
    step indices, identity remap rows past each lane's maturity —
    the reference's american+dividend multi-maturity scenario,
    ref: src/heston_calibration.cpp:2936-3243) and must reproduce the
    scan-engine per-group trajectory to roundoff."""
    import dataclasses

    from heston_tpu.config import GOLDEN_DIVIDENDS

    strikes = jnp.concatenate([jnp.linspace(90., 110., 4)] * 2)
    market = jnp.concatenate([
        bs.generate_market_data(100.0, 0.5, params.r_d, strikes[:4]),
        bs.generate_market_data(100.0, 1.0, params.r_d, strikes[4:]),
    ])
    init_vec = jnp.array(params.bumpable())
    cfg = CalibrationConfig(max_iter=2, tol=1e-12, jacobian_mode="ad")
    res = {}
    for eng in ("scan", "pallas"):
        sol = dataclasses.replace(SOLVER_EQ, solver_engine=eng)
        tv, info = calib.calibrate_device(
            SPEC_EQ, sol, strikes, market, 100.0, init_vec,
            params.r_d, params.r_f, cfg=cfg, american=True,
            dividends=GOLDEN_DIVIDENDS,
            group_steps=((0, 4, 3), (4, 8, 6)))
        res[eng] = (np.asarray(tv), float(info["final_error"]))
    np.testing.assert_allclose(res["pallas"][0], res["scan"][0],
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(res["pallas"][1], res["scan"][1],
                               rtol=1e-6)


def test_calibration_sharded_matches_single(params):
    """The same LM driver with sharded pricing fns reproduces the
    single-device trajectory bit-for-bit."""
    targets = _make_targets(params, n_strikes=8)
    init = HestonParams(kappa=1.0, eta=0.05, sigma=0.4, rho=-0.5, v0=0.05)
    cfg = CalibrationConfig(max_iter=3, tol=1e-8)
    res_single = calib.calibrate(targets, SPEC, SOLVER, init, cfg)
    mesh = make_mesh()
    res_sharded = calib.calibrate(targets, SPEC, SOLVER, init, cfg,
                                  pricing_fns=sharded_pricing_fns(mesh))
    np.testing.assert_allclose(
        np.array(res_sharded.params.bumpable()),
        np.array(res_single.params.bumpable()), rtol=1e-8)
    assert abs(res_sharded.final_error - res_single.final_error) < 1e-8


def test_device_lm_ad_pallas_cs_scheme(params):
    """scheme='cs' + engine='pallas' AD calibration: the forward-mode
    kernel now implements the Craig-Sneyd corrector, so the device LM
    rides the fused kernel (use_fused dispatches it) and must agree
    with the XLA-engine CS calibration at solver roundoff — the
    Jacobian and the trial residuals still come from the SAME
    discretization (a missed scheme guard here once produced a
    DO-Jacobian / CS-residual LM)."""
    import dataclasses

    from heston_tpu.pallas import fused_do

    p = params
    solver_p = dataclasses.replace(SOLVER_EQ, scheme="cs",
                                   solver_engine="pallas")
    solver_s = dataclasses.replace(SOLVER_EQ, scheme="cs",
                                   solver_engine="scan")
    assert fused_do.use_fused(SPEC_EQ, solver_p,
                              n_tangents=fused_do.JAC_TANGENTS)
    strikes = jnp.linspace(90.0, 110.0, 5)
    market = bs.generate_market_data(100.0, 1.0, p.r_d, strikes)
    init = jnp.array([1.2, 0.05, 0.4, -0.5, 0.05])
    cfg = CalibrationConfig(max_iter=2, tol=1e-12, jacobian_mode="ad")
    tv_p, info_p = calib.calibrate_device(
        SPEC_EQ, solver_p, strikes, market, 100.0, init, p.r_d, p.r_f,
        cfg=cfg)
    tv_s, info_s = calib.calibrate_device(
        SPEC_EQ, solver_s, strikes, market, 100.0, init, p.r_d, p.r_f,
        cfg=cfg)
    np.testing.assert_allclose(np.array(tv_p), np.array(tv_s),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(float(info_p["final_error"]),
                               float(info_s["final_error"]),
                               rtol=1e-6, atol=0)


def test_device_lm_ad_pallas_vmem_window_falls_back(params):
    """Grid in the fits(primal)-but-not-fits(5-tangents) VMEM window:
    the AD-Jacobian branch cannot ride the fused kernel AND must not
    linearize through price_batch while it still dispatches the kernel
    (pallas_call's input_output_aliases has no JVP rule — this exact
    config crashed at trace time with NotImplementedError). The fleet
    downgrades to the XLA engine and the LM runs."""
    import dataclasses

    from heston_tpu.pallas import fused_do

    p = params
    spec = GridSpec(m1=60, m2=50)
    assert fused_do.fits_vmem(spec, 8, 0)          # primal fits...
    assert not fused_do.fits_vmem(spec, 8, 5)      # ...5 tangents don't
    solver = dataclasses.replace(SOLVER, n_steps=4,
                                 solver_engine="pallas")
    strikes = jnp.linspace(95.0, 105.0, 4)
    market = bs.generate_market_data(100.0, 1.0, p.r_d, strikes)
    init = jnp.array([1.2, 0.05, 0.4, -0.5, 0.05])
    cfg = CalibrationConfig(max_iter=2, tol=1e-12, jacobian_mode="ad")
    tv, info = calib.calibrate_device(
        spec, solver, strikes, market, 100.0, init, p.r_d, p.r_f, cfg=cfg)
    assert np.all(np.isfinite(np.array(tv)))
    assert int(info["iterations"]) >= 1


def test_ad_jacobian_matches_fd(params):
    """jacobian_and_prices_ad (exact forward mode, the host-loop f32
    path) agrees with the FD Jacobian to the FD truncation error."""
    strikes = jnp.array([95.0, 105.0])
    tv = jnp.array(params.bumpable())
    jac_fd, base_fd = calib.jacobian_and_prices(
        SPEC, SOLVER, strikes, 100.0, tv, params.r_d, params.r_f, eps=1e-6)
    jac_ad, base_ad = calib.jacobian_and_prices_ad(
        SPEC, SOLVER, strikes, 100.0, tv, params.r_d, params.r_f,
        v0_mode="ad")
    np.testing.assert_allclose(np.array(base_ad), np.array(base_fd),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.array(jac_ad), np.array(jac_fd),
                               rtol=1e-4, atol=1e-5)


def test_device_lm_returns_iteration_history(params):
    """The on-chip LM keeps per-iteration forensics (error/lam/accept/
    params) in preallocated [max_iter] rows — the host loop's history
    equivalent, previously missing from the device loop."""
    p = params
    strikes = jnp.linspace(90.0, 110.0, 5)
    market = bs.generate_market_data(100.0, 1.0, p.r_d, strikes)
    init = jnp.array([1.2, 0.05, 0.4, -0.5, 0.05])
    cfg = CalibrationConfig(max_iter=6, tol=1e-12)
    tv, info = calib.calibrate_device(
        SPEC, SOLVER, strikes, market, 100.0, init, p.r_d, p.r_f, cfg=cfg)
    hist = info["history"]
    it = int(info["iterations"])
    assert 1 <= it <= 6
    err = np.array(hist["error"])
    assert np.all(np.isfinite(err[:it]))
    assert np.all(np.isnan(err[it:]))
    pars = np.array(hist["params"])
    assert pars.shape == (6, 5)
    assert np.all(np.isfinite(pars[:it]))
    # the last recorded parameter row IS the returned vector
    np.testing.assert_array_equal(pars[it - 1], np.array(tv))
    # errors in the history are the per-iteration SSE of the CURRENT
    # params — monotone non-increasing on accepted steps
    acc = np.array(hist["accepted"])[:it]
    for i in range(1, it):
        if acc[i - 1]:
            assert err[i] <= err[i - 1] + 1e-12


# ---------------------------------------------------------------------------
# Weighted least squares (framework extension: sum w_i r_i^2 objective)
# ---------------------------------------------------------------------------


def test_vega_weights_properties(params):
    """1/vega^2 weights: positive, mean-1 normalized, minimal at the
    ATM point (max vega) and larger on the wings, floor-capped."""
    targets = _make_targets(params)
    w = calib.vega_weights(targets)
    assert w.shape == targets.prices.shape
    assert np.all(w > 0)
    np.testing.assert_allclose(w.mean(), 1.0, rtol=1e-12)
    # min weight = max vega sits near the FORWARD (s0*e^{rT}), i.e. in
    # the interior of the chain, with both wings weighted higher
    amin = int(np.argmin(w))
    fwd = 100.0 * np.exp(targets.r_d * 1.0)
    assert abs(targets.strikes[amin] - fwd) <= 5.0 + 1e-9
    assert w[0] > w[amin] and w[-1] > w[amin]
    # floor: no weight exceeds (floor_frac*max_vega)^-2 normalized
    assert w.max() / w.min() <= (1 / 0.05) ** 2 + 1e-9


def test_unit_weights_match_unweighted_host(params):
    """weights = all-ones must reproduce the unweighted LM trajectory
    bitwise (same objective)."""
    targets = _make_targets(params, n_strikes=8)
    init = HestonParams(kappa=1.0, eta=0.05, sigma=0.4, rho=-0.5, v0=0.05)
    cfg = CalibrationConfig(max_iter=3, tol=1e-8)
    res_plain = calib.calibrate(targets, SPEC, SOLVER, init, cfg)
    targets_w = calib.CalibrationTargets(
        strikes=targets.strikes, maturities=targets.maturities,
        prices=targets.prices, s0=targets.s0, r_d=targets.r_d,
        r_f=targets.r_f, weights=np.ones_like(targets.prices))
    res_w = calib.calibrate(targets_w, SPEC, SOLVER, init, cfg)
    np.testing.assert_array_equal(
        np.array(res_w.params.bumpable()),
        np.array(res_plain.params.bumpable()))
    assert res_w.final_error == res_plain.final_error
    assert res_w.iterations == res_plain.iterations


def test_weight_scale_invariance(params):
    """Scaling all weights by c scales the SSE by c but leaves the LM
    trajectory (normal equations, accept/reject) unchanged."""
    targets = _make_targets(params, n_strikes=8)
    init = HestonParams(kappa=1.0, eta=0.05, sigma=0.4, rho=-0.5, v0=0.05)
    cfg = CalibrationConfig(max_iter=3, tol=1e-12)
    t1 = calib.CalibrationTargets(
        strikes=targets.strikes, maturities=targets.maturities,
        prices=targets.prices, s0=targets.s0, r_d=targets.r_d,
        r_f=targets.r_f, weights=np.ones_like(targets.prices))
    t2 = calib.CalibrationTargets(
        strikes=targets.strikes, maturities=targets.maturities,
        prices=targets.prices, s0=targets.s0, r_d=targets.r_d,
        r_f=targets.r_f, weights=np.full_like(targets.prices, 4.0))
    r1 = calib.calibrate(t1, SPEC, SOLVER, init, cfg)
    r2 = calib.calibrate(t2, SPEC, SOLVER, init, cfg)
    np.testing.assert_allclose(np.array(r2.params.bumpable()),
                               np.array(r1.params.bumpable()), rtol=1e-10)
    np.testing.assert_allclose(r2.final_error, 4.0 * r1.final_error,
                               rtol=1e-9)


def test_device_lm_weights_match_host(params):
    """calibrate_device(weights=...) reproduces the host weighted driver
    (one objective on both loops)."""
    strikes = jnp.linspace(85.0, 115.0, 7)
    market = bs.generate_market_data(100.0, 1.0, params.r_d, strikes)
    w = np.linspace(0.5, 2.0, 7)
    w = w / w.mean()
    init = HestonParams(kappa=1.0, eta=0.05, sigma=0.4, rho=-0.5, v0=0.05)
    init_vec = jnp.array(init.bumpable())
    cfg = CalibrationConfig(max_iter=4, tol=1e-10)
    tv, info = calib.calibrate_device(
        SPEC, SOLVER, strikes, market, 100.0, init_vec,
        params.r_d, params.r_f, cfg=cfg, weights=jnp.asarray(w))
    targets = calib.CalibrationTargets(
        strikes=np.array(strikes), maturities=np.ones(7),
        prices=np.array(market), s0=100.0, r_d=params.r_d,
        r_f=params.r_f, weights=w)
    res = calib.calibrate(targets, SPEC, SOLVER, init, cfg)
    # the two drivers build J from independently-compiled executables;
    # ~1e-12 price noise through ill-conditioned weighted normal
    # equations shows up at ~1e-5 in the trajectory
    np.testing.assert_allclose(np.array(tv),
                               np.array(res.params.bumpable()),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(info["final_error"]),
                               res.final_error, rtol=1e-3)
    assert int(info["iterations"]) == res.iterations


def test_calibrate_sharded_weights_match_host(params):
    """The distributed LM with weights reproduces the single-device
    weighted trajectory (sqrt(w) rides the padded-lane channel)."""
    from heston_tpu.parallel import sharded

    strikes = np.linspace(85.0, 115.0, 8)
    market = np.asarray(bs.generate_market_data(
        100.0, 1.0, params.r_d, jnp.asarray(strikes)))
    w = np.linspace(0.5, 2.0, 8)
    w = w / w.mean()
    init = HestonParams(kappa=1.0, eta=0.05, sigma=0.4, rho=-0.5, v0=0.05)
    cfg = CalibrationConfig(max_iter=3, tol=1e-10)
    mesh = make_mesh()
    tv_sh, info_sh = sharded.calibrate_sharded(
        mesh, SPEC, SOLVER, jnp.asarray(strikes), market, 100.0,
        jnp.array(init.bumpable()), params.r_d, params.r_f, cfg=cfg,
        weights=w)
    targets = calib.CalibrationTargets(
        strikes=strikes, maturities=np.ones(8), prices=market,
        s0=100.0, r_d=params.r_d, r_f=params.r_f, weights=w)
    res = calib.calibrate(targets, SPEC, SOLVER, init, cfg)
    np.testing.assert_allclose(np.array(tv_sh),
                               np.array(res.params.bumpable()),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(info_sh["final_error"]),
                               res.final_error, rtol=1e-5)


def test_weights_validation(params):
    targets = _make_targets(params, n_strikes=4)
    init = HestonParams()
    cfg = CalibrationConfig(max_iter=1)
    bad_shape = calib.CalibrationTargets(
        strikes=targets.strikes, maturities=targets.maturities,
        prices=targets.prices, s0=targets.s0, r_d=targets.r_d,
        r_f=targets.r_f, weights=np.ones(3))
    with pytest.raises(ValueError, match="weights"):
        calib.calibrate(bad_shape, SPEC, SOLVER, init, cfg)
    negative = calib.CalibrationTargets(
        strikes=targets.strikes, maturities=targets.maturities,
        prices=targets.prices, s0=targets.s0, r_d=targets.r_d,
        r_f=targets.r_f, weights=np.array([1.0, 1.0, -0.5, 1.0]))
    with pytest.raises(ValueError, match="weights"):
        calib.calibrate(negative, SPEC, SOLVER, init, cfg)
    with pytest.raises(ValueError, match="weights"):
        calib.calibrate_device(
            SPEC, SOLVER, jnp.asarray(targets.strikes),
            jnp.asarray(targets.prices), 100.0,
            jnp.array(init.bumpable()), targets.r_d, targets.r_f,
            cfg=cfg, weights=jnp.ones(3))


def test_vega_weighting_steers_fit(params):
    """Vega weighting must actually change the optimum: the weighted fit
    achieves a lower WEIGHTED error than the unweighted fit evaluated
    under the same weights."""
    targets = _make_targets(params)
    w = calib.vega_weights(targets)
    targets_w = calib.CalibrationTargets(
        strikes=targets.strikes, maturities=targets.maturities,
        prices=targets.prices, s0=targets.s0, r_d=targets.r_d,
        r_f=targets.r_f, weights=w)
    init = HestonParams(kappa=1.5, eta=0.04, sigma=0.3, rho=-0.9, v0=0.04)
    cfg = CalibrationConfig(max_iter=6, tol=1e-10)
    res_w = calib.calibrate(targets_w, SPEC, SOLVER, init, cfg)
    res_u = calib.calibrate(targets, SPEC, SOLVER, init, cfg)
    # the weighted LM drives the WEIGHTED error down by orders of
    # magnitude from the initial guess...
    init_prices = np.asarray(calib.base_prices(
        SPEC, SOLVER, jnp.asarray(targets.strikes), 100.0,
        jnp.array(init.bumpable()), params.r_d, params.r_f))
    r0 = targets.prices - init_prices
    init_werr = float(r0 @ (w * r0))
    assert res_w.final_error < init_werr * 1e-2
    # ...and lands on a genuinely different optimum than the price fit
    # (the objective actually steers the solution)
    assert not np.allclose(np.array(res_w.params.bumpable()),
                           np.array(res_u.params.bumpable()), rtol=1e-3)
