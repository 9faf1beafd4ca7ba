"""Multi-chip sharding tests on the virtual 8-device CPU mesh: sharded
results must equal single-device results exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heston_tpu.config import GOLDEN_DIVIDENDS, GridSpec, SolverConfig
from heston_tpu.models import calibration as calib
from heston_tpu.parallel import (
    jacobian_normal_eq_sharded,
    make_mesh,
    price_batch_sharded,
    sharded_pricing_fns,
)

SPEC = GridSpec(m1=16, m2=10)
SOLVER = SolverConfig(n_steps=6, theta=0.8, maturity=1.0, a2_variant="upwind")


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must force 8 virtual devices"
    return make_mesh()


def _theta(params):
    return jnp.array(params.bumpable())


def test_sharded_prices_match_single_device(params, mesh):
    strikes = jnp.linspace(80.0, 120.0, 16)
    tv = _theta(params)
    want = calib.base_prices(SPEC, SOLVER, strikes, 100.0, tv,
                             params.r_d, params.r_f)
    got = price_batch_sharded(mesh, SPEC, SOLVER, strikes, 100.0, tv,
                              params.r_d, params.r_f)
    np.testing.assert_allclose(np.array(got), np.array(want), rtol=0,
                               atol=1e-12)


def test_sharded_handles_non_divisible_batch(params, mesh):
    strikes = jnp.linspace(85.0, 115.0, 13)  # 13 % 8 != 0
    tv = _theta(params)
    want = calib.base_prices(SPEC, SOLVER, strikes, 100.0, tv,
                             params.r_d, params.r_f,
                             dividends=GOLDEN_DIVIDENDS)
    got = price_batch_sharded(mesh, SPEC, SOLVER, strikes, 100.0, tv,
                              params.r_d, params.r_f,
                              dividends=GOLDEN_DIVIDENDS)
    assert got.shape == (13,)
    np.testing.assert_allclose(np.array(got), np.array(want), rtol=0,
                               atol=1e-12)


def test_distributed_normal_equations_match_dense(params, mesh):
    """psum'd JtJ/Jtr + replicated 5x5 solve == single-device lm_update."""
    strikes = jnp.linspace(90.0, 110.0, 11)
    tv = _theta(params)
    market = calib.base_prices(SPEC, SOLVER, strikes, 100.0,
                               tv * 1.05, params.r_d, params.r_f)
    lam = 0.01
    jac, base = calib.jacobian_and_prices(
        SPEC, SOLVER, strikes, 100.0, tv, params.r_d, params.r_f)
    resid = market - base
    want_delta = calib.lm_update(jac, resid, lam)
    want_sse = float(resid @ resid)

    delta, base_sh, sse = jacobian_normal_eq_sharded(
        mesh, SPEC, SOLVER, strikes, market, 100.0, tv,
        params.r_d, params.r_f, lam)
    np.testing.assert_allclose(np.array(base_sh), np.array(base), atol=1e-12)
    np.testing.assert_allclose(np.array(delta), np.array(want_delta),
                               rtol=1e-9, atol=1e-12)
    assert abs(float(sse) - want_sse) < 1e-9 * max(1.0, want_sse)


def test_sharded_pricing_fns_match_plain(params, mesh):
    strikes = jnp.linspace(80.0, 120.0, 10)
    tv = _theta(params)
    jac_fn, price_fn = sharded_pricing_fns(mesh)
    j_sh, b_sh = jac_fn(SPEC, SOLVER, strikes, 100.0, tv,
                        params.r_d, params.r_f)
    j, b = calib.jacobian_and_prices(SPEC, SOLVER, strikes, 100.0, tv,
                                     params.r_d, params.r_f)
    np.testing.assert_allclose(np.array(j_sh), np.array(j), rtol=0,
                               atol=1e-9)
    np.testing.assert_allclose(np.array(b_sh), np.array(b), rtol=0,
                               atol=1e-12)


def test_sharded_fused_ad_jacobian_matches_single_device(params, mesh):
    """solver_engine='pallas' on a sharded book: each device runs the
    fused kernel (exact AD Jacobian through it) on its shard; the
    distributed result equals the single-device fused Jacobian to
    roundoff."""
    import dataclasses

    from heston_tpu.pallas import fused_do

    solver_p = dataclasses.replace(SOLVER, solver_engine="pallas")
    strikes = jnp.linspace(80.0, 120.0, 16)
    tv = _theta(params)
    jac_fn, price_fn = sharded_pricing_fns(mesh)
    j_sh, b_sh = jac_fn(SPEC, solver_p, strikes, 100.0, tv,
                        params.r_d, params.r_f, american=True,
                        jacobian_mode="ad")
    b, j = fused_do.fused_theta_jacobian(
        SPEC, solver_p, strikes, 100.0, tv, params.r_d, params.r_f,
        american=True, interpret=True)
    np.testing.assert_allclose(np.array(b_sh), np.array(b), rtol=0,
                               atol=1e-12)
    np.testing.assert_allclose(np.array(j_sh), np.array(j), rtol=0,
                               atol=1e-10)


def test_sharded_book_greeks_match_single_device(params, mesh):
    """batch_greeks_sharded == batch_greeks on every output (non-divisible
    batch, American put book)."""
    from heston_tpu.models import greeks
    from heston_tpu.parallel import batch_greeks_sharded

    strikes = jnp.linspace(85.0, 125.0, 11)  # 11 % 8 != 0
    tv = _theta(params)
    want = greeks.batch_greeks(
        SPEC, SOLVER, strikes, 100.0, params.kappa, params.eta,
        params.sigma, params.rho, params.v0, params.r_d, params.r_f,
        american=True, option_type="put")
    got = batch_greeks_sharded(
        mesh, SPEC, SOLVER, strikes, 100.0, tv, params.r_d, params.r_f,
        american=True, option_type="put")
    from heston_tpu.models.greeks import RISK_KEYS

    assert set(got) == set(RISK_KEYS)
    for key in RISK_KEYS:
        np.testing.assert_allclose(np.array(got[key]),
                                   np.array(want[key]), rtol=0,
                                   atol=1e-12, err_msg=key)


def test_sharded_ad_jacobian_without_fused_kernel(params, mesh):
    """jacobian_mode='ad' on the sharded arm (auto-selected under
    float32, where the FD bump is quantization noise) produces the exact
    forward-mode Jacobian even when the fused kernel does not dispatch
    (scan engine)."""
    from heston_tpu.parallel import sharded_pricing_fns

    jac_fn, _ = sharded_pricing_fns(mesh)
    strikes = jnp.linspace(90.0, 110.0, 8)
    tv = _theta(params)
    jac, base = jac_fn(SPEC, SOLVER, strikes, 100.0, tv,
                       params.r_d, params.r_f, jacobian_mode="ad")
    want_jac, want_base = calib.jacobian_and_prices_ad(
        SPEC, SOLVER, strikes, 100.0, tv, params.r_d, params.r_f)
    np.testing.assert_allclose(np.array(base), np.array(want_base),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.array(jac), np.array(want_jac),
                               rtol=1e-9, atol=1e-10)


def test_sharded_ad_jacobian_vmem_window_falls_back(params, mesh):
    """Same VMEM-window defect on the sharded LM arm: jacobian_mode='ad'
    with engine='pallas' on a grid where the primal fits VMEM but 5
    tangents do not must linearize through the XLA engine instead of
    crashing on pallas_call's missing JVP rule."""
    import dataclasses

    from heston_tpu.models import calibration as calib
    from heston_tpu.pallas import fused_do
    from heston_tpu.parallel import sharded_pricing_fns

    spec = GridSpec(m1=60, m2=50)
    assert fused_do.fits_vmem(spec, 8, 0)
    assert not fused_do.fits_vmem(spec, 8, 5)
    solver = dataclasses.replace(SOLVER, n_steps=4,
                                 solver_engine="pallas")
    jac_fn, _ = sharded_pricing_fns(mesh)
    strikes = jnp.linspace(95.0, 105.0, 8)
    tv = _theta(params)
    jac, base = jac_fn(spec, solver, strikes, 100.0, tv,
                       params.r_d, params.r_f, jacobian_mode="ad")
    xla_solver = dataclasses.replace(solver, solver_engine="scan")
    want_jac, want_base = calib.jacobian_and_prices_ad(
        spec, xla_solver, strikes, 100.0, tv, params.r_d, params.r_f)
    np.testing.assert_allclose(np.array(base), np.array(want_base),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.array(jac), np.array(want_jac),
                               rtol=1e-9, atol=1e-10)


@pytest.mark.parametrize("engine", ["scan", "pallas"])
def test_sharded_mixed_maturity_book_risk(params, mesh, engine):
    """batch_greeks_sharded(group_steps=...) == single-device
    batch_greeks(group_steps=...): the fused engine runs ONE per-lane
    launch per shard; XLA engines shard each maturity group separately."""
    import dataclasses

    from heston_tpu.models import greeks
    from heston_tpu.parallel import batch_greeks_sharded

    ks = jnp.linspace(85.0, 115.0, 11)          # 11 % 8 != 0
    groups = ((0, 5, 3), (5, 11, 6))
    se = dataclasses.replace(SOLVER, solver_engine=engine)
    tv = _theta(params)
    want = greeks.batch_greeks(
        SPEC, se, ks, 100.0, params.kappa, params.eta, params.sigma,
        params.rho, params.v0, params.r_d, params.r_f, american=True,
        dividends=GOLDEN_DIVIDENDS, group_steps=groups)
    got = batch_greeks_sharded(
        mesh, SPEC, se, ks, 100.0, tv, params.r_d, params.r_f,
        american=True, dividends=GOLDEN_DIVIDENDS, group_steps=groups)
    from heston_tpu.models.greeks import RISK_KEYS

    for key in RISK_KEYS:
        # rtol covers the v-stencil's 1/h_v^2 amplification of the
        # padded-assembly float noise on the large vanna/volga values
        np.testing.assert_allclose(
            np.array(got[key]), np.array(want[key]), rtol=1e-9,
            atol=(1e-9 if key == "theta" else 1e-11),
            err_msg=f"{engine}:{key}")


def test_sharded_mixed_maturity_normal_eq_one_launch(params, mesh):
    """jacobian_normal_eq_sharded(group_steps=...): each shard runs ONE
    fused forward-mode launch over its slice of the maturity ladder
    (per-lane step counts, the distributed form of calibrate_device's
    one-launch multi-maturity path) — equal to the single-device
    normal-equation step built from fused_theta_jacobian."""
    import dataclasses

    from heston_tpu.models import bs
    from heston_tpu.pallas import fused_do

    solver = dataclasses.replace(SOLVER, solver_engine="pallas")
    ks = jnp.concatenate([jnp.linspace(90.0, 110.0, 8)] * 2)
    groups = ((0, 8, 3), (8, 16, 6))
    nst = jnp.concatenate([jnp.full(8, 3), jnp.full(8, 6)])
    market = jnp.concatenate([
        bs.generate_market_data(100.0, 0.5, params.r_d, ks[:8]),
        bs.generate_market_data(100.0, 1.0, params.r_d, ks[8:]),
    ])
    tv = _theta(params)
    lam = 0.01
    delta, base, sse = jacobian_normal_eq_sharded(
        mesh, SPEC, solver, ks, market, 100.0, tv, params.r_d,
        params.r_f, lam=lam, american=True, jacobian_mode="ad",
        dividends=GOLDEN_DIVIDENDS, group_steps=groups)
    want_base, want_jac = fused_do.fused_theta_jacobian(
        SPEC, solver, ks, 100.0, tv, params.r_d, params.r_f,
        american=True, dividends=GOLDEN_DIVIDENDS, interpret=True,
        n_steps_per=nst)
    resid = np.asarray(market) - np.asarray(want_base)
    J = np.asarray(want_jac)
    jtj = J.T @ J * (1.0 + lam * np.eye(5))
    want_delta = np.linalg.solve(jtj, J.T @ resid)
    np.testing.assert_allclose(np.array(base), np.asarray(want_base),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(float(sse), float(resid @ resid),
                               rtol=1e-12)
    np.testing.assert_allclose(np.array(delta), want_delta, rtol=1e-8,
                               atol=1e-12)


def test_sharded_mixed_maturity_normal_eq_rejects_xla_engine(params, mesh):
    from heston_tpu.models import bs

    ks = jnp.linspace(90.0, 110.0, 8)
    market = bs.generate_market_data(100.0, 1.0, params.r_d, ks)
    with pytest.raises(ValueError, match="fused engine"):
        jacobian_normal_eq_sharded(
            mesh, SPEC, SOLVER, ks, market, 100.0, _theta(params),
            params.r_d, params.r_f, lam=0.01,
            group_steps=((0, 4, 3), (4, 8, 6)))


def test_calibrate_sharded_mixed_ladder(params, mesh):
    """calibrate_sharded: whole mixed-maturity American+dividend chain
    stays sharded for every LM pass (one per-lane fused launch per shard
    per Jacobian, one per trial). Must reproduce calibrate_device's
    one-launch trajectory (same AD Jacobian, same LM rules) and cut the
    SSE."""
    import dataclasses

    from heston_tpu.models import bs
    from heston_tpu.parallel import calibrate_sharded
    from heston_tpu.config import CalibrationConfig

    solver = dataclasses.replace(SOLVER, solver_engine="pallas")
    ks = jnp.concatenate([jnp.linspace(90.0, 110.0, 8)] * 2)
    groups = ((0, 8, 3), (8, 16, 6))
    market = jnp.concatenate([
        bs.generate_market_data(100.0, 0.5, params.r_d, ks[:8]),
        bs.generate_market_data(100.0, 1.0, params.r_d, ks[8:]),
    ])
    init = jnp.array([1.0, 0.05, 0.4, -0.5, 0.05])
    cfg = CalibrationConfig(max_iter=3, tol=1e-12, jacobian_mode="ad")
    tv, info = calibrate_sharded(
        mesh, SPEC, solver, ks, market, 100.0, init, params.r_d,
        params.r_f, cfg=cfg, group_steps=groups, american=True,
        dividends=GOLDEN_DIVIDENDS)
    assert info["iterations"] == 3
    first = info["history"][0]["sse"]
    assert info["final_error"] < 0.2 * first, info
    want_tv, want_info = calib.calibrate_device(
        SPEC, solver, ks, market, 100.0, init, params.r_d, params.r_f,
        cfg=cfg, group_steps=groups, american=True,
        dividends=GOLDEN_DIVIDENDS)
    np.testing.assert_allclose(np.asarray(tv), np.asarray(want_tv),
                               rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(info["final_error"],
                               float(want_info["final_error"]),
                               rtol=1e-6)


@pytest.mark.parametrize("engine", ["scan", "pallas"])
def test_price_batch_sharded_mixed(params, mesh, engine):
    """price_batch_sharded(group_steps=...): fused one-launch per shard
    or per-group sharded XLA launches — both equal single-device
    per-group pricing."""
    import dataclasses

    from heston_tpu.models import douglas

    se = dataclasses.replace(SOLVER, solver_engine=engine)
    ks = jnp.linspace(85.0, 115.0, 11)
    groups = ((0, 5, 3), (5, 11, 6))
    tv = _theta(params)
    got = price_batch_sharded(
        mesh, SPEC, se, ks, 100.0, tv, params.r_d, params.r_f,
        american=True, dividends=GOLDEN_DIVIDENDS, group_steps=groups)
    want = []
    for a, e, g in groups:
        sg = dataclasses.replace(se, n_steps=g, maturity=g * se.delta_t)
        want.append(np.array(douglas.price_batch(
            SPEC, sg, ks[a:e], 100.0, tv[0], tv[1], tv[2], tv[3], tv[4],
            params.r_d, params.r_f, american=True,
            dividends=GOLDEN_DIVIDENDS)))
    np.testing.assert_allclose(np.array(got), np.concatenate(want),
                               rtol=0, atol=1e-12)


def test_group_steps_validation_rejects_bad_tilings(params, mesh):
    """Gapped / out-of-order / short group tuples fail loudly everywhere
    (positional per-lane packing and slice-indexed fallbacks would
    otherwise silently disagree)."""
    from heston_tpu.models import greeks

    ks = jnp.linspace(90.0, 110.0, 8)
    tv = _theta(params)
    for bad in (((0, 4, 5), (6, 8, 10)),      # gap
                ((4, 8, 10), (0, 4, 5)),      # out of order
                ((0, 4, 5), (4, 6, 10))):     # short cover
        with pytest.raises(ValueError, match="group_steps"):
            price_batch_sharded(mesh, SPEC, SOLVER, ks, 100.0, tv,
                                params.r_d, params.r_f, group_steps=bad)
        with pytest.raises(ValueError, match="group_steps"):
            greeks.batch_greeks(
                SPEC, SOLVER, ks, 100.0, params.kappa, params.eta,
                params.sigma, params.rho, params.v0, params.r_d,
                params.r_f, group_steps=bad)


def test_sharded_mixed_normal_eq_fd_mode(params, mesh):
    """jacobian_mode='fd' on the mixed ladder: 6 sequential bumped
    per-lane launches per shard (reference-parity FD), matching the
    single-device FD normal equations built from the same one-launch
    pricer."""
    import dataclasses

    from heston_tpu.models import bs
    from heston_tpu.models.calibration import _bumped_param_matrix
    from heston_tpu.pallas import fused_do

    solver = dataclasses.replace(SOLVER, solver_engine="pallas")
    ks = jnp.concatenate([jnp.linspace(90.0, 110.0, 8)] * 2)
    groups = ((0, 8, 3), (8, 16, 6))
    nst = jnp.concatenate([jnp.full(8, 3), jnp.full(8, 6)])
    market = jnp.concatenate([
        bs.generate_market_data(100.0, 0.5, params.r_d, ks[:8]),
        bs.generate_market_data(100.0, 1.0, params.r_d, ks[8:]),
    ])
    tv = _theta(params)
    lam, eps = 0.01, 1e-6
    delta, base, sse = jacobian_normal_eq_sharded(
        mesh, SPEC, solver, ks, market, 100.0, tv, params.r_d,
        params.r_f, lam=lam, eps=eps, jacobian_mode="fd",
        group_steps=groups)
    pmat = _bumped_param_matrix(tv, eps)
    prices = np.stack([np.asarray(fused_do.fused_price_batch(
        SPEC, solver, ks, 100.0, p_[0], p_[1], p_[2], p_[3], p_[4],
        params.r_d, params.r_f, interpret=True, n_steps_per=nst))
        for p_ in pmat])
    want_base = prices[0]
    J = ((prices[1:] - want_base[None, :]) / eps).T
    resid = np.asarray(market) - want_base
    jtj = J.T @ J * (1.0 + lam * np.eye(5))
    want_delta = np.linalg.solve(jtj, J.T @ resid)
    np.testing.assert_allclose(np.array(base), want_base, rtol=0,
                               atol=1e-12)
    # FD amplification: the per-shard padded batch shape reorders float
    # ops by ~1e-12 in the bumped prices, and the 1e-6 bump divides that
    # into ~1e-6 relative Jacobian noise — inherent to FD, not a defect
    # (the 'ad' mode test above matches at 1e-8)
    np.testing.assert_allclose(np.array(delta), want_delta, rtol=5e-5,
                               atol=1e-10)
    np.testing.assert_allclose(float(sse), float(resid @ resid),
                               rtol=1e-12)


def test_sharded_fd_mode_honored_with_pallas_engine(params, mesh):
    """jacobian_mode='fd' + engine='pallas' must run FD bumps (one cfg =
    one Jacobian method), equal to the single-device FD Jacobian — the
    fused forward-mode launch is the 'ad' implementation, not an
    override (it previously force-dispatched whenever it fit VMEM)."""
    import dataclasses

    from heston_tpu.parallel import sharded_pricing_fns

    solver_p = dataclasses.replace(SOLVER, solver_engine="pallas")
    strikes = jnp.linspace(90.0, 110.0, 8)
    tv = _theta(params)
    jac_fn, _ = sharded_pricing_fns(mesh)
    jac, base = jac_fn(SPEC, solver_p, strikes, 100.0, tv,
                       params.r_d, params.r_f, jacobian_mode="fd")
    want_jac, want_base = calib.jacobian_and_prices(
        SPEC, SOLVER, strikes, 100.0, tv, params.r_d, params.r_f)
    np.testing.assert_allclose(np.array(base), np.array(want_base),
                               rtol=0, atol=1e-10)
    # FD noise floor: engine difference of ~1e-12 in the bumped prices
    # divides by the 1e-6 bump
    np.testing.assert_allclose(np.array(jac), np.array(want_jac),
                               rtol=5e-5, atol=1e-8)
