"""Calibration checkpoint / resume tests."""

import numpy as np
import jax.numpy as jnp

from heston_tpu.config import (
    CalibrationConfig,
    GridSpec,
    HestonParams,
    SolverConfig,
)
from heston_tpu.models import bs, calibration as calib
from heston_tpu.utils.checkpoint import LMState

SPEC = GridSpec(m1=20, m2=10)
SOLVER = SolverConfig(n_steps=6)


def _targets(params, n=8):
    strikes = np.linspace(85.0, 115.0, n)
    market = np.asarray(bs.generate_market_data(
        100.0, 1.0, params.r_d, jnp.asarray(strikes)))
    return calib.CalibrationTargets(
        strikes=strikes, maturities=np.ones(n), prices=market, s0=100.0,
        r_d=params.r_d, r_f=params.r_f)


def test_state_round_trip(tmp_path):
    st = LMState.fresh(HestonParams(), 0.01)
    st.history.append({"iter": 1, "sse": 2.0})
    st.iteration = 1
    p = st.save(tmp_path / "ck.json")
    st2 = LMState.load(p)
    np.testing.assert_array_equal(st2.theta_vec, st.theta_vec)
    assert st2.iteration == 1 and st2.history == st.history


def test_resume_reproduces_uninterrupted_run(tmp_path, params):
    targets = _targets(params)
    init = HestonParams(kappa=1.0, eta=0.05, sigma=0.4, rho=-0.5, v0=0.05)
    ck = tmp_path / "lm.json"

    # uninterrupted 4-iteration run
    cfg4 = CalibrationConfig(max_iter=4, tol=1e-8)
    full = calib.calibrate(targets, SPEC, SOLVER, init, cfg4)

    # interrupted: run 2 iterations with checkpointing ...
    cfg2 = CalibrationConfig(max_iter=2, tol=1e-8)
    calib.calibrate(targets, SPEC, SOLVER, init, cfg2,
                    checkpoint_path=str(ck))
    assert ck.exists()
    # ... then resume to 4 (fresh init is ignored; state comes from disk)
    resumed = calib.calibrate(targets, SPEC, SOLVER, init, cfg4,
                              checkpoint_path=str(ck))

    np.testing.assert_allclose(
        np.array(resumed.params.bumpable()),
        np.array(full.params.bumpable()), rtol=1e-12)
    assert abs(resumed.final_error - full.final_error) < 1e-12
    assert resumed.iterations == full.iterations


def test_calibrate_sharded_checkpoint_resume(tmp_path, params):
    """calibrate_sharded persists LM state per iteration; a rerun from
    the checkpoint continues (not restarts) and lands on the same final
    state as an uninterrupted run."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from heston_tpu.config import CalibrationConfig, GridSpec, SolverConfig
    from heston_tpu.models import bs
    from heston_tpu.parallel import calibrate_sharded, make_mesh

    spec = GridSpec(m1=16, m2=8)
    solver = SolverConfig(n_steps=6, theta=0.8, maturity=1.0,
                          a2_variant="upwind", solver_engine="pallas")
    mesh = make_mesh()
    ks = jnp.linspace(92.0, 108.0, 8)
    market = bs.generate_market_data(100.0, 1.0, 0.025, ks)
    init = jnp.array([1.0, 0.05, 0.4, -0.5, 0.05])
    path = str(tmp_path / "lm.json")
    cfg2 = CalibrationConfig(max_iter=2, tol=1e-12, jacobian_mode="ad")
    cfg4 = CalibrationConfig(max_iter=4, tol=1e-12, jacobian_mode="ad")
    calibrate_sharded(mesh, spec, solver, ks, market, 100.0, init,
                      0.025, 0.0, cfg=cfg2, checkpoint_path=path)
    tv_res, info_res = calibrate_sharded(
        mesh, spec, solver, ks, market, 100.0, init, 0.025, 0.0,
        cfg=cfg4, checkpoint_path=path)
    tv_full, info_full = calibrate_sharded(
        mesh, spec, solver, ks, market, 100.0, init, 0.025, 0.0,
        cfg=cfg4)
    assert info_res["iterations"] == info_full["iterations"] == 4
    assert len(info_res["history"]) == len(info_full["history"])
    np.testing.assert_allclose(np.asarray(tv_res), np.asarray(tv_full),
                               rtol=1e-10, atol=1e-12)


def test_checkpoint_rejects_foreign_problem(tmp_path, params):
    """A checkpoint written for one chain must not silently hijack a
    calibration of a DIFFERENT chain at the same path."""
    import jax.numpy as jnp
    import pytest

    from heston_tpu.config import CalibrationConfig, GridSpec, SolverConfig
    from heston_tpu.models import bs
    from heston_tpu.parallel import calibrate_sharded, make_mesh

    spec = GridSpec(m1=12, m2=8)
    solver = SolverConfig(n_steps=4, theta=0.8, maturity=1.0,
                          a2_variant="upwind")
    mesh = make_mesh()
    ks = jnp.linspace(92.0, 108.0, 8)
    market = bs.generate_market_data(100.0, 1.0, 0.025, ks)
    init = jnp.array([1.0, 0.05, 0.4, -0.5, 0.05])
    path = str(tmp_path / "lm.json")
    cfg = CalibrationConfig(max_iter=1, tol=1e-12, jacobian_mode="ad")
    calibrate_sharded(mesh, spec, solver, ks, market, 100.0, init,
                      0.025, 0.0, cfg=cfg, checkpoint_path=path)
    with pytest.raises(ValueError, match="different"):
        calibrate_sharded(mesh, spec, solver, ks + 5.0, market, 100.0,
                          init, 0.025, 0.0, cfg=cfg, checkpoint_path=path)
