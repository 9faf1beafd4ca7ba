"""Craig-Sneyd / modified-Craig-Sneyd schemes + tracking variant tests."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from heston_tpu.config import (
    GOLDEN_DIVIDENDS,
    GridSpec,
    SolverConfig,
)
from heston_tpu.models import douglas

from oracle_dense import (
    boundary_vectors,
    build_grid_np,
    cs_scheme_dense,
    dense_a0,
    dense_a1,
    dense_a2,
    hv_scheme_dense,
    mcs_scheme_dense,
)

M1, M2, N = 10, 8, 6


@pytest.fixture(scope="module")
def dense_setup(params):
    p = params
    vs, vv, ds, dv = build_grid_np(M1, M2, 100.0, 100.0, p.v0)
    a1 = dense_a1(vs, vv, ds, p.r_d, p.r_f)
    a2 = dense_a2(vs, vv, dv, p.r_d, p.kappa, p.eta, p.sigma, upwind=False)
    a0 = dense_a0(vs, vv, ds, dv, p.rho, p.sigma)
    dt = 1.0 / N
    b1, b2 = boundary_vectors(vs, M1, M2, p.r_d, p.r_f, N, dt)
    u0 = (np.maximum(vs[None, :] - 100.0, 0.0)
          * np.ones((M2 + 1, 1))).reshape(-1)
    return p, a0, a1, a2, b1, b2, u0, dt


@pytest.mark.parametrize("scheme,dense_fn",
                         [("cs", cs_scheme_dense), ("mcs", mcs_scheme_dense),
                          ("hv", hv_scheme_dense)])
def test_scheme_matches_dense(params, dense_setup, scheme, dense_fn):
    p, a0, a1, a2, b1, b2, u0, dt = dense_setup
    want = dense_fn(M1, M2, N, dt, 0.8, p.r_f, a0, a1, a2,
                    b1 + b2, b1, b2, u0)
    spec = GridSpec(m1=M1, m2=M2)
    solver = SolverConfig(n_steps=N, theta=0.8, maturity=1.0,
                          a2_variant="central", scheme=scheme)
    inst = douglas.prepare_instance(
        spec, solver, 100.0, 100.0, p.kappa, p.eta, p.sigma, p.rho, p.v0,
        p.r_d, p.r_f)
    got = np.array(douglas.run_time_loop(inst, solver, p.r_f))
    np.testing.assert_allclose(got, want.reshape(M2 + 1, M1 + 1),
                               rtol=0, atol=1e-10)


def test_cs_mcs_converge_to_golden(params):
    """All three schemes share the spatial discretization, so they converge
    to the same (golden) price; at modest N the CS/MCS time error must not
    blow up relative to DO."""
    golden = 8.8943383103218502
    spec = GridSpec(m1=100, m2=75)
    diffs = {}
    for scheme in ("do", "cs", "mcs", "hv"):
        solver = SolverConfig(n_steps=50, theta=0.8, maturity=1.0,
                              a2_variant="central", scheme=scheme)
        price = float(douglas.price_option(
            spec, solver, 100.0, 100.0, params.kappa, params.eta,
            params.sigma, params.rho, params.v0, params.r_d, params.r_f))
        diffs[scheme] = abs(price - golden)
    assert diffs["cs"] < 2e-2
    assert diffs["mcs"] < 2e-2
    assert diffs["hv"] < 2e-2


def test_scheme_guard_for_exotics(params):
    spec = GridSpec(m1=8, m2=6)
    solver = SolverConfig(n_steps=2, scheme="nope")
    with pytest.raises(ValueError):
        douglas.price_option(
            spec, solver, 100.0, 100.0, params.kappa, params.eta,
            params.sigma, params.rho, params.v0, params.r_d, params.r_f)


def test_tracking_matches_plain_run(params):
    spec = GridSpec(m1=20, m2=10)
    solver = SolverConfig(n_steps=8, a2_variant="upwind")
    p = params
    inst = douglas.prepare_instance(
        spec, solver, 95.0, 100.0, p.kappa, p.eta, p.sigma, p.rho, p.v0,
        p.r_d, p.r_f)
    surfaces, lambdas = douglas.solve_with_tracking(
        inst, solver, p.r_f, american=True, dividends=GOLDEN_DIVIDENDS)
    assert surfaces.shape == (solver.n_steps + 1, 11, 21)
    np.testing.assert_array_equal(np.array(surfaces[0]), np.array(inst.u0))
    want = douglas.run_time_loop(inst, solver, p.r_f, american=True,
                                 dividends=GOLDEN_DIVIDENDS)
    np.testing.assert_allclose(np.array(surfaces[-1]), np.array(want),
                               rtol=0, atol=1e-12)
    # lambda vanishes at the s_max column every step (ref: the stability
    # clamp at src/device_solver.hpp:935-939)
    assert float(jnp.max(jnp.abs(lambdas[1:, :, -1]))) == 0.0


def test_pallas_engine_respects_scheme(params):
    """engine='pallas' must NOT silently run the Douglas kernel for
    other schemes: CS and MCS each run their OWN fused corrector
    (solver-roundoff match vs the XLA stepper of the same scheme)."""
    import numpy as np
    from heston_tpu.models import douglas

    p = params
    spec = GridSpec(m1=20, m2=10)
    ks = jnp.array([95.0, 105.0])
    args = (100.0, p.kappa, p.eta, p.sigma, p.rho, p.v0, p.r_d, p.r_f)
    for scheme, atol in (("cs", 1e-11), ("mcs", 1e-11), ("hv", 1e-11)):
        want = np.array(douglas.price_batch(
            spec, SolverConfig(n_steps=4, scheme=scheme), ks, *args))
        got = np.array(douglas.price_batch(
            spec, SolverConfig(n_steps=4, scheme=scheme,
                               solver_engine="pallas"), ks, *args))
        np.testing.assert_allclose(got, want, rtol=0, atol=atol)
