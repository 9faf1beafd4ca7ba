"""Operator assembly & multiply tests vs. the dense numpy oracle, plus the
reference's algebraic residual-identity style
(ref: src/hes_mat_fac.cpp:539-556, src/hes_A2_mat.cpp:336-352)."""

import jax.numpy as jnp
import numpy as np
import pytest

from heston_tpu.config import GridSpec, SolverConfig
from heston_tpu.ops import banded, grid as gridmod, operators

from oracle_dense import (
    boundary_vectors,
    build_grid_np,
    dense_a0,
    dense_a1,
    dense_a2,
)

M1, M2 = 12, 10


@pytest.fixture(scope="module")
def setup(params):
    spec = GridSpec(m1=M1, m2=M2)
    solver = SolverConfig(n_steps=8, theta=0.8, maturity=1.0)
    g = gridmod.make_grid(spec, 100.0, 100.0, params.v0)
    vs, vv, ds, dv = build_grid_np(M1, M2, 100.0, 100.0, params.v0)
    return spec, solver, g, (vs, vv, ds, dv)


def _ops(g, params, solver, variant):
    return operators.build_operators(
        g, params.kappa, params.eta, params.sigma, params.rho,
        params.r_d, params.r_f, solver.theta, solver.delta_t,
        solver.n_steps, variant,
    )


def _rand_u(rng):
    return rng.standard_normal((M2 + 1, M1 + 1))


def test_a1_multiply_matches_dense(setup, params, rng):
    spec, solver, g, (vs, vv, ds, dv) = setup
    ops = _ops(g, params, solver, "central")
    u = _rand_u(rng)
    dense = dense_a1(vs, vv, ds, params.r_d, params.r_f)
    want = (dense @ u.reshape(-1)).reshape(M2 + 1, M1 + 1)
    got = np.array(operators.a1_multiply(ops, jnp.array(u)))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-9)


@pytest.mark.parametrize("variant,upwind", [("central", False), ("upwind", True)])
def test_a2_multiply_matches_dense(setup, params, rng, variant, upwind):
    spec, solver, g, (vs, vv, ds, dv) = setup
    ops = _ops(g, params, solver, variant)
    u = _rand_u(rng)
    dense = dense_a2(vs, vv, dv, params.r_d, params.kappa, params.eta,
                     params.sigma, upwind=upwind)
    want = (dense @ u.reshape(-1)).reshape(M2 + 1, M1 + 1)
    got = np.array(operators.a2_multiply(ops, jnp.array(u)))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-9)


def test_a2_upwind_active_on_wide_grid(params):
    """On the production grid (m2 = 25) nodes with v > 1 exist inside the
    active row range, so the upwind branch must fire."""
    spec = GridSpec(m1=50, m2=25)
    solver = SolverConfig(n_steps=8, theta=0.8, maturity=1.0)
    g = gridmod.make_grid(spec, 100.0, 100.0, params.v0)
    ops_c = _ops(g, params, solver, "central")
    ops_u = _ops(g, params, solver, "upwind")
    assert float(jnp.max(jnp.abs(ops_u.a2_l2))) > 0.0
    assert float(jnp.max(jnp.abs(ops_c.a2_l2))) == 0.0
    assert not np.allclose(np.array(ops_u.a2_d), np.array(ops_c.a2_d))


def test_a0_multiply_matches_dense(setup, params, rng):
    spec, solver, g, (vs, vv, ds, dv) = setup
    ops = _ops(g, params, solver, "central")
    u = _rand_u(rng)
    dense = dense_a0(vs, vv, ds, dv, params.rho, params.sigma)
    want = (dense @ u.reshape(-1)).reshape(M2 + 1, M1 + 1)
    got = np.array(operators.a0_multiply(ops, jnp.array(u)))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-9)


def test_boundary_vectors_match_reference_layout(setup, params):
    spec, solver, g, (vs, vv, ds, dv) = setup
    ops = _ops(g, params, solver, "central")
    b1, b2 = boundary_vectors(vs, M1, M2, params.r_d, params.r_f,
                              solver.n_steps, solver.delta_t)
    np.testing.assert_allclose(
        np.array(ops.b1).reshape(-1), b1, rtol=0, atol=1e-13)
    np.testing.assert_allclose(
        np.array(ops.b2).reshape(-1), b2, rtol=0, atol=1e-13)
    np.testing.assert_allclose(
        np.array(ops.b), np.array(ops.b1 + ops.b2), rtol=0, atol=0)


@pytest.mark.parametrize("variant", ["central", "upwind"])
def test_implicit_solve_residual_identity(setup, params, rng, variant):
    """After x = (I - theta dt A)^{-1} b, verify x - theta dt A x == b —
    the reference's own verification style (ref: src/hes_mat_fac.cpp:539)."""
    spec, solver, g, _ = setup
    ops = _ops(g, params, solver, variant)
    td = solver.theta * solver.delta_t
    b = _rand_u(rng)

    fac1 = banded.tridiag_factor(ops.a1_iml, ops.a1_imd, ops.a1_imu)
    x1 = banded.tridiag_solve(fac1, jnp.array(b))
    resid1 = x1 - td * operators.a1_multiply(ops, x1) - b
    assert float(jnp.max(jnp.abs(resid1))) < 1e-12

    fac2 = banded.penta_factor(
        ops.a2_il2, ops.a2_il1, ops.a2_id, ops.a2_iu1, ops.a2_iu2)
    x2 = banded.penta_solve(fac2, jnp.array(b))
    resid2 = x2 - td * operators.a2_multiply(ops, x2) - b
    assert float(jnp.max(jnp.abs(resid2))) < 1e-12


def test_stencil_weight_identities(setup, params):
    """FD weights must annihilate constants and differentiate linears."""
    from heston_tpu.ops import coeff

    spec, solver, g, _ = setup
    h0, h1 = g.dels[:-1], g.dels[1:]
    for trip in (coeff.w_delta(h0, h1), coeff.w_beta(h0, h1),
                 coeff.w_alpha(h0, h1), coeff.w_gamma(h0, h1)):
        s = trip[0] + trip[1] + trip[2]
        np.testing.assert_allclose(np.array(s), 0.0, atol=1e-12)
    # beta: exact first derivative of identity map:
    # nodes x_{i}, x_{i+1}, x_{i+2} spaced h0, h1 -> derivative at middle = 1
    bm, b0, bp = coeff.w_beta(h0, h1)
    d = bm * 0.0 + b0 * h0 + bp * (h0 + h1)
    np.testing.assert_allclose(np.array(d - b0 * 0.0), np.array(
        bm * (-h0) * 0 + b0 * h0 + bp * (h0 + h1)), atol=1e-12)
    lin = bm * (-h0) + b0 * 0.0 + bp * h1
    np.testing.assert_allclose(np.array(lin), 1.0, atol=1e-10)
    # delta: exact second derivative of x^2 (== 2)
    dm, d0, dp = coeff.w_delta(h0, h1)
    quad = dm * h0 * h0 + d0 * 0.0 + dp * h1 * h1
    np.testing.assert_allclose(np.array(quad), 2.0, atol=1e-9)
