"""Non-zero foreign rate tests: the e^{r_f dt n} boundary time-scaling
(ref: src/solver.hpp:65-85) is exercised nowhere else (every reference test
uses r_f = 0)."""

import jax
import jax.numpy as jnp
import numpy as np

from heston_tpu.config import (
    GOLDEN_DIVIDENDS,
    GridSpec,
    HestonParams,
    SolverConfig,
)
from heston_tpu.models import douglas
from heston_tpu.pallas import fused_do

from oracle_dense import (
    boundary_vectors,
    build_grid_np,
    dense_a0,
    dense_a1,
    dense_a2,
    do_scheme_dense,
)

M1, M2, N = 10, 8, 6
P = HestonParams(r_f=0.015)


def test_rf_nonzero_matches_dense_oracle():
    spec = GridSpec(m1=M1, m2=M2)
    solver = SolverConfig(n_steps=N, a2_variant="upwind")
    vs, vv, ds, dv = build_grid_np(M1, M2, 100.0, 100.0, P.v0)
    a1 = dense_a1(vs, vv, ds, P.r_d, P.r_f)
    a2 = dense_a2(vs, vv, dv, P.r_d, P.kappa, P.eta, P.sigma, upwind=True)
    a0 = dense_a0(vs, vv, ds, dv, P.rho, P.sigma)
    b1, b2 = boundary_vectors(vs, M1, M2, P.r_d, P.r_f, N, solver.delta_t)
    u0 = (np.maximum(vs[None, :] - 100.0, 0.0)
          * np.ones((M2 + 1, 1))).reshape(-1)
    for american in (False, True):
        want = do_scheme_dense(M1, M2, N, solver.delta_t, 0.8, P.r_f,
                               a0, a1, a2, b1 + b2, b1, b2, u0,
                               american=american)
        inst = douglas.prepare_instance(
            spec, solver, 100.0, 100.0, P.kappa, P.eta, P.sigma, P.rho,
            P.v0, P.r_d, P.r_f)
        got = np.array(douglas.run_time_loop(inst, solver, P.r_f,
                                             american=american))
        np.testing.assert_allclose(got, want.reshape(M2 + 1, M1 + 1),
                                   rtol=0, atol=1e-10)


def test_rf_nonzero_fused_kernel_matches_xla():
    spec = GridSpec(m1=M1, m2=M2)
    solver = SolverConfig(n_steps=N, a2_variant="upwind")
    ks = jnp.linspace(80.0, 120.0, 6)
    args = (100.0, P.kappa, P.eta, P.sigma, P.rho, P.v0, P.r_d, P.r_f)
    for kw in (dict(), dict(american=True, dividends=GOLDEN_DIVIDENDS)):
        want = np.array(douglas.price_batch(spec, solver, ks, *args, **kw))
        got = np.array(jax.jit(
            lambda k: fused_do.fused_price_batch(
                spec, solver, k, *args, interpret=True, **kw))(ks))
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-10)
