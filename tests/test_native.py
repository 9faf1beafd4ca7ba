"""Native C++ oracle tests: solver equivalence and full-loop cross-check
against the JAX path (the reference's own GPU-vs-CPU verification style,
ref: src/hes_A2_mat.cpp:785, src/BlackScholesMatrixTest.cpp)."""

import numpy as np
import jax.numpy as jnp
import pytest

from heston_tpu.config import GridSpec, SolverConfig
from heston_tpu.models import douglas
from heston_tpu.ops import grid as gridmod, operators
from heston_tpu.utils import native


@pytest.fixture(scope="module")
def lib():
    try:
        return native.load()
    except Exception as exc:  # pragma: no cover
        pytest.skip(f"native toolchain unavailable: {exc}")


def test_native_tridiag(lib, rng):
    n = 31
    md = 3.0 + rng.standard_normal(n)
    ml = 0.4 * rng.standard_normal(n)
    mu = 0.4 * rng.standard_normal(n)
    ml[0] = mu[-1] = 0.0
    rhs = rng.standard_normal(n)
    x = native.tridiag_solve(ml, md, mu, rhs)
    dense = np.diag(md) + np.diag(ml[1:], -1) + np.diag(mu[:-1], 1)
    np.testing.assert_allclose(x, np.linalg.solve(dense, rhs), atol=1e-11)


def test_native_penta(lib, rng):
    n = 21
    d = 4.0 + rng.standard_normal(n)
    l1 = 0.4 * rng.standard_normal(n)
    l2 = 0.2 * rng.standard_normal(n)
    u1 = 0.4 * rng.standard_normal(n)
    u2 = 0.2 * rng.standard_normal(n)
    l1[0] = 0.0
    l2[:2] = 0.0
    u1[-1] = 0.0
    u2[-2:] = 0.0
    rhs = rng.standard_normal(n)
    x = native.penta_solve(l2, l1, d, u1, u2, rhs)
    dense = (np.diag(d) + np.diag(l1[1:], -1) + np.diag(l2[2:], -2)
             + np.diag(u1[:-1], 1) + np.diag(u2[:-2], 2))
    np.testing.assert_allclose(x, np.linalg.solve(dense, rhs), atol=1e-11)


@pytest.mark.parametrize("american", [False, True])
def test_native_do_loop_matches_jax(lib, params, american):
    p = params
    spec = GridSpec(m1=20, m2=12)
    solver = SolverConfig(n_steps=8, a2_variant="upwind")
    g = gridmod.make_grid(spec, 100.0, 95.0, p.v0)
    ops = operators.build_operators(
        g, p.kappa, p.eta, p.sigma, p.rho, p.r_d, p.r_f,
        solver.theta, solver.delta_t, solver.n_steps, "upwind")
    u0 = np.maximum(np.asarray(g.vec_s)[None, :] - 95.0, 0.0) * np.ones(
        (spec.m2 + 1, 1))
    got = native.do_solve(ops, u0, solver.n_steps, solver.delta_t,
                          solver.theta, p.r_f, american=american)
    inst = douglas.prepare_instance(
        spec, solver, 95.0, 100.0, p.kappa, p.eta, p.sigma, p.rho, p.v0,
        p.r_d, p.r_f)
    want = np.asarray(douglas.run_time_loop(inst, solver, p.r_f,
                                            american=american))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-10)


def test_native_batch_matches_xla_all_variants(params):
    """ht_do_solve_batch (the OpenMP CPU benchmark engine) == the XLA
    path for euro/american/dividends/both, calls and puts."""
    import jax.numpy as jnp

    from heston_tpu.config import GOLDEN_DIVIDENDS, GridSpec, SolverConfig
    from heston_tpu.models import douglas

    spec = GridSpec(m1=30, m2=15)
    sol = SolverConfig(n_steps=8)
    ks = jnp.array([85.0, 100.0, 115.0])
    args = (100.0, params.kappa, params.eta, params.sigma, params.rho,
            params.v0, params.r_d, params.r_f)
    for ot in ("call", "put", "digital_call", "digital_put"):
        for kw in (dict(), dict(american=True),
                   dict(dividends=GOLDEN_DIVIDENDS),
                   dict(american=True, dividends=GOLDEN_DIVIDENDS)):
            want = np.array(douglas.price_batch(
                spec, sol, ks, *args, option_type=ot, **kw))
            got = native.price_batch_cpu(spec, sol, ks, *args,
                                         option_type=ot, **kw)
            np.testing.assert_allclose(got, want, rtol=0, atol=1e-10,
                                       err_msg=f"{ot} {kw}")


def test_native_apply_dividend_matches(params):
    """ht_apply_dividend == douglas.apply_dividend (call zero-fill and
    put column-0 copy conventions)."""
    import jax.numpy as jnp

    from heston_tpu.models import douglas

    rng = np.random.default_rng(3)
    vec_s = np.sort(rng.uniform(0.0, 300.0, 21))
    vec_s[0] = 0.0
    u = rng.normal(size=(9, 21))
    for put in (False, True):
        want = np.array(douglas.apply_dividend(
            jnp.asarray(u), jnp.asarray(vec_s), 5.0, 0.02,
            "put" if put else "call"))
        got = native.apply_dividend(u, vec_s, 5.0, 0.02, put=put)
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)


def test_native_mixed_maturity_oracle(params):
    """The native C++ engine with per-option step counts is an
    INDEPENDENT oracle for the device mixed-maturity path: same
    American+dividend ladder, 1e-12 agreement with the fused per-lane
    launch (which is itself bitwise-equal to per-group launches)."""
    import dataclasses

    from heston_tpu.config import GOLDEN_DIVIDENDS
    from heston_tpu.pallas import fused_do

    p = params
    spec = GridSpec(m1=30, m2=15)
    sol = SolverConfig(n_steps=10, a2_variant="upwind", theta=0.8,
                       maturity=1.0)
    ks = jnp.array([90.0, 100.0, 110.0, 95.0, 105.0])
    groups = ((0, 3, 5), (3, 5, 10))
    cpu = native.price_batch_cpu(
        spec, sol, ks, 100.0, p.kappa, p.eta, p.sigma, p.rho, p.v0,
        p.r_d, p.r_f, american=True, dividends=GOLDEN_DIVIDENDS,
        group_steps=groups)
    dev = np.array(fused_do.fused_price_batch(
        spec, sol, ks, 100.0, p.kappa, p.eta, p.sigma, p.rho, p.v0,
        p.r_d, p.r_f, american=True, dividends=GOLDEN_DIVIDENDS,
        interpret=True, n_steps_per=jnp.array([5, 5, 5, 10, 10])))
    np.testing.assert_allclose(cpu, dev, rtol=0, atol=1e-12)
    with pytest.raises(ValueError, match="group_steps"):
        native.price_batch_cpu(
            spec, sol, ks, 100.0, p.kappa, p.eta, p.sigma, p.rho, p.v0,
            p.r_d, p.r_f, group_steps=((0, 3, 5), (4, 5, 10)))


def test_native_schemes_and_damping_match_xla(params):
    """The native engine's CS/MCS/HV correctors and the Rannacher damped
    start-up window reproduce the XLA steppers at f64 solver roundoff —
    a fully independent C++ oracle for every scheme configuration
    (csrc/heston_cpu.cpp::do_run_steps)."""
    import dataclasses

    import jax.numpy as jnp

    from heston_tpu.config import GOLDEN_DIVIDENDS, GridSpec, SolverConfig
    from heston_tpu.models import douglas

    p = params
    spec = GridSpec(m1=24, m2=12)
    ks = jnp.array([90.0, 105.0])
    args = (100.0, p.kappa, p.eta, p.sigma, p.rho, p.v0, p.r_d, p.r_f)
    for scheme in ("cs", "mcs", "hv"):
        for rann in (0, 2):
            sol = SolverConfig(n_steps=6, scheme=scheme,
                               rannacher_steps=rann)
            for kw in (dict(),
                       dict(american=True, dividends=GOLDEN_DIVIDENDS)):
                want = np.array(douglas.price_batch(
                    spec, sol, ks, *args, **kw))
                got = native.price_batch_cpu(spec, sol, ks, *args, **kw)
                np.testing.assert_allclose(
                    got, want, rtol=0, atol=1e-11,
                    err_msg=f"{scheme} rann={rann} {kw}")
    with pytest.raises(ValueError, match="scheme"):
        native.price_batch_cpu(
            spec, dataclasses.replace(SolverConfig(n_steps=4),
                                      scheme="nope"),
            ks, *args)


def test_native_mixed_maturity_damped(params):
    """Per-option Rannacher clamp in the native batch engine: a mixed
    ladder with R > the short group's n damps min(n_o, R) steps per
    option — equal to dedicated per-group native runs."""
    from heston_tpu.config import GOLDEN_DIVIDENDS, GridSpec, SolverConfig

    p = params
    spec = GridSpec(m1=20, m2=10)
    dt = 0.1
    groups = ((0, 2, 4), (2, 4, 10))
    sol = SolverConfig(n_steps=10, maturity=10 * dt, rannacher_steps=6)
    ks = np.linspace(85.0, 115.0, 4)
    args = (100.0, p.kappa, p.eta, p.sigma, p.rho, p.v0, p.r_d, p.r_f)
    kw = dict(american=True, dividends=GOLDEN_DIVIDENDS)
    got = native.price_batch_cpu(spec, sol, ks, *args,
                                 group_steps=groups, **kw)
    import dataclasses
    want = []
    for a, e, n in groups:
        sol_g = dataclasses.replace(sol, n_steps=n, maturity=n * dt)
        want.append(native.price_batch_cpu(spec, sol_g, ks[a:e], *args,
                                           **kw))
    np.testing.assert_allclose(got, np.concatenate(want), rtol=0,
                               atol=1e-13)
