"""AD Greeks tests: against finite differences and financial sanity."""

import jax.numpy as jnp
import numpy as np
import pytest

from heston_tpu.config import GridSpec, SolverConfig
from heston_tpu.models import douglas, greeks

SPEC = GridSpec(m1=30, m2=15)
SOLVER = SolverConfig(n_steps=10, a2_variant="upwind")


def _price(params, k, s0=100.0, **over):
    vals = dict(kappa=params.kappa, eta=params.eta, sigma=params.sigma,
                rho=params.rho, v0=params.v0)
    vals.update(over)
    return float(douglas.price_option(
        SPEC, SOLVER, k, s0, vals["kappa"], vals["eta"], vals["sigma"],
        vals["rho"], vals["v0"], params.r_d, params.r_f))


def test_greeks_match_central_differences(params):
    g = {k: float(v) for k, v in greeks.price_and_greeks(
        SPEC, SOLVER, 100.0, 100.0, params.kappa, params.eta, params.sigma,
        params.rho, params.v0, params.r_d, params.r_f).items()}
    eps = 1e-5
    fd_delta = (_price(params, 100.0, s0=100.0 + eps)
                - _price(params, 100.0, s0=100.0 - eps)) / (2 * eps)
    assert abs(g["delta"] - fd_delta) < 1e-3 * max(1.0, abs(fd_delta))
    fd_vega = (_price(params, 100.0, v0=params.v0 + eps)
               - _price(params, 100.0, v0=params.v0 - eps)) / (2 * eps)
    assert abs(g["vega_v0"] - fd_vega) < 1e-2 * max(1.0, abs(fd_vega))


def test_greeks_financial_sanity(params):
    g = greeks.price_and_greeks(
        SPEC, SOLVER, 100.0, 100.0, params.kappa, params.eta, params.sigma,
        params.rho, params.v0, params.r_d, params.r_f)
    assert 0.3 < float(g["delta"]) < 0.9      # ATM call delta
    assert float(g["vega_v0"]) > 0.0          # more variance -> dearer call
    assert float(g["d_eta"]) > 0.0            # higher long-run var -> dearer
    assert float(g["price"]) > 0.0


def test_greeks_pallas_engine_matches_scan(params):
    """engine='pallas' greeks: parameter sensitivities through the fused
    kernel's forward-mode variant, delta through the XLA tangent — all
    equal to the pure-XLA AD greeks to roundoff."""
    import dataclasses

    p = params
    spec = GridSpec(m1=16, m2=10)
    want = greeks.price_and_greeks(
        spec, SolverConfig(n_steps=6), 100.0, 100.0, p.kappa, p.eta,
        p.sigma, p.rho, p.v0, p.r_d, p.r_f, american=True)
    got = greeks.price_and_greeks(
        spec, SolverConfig(n_steps=6, solver_engine="pallas"), 100.0,
        100.0, p.kappa, p.eta, p.sigma, p.rho, p.v0, p.r_d, p.r_f,
        american=True)
    for k in want:
        np.testing.assert_allclose(float(got[k]), float(want[k]),
                                   rtol=1e-9, atol=1e-10, err_msg=k)


def test_gamma_matches_cf(params):
    """Surface-stencil gamma converges to the semi-analytic CF gamma."""
    from heston_tpu.models import heston_cf

    def cf(s):
        return float(heston_cf.call_price(
            s, 100.0, params.v0, params.kappa, params.eta, params.sigma,
            params.rho, params.r_d, 1.0))

    e = 0.5
    want = (cf(100 + e) - 2 * cf(100.0) + cf(100 - e)) / e**2
    errs = []
    for (m1, m2, n) in [(50, 25, 40), (100, 50, 80)]:
        g = float(greeks.gamma(
            GridSpec(m1=m1, m2=m2), SolverConfig(n_steps=n), 100.0, 100.0,
            params.kappa, params.eta, params.sigma, params.rho, params.v0,
            params.r_d, params.r_f))
        errs.append(abs(g - want))
    assert errs[1] < errs[0]
    assert errs[1] < 1e-4, (errs, want)


def test_theta_matches_cf(params):
    """PDE theta (-L(U) at the extraction node) matches the CF maturity
    derivative to discretization accuracy."""
    from heston_tpu.models import heston_cf

    h = 1e-4

    def cf(t):
        return float(heston_cf.call_price(
            100.0, 100.0, params.v0, params.kappa, params.eta,
            params.sigma, params.rho, params.r_d, t))

    want = -(cf(1.0 + h) - cf(1.0 - h)) / (2 * h)
    th = float(greeks.pde_theta(
        GridSpec(m1=50, m2=25), SolverConfig(n_steps=40), 100.0, 100.0,
        params.kappa, params.eta, params.sigma, params.rho, params.v0,
        params.r_d, params.r_f))
    assert th < 0.0                      # long option loses value
    assert abs(th - want) < 0.03 * abs(want), (th, want)


def test_rho_rd_matches_fd(params):
    """dPrice/dr_d by AD == central FD of the pricer."""
    from heston_tpu.models import douglas

    out = greeks.price_and_greeks(
        SPEC, SOLVER, 100.0, 100.0, params.kappa, params.eta, params.sigma,
        params.rho, params.v0, params.r_d, params.r_f)
    eps = 1e-6

    def price_rd(rd):
        return float(douglas.price_option(
            SPEC, SOLVER, 100.0, 100.0, params.kappa, params.eta,
            params.sigma, params.rho, params.v0, rd, params.r_f))

    fd = (price_rd(params.r_d + eps) - price_rd(params.r_d - eps)) / (2 * eps)
    assert abs(float(out["rho_rd"]) - fd) < 1e-3 * max(1.0, abs(fd))


def test_batch_greeks_consistent(params):
    """batch_greeks == the single-option fns at every strike, and the
    param Jacobian equals jacfwd of the batched pricer."""
    import jax
    import jax.numpy as jnp

    from heston_tpu.models import douglas

    ks = jnp.array([90.0, 100.0, 110.0])
    args = (100.0, params.kappa, params.eta, params.sigma, params.rho,
            params.v0, params.r_d, params.r_f)
    out = greeks.batch_greeks(SPEC, SOLVER, ks, *args, param_jacobian=True)
    for j, k in enumerate(np.asarray(ks)):
        g1 = float(greeks.gamma(SPEC, SOLVER, float(k), *args))
        t1 = float(greeks.pde_theta(SPEC, SOLVER, float(k), *args))
        p1 = float(douglas.price_option(SPEC, SOLVER, float(k), *args))
        assert abs(float(out["gamma"][j]) - g1) < 1e-10
        assert abs(float(out["theta"][j]) - t1) < 1e-10
        assert abs(float(out["price"][j]) - p1) < 1e-10
    tv = jnp.array(params.bumpable())

    def prices(t):
        return douglas.price_batch(
            SPEC, SOLVER, ks, 100.0, t[0], t[1], t[2], t[3], t[4],
            params.r_d, params.r_f)

    want = np.array(jax.jacfwd(prices)(tv))
    got = np.array(out["param_jacobian"])
    # kappa/eta/sigma/rho columns: same AD formulation as jacfwd
    np.testing.assert_allclose(got[:, :4], want[:, :4], rtol=1e-7,
                               atol=1e-9)
    # v0 column: the surface v-stencil estimator (engine-independent
    # production formulation) vs jacfwd's grid-motion AD — equal up to
    # the O(h^2) discretization difference between the two estimators
    rel = np.abs(got[:, 4] - want[:, 4]) / np.maximum(1.0,
                                                      np.abs(want[:, 4]))
    assert rel.max() < 2e-2, rel
    # financial sanity across the book
    assert np.all(np.asarray(out["gamma"]) > 0)
    assert np.all(np.asarray(out["theta"]) < 0)
    d = np.asarray(out["delta"])
    assert np.all(np.diff(d) < 0)   # call delta falls with strike


@pytest.mark.parametrize("american", [False, True])
def test_batch_greeks_fused_matches_xla(params, american):
    """batch_greeks via the fused-kernel surface path == the XLA path
    (f64 interpret); the European case guards the lam=None regression in
    _run_chunks' no-dividend branch."""
    import dataclasses

    import jax.numpy as jnp

    ks = jnp.array([90.0, 105.0])
    args = (100.0, params.kappa, params.eta, params.sigma, params.rho,
            params.v0, params.r_d, params.r_f)
    pal = dataclasses.replace(SOLVER, solver_engine="pallas")
    a = greeks.batch_greeks(SPEC, pal, ks, *args, american=american)
    b = greeks.batch_greeks(SPEC, SOLVER, ks, *args, american=american)
    for key in greeks.RISK_KEYS:
        # atol 1e-9: the fused path's theta epilogue reuses the
        # PADDED-batch vmapped assembly (trimmed), which reorders float
        # ops vs the XLA branch's unpadded build by ~1e-10; rtol 1e-9:
        # the v-stencils divide that surface noise by h_v^2, so the
        # large-magnitude volga/vanna carry it multiplied back up
        np.testing.assert_allclose(np.asarray(a[key]), np.asarray(b[key]),
                                   rtol=1e-9, atol=1e-9, err_msg=key)


def test_american_put_theta_in_exercise_region(params):
    """Deep-ITM American put: the extraction node sits in the
    early-exercise region where the true calendar theta is ~0; without
    the Ikonen-Toivanen lambda term the PDE theta would read a spurious
    ~r_d*K (~2.5 here)."""
    th = float(greeks.pde_theta(
        GridSpec(m1=50, m2=25), SolverConfig(n_steps=40), 140.0, 100.0,
        params.kappa, params.eta, params.sigma, params.rho, params.v0,
        params.r_d, params.r_f, american=True, option_type="put"))
    assert abs(th) < 0.3, th
    # the European theta at the same node is NOT ~0 (control)
    th_e = float(greeks.pde_theta(
        GridSpec(m1=50, m2=25), SolverConfig(n_steps=40), 140.0, 100.0,
        params.kappa, params.eta, params.sigma, params.rho, params.v0,
        params.r_d, params.r_f, american=False, option_type="put"))
    assert th_e > 1.0, th_e


@pytest.mark.parametrize("engine", ["scan", "pallas"])
def test_batch_greeks_mixed_maturity_groups(params, engine):
    """A mixed-maturity book (group_steps, the reference's
    CalibrationPoint packing applied to risk,
    ref: src/heston_calibration.cpp:2165-2213) with an American+dividend
    overlay equals per-maturity-group batch_greeks calls — for the XLA
    group loop AND the fused one-launch per-lane path (theta tolerance
    1e-9: the padded-batch vmapped assembly reorders float ops with the
    batch shape, same effect the fused-vs-XLA test documents)."""
    import dataclasses

    from heston_tpu.config import GOLDEN_DIVIDENDS

    ks = jnp.array([90.0, 100.0, 110.0, 95.0, 105.0])
    groups = ((0, 3, 3), (3, 5, 6))
    args = (100.0, params.kappa, params.eta, params.sigma, params.rho,
            params.v0, params.r_d, params.r_f)
    tol = dict(price=1e-11, delta=1e-11, gamma=1e-11, theta=1e-9,
               vega_v0=1e-11, vanna=1e-9, volga=1e-7,
               param_jacobian=1e-11)
    # local small grid: this is an ENGINE-EQUALITY contract (grid-
    # independent), and the per-lane fused interpret run is the most
    # expensive in the module at production grids
    spec_eq = GridSpec(m1=16, m2=10)
    se = dataclasses.replace(SOLVER, n_steps=6, solver_engine=engine)
    got = greeks.batch_greeks(spec_eq, se, ks, *args, american=True,
                              dividends=GOLDEN_DIVIDENDS,
                              param_jacobian=True, group_steps=groups)
    parts = []
    for a, e, n in groups:
        sg = dataclasses.replace(se, n_steps=n, maturity=n * se.delta_t)
        parts.append(greeks.batch_greeks(
            spec_eq, sg, ks[a:e], *args, american=True,
            dividends=GOLDEN_DIVIDENDS, param_jacobian=True))
    for key, atol in tol.items():
        want = np.concatenate([np.asarray(p[key]) for p in parts])
        np.testing.assert_allclose(np.asarray(got[key]), want, rtol=0,
                                   atol=atol, err_msg=f"{engine}:{key}")


def test_v_greeks_match_cf(params):
    """Surface-stencil vega_v0 / vanna / volga converge to the CF
    oracle's exact AD derivatives (vega = dP/dv0, vanna = d2P/ds0 dv0,
    volga = d2P/dv0^2) — the CF price is jnp code, so the truth values
    are free of bump noise.

    scheme='hv': with rho = -0.9 the Douglas scheme's first-order-in-dt
    mixed-term error dominates the v-direction SECOND derivatives (DO at
    100x50x80 leaves vanna ~1.4% off the CF truth where HV is at 0.1%;
    measured 2026-08-18) — the second-order corrector is what makes the
    cross greeks converge at practical step counts."""
    import jax

    from heston_tpu.models import heston_cf

    def cf(x):
        return heston_cf.call_price(
            x[0], 100.0, x[1], params.kappa, params.eta, params.sigma,
            params.rho, params.r_d, 1.0)

    x0 = jnp.array([100.0, params.v0])
    g = jax.grad(cf)(x0)
    h = jax.hessian(cf)(x0)
    want = dict(vega_v0=float(g[1]), vanna=float(h[0, 1]),
                volga=float(h[1, 1]))

    errs = {k: [] for k in want}
    for (m1, m2, n) in [(50, 25, 40), (100, 50, 160)]:
        out = greeks.batch_greeks(
            GridSpec(m1=m1, m2=m2), SolverConfig(n_steps=n, scheme="hv"),
            jnp.array([100.0]), 100.0, params.kappa, params.eta,
            params.sigma, params.rho, params.v0, params.r_d, params.r_f)
        for k, w in want.items():
            errs[k].append(abs(float(out[k][0]) - w) / max(1.0, abs(w)))
    for k, w in want.items():
        assert errs[k][1] < errs[k][0], (k, errs[k])       # converging
        assert errs[k][1] < 5e-3, (k, errs[k], w)          # and close


def test_batch_vega_matches_v0_stencil(params):
    """batch_greeks' vega_v0 is the SAME estimator as
    douglas.price_and_v0_stencil (the calibration Jacobian's v0 column)
    — identical to roundoff on the same surface."""
    _, want = douglas.price_and_v0_stencil(
        SPEC, SOLVER, 100.0, 100.0, params.kappa, params.eta,
        params.sigma, params.rho, params.v0, params.r_d, params.r_f)
    out = greeks.batch_greeks(
        SPEC, SOLVER, jnp.array([100.0]), 100.0, params.kappa,
        params.eta, params.sigma, params.rho, params.v0, params.r_d,
        params.r_f)
    assert abs(float(out["vega_v0"][0]) - float(want)) < 1e-10
    # financial sanity for the second-order pair on an ATM call: in
    # VARIANCE terms the ATM price is concave in v0 (vega_v0 ~
    # vega_BS/(2*sqrt(v)) falls as v rises), so volga < 0; and with
    # rho < 0 the ATM call vanna is negative too
    assert float(out["volga"][0]) < 0.0
    assert float(out["vanna"][0]) < 0.0


def test_rates_rho_book(params):
    """batch_greeks(rates=True): the XLA exact-AD rate rhos match
    single-option AD per strike, a central-FD cross-check, and the
    fused engine's bumped-launch FD at its truncation tolerance
    (framework extension — the reference has no rate greeks)."""
    import dataclasses

    from heston_tpu.models import douglas

    p = params
    ks = jnp.array([90.0, 100.0, 110.0])
    args = (100.0, p.kappa, p.eta, p.sigma, p.rho, p.v0, p.r_d, p.r_f)
    out = greeks.batch_greeks(SPEC, SOLVER, ks, *args, rates=True)
    # per-strike agreement with the single-option linearize
    for i, k in enumerate(ks):
        one = greeks.price_and_greeks(SPEC, SOLVER, float(k), *args)
        np.testing.assert_allclose(float(out["rho_rd"][i]),
                                   float(one["rho_rd"]), rtol=1e-9)
        np.testing.assert_allclose(float(out["rho_rf"][i]),
                                   float(one["rho_rf"]), rtol=1e-9)
    # FD cross-check of the r_f column (AD exactness)
    eps = 1e-6

    def price_rf(rf):
        return np.array(douglas.price_batch(
            SPEC, SOLVER, ks, 100.0, p.kappa, p.eta, p.sigma, p.rho,
            p.v0, p.r_d, rf))

    fd = (price_rf(p.r_f + eps) - price_rf(p.r_f - eps)) / (2 * eps)
    np.testing.assert_allclose(np.array(out["rho_rf"]), fd, rtol=0,
                               atol=2e-4)
    # fused engine: central-FD bumped launches, O(eps^2) truncation
    pal = dataclasses.replace(SOLVER, solver_engine="pallas")
    out_f = greeks.batch_greeks(SPEC, pal, ks, *args, rates=True)
    np.testing.assert_allclose(np.array(out_f["rho_rd"]),
                               np.array(out["rho_rd"]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.array(out_f["rho_rf"]),
                               np.array(out["rho_rf"]),
                               rtol=1e-4, atol=1e-4)
    # financial sanity: for a call, d/dr_d > 0 (forward up) at ATM
    assert float(out["rho_rd"][1]) > 0.0


def test_rates_rho_mixed_book(params):
    """rates=True composes with group_steps: each maturity group's rate
    rhos equal a dedicated uniform-book pass at that maturity."""
    p = params
    args = (100.0, p.kappa, p.eta, p.sigma, p.rho, p.v0, p.r_d, p.r_f)
    ks = jnp.array([95.0, 105.0, 95.0, 105.0])
    gs = ((0, 2, 5), (2, 4, 10))
    out = greeks.batch_greeks(SPEC, SOLVER, ks, *args,
                              group_steps=gs, rates=True)
    import dataclasses

    for (a, e, n) in gs:
        sol_g = dataclasses.replace(SOLVER, n_steps=n,
                                    maturity=n * SOLVER.delta_t)
        want = greeks.batch_greeks(SPEC, sol_g, ks[a:e], *args,
                                   rates=True)
        np.testing.assert_allclose(np.array(out["rho_rd"][a:e]),
                                   np.array(want["rho_rd"]), rtol=1e-9)
        np.testing.assert_allclose(np.array(out["rho_rf"][a:e]),
                                   np.array(want["rho_rf"]), rtol=1e-9)
