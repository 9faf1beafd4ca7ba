"""Put-option support (framework extension — the reference prices calls
only, src/bs.hpp:44 / src/solver.cpp; American puts are THE canonical
early-exercise problem, which a calls-only Heston solver cannot express
without dividends).

Put discretization design (see operators.build_a1_bands /
build_a2_bands / build_boundary_vectors): put payoff; NO boundary
injection vectors (b1 = b2 = 0). The s = 0 far field U(0, tau) =
K e^{-r_d tau} emerges from the full -r_d reaction (A1 row 0 gives
-r_d/2, the put A2 diagonal gives -r_d/2 on every row); U -> 0 at
s_max; the top variance rows evolve as Black-Scholes at
sigma^2 = v_max — the correct finite-v_max far field.

Validation strategy (no golden values exist upstream):
  * European put vs the semi-analytic CF put (parity-exact oracle),
    converging under refinement,
  * discrete put-call parity at matched grids,
  * American put >= European put, >= intrinsic,
  * r_d = 0, no dividends: American put == European put (early exercise
    never optimal),
  * fused Pallas kernel == XLA path in f64 for all variants.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heston_tpu.config import (
    GOLDEN_DIVIDENDS,
    GridSpec,
    HestonParams,
    SolverConfig,
)
from heston_tpu.models import douglas, heston_cf
from heston_tpu.pallas import fused_do

P = HestonParams()
SPEC = GridSpec(m1=50, m2=25)
SOLVER = SolverConfig(n_steps=20, theta=0.8, maturity=1.0,
                      a2_variant="upwind")


def _price(spec, solver, k, **kw):
    return float(douglas.price_option(
        spec, solver, k, 100.0, P.kappa, P.eta, P.sigma, P.rho, P.v0,
        P.r_d, P.r_f, **kw))


def test_european_put_converges_to_cf():
    """PDE put converges to the semi-analytic CF put under refinement."""
    want = float(heston_cf.put_price(
        100.0, 100.0, P.v0, P.kappa, P.eta, P.sigma, P.rho, P.r_d, 1.0))
    errs = []
    for (m1, m2, n) in [(50, 25, 20), (100, 50, 80)]:
        got = _price(GridSpec(m1=m1, m2=m2),
                     dataclasses.replace(SOLVER, n_steps=n),
                     100.0, option_type="put")
        errs.append(abs(got - want))
    assert errs[1] < errs[0]
    assert errs[1] < 0.02, (errs, want)


def test_put_call_parity_european():
    """C - P = S0 - K e^{-r_d T} (r_f = 0) to discretization accuracy,
    shrinking under refinement."""
    diffs = []
    for (m1, m2, n) in [(50, 25, 20), (100, 50, 80)]:
        spec = GridSpec(m1=m1, m2=m2)
        sol = dataclasses.replace(SOLVER, n_steps=n)
        c = _price(spec, sol, 100.0)
        p = _price(spec, sol, 100.0, option_type="put")
        parity = 100.0 - 100.0 * np.exp(-P.r_d * 1.0)
        diffs.append(abs((c - p) - parity))
    assert diffs[1] < diffs[0]
    assert diffs[1] < 0.02, diffs


def test_american_put_dominates():
    """American >= European, and >= intrinsic at every tested strike."""
    for k in (80.0, 100.0, 120.0):
        euro = _price(SPEC, SOLVER, k, option_type="put")
        amer = _price(SPEC, SOLVER, k, option_type="put", american=True)
        assert amer >= euro - 1e-10, (k, amer, euro)
        assert amer >= max(k - 100.0, 0.0) - 1e-8, (k, amer)
    # early-exercise premium is strictly positive for deep ITM puts
    euro = _price(SPEC, SOLVER, 130.0, option_type="put")
    amer = _price(SPEC, SOLVER, 130.0, option_type="put", american=True)
    assert amer > euro + 1e-3, (amer, euro)


def test_american_put_equals_european_at_zero_rate():
    """With r_d = 0 and no dividends, early exercise of a put is never
    optimal -> American == European up to the Ikonen-Toivanen splitting
    error (the lambda-multiplier LCP is an O(dt) operator splitting; at
    the payoff kink it leaves ~3e-5 of residual even when the constraint
    is globally inactive — measured 3.7e-5 at 50x25x20 and 3.1e-5 at
    100x50x80)."""
    p0 = dataclasses.replace(P, r_d=0.0)

    def price(american):
        return float(douglas.price_option(
            SPEC, SOLVER, 100.0, 100.0, p0.kappa, p0.eta, p0.sigma,
            p0.rho, p0.v0, p0.r_d, p0.r_f, option_type="put",
            american=american))

    assert abs(price(True) - price(False)) < 1e-4


def test_put_with_dividends_worth_more():
    """Cash dividends lower the forward -> puts gain value."""
    base = _price(SPEC, SOLVER, 100.0, option_type="put")
    with_div = _price(SPEC, SOLVER, 100.0, option_type="put",
                      dividends=GOLDEN_DIVIDENDS)
    assert with_div > base + 1e-3


@pytest.mark.parametrize("kw", [
    dict(),
    dict(american=True),
    dict(dividends=GOLDEN_DIVIDENDS),
    dict(american=True, dividends=GOLDEN_DIVIDENDS),
])
def test_fused_kernel_puts_match_xla(kw):
    """f64 fused kernel == XLA path for every put variant (interpret)."""
    ks = jnp.array([85.0, 100.0, 115.0], dtype=jnp.float64)
    args = tuple(jnp.float64(a) for a in (
        100.0, P.kappa, P.eta, P.sigma, P.rho, P.v0, P.r_d, P.r_f))
    want = np.array(douglas.price_batch(
        SPEC, SOLVER, ks, *args, option_type="put", **kw))
    got = np.array(jax.jit(
        lambda k: fused_do.fused_price_batch(
            SPEC, SOLVER, k, *args, interpret=True, option_type="put",
            **kw))(ks))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-11)


def test_fused_put_jacobian_matches_xla_ad():
    """Forward-mode AD through the kernel handles puts: equals jacfwd of
    the XLA path in f64."""
    ks = jnp.array([90.0, 105.0], dtype=jnp.float64)
    tv = jnp.array(P.bumpable(), dtype=jnp.float64)

    def xla_prices(t):
        return douglas.price_batch(
            SPEC, SOLVER, ks, 100.0, t[0], t[1], t[2], t[3], t[4],
            P.r_d, P.r_f, american=True, option_type="put")

    want_jac = np.array(jax.jacfwd(xla_prices)(tv))
    base, jac = jax.jit(lambda t: fused_do.fused_theta_jacobian(
        SPEC, SOLVER, ks, 100.0, t, P.r_d, P.r_f, american=True,
        option_type="put", interpret=True, v0_mode="ad"))(tv)
    np.testing.assert_allclose(np.array(jac), want_jac, rtol=0, atol=1e-9)
    np.testing.assert_allclose(np.array(base), np.array(xla_prices(tv)),
                               rtol=0, atol=1e-11)


def test_put_greeks_sanity():
    """AD greeks through the put path: negative delta, positive vega."""
    from heston_tpu.models import greeks

    g = greeks.price_and_greeks(
        SPEC, SOLVER, 100.0, 100.0, P.kappa, P.eta, P.sigma, P.rho,
        P.v0, P.r_d, P.r_f, option_type="put")
    assert -0.9 < float(g["delta"]) < -0.1    # ATM put delta
    assert float(g["vega_v0"]) > 0.0          # more variance -> dearer put
    assert float(g["price"]) > 0.0


def test_cli_price_puts(capsys):
    """CLI --option-type put: decreasing in moneyness, parity ordering."""
    import json

    from heston_tpu import cli

    rc = cli.main(["price", "--strikes", "90", "100", "110",
                   "--m1", "20", "--m2", "10", "--n-steps", "4",
                   "--option-type", "put"])
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    prices = [l["price"] for l in lines]
    assert prices[0] < prices[1] < prices[2]  # puts gain with strike
    assert all(p > 0 for p in prices)


def test_put_chain_calibration_reduces_error():
    """LM fit of a flat-vol-0.2 BS PUT chain (framework extension of the
    reference's European acceptance scenario,
    ref: src/heston_calibration.cpp:77-83): SSE must collapse 100x."""
    from heston_tpu.config import CalibrationConfig
    from heston_tpu.models import bs
    from heston_tpu.models import calibration as calib

    spec = GridSpec(m1=30, m2=15)
    solver = SolverConfig(n_steps=10, theta=0.8, maturity=1.0,
                          a2_variant="upwind")
    n = 12
    strikes = np.array([70.0 + i * 60.0 / n for i in range(n)])
    market = np.asarray(bs.generate_market_data(
        100.0, 1.0, P.r_d, jnp.asarray(strikes), option_type="put"))
    targets = calib.CalibrationTargets(
        strikes=strikes, maturities=np.full(n, 1.0), prices=market,
        s0=100.0, r_d=P.r_d, r_f=P.r_f, option_type="put")
    init = HestonParams(kappa=1.5, eta=0.04, sigma=0.3, rho=-0.9, v0=0.04)
    res = calib.calibrate(targets, spec, solver, init,
                          CalibrationConfig(max_iter=8, tol=1e-4))

    init_prices = np.asarray(calib.base_prices(
        spec, solver, jnp.asarray(strikes), 100.0,
        jnp.array(init.bumpable()), P.r_d, P.r_f, option_type="put"))
    init_sse = float(np.sum((market - init_prices) ** 2))
    assert res.final_error < init_sse * 1e-2
    # the fitted chain must actually be a put chain (increasing in strike)
    assert res.fitted_prices[0] < res.fitted_prices[-1]


def test_put_market_data_and_iv_roundtrip():
    """BS put chain inverts back to the flat generating vol through the
    parity conversion used by export_calibration_fit."""
    from heston_tpu.models import bs

    strikes = jnp.array([85.0, 100.0, 115.0])
    puts = bs.generate_market_data(100.0, 1.0, P.r_d, strikes,
                                   option_type="put")
    calls = bs.put_to_call_parity(puts, 100.0, strikes, P.r_d, 1.0)
    ivs = np.asarray(bs.implied_vol_chain(calls, 100.0, strikes,
                                          P.r_d, 1.0))
    np.testing.assert_allclose(ivs, bs.MARKET_VOL, atol=1e-6)


def test_sharded_puts_match_single_device():
    """option_type threads through the shard_map pricing path."""
    from heston_tpu.models import calibration as calib
    from heston_tpu.parallel import make_mesh
    from heston_tpu.parallel.sharded import price_batch_sharded

    assert len(jax.devices()) == 8
    mesh = make_mesh()
    strikes = jnp.linspace(80.0, 120.0, 16)
    tv = jnp.array(P.bumpable())
    want = calib.base_prices(SPEC, SOLVER, strikes, 100.0, tv,
                             P.r_d, P.r_f, option_type="put")
    got = price_batch_sharded(mesh, SPEC, SOLVER, strikes, 100.0, tv,
                              P.r_d, P.r_f, option_type="put")
    np.testing.assert_allclose(np.array(got), np.array(want), rtol=0,
                               atol=1e-12)


def test_mc_put_matches_cf():
    """MC put (same paths, put payoff) agrees with the CF put within its
    own 95% confidence band."""
    from heston_tpu.models import mc

    want = float(heston_cf.put_price(
        100.0, 100.0, P.v0, P.kappa, P.eta, P.sigma, P.rho, P.r_d, 1.0))
    price, half = mc.price_european_call_mc(
        jax.random.PRNGKey(7), 100.0, P.v0, 100.0, P.r_d, P.r_f,
        P.kappa, P.eta, P.sigma, P.rho, 1.0, num_paths=60_000,
        n_steps=200, scheme="reflection", option_type="put")
    assert abs(float(price) - want) < 2.0 * float(half) + 0.05


def test_put_boundary_columns():
    """Injection-free put boundaries: the s = 0 column decays at the FULL
    -r_d rate on every variance row (including the A2 identity-tail rows
    m2-1 and m2, which a half-rate bug once left at K*e^{-r_d*T/2}), and
    the v_max row tracks Black-Scholes at sigma^2 = v_max (the correct
    finite-v_max far field), not the sigma->inf Dirichlet limit."""
    from heston_tpu.models import bs

    spec = GridSpec(m1=50, m2=25)
    sol = dataclasses.replace(SOLVER, n_steps=40)
    u, grid = douglas.price_surface(spec, sol, 100.0, 100.0, P,
                                    option_type="put")
    want = 100.0 * np.exp(-P.r_d * 1.0)
    col0 = np.asarray(u[:, 0])
    np.testing.assert_allclose(col0, want, rtol=5e-5)
    vmax = float(grid.vec_v[-1])
    i_atm = int(np.argmin(np.abs(np.asarray(grid.vec_s) - 100.0)))
    bs_ref = float(bs.put_price(float(grid.vec_s[i_atm]), 100.0, P.r_d,
                                np.sqrt(vmax), 1.0))
    # one-sided FD row lacking v-derivatives: agree to a few percent
    assert abs(float(u[-1, i_atm]) - bs_ref) < 0.05 * bs_ref


def test_device_lm_matches_host_lm_puts():
    """The fully on-chip LM loop prices/fits put chains identically to
    the host loop (option_type plumbing through calibrate_device)."""
    from heston_tpu.config import CalibrationConfig
    from heston_tpu.models import bs
    from heston_tpu.models import calibration as calib

    strikes = jnp.linspace(85.0, 115.0, 7)
    market = bs.generate_market_data(100.0, 1.0, P.r_d, strikes,
                                     option_type="put")
    init_vec = jnp.array([1.0, 0.05, 0.4, -0.5, 0.05])
    cfg = CalibrationConfig(max_iter=3, tol=1e-10, jacobian_mode="ad")

    tv_dev, info = calib.calibrate_device(
        SPEC, SOLVER, strikes, market, 100.0, init_vec, P.r_d, P.r_f,
        cfg=cfg, option_type="put")

    targets = calib.CalibrationTargets(
        strikes=np.asarray(strikes), maturities=np.full(7, 1.0),
        prices=np.asarray(market), s0=100.0, r_d=P.r_d, r_f=P.r_f,
        option_type="put")
    res = calib.calibrate(targets, SPEC, SOLVER,
                          HestonParams(kappa=1.0, eta=0.05, sigma=0.4,
                                       rho=-0.5, v0=0.05), cfg)
    np.testing.assert_allclose(np.asarray(tv_dev),
                               np.asarray(res.params.bumpable()),
                               rtol=0, atol=1e-9)
    assert int(info["iterations"]) == res.iterations


@pytest.mark.parametrize("scheme", ["cs", "mcs", "hv"])
def test_put_schemes_converge_to_cf(scheme):
    """Puts under the Craig-Sneyd / modified-CS / Hundsdorfer-Verwer
    steppers converge to the
    CF put like the Douglas path does (the scheme machinery is
    payoff-agnostic, but the put boundary treatment rides through each
    scheme's corrector stages — worth pinning)."""
    want = float(heston_cf.put_price(
        100.0, 100.0, P.v0, P.kappa, P.eta, P.sigma, P.rho, P.r_d, 1.0))
    errs = []
    for (m1, m2, n) in [(50, 25, 20), (100, 50, 80)]:
        sol = dataclasses.replace(SOLVER, n_steps=n, scheme=scheme)
        got = _price(GridSpec(m1=m1, m2=m2), sol, 100.0,
                     option_type="put")
        errs.append(abs(got - want))
    assert errs[1] < errs[0]
    assert errs[1] < 0.03, (scheme, errs, want)


def test_unknown_option_type_raises():
    """Typos like 'Put' must raise, not silently price a call."""
    with pytest.raises(ValueError, match="unknown option_type"):
        douglas.price_option(
            SPEC, SOLVER, 100.0, 100.0, P.kappa, P.eta, P.sigma, P.rho,
            P.v0, P.r_d, P.r_f, option_type="Put")
