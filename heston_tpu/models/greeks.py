"""Greeks via automatic differentiation through the PDE solve.

The reference has no Greeks beyond the finite-difference parameter
sensitivities inside the calibration Jacobian (and closed-form BS vega,
ref: src/bs.hpp:124-127). On TPU the whole pricer is differentiable, so
delta/vega-style sensitivities come from `jax.grad` / `jax.jacfwd` at the
cost of roughly one extra solve per direction — exact, no bump noise.

Note on delta/gamma: the spot enters the discretization through the grid
construction itself (S_0 is inserted as a node, ref: src/grid.cpp:34-37),
so dPrice/dS_0 here is the TOTAL derivative including the grid motion —
which is the correct continuum delta because the scheme's solution is
evaluated exactly at the moving node.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from heston_tpu.config import DividendSchedule, GridSpec, SolverConfig
from heston_tpu.models import douglas
from heston_tpu.ops import operators

# the per-option columns every book-risk pass emits (_surface_risk's
# output contract, shared with parallel.sharded's risk executors)
RISK_KEYS = ("price", "delta", "gamma", "theta", "vega_v0", "vanna",
             "volga")


def _terminal_b_rate(solver, option_type, r_d, r_f, rate_schedule=None):
    """Boundary rate at valuation time tau = T: the scalar rate for flat
    books, the LAST calendar segment's for curve books (the theta
    epilogue applies e^{b_rate*dt*N} against ops.b's baked anchor — see
    operators.rate_segment_structure for why the pairing is exact)."""
    if rate_schedule is None:
        return operators.boundary_rate(r_d, r_f, option_type)
    return operators.rate_segment_structure(
        solver.n_steps, solver.delta_t, solver.maturity, rate_schedule,
        option_type)[-1][4]


def _book_prices(spec, solver, ks, s0, kappa, eta, sigma, rho, v0,
                 r_d, r_f, american, dividends, option_type,
                 group_steps=()):
    """Price a (possibly mixed-maturity) book on the configured engine:
    ONE fused launch with per-lane step counts when the fused kernel
    applies, else the XLA path per maturity group. The rates-rho FD
    bumps and their exact-AD fallback both linearize through THIS
    function so every engine prices the same formulation."""
    import dataclasses

    from heston_tpu.pallas import fused_do

    if group_steps:
        nsteps_per = jnp.concatenate([
            jnp.full(e - a, n, jnp.int32) for a, e, n in group_steps])
    else:
        nsteps_per = None
    if solver.solver_engine == "pallas" and fused_do.use_fused(
            spec, solver):
        return fused_do.fused_price_batch(
            spec, solver, ks, s0, kappa, eta, sigma, rho, v0, r_d, r_f,
            american=american, dividends=dividends,
            option_type=option_type, n_steps_per=nsteps_per)
    if group_steps:
        return jnp.concatenate([
            douglas.price_batch(
                spec, dataclasses.replace(
                    solver, solver_engine="scan", n_steps=n,
                    maturity=n * solver.delta_t),
                ks[a:e], s0, kappa, eta, sigma, rho, v0, r_d, r_f,
                american=american, dividends=dividends,
                option_type=option_type)
            for a, e, n in group_steps])
    xsol = dataclasses.replace(solver, solver_engine="scan")
    return douglas.price_batch(
        spec, xsol, ks, s0, kappa, eta, sigma, rho, v0, r_d, r_f,
        american=american, dividends=dividends, option_type=option_type)


def _rates_rho(spec, solver, ks, s0, kappa, eta, sigma, rho, v0,
               r_d, r_f, american, dividends, option_type,
               group_steps=()):
    """Book-level rate sensitivities (d price / d r_d, d / d r_f) —
    framework extension (the reference has no rate greeks).

    The fused kernel's tangent set covers the five Heston parameters
    only (rates move the A1 Q-rows AND the boundary e^{rate dt n}
    scaling, which the forward-mode kernel treats as constants), so:
    * fused engine: CENTRAL FD, two bumped fused launches per rate —
      the reference's own bump convention applied to rates
      (ref: src/jacobian_computation.cpp:204-364); eps is dtype-aware
      (truncation O(eps^2) vs the engine's rounding floor).
    * XLA engines: EXACT forward-mode AD (jax.linearize over the two
      rates; two tangent solves reusing the primal factorizations).
    """
    from heston_tpu.pallas import fused_do

    dtype = jnp.result_type(float)
    args = (spec, solver, ks, s0, kappa, eta, sigma, rho, v0)
    tail = dict(american=american, dividends=dividends,
                option_type=option_type, group_steps=group_steps)
    if solver.solver_engine == "pallas" and fused_do.use_fused(
            spec, solver):
        eps = jnp.asarray(2e-3 if dtype == jnp.float32 else 1e-5, dtype)
        rd = jnp.asarray(r_d, dtype)
        rf = jnp.asarray(r_f, dtype)
        rho_rd = (_book_prices(*args, rd + eps, rf, **tail)
                  - _book_prices(*args, rd - eps, rf, **tail)) / (2 * eps)
        rho_rf = (_book_prices(*args, rd, rf + eps, **tail)
                  - _book_prices(*args, rd, rf - eps, **tail)) / (2 * eps)
        return rho_rd, rho_rf

    def price_fn(rates):
        return _book_prices(*args, rates[0], rates[1], **tail)

    x = jnp.stack([jnp.asarray(r_d, dtype), jnp.asarray(r_f, dtype)])
    _, jvp_fn = jax.linearize(price_fn, x)
    cols = jax.vmap(jvp_fn)(jnp.eye(2, dtype=dtype))
    return cols[0], cols[1]


def _surface_risk(spec, solver, b_rate, u, lam, ops, vs, vv, idx_s, idx_v,
                  nsf=None, active=None):
    """price / delta / gamma / theta / vega_v0 / vanna / volga for ONE
    instance read off its solution surface with the discretization's own
    stencils (delta = w_beta, gamma = w_delta, vega = w_beta in v,
    volga = w_delta in v, vanna = w_beta-in-v of the per-row deltas);
    THE single implementation behind pde_theta, gamma and batch_greeks
    (vmapped there). `vv` is the v-grid node vector (shared across a
    batch — v0 insertion does not depend on the strike).

    theta: dU/dtau = L U + b + lambda (the Ikonen-Toivanen multiplier —
    WITHOUT it the theta of an American option in the early-exercise
    region would read a spurious ~r_d*K instead of ~0), so
    theta = -(L U + b*e^{rate*dt*N} + lambda). lam is zeros for
    European.

    `nsf`: the option's OWN step count (defaults to solver.n_steps) —
    mixed-maturity books scale each boundary vector through the lane's
    own e^{rate dt n_i} factor (ops.b was assembled with the matching
    e^{-rate dt (n_i - 1)})."""
    from heston_tpu.ops import coeff

    if nsf is None:
        nsf = solver.n_steps

    # the stencil center is clamped to the interior; when the inserted
    # spot node sits ON a grid boundary (idx_s = 0 or m1) the parabola
    # through (i-1, i, i+1) is instead EVALUATED at the actual node:
    # gamma of a parabola is constant and delta(s) = delta(s_i)
    # + gamma*(s - s_i) — a no-op for interior nodes (s == s_i), the
    # correct one-sided 3-point stencil at the boundaries
    i = jnp.clip(idx_s, 1, spec.m1 - 1)
    h0 = (vs[i] - vs[i - 1])[None]
    h1 = (vs[i + 1] - vs[i])[None]
    bm, b0, bp = coeff.w_beta(h0, h1)
    dm, d0, dp = coeff.w_delta(h0, h1)
    row = u[idx_v]
    du = (operators.a0_multiply(ops, u)
          + operators.a1_multiply(ops, u)
          + operators.a2_multiply(ops, u)
          + ops.b * jnp.exp(b_rate * solver.delta_t * nsf)
          + lam)
    if active is not None:
        # PROJECTED-scheme obstacles (American digitals) carry NO
        # multiplier surface; reconstruct it from complementarity on
        # the active set (u == payoff exactly where the projection
        # bound): lambda = max(0, -(L U + b)) there, so theta reads 0
        # in the stopping region instead of a spurious +r_d
        du = du + jnp.where(active, jnp.maximum(0.0, -du),
                            jnp.zeros_like(du))
    gamma_i = dm[0] * row[i - 1] + d0[0] * row[i] + dp[0] * row[i + 1]
    delta_i = bm[0] * row[i - 1] + b0[0] * row[i] + bp[0] * row[i + 1]

    # v-direction greeks: the same clamp-and-evaluate rule in v. v0
    # enters the discrete price only through the grid (the inserted
    # node), so dP/dv0 is dU/dv at the node — the estimator
    # douglas.price_and_v0_stencil / the calibration Jacobian's v0
    # column use; volga is the (constant) second derivative of the
    # v-parabola, and vanna applies the v-stencil to the three
    # neighboring rows' deltas (each evaluated at the actual spot node).
    # Accuracy note: with a strong mixed term (|rho| large) the DO
    # scheme's first-order-in-dt splitting error shows up in these
    # SECOND v-derivatives well before it shows in price/vega —
    # scheme="hv" (or "cs"/"mcs") makes vanna/volga converge at
    # practical step counts (tests/test_greeks.py::test_v_greeks_match_cf).
    j = jnp.clip(idx_v, 1, spec.m2 - 1)
    g0 = (vv[j] - vv[j - 1])[None]
    g1 = (vv[j + 1] - vv[j])[None]
    cm, c0, cp = coeff.w_beta(g0, g1)
    em, e0, ep = coeff.w_delta(g0, g1)
    dv = vv[idx_v] - vv[j]
    ds = vs[idx_s] - vs[i]
    rows = (u[j - 1], u[j], u[j + 1])
    col = jnp.stack([r[idx_s] for r in rows])
    volga = em[0] * col[0] + e0[0] * col[1] + ep[0] * col[2]
    vega = cm[0] * col[0] + c0[0] * col[1] + cp[0] * col[2] + volga * dv

    def row_delta(r):
        g_r = dm[0] * r[i - 1] + d0[0] * r[i] + dp[0] * r[i + 1]
        d_r = bm[0] * r[i - 1] + b0[0] * r[i] + bp[0] * r[i + 1]
        return d_r + g_r * ds

    deltas = jnp.stack([row_delta(r) for r in rows])
    dvanna_dv = em[0] * deltas[0] + e0[0] * deltas[1] + ep[0] * deltas[2]
    vanna = (cm[0] * deltas[0] + c0[0] * deltas[1] + cp[0] * deltas[2]
             + dvanna_dv * dv)
    return dict(
        price=u[idx_v, idx_s],
        delta=delta_i + gamma_i * ds,
        gamma=gamma_i,
        theta=-du[idx_v, idx_s],
        vega_v0=vega,
        vanna=vanna,
        volga=volga,
    )


def pde_theta(
    spec: GridSpec,
    solver: SolverConfig,
    strike,
    s0,
    kappa, eta, sigma, rho, v0, r_d, r_f,
    american: bool = False,
    dividends: Optional[DividendSchedule] = None,
    option_type: str = "call",
    rate_schedule=None,
) -> jax.Array:
    """Calendar theta dPrice/dt (per year, negative for long options) from
    the PDE itself: at the terminal surface, dU/dtau = (A0+A1+A2)U + b +
    lambda, so theta = -(L(U) + lambda) at the extraction node — exact to
    the discretization, no maturity bump or recompile; the lambda term
    makes the American theta correct in the early-exercise region
    (~0 there) as well. Thin wrapper over batch_greeks."""
    return batch_greeks(
        spec, solver, jnp.asarray(strike)[None], s0, kappa, eta, sigma,
        rho, v0, r_d, r_f, american=american, dividends=dividends,
        option_type=option_type, rate_schedule=rate_schedule)["theta"][0]


@functools.partial(
    jax.jit, static_argnames=("spec", "solver", "american", "dividends",
                              "option_type", "rate_schedule"))
def price_and_greeks(
    spec: GridSpec,
    solver: SolverConfig,
    strike,
    s0,
    kappa, eta, sigma, rho, v0, r_d, r_f,
    american: bool = False,
    dividends: Optional[DividendSchedule] = None,
    option_type: str = "call",
    rate_schedule=None,
) -> Dict[str, jax.Array]:
    """Price + (delta, vega_v0, and the five model-parameter sensitivities)
    for one option via forward-mode AD.

    With solver_engine="pallas" the five parameter sensitivities come
    from the fused kernel's forward-mode variant (one launch,
    fused_do.fused_theta_jacobian); delta needs s-grid-motion tangents
    (the spot moves the grid itself) that the kernel does not carry, so
    its single tangent runs through the XLA path.

    rate_schedule: optional config.RateSchedule (curve books) — the
    scalar r_d / r_f are then ignored, everything runs the XLA
    linearize path, and rho_rd / rho_rf are OMITTED from the result
    (the curve is static trace-time data; bump the schedule and reprice
    for curve sensitivities)."""
    dtype = jnp.result_type(float)

    if solver.solver_engine == "pallas" and rate_schedule is None:
        from heston_tpu.pallas import fused_do

        if fused_do.use_fused(spec, solver,
                              n_tangents=fused_do.JAC_TANGENTS,
                              american=american, dividends=dividends):
            import dataclasses

            tv = jnp.stack([jnp.asarray(v, dtype)
                            for v in (kappa, eta, sigma, rho, v0)])
            base, jac = fused_do.fused_theta_jacobian(
                spec, solver, jnp.asarray(strike, dtype)[None], s0, tv,
                r_d, r_f, american=american, dividends=dividends,
                option_type=option_type)

            xla_solver = dataclasses.replace(solver, solver_engine="scan")

            # delta and the two rate rhos share ONE linearized primal
            # solve (the kernel carries no s-grid-motion or rate
            # tangents)
            def price_s0_rates(x):
                return douglas.price_option(
                    spec, xla_solver, strike, x[0], kappa, eta, sigma,
                    rho, v0, x[1], x[2], american=american,
                    dividends=dividends, option_type=option_type)

            _, jvp_fn = jax.linearize(
                price_s0_rates,
                jnp.stack([jnp.asarray(s0, dtype),
                           jnp.asarray(r_d, dtype),
                           jnp.asarray(r_f, dtype)]))
            delta, rho_rd, rho_rf = jax.vmap(jvp_fn)(
                jnp.eye(3, dtype=dtype))
            return {
                "price": base[0],
                "delta": delta,
                "d_kappa": jac[0, 0],
                "d_eta": jac[0, 1],
                "d_sigma": jac[0, 2],
                "d_rho": jac[0, 3],
                "vega_v0": jac[0, 4],
                "rho_rd": rho_rd,
                "rho_rf": rho_rf,
            }

    # same formulation as the fused branch: vega_v0 is the surface
    # v-stencil at the inserted v0 node (douglas.price_and_v0_stencil),
    # NOT a grid-motion tangent — so the greeks are engine-independent
    def price_fn(x):
        s0_, kappa_, eta_, sigma_, rho_, r_d_, r_f_ = x
        return douglas.price_and_v0_stencil(
            spec, solver, strike, s0_, kappa_, eta_, sigma_, rho_, v0,
            r_d_, r_f_, american=american, dividends=dividends,
            option_type=option_type, rate_schedule=rate_schedule)

    x = jnp.stack([jnp.asarray(v, dtype)
                   for v in (s0, kappa, eta, sigma, rho, r_d, r_f)])
    price, jvp_fn, vega_v0 = jax.linearize(price_fn, x, has_aux=True)
    n_tg = 5 if rate_schedule is not None else 7
    grads = jax.vmap(jvp_fn)(jnp.eye(7, dtype=x.dtype)[:n_tg])
    out = {
        "price": price,
        "delta": grads[0],
        "d_kappa": grads[1],
        "d_eta": grads[2],
        "d_sigma": grads[3],
        "d_rho": grads[4],
        "vega_v0": vega_v0,
    }
    if rate_schedule is None:
        out["rho_rd"] = grads[5]
        out["rho_rf"] = grads[6]
    return out


def fused_book_risk(spec, solver, ks, s0, kappa, eta, sigma, rho, v0,
                    r_d, r_f, american=False, dividends=None,
                    option_type="call", nst=None, rate_schedule=None):
    """Fused-surface book risk: one kernel launch for the surfaces + the
    stencil/theta epilogues; THE single implementation behind
    batch_greeks' fused branch and the sharded mixed-maturity risk exec
    (parallel.sharded._risk_exec_mixed) — keep them in sync by keeping
    them the same code. `nst`: optional per-option int step counts.
    `rate_schedule`: optional curve — per-segment fused launches; the
    theta epilogue differentiates the LAST segment's operators (the
    valuation-time set) at its boundary rate."""
    from heston_tpu.pallas import fused_do

    b_rate = _terminal_b_rate(solver, option_type, r_d, r_f,
                              rate_schedule)
    dtype = jnp.result_type(float)
    nsf = (jnp.full(ks.shape, solver.n_steps, dtype) if nst is None
           else jnp.asarray(nst).astype(dtype))
    surf, lam, ops_b, vec_s_b, idx_s, idx_v = (
        fused_do.fused_surface_batch(
            spec, solver, ks, s0, kappa, eta, sigma, rho, v0, r_d,
            r_f, american=american, dividends=dividends,
            option_type=option_type, n_steps_per=nst,
            rate_schedule=rate_schedule))
    # the v grid is strike-independent (v0 insertion only), so one
    # vector serves the whole batch
    from heston_tpu.ops import grid as grid_mod

    vv = grid_mod.make_v_nodes(spec.m2, spec.v_max, v0,
                               spec.v_max / spec.d_div)
    risk = functools.partial(_surface_risk, spec, solver, b_rate)
    if american and operators.is_digital(option_type):
        # projected digitals: active set = exact payoff equality (the
        # projection writes u0 bitwise where it binds; the compensation
        # field is zeroed there so the launch output preserves it)
        u0_b = jax.vmap(
            lambda v, k: operators.grid_payoff(v[None, :], k, option_type)
            * jnp.ones((spec.m2 + 1, 1), v.dtype))(vec_s_b, ks)
        if spec.barrier is not None:
            u0_b = jax.vmap(spec.barrier.mask_payoff)(u0_b)
        active_b = surf == u0_b
        return jax.vmap(risk, in_axes=(0, 0, 0, 0, None, 0, 0, 0, 0))(
            surf, lam, ops_b, vec_s_b, vv, idx_s, idx_v, nsf, active_b)
    return jax.vmap(risk, in_axes=(0, 0, 0, 0, None, 0, 0, 0))(
        surf, lam, ops_b, vec_s_b, vv, idx_s, idx_v, nsf)


@functools.partial(
    jax.jit, static_argnames=("spec", "solver", "american", "dividends",
                              "option_type", "param_jacobian",
                              "group_steps", "rates", "rate_schedule"))
def batch_greeks(
    spec: GridSpec,
    solver: SolverConfig,
    strikes,
    s0,
    kappa, eta, sigma, rho, v0, r_d, r_f,
    american: bool = False,
    dividends: Optional[DividendSchedule] = None,
    option_type: str = "call",
    param_jacobian: bool = False,
    group_steps=(),
    rates: bool = False,
    rate_schedule=None,
) -> Dict[str, jax.Array]:
    """Book-level risk in ONE batched solve: price, delta, gamma,
    calendar theta, vega_v0, vanna and volga for every option, read off
    each option's solution surface with the discretization's own
    stencils (delta = w_beta, gamma = w_delta, theta = -L(U), the
    v-direction trio via the v-grid stencils at the inserted v0 node) —
    no extra solves, no bump noise. The production risk pass the
    reference has no analog of.

    param_jacobian=True adds the five exact model-parameter
    sensitivities d(kappa, eta, sigma, rho, v0) [B, 5] via forward-mode
    AD — through the fused Pallas kernel in one launch when the engine
    and grid allow (fused_do.use_fused), else the XLA linearize path.

    group_steps: optional static tuple of (start, end, n_steps) slices
    — a MIXED-MATURITY book under the shared-dt convention
    T_i = n_i * solver.delta_t with solver.n_steps = max(n_i) (the
    reference's CalibrationPoint packing applied to risk,
    ref: src/heston_calibration.cpp:2165-2213). With the fused engine
    the whole book still runs in ONE launch (per-lane step counts);
    the XLA fallback prices per maturity group.

    rates=True adds the rate sensitivities rho_rd = dP/dr_d and
    rho_rf = dP/dr_f per option (framework extension; see _rates_rho —
    exact AD on the XLA engines, central FD bumped fused launches on
    the pallas engine).

    rate_schedule: optional config.RateSchedule (curve books; framework
    extension) — the scalar r_d / r_f are then ignored. Composes with
    everything here EXCEPT group_steps (one calendar curve maps to
    different step windows per maturity) and rates=True (the curve is
    static trace-time data; scalar-rate sensitivities are undefined —
    bump the curve and reprice instead)."""
    import dataclasses

    if rate_schedule is not None and group_steps:
        raise ValueError(
            "rate_schedule does not compose with group_steps — risk "
            "mixed-maturity curve books per maturity group (each group "
            "re-derives its own segment windows from the calendar "
            "curve)")
    if rate_schedule is not None and rates:
        raise ValueError(
            "rates=True is undefined for curve books (the scalar "
            "r_d / r_f are ignored) — bump the RateSchedule and "
            "reprice for curve sensitivities")
    b_rate = _terminal_b_rate(solver, option_type, r_d, r_f,
                              rate_schedule)

    from heston_tpu.models.calibration import validate_group_steps
    from heston_tpu.pallas import fused_do

    ks = jnp.asarray(strikes)
    dtype = jnp.result_type(float)
    if group_steps:
        validate_group_steps(group_steps, int(ks.shape[0]),
                             n_steps=solver.n_steps)
        nsteps_per = jnp.concatenate([
            jnp.full(e - a, n, jnp.int32) for a, e, n in group_steps])
    else:
        nsteps_per = None
    if fused_do.use_fused(spec, solver):
        # surfaces + the ALREADY-assembled operators from ONE fused
        # launch (re-running the vmapped assembly here would double the
        # prep cost); stencil extraction and the theta operator
        # application are tiny XLA epilogues
        out = fused_book_risk(
            spec, solver, ks, s0, kappa, eta, sigma, rho, v0, r_d, r_f,
            american=american, dividends=dividends,
            option_type=option_type, nst=nsteps_per,
            rate_schedule=rate_schedule)
    else:
        risk = functools.partial(_surface_risk, spec, solver, b_rate)
        def one_group(sol_g, ks_g):
            def one(k):
                inst = douglas.prepare_instance(
                    spec, sol_g, k, s0, kappa, eta, sigma, rho, v0,
                    r_d, r_f, option_type,
                    rate_schedule=rate_schedule)
                u, lam = douglas.run_time_loop(
                    inst, sol_g, b_rate, american, dividends,
                    option_type, with_lambda=True,
                    rate_schedule=rate_schedule)
                active = (u == inst.u0 if american
                          and operators.is_digital(option_type)
                          else None)
                return risk(u, lam, inst.ops, inst.grid.vec_s,
                            inst.grid.vec_v, inst.idx_s, inst.idx_v,
                            jnp.asarray(sol_g.n_steps, dtype),
                            active)

            return jax.vmap(one)(ks_g)

        if group_steps:
            parts = [
                one_group(dataclasses.replace(
                    solver, n_steps=n, maturity=n * solver.delta_t),
                    ks[a:e])
                for a, e, n in group_steps]
            out = jax.tree_util.tree_map(
                lambda *xs: jnp.concatenate(xs), *parts)
        else:
            out = one_group(solver, ks)
    if param_jacobian:
        tv = jnp.stack([jnp.asarray(v, dtype)
                        for v in (kappa, eta, sigma, rho, v0)])
        if rate_schedule is not None:
            # the forward-mode kernel bakes flat-rate constants; the
            # XLA linearize path composes with curve segment swaps
            from heston_tpu.models import calibration as calib

            jac, _ = calib.jacobian_and_prices_ad(
                spec, solver, ks, s0, tv, r_d, r_f, american=american,
                dividends=dividends, option_type=option_type,
                rate_schedule=rate_schedule)
        elif fused_do.use_fused(spec, solver,
                                n_tangents=fused_do.JAC_TANGENTS,
                                american=american, dividends=dividends):
            _, jac = fused_do.fused_theta_jacobian(
                spec, solver, ks, s0, tv, r_d, r_f,
                american=american, dividends=dividends,
                option_type=option_type, n_steps_per=nsteps_per)
        else:
            # same formulation as the fused branch (4 AD columns + the
            # surface v-stencil v0 column) so the book Jacobian is
            # engine-independent
            from heston_tpu.models import calibration as calib

            if group_steps:
                jac = jnp.concatenate([
                    calib.jacobian_and_prices_ad(
                        spec, dataclasses.replace(
                            solver, n_steps=n,
                            maturity=n * solver.delta_t),
                        ks[a:e], s0, tv, r_d, r_f, american=american,
                        dividends=dividends, option_type=option_type)[0]
                    for a, e, n in group_steps])
            else:
                jac, _ = calib.jacobian_and_prices_ad(
                    spec, solver, ks, s0, tv, r_d, r_f,
                    american=american, dividends=dividends,
                    option_type=option_type)
        out["param_jacobian"] = jac
    if rates:
        rho_rd, rho_rf = _rates_rho(
            spec, solver, ks, s0, kappa, eta, sigma, rho, v0, r_d, r_f,
            american, dividends, option_type, group_steps)
        out["rho_rd"] = rho_rd
        out["rho_rf"] = rho_rf
    return out


def gamma(
    spec: GridSpec,
    solver: SolverConfig,
    strike,
    s0,
    kappa, eta, sigma, rho, v0, r_d, r_f,
    american: bool = False,
    dividends: Optional[DividendSchedule] = None,
    option_type: str = "call",
    rate_schedule=None,
) -> jax.Array:
    """d2Price/dS0^2 from the non-uniform central second-difference of the
    SOLUTION SURFACE at the spot node (the same w_delta stencil the
    discretization itself uses) — one solve, and ~30x more accurate than
    differentiating the pricer twice in s0: the total second derivative
    through the S0-driven grid motion converges only slowly (measured
    4.7e-3 vs 1.4e-4 abs error against the CF gamma at 50x25x40),
    because grid insertion makes the price merely piecewise-smooth in
    s0. (For the same reason, bump-and-revalue gamma on this solver is
    pure noise — the kink curvature dominates at any usable bump.)
    Thin wrapper over batch_greeks."""
    return batch_greeks(
        spec, solver, jnp.asarray(strike)[None], s0, kappa, eta, sigma,
        rho, v0, r_d, r_f, american=american, dividends=dividends,
        option_type=option_type, rate_schedule=rate_schedule)["gamma"][0]
