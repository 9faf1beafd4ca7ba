"""Douglas (DO) ADI time-stepping for the 2-D Heston PDE.

One DO step (theta-weighted, A0 explicit; ref: src/solver.hpp:19-95,
src/device_solver.hpp:196-266):

    Y0   = U + dt * (A0 U + A1 U + A2 U + b * e^{r_f dt (n-1)})   [+ lambda]
    rhs1 = Y0 + theta*dt * (b1 e^{r_f dt n} - A1 U - b1 e^{r_f dt (n-1)})
    Y1   = (I - theta*dt*A1)^{-1} rhs1        (tridiagonal along s)
    rhs2 = Y1 + theta*dt * (b2 e^{r_f dt n} - A2 U - b2 e^{r_f dt (n-1)})
    U'   = (I - theta*dt*A2)^{-1} rhs2        (pentadiagonal along v)

American early exercise uses the Ikonen–Toivanen lambda multiplier
(ref: src/solver.hpp:267-280, src/device_solver.hpp:357-372):

    U      = max(U' - dt*lambda, U_payoff)
    lambda = max(0, lambda + (U_payoff - U') / dt);  lambda[s = s_max] = 0

Discrete dividends re-map the surface via S -> S(1-pct) - cash with linear
interpolation on the s-grid before the PDE step whose window contains the
dividend date (ref: src/solver.hpp:358-429). The schedule is static, so the
time loop is split into `lax.fori_loop` segments with the (traced) dividend
re-maps applied between segments — no data-dependent control flow under jit.

TPU-native structure: everything here is pure and shape-static, jitted once
and `vmap`-ed over the option book (and over parameter bumps for the
calibration Jacobian). The reference's one-team-per-option batching
(ref: src/device_solver.hpp:53-185) becomes a leading batch axis.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from heston_tpu.config import (
    DividendSchedule,
    GridSpec,
    HestonParams,
    SolverConfig,
)
from heston_tpu.ops import banded, operators
from heston_tpu.ops.grid import Grid, find_node, make_grid

Array = jnp.ndarray


class DampOps(NamedTuple):
    """Operator/factorization set for the Rannacher start-up phase:
    implicit bands at theta = 1, dt/2; boundary vectors SHARED with the
    main phase (their baked e^{-rate*dt*(N-1)} factor is the main
    solver's convention — the damp sub-steps then scale by
    e^{rate*(dt/2)*k}, which lands on the same absolute times)."""

    ops: operators.HestonOperators
    a1_fac: banded.TridiagFactor
    a2_fac: banded.PentaFactor


class SegmentOps(NamedTuple):
    """Operator/factorization set for ONE rate-schedule segment (arrays
    only — the static segment structure (step ranges, boundary rates)
    is re-derived from (solver, rate_schedule) where needed so the
    pytree stays vmap-clean)."""

    ops: operators.HestonOperators
    a1_fac: banded.TridiagFactor
    a2_fac: banded.PentaFactor
    damp: Optional[DampOps] = None


class PreparedInstance(NamedTuple):
    """Everything one option instance needs to run the DO time loop."""

    grid: Grid
    ops: operators.HestonOperators
    a1_fac: banded.TridiagFactor
    a2_fac: banded.PentaFactor
    u0: Array        # payoff surface max(+-(s - K), 0), (m2+1, m1+1)
    idx_s: Array     # spot node index (int32 scalar)
    idx_v: Array     # variance node index (int32 scalar)
    damp: Optional[DampOps] = None   # rannacher_steps > 0 only
    barrier: object = None           # spec.barrier (knock-out re-knock)
    # piecewise-constant RateSchedule only: one SegmentOps per rate
    # segment, ascending; () when pricing at flat rates. The top-level
    # ops/facs then hold the LAST segment's set (the operators at
    # valuation time tau = T — what the theta epilogue differentiates).
    rate_segments: tuple = ()


def _build_op_set(grid, solver: SolverConfig, kappa, eta, sigma, rho,
                  r_d, r_f, option_type, strike, barrier,
                  boundary_anchor=None, need_damp=None) -> SegmentOps:
    """Operators + factorizations (+ optional Rannacher damp set) for
    one (rate, anchor) pair — the per-segment unit of prepare_instance."""
    ops = operators.build_operators(
        grid, kappa, eta, sigma, rho, r_d, r_f,
        solver.theta, solver.delta_t, solver.n_steps,
        solver.a2_variant, option_type, strike, barrier,
        boundary_anchor,
    )
    a1_fac = banded.tridiag_factor(ops.a1_iml, ops.a1_imd, ops.a1_imu)
    a2_fac = banded.penta_factor(
        ops.a2_il2, ops.a2_il1, ops.a2_id, ops.a2_iu1, ops.a2_iu2
    )
    damp = None
    if need_damp is None:
        need_damp = bool(solver.rannacher_steps)
    if need_damp:
        if solver.rannacher_steps < 0:
            raise ValueError(
                f"rannacher_steps must be >= 0; got "
                f"{solver.rannacher_steps}")
        # The damp set differs from the main ops ONLY in the implicit
        # bands' theta*dt scalar (1.0 * dt/2 instead of theta*dt):
        # derive them from the already-built explicit bands — exactly
        # build_operators' own `I - td*A` assembly — instead of
        # re-running the whole operator build. Explicit bands, A0 and
        # the boundary vectors (whose baked e^{-rate*dt*(N-1)} factor is
        # the MAIN phase's convention, see DampOps) are shared.
        td_d = solver.delta_t / 2.0
        ops_d = ops._replace(
            a1_iml=-td_d * ops.a1_ml,
            a1_imd=1.0 - td_d * ops.a1_md,
            a1_imu=-td_d * ops.a1_mu,
            a2_il2=-td_d * ops.a2_l2,
            a2_il1=-td_d * ops.a2_l1,
            a2_id=1.0 - td_d * ops.a2_d,
            a2_iu1=-td_d * ops.a2_u1,
            a2_iu2=-td_d * ops.a2_u2,
        )
        damp = DampOps(
            ops=ops_d,
            a1_fac=banded.tridiag_factor(ops_d.a1_iml, ops_d.a1_imd,
                                         ops_d.a1_imu),
            a2_fac=banded.penta_factor(ops_d.a2_il2, ops_d.a2_il1,
                                       ops_d.a2_id, ops_d.a2_iu1,
                                       ops_d.a2_iu2),
        )
    return SegmentOps(ops=ops, a1_fac=a1_fac, a2_fac=a2_fac, damp=damp)


def _segment_structure(solver: SolverConfig, rate_schedule,
                       option_type: str):
    """STATIC per-segment structure for a RateSchedule — see
    operators.rate_segment_structure (shared with the fused kernel)."""
    return operators.rate_segment_structure(
        solver.n_steps, solver.delta_t, solver.maturity, rate_schedule,
        option_type)


def prepare_instance(
    spec: GridSpec,
    solver: SolverConfig,
    strike,
    s0,
    kappa,
    eta,
    sigma,
    rho,
    v0,
    r_d,
    r_f,
    option_type: str = "call",
    rate_schedule=None,
) -> PreparedInstance:
    """Build grid, operators, factorizations and payoff for one option.

    rate_schedule: optional config.RateSchedule (piecewise-constant
    term structures; framework extension). When set, the scalar
    r_d / r_f arguments are IGNORED: one SegmentOps set is built per
    rate segment (the time loop swaps operator sets at the static
    segment boundaries — run_time_loop), and the top-level ops hold the
    LAST segment's set (valuation-time operators)."""
    grid = make_grid(spec, s0, strike, v0)
    if rate_schedule is not None:
        R = min(solver.rannacher_steps, solver.n_steps) \
            if solver.rannacher_steps else 0
        structure = _segment_structure(solver, rate_schedule, option_type)
        seg_ops = tuple(
            _build_op_set(grid, solver, kappa, eta, sigma, rho,
                          seg_rd, seg_rf, option_type, strike,
                          spec.barrier, boundary_anchor=anchor,
                          need_damp=bool(R) and n_lo <= R)
            for (n_lo, n_hi, seg_rd, seg_rf, _, anchor) in structure)
        last = seg_ops[-1]
        u0 = operators.grid_payoff(
            grid.vec_s[None, :], strike, option_type) * jnp.ones(
            (spec.m2 + 1, 1), grid.vec_s.dtype)
        if spec.barrier is not None:
            u0 = spec.barrier.mask_payoff(u0)
        return PreparedInstance(
            grid=grid, ops=last.ops, a1_fac=last.a1_fac,
            a2_fac=last.a2_fac, u0=u0,
            idx_s=find_node(grid.vec_s, s0),
            idx_v=find_node(grid.vec_v, v0),
            damp=seg_ops[0].damp, barrier=spec.barrier,
            rate_segments=seg_ops,
        )
    built = _build_op_set(grid, solver, kappa, eta, sigma, rho, r_d, r_f,
                          option_type, strike, spec.barrier)
    ops, a1_fac, a2_fac, damp = built
    u0 = operators.grid_payoff(
        grid.vec_s[None, :], strike, option_type) * jnp.ones(
        (spec.m2 + 1, 1), grid.vec_s.dtype
    )
    if spec.barrier is not None:
        # the knocked node(s) are knocked out AT expiry too: Dirichlet 0
        # from payoff onward — this same masked u0 is the American
        # exercise floor, so a knocked column can never be resurrected
        # by the lambda step (shared rule: config.Barrier.mask_payoff)
        u0 = spec.barrier.mask_payoff(u0)
    return PreparedInstance(
        grid=grid,
        ops=ops,
        a1_fac=a1_fac,
        a2_fac=a2_fac,
        u0=u0,
        idx_s=find_node(grid.vec_s, s0),
        idx_v=find_node(grid.vec_v, v0),
        damp=damp,
        barrier=spec.barrier,
    )


def apply_dividend(u: Array, vec_s: Array, amount, pct,
                   option_type: str = "call", barrier=None) -> Array:
    """Surface re-map for one discrete dividend.

    For each s-node: new_s = s*(1-pct) - amount, then linear interpolation of
    the old surface at new_s. Replicates the reference exactly, including
    idx==0 -> left extrapolation and new_s <= 0 -> 0
    (ref: src/solver.hpp:382-425). For PUTS (framework extension) the
    new_s <= 0 region copies column 0 instead of zeroing — U(0) ~ K
    there, and the call convention is only exact because U(0) = 0.

    barrier: knock-out re-knock. A spot AT the barrier at the dividend
    instant is knocked out (continuous monitoring) — the remap would
    otherwise refill the up-out's top node from the alive interior at
    s*(1-pct) - D < level. Down-out needs no explicit mask: new_s at
    the bottom node falls BELOW the grid, and the idx == 0 fall-through
    copies column 0, which is already 0."""
    m1 = vec_s.shape[-1] - 1
    new_s = vec_s * (1.0 - pct) - amount
    # first index with vec_s[k] > new_s (strict); 0 if none (matches the
    # reference's untouched idx = 0 fall-through). Computed as a comparison
    # count: batched searchsorted scalarizes into per-element binary
    # searches on TPU and costs milliseconds.
    idx = jnp.sum(vec_s[:, None] <= new_s[None, :], axis=0).astype(jnp.int32)
    idx = jnp.where(idx > m1, 0, idx)
    idx_lo = jnp.maximum(idx - 1, 0)

    s_lo = vec_s[idx_lo]
    s_hi = vec_s[idx]
    w = (new_s - s_lo) / jnp.where(s_hi == s_lo, 1.0, s_hi - s_lo)

    u_lo = jnp.take(u, idx_lo, axis=-1)
    u_hi = jnp.take(u, idx, axis=-1)
    interp = (1.0 - w) * u_lo + w * u_hi

    left = u[..., 0:1] * jnp.ones_like(new_s)
    out = jnp.where(idx == 0, left, interp)
    if operators.is_put(option_type):
        out = jnp.where(new_s > 0.0, out, left)
    else:
        out = jnp.where(new_s > 0.0, out, 0.0)
    if barrier is not None and barrier.knock_top:
        out = out.at[..., -1].set(0.0)
    return out


def _do_step(n, u, lam, inst: PreparedInstance, solver: SolverConfig,
             b_rate, american: bool, projected: bool = False):
    """One ADI step (Douglas / Craig-Sneyd / modified Craig-Sneyd);
    n is the 1-based (possibly traced) step index. `b_rate` is the
    boundary-vector scaling rate (r_f for calls, r_d for puts —
    operators.boundary_rate).

    DO  (ref: src/solver.hpp:19-95): predictor + A1/A2 implicit corrections.
    CS  (ref: src/solver.hpp:678-778): adds a 1/2*dt mixed-derivative
        corrector and re-runs both implicit solves.
    MCS: textbook in 't Hout-Foulon modified Craig-Sneyd (the reference's
        MCS is marked broken, src/solver.hpp:915).
    HV:  Hundsdorfer-Verwer (framework extension beyond the reference) —
        full-operator 1/2-weight corrector with the second-stage
        implicit corrections anchored at Y2."""
    ops = inst.ops
    dt = solver.delta_t
    theta = solver.theta
    # single-instance path always runs XLA solvers; "pallas" only applies
    # to the batched entry point (price_batch)
    engine = "scan" if solver.solver_engine == "pallas" \
        else solver.solver_engine
    dtype = u.dtype
    nf = jnp.asarray(n, dtype)
    e_nm1 = jnp.exp(b_rate * dt * (nf - 1.0))
    e_n = jnp.exp(b_rate * dt * nf)

    a0r = operators.a0_multiply(ops, u)
    a1r = operators.a1_multiply(ops, u)
    a2r = operators.a2_multiply(ops, u)

    def stage_solves(y0_stage):
        rhs1 = y0_stage + theta * dt * (
            ops.b1 * e_n - (a1r + ops.b1 * e_nm1))
        y1 = banded.tridiag_solve(inst.a1_fac, rhs1, engine)
        rhs2 = y1 + theta * dt * (ops.b2 * e_n - (a2r + ops.b2 * e_nm1))
        return banded.penta_solve(inst.a2_fac, rhs2, engine)

    y0 = u + dt * (a0r + a1r + a2r + ops.b * e_nm1)
    if american:
        y0 = y0 + dt * lam
    y2 = stage_solves(y0)

    if solver.scheme == "cs":
        # mixed-derivative corrector (b0 == 0 for calls)
        a0_y2 = operators.a0_multiply(ops, y2)
        y0_tilde = y0 + 0.5 * dt * (a0_y2 - a0r)
        u_bar = stage_solves(y0_tilde)
    elif solver.scheme == "mcs":
        a0_y2 = operators.a0_multiply(ops, y2)
        a1_y2 = operators.a1_multiply(ops, y2)
        a2_y2 = operators.a2_multiply(ops, y2)
        y0_hat = y0 + theta * dt * (a0_y2 - a0r)
        full_new = a0_y2 + a1_y2 + a2_y2 + ops.b * e_n
        full_old = a0r + a1r + a2r + ops.b * e_nm1
        y0_tilde = y0_hat + (0.5 - theta) * dt * (full_new - full_old)
        u_bar = stage_solves(y0_tilde)
    elif solver.scheme == "hv":
        # Hundsdorfer-Verwer (in 't Hout & Foulon 2010; framework
        # extension — the reference ships DO/CS/MCS only): full-operator
        # corrector with weight 1/2, and second-stage implicit
        # corrections anchored at Y2 instead of U —
        #   y0~ = y0 + 1/2 dt (F(y2, t_n) - F(u, t_{n-1}))
        #   y1~ = y0~ + theta dt (F1(y1~, t_n) - F1(y2, t_n))
        #   u'  = y1~ + theta dt (F2(u', t_n) - F2(y2, t_n))
        # so the t_n boundary terms cancel inside both corrections.
        a0_y2 = operators.a0_multiply(ops, y2)
        a1_y2 = operators.a1_multiply(ops, y2)
        a2_y2 = operators.a2_multiply(ops, y2)
        full_new = a0_y2 + a1_y2 + a2_y2 + ops.b * e_n
        full_old = a0r + a1r + a2r + ops.b * e_nm1
        y0_tilde = y0 + 0.5 * dt * (full_new - full_old)
        y1t = banded.tridiag_solve(
            inst.a1_fac, y0_tilde - theta * dt * a1_y2, engine)
        u_bar = banded.penta_solve(
            inst.a2_fac, y1t - theta * dt * a2_y2, engine)
    elif solver.scheme == "do":
        u_bar = y2
    else:
        raise ValueError(f"unknown scheme: {solver.scheme!r}")

    if american:
        if projected:
            # STATIC-PIN scheme for the DISCONTINUOUS digital obstacle
            # (the at-exercise-paid one-touch). Two facts drive it:
            # (1) the Ikonen-Toivanen lambda is O(1/h^2) at the payoff
            # jump and its explicit dt*lam source leaks through the
            # implicit solves (measured: 34% overshoot above the 0/1
            # payoff at the reference's N=20; plain max-projection still
            # 2.4x — the floor RECTIFIES the non-monotone central-
            # convection ringing every step). (2) For r_d >= 0 the
            # active set is STATIC: wherever the payoff is 1, immediate
            # exercise is uniquely optimal (holding is worth at most
            # E[e^{-r_d tau}] < 1), so the LCP degenerates to a
            # Dirichlet problem — pin u = 1 on full-payoff nodes
            # (cell-averaged u0 == 1 exactly there) and project the
            # rest onto the BOX [payoff, 1]: the value is also bounded
            # above by the unit cash, so clipping the v=0 row's
            # persistent ringing (no diffusion there keeps the price
            # jump sharp for all time) is exact — DESIGN.md §11 has the
            # measured comparison. lambda stays 0 (the risk epilogue
            # reconstructs it from complementarity on the active set —
            # greeks._surface_risk).
            pin = inst.u0 == 1.0
            u_new = jnp.where(pin, inst.u0,
                              jnp.minimum(jnp.maximum(u_bar, inst.u0),
                                          1.0))
            return u_new, lam
        u_new = jnp.maximum(u_bar - dt * lam, inst.u0)
        lam_new = jnp.maximum(0.0, lam + (inst.u0 - u_bar) / dt)
        lam_new = lam_new.at[..., :, -1].set(0.0)   # lambda(s_max) = 0
        return u_new, lam_new
    return u_bar, lam


def _phase_plan(solver: SolverConfig, dividends):
    """Static execution plan for the time loop: a list of
    ('run', phase, n0, n1) half-open step ranges and ('div', amount, pct)
    surface re-maps, in order. Pure bookkeeping — unit-tested directly
    (tests/test_rannacher.py) because the dividend/damping interleaving
    conventions live here.

    phase 'main' runs steps at solver.delta_t with the configured
    scheme; phase 'damp' runs the Rannacher start-up sub-steps (theta=1
    Douglas at delta_t/2, see SolverConfig.rannacher_steps) with
    phase-local indices k = 1..2R. A dividend belonging to main step n
    (window [n*dt, (n+1)*dt), DividendSchedule.events_for_step) with
    n <= R fires before damp sub-step 2n-1 — the re-map happens at the
    SAME absolute tau = (n-1)*dt as in the undamped run.

    rannacher_steps > n_steps damps the whole horizon (clamped; a mixed-
    maturity book's short groups re-derive solvers with smaller n_steps,
    so a global R must not be an error for them)."""
    R = min(solver.rannacher_steps, solver.n_steps)
    N = solver.n_steps
    have_div = dividends is not None and len(dividends) > 0
    acts = []

    def emit_phase(phase, k_lo, k_hi, event_points):
        # event_points: [(k, [(amount, pct), ...])] with k the
        # phase-local index whose step the events precede, ascending
        n_next = k_lo
        for k, events in event_points:
            acts.append(("run", phase, n_next, k))
            for amount, pct in events:
                acts.append(("div", amount, pct))
            n_next = k
        acts.append(("run", phase, n_next, k_hi + 1))

    def events_in(lo, hi, to_local):
        pts = []
        if have_div:
            for n in range(lo, hi + 1):
                e = dividends.events_for_step(n, solver.delta_t)
                if e:
                    pts.append((to_local(n), e))
        return pts

    if R:
        emit_phase("damp", 1, 2 * R, events_in(1, R, lambda n: 2 * n - 1))
    emit_phase("main", R + 1, N, events_in(R + 1, N, lambda n: n))
    return acts


def _phase_views(inst: PreparedInstance, solver: SolverConfig):
    """(inst, solver) pairs keyed by phase name for the plan executor."""
    views = {"main": (inst, solver)}
    if solver.rannacher_steps:
        if inst.damp is None:
            raise ValueError(
                "solver.rannacher_steps > 0 but the PreparedInstance has "
                "no damping operators — it was prepared with a different "
                "solver; rebuild it via prepare_instance(spec, solver, ...)")
        views["damp"] = (
            inst._replace(ops=inst.damp.ops, a1_fac=inst.damp.a1_fac,
                          a2_fac=inst.damp.a2_fac),
            solver.damping_solver(),
        )
    return views


def _loop_views(inst: PreparedInstance, solver: SolverConfig, b_rate,
                dividends, option_type: str, rate_schedule):
    """(acts, views) for the plan executors: the phase plan with run
    entries rewritten to ('run', key, n0, n1) and
    views[key] = (inst_view, solver_view, b_rate).

    Flat rates: keys are the phase names, views from _phase_views, the
    caller's b_rate everywhere. With a RateSchedule, run ranges are
    additionally split at the STATIC rate-segment boundaries, keys are
    (phase, segment_index), each view carries that segment's operator
    set (inst.rate_segments) and boundary rate. The damp phase's
    sub-steps 2n-1, 2n belong to main step n, so a main segment
    [a, b] owns damp-local [2a-1, 2b]."""
    acts = _phase_plan(solver, dividends)
    if rate_schedule is None:
        views = {ph: v + (b_rate,)
                 for ph, v in _phase_views(inst, solver).items()}
        return acts, views
    structure = _segment_structure(solver, rate_schedule, option_type)
    if len(inst.rate_segments) != len(structure):
        raise ValueError(
            "PreparedInstance was built with a different rate schedule "
            f"({len(inst.rate_segments)} operator segments vs "
            f"{len(structure)} in the plan) — rebuild it via "
            "prepare_instance(..., rate_schedule=...)")
    views = {}
    for si, ((_, _, _, _, br, _), seg) in enumerate(
            zip(structure, inst.rate_segments)):
        views[("main", si)] = (
            inst._replace(ops=seg.ops, a1_fac=seg.a1_fac,
                          a2_fac=seg.a2_fac),
            solver, br)
        if seg.damp is not None:
            views[("damp", si)] = (
                inst._replace(ops=seg.damp.ops, a1_fac=seg.damp.a1_fac,
                              a2_fac=seg.damp.a2_fac),
                solver.damping_solver(), br)
    seg_hi = [s[1] for s in structure]

    def seg_of_main(n):
        for i, hi in enumerate(seg_hi):
            if n <= hi:
                return i
        return len(seg_hi) - 1

    out = []
    for act in acts:
        if act[0] != "run":
            out.append(act)
            continue
        _, phase, n0, n1 = act
        if phase == "damp":
            def to_main(k):
                return (k + 1) // 2

            def local_start(n):
                return 2 * n - 1
        else:
            def to_main(k):
                return k

            def local_start(n):
                return n
        if n1 <= n0:     # empty range — executors skip it; key arbitrary
            out.append(("run", (phase, seg_of_main(max(to_main(n0), 1))),
                        n0, n1))
            continue
        k = n0
        while k < n1:
            si = seg_of_main(to_main(k))
            end = min(n1, local_start(seg_hi[si] + 1))
            out.append(("run", (phase, si), k, end))
            k = end
    return out, views


def run_time_loop(
    inst: PreparedInstance,
    solver: SolverConfig,
    b_rate,
    american: bool = False,
    dividends: Optional[DividendSchedule] = None,
    option_type: str = "call",
    with_lambda: bool = False,
    rate_schedule=None,
):
    """Jit-dispatching wrapper over the raw loop: a direct (eager) call
    otherwise compiles every lax loop piecemeal per call and lands
    nothing in the persistent compilation cache (same rationale as
    _price_option_exec; direct eager calls are common in tests and
    notebooks). Inside a trace the raw body runs inline as before."""
    leaves = jax.tree_util.tree_leaves((inst, b_rate))
    if any(isinstance(x, jax.core.Tracer) for x in leaves):
        return _run_time_loop_impl(inst, solver, b_rate, american,
                                   dividends, option_type, with_lambda,
                                   rate_schedule)
    # inst.barrier is a static config object riding the pytree — hoist
    # it into the executable cache key (jit would reject a non-array
    # leaf) and re-attach inside the trace
    return _run_time_loop_exec(solver, american, dividends, option_type,
                               with_lambda, rate_schedule,
                               inst.barrier)(
        inst._replace(barrier=None), b_rate)


@functools.lru_cache(maxsize=None)
def _run_time_loop_exec(solver, american, dividends, option_type,
                        with_lambda, rate_schedule, barrier):
    @jax.jit
    def run(inst, b_rate):
        return _run_time_loop_impl(inst._replace(barrier=barrier),
                                   solver, b_rate, american,
                                   dividends, option_type, with_lambda,
                                   rate_schedule)

    return run


def _run_time_loop_impl(
    inst: PreparedInstance,
    solver: SolverConfig,
    b_rate,
    american: bool = False,
    dividends: Optional[DividendSchedule] = None,
    option_type: str = "call",
    with_lambda: bool = False,
    rate_schedule=None,
):
    """Run all N DO steps (with dividend re-maps between segments, and
    the Rannacher start-up sub-steps when solver.rannacher_steps > 0);
    returns the terminal surface, or (u, lambda) when with_lambda=True.

    Knock-out re-knock at dividends comes from inst.barrier (set by
    prepare_instance from spec.barrier — a forgotten thread-through
    here once silently resurrected the knocked column at every event);
    the steps themselves need nothing (the knocked column of inst.u0 is
    preserved by every operator).

    `b_rate` scales the boundary vectors through time (r_f for calls —
    what every reference path passes — r_d for puts); with a
    `rate_schedule` the per-segment boundary rates override it.
    `with_lambda=True` returns (u, lambda_surface) — the Ikonen-Toivanen
    multiplier is needed by e.g. the American theta epilogue
    (dU/dtau = L U + b + lambda)."""
    u = inst.u0
    lam = jnp.zeros_like(u)
    acts, views = _loop_views(inst, solver, b_rate, dividends,
                              option_type, rate_schedule)
    projected = operators.is_digital(option_type)

    def run_range(key, n0, n1, carry):
        inst_p, solver_p, br = views[key]

        def body(n, c):
            return _do_step(n, c[0], c[1], inst_p, solver_p, br,
                            american, projected)

        if n1 <= n0:
            return carry
        if n1 - n0 == 1:
            return body(n0, carry)
        return lax.fori_loop(n0, n1, body, carry)

    carry = (u, lam)
    for act in acts:
        if act[0] == "run":
            _, key, n0, n1 = act
            carry = run_range(key, n0, n1, carry)
        else:
            _, amount, pct = act
            carry = (apply_dividend(carry[0], inst.grid.vec_s, amount,
                                    pct, option_type, inst.barrier),
                     carry[1])
    if with_lambda:
        return carry
    return carry[0]


def solve_with_tracking(
    inst: PreparedInstance,
    solver: SolverConfig,
    b_rate,
    american: bool = False,
    dividends: Optional[DividendSchedule] = None,
    option_type: str = "call",
    rate_schedule=None,
):
    """Run the time loop recording the full price surface (and the American
    lambda-multiplier surface) after every step — the TPU equivalent of the
    reference's *_with_..._tracking steppers used for plots
    (ref: src/solver.hpp:1086-1621). Returns (surfaces [N+1, nv, ns],
    lambdas [N+1, nv, ns]); index 0 is the payoff. With Rannacher
    damping the [N+1] contract is kept: the damped window records the
    surface at the full-dt boundaries (every SECOND sub-step)."""
    import numpy as np

    u = inst.u0
    lam = jnp.zeros_like(u)
    acts, views = _loop_views(inst, solver, b_rate, dividends,
                              option_type, rate_schedule)
    projected = operators.is_digital(option_type)

    def scan_range(key, n0, n1, carry):
        inst_p, solver_p, br = views[key]
        phase = key[0] if isinstance(key, tuple) else key

        def body(carry_, n):
            out = _do_step(n, carry_[0], carry_[1], inst_p, solver_p,
                           br, american, projected)
            return out, out
        ns_ = jnp.arange(n0, n1)
        carry, hist = lax.scan(body, carry, ns_)
        if phase == "damp":
            # keep only the full-dt boundaries (even sub-steps)
            keep = (np.arange(n0, n1) % 2) == 0
            hist = (hist[0][keep], hist[1][keep])
        return carry, hist

    chunks_u = [u[None]]
    chunks_lam = [lam[None]]
    carry = (u, lam)
    for act in acts:
        if act[0] == "run":
            _, key, n0, n1 = act
            if n1 <= n0:
                continue
            carry, hist = scan_range(key, n0, n1, carry)
            chunks_u.append(hist[0])
            chunks_lam.append(hist[1])
        else:
            _, amount, pct = act
            carry = (apply_dividend(carry[0], inst.grid.vec_s, amount,
                                    pct, option_type, inst.barrier),
                     carry[1])
    return jnp.concatenate(chunks_u), jnp.concatenate(chunks_lam)


def _validate_barrier_book(spec, s0, strikes) -> None:
    """Loud host-side guard on barrier books (concrete inputs only —
    traced calls, e.g. inside a vmap/jit of the caller, skip it; the
    production entry points see concrete spots). The vanilla grid's
    drop-the-spot quirk at s0 >= 8K is reference-faithful and stays
    unguarded; the barrier cases are framework extensions where a
    silent ~0 price would be a plain bug (grid.validate_book)."""
    if spec.barrier is None:
        return
    import jax.core as _core

    if isinstance(s0, _core.Tracer) or isinstance(strikes, _core.Tracer):
        return
    from heston_tpu.ops import grid as _gridmod
    import numpy as _np

    _gridmod.validate_book(spec, float(s0),
                           _np.atleast_1d(_np.asarray(strikes, float)))


def price_option(
    spec: GridSpec,
    solver: SolverConfig,
    strike,
    s0,
    kappa,
    eta,
    sigma,
    rho,
    v0,
    r_d,
    r_f,
    american: bool = False,
    dividends: Optional[DividendSchedule] = None,
    option_type: str = "call",
    rate_schedule=None,
) -> Array:
    """Price a single option; returns a scalar. Pure & vmappable.

    option_type="put" is a framework extension (the reference prices
    calls only): put payoff and injection-free put boundaries — the far
    fields emerge from the full -r_d reaction (operators.build_a1_bands
    / build_a2_bands; b1 = b2 = 0); American puts — the canonical
    early-exercise case — run through the same lambda-multiplier LCP.

    rate_schedule: optional config.RateSchedule (piecewise-constant
    term structures for r_d / r_f — framework extension; the reference
    prices at flat rates only). When set, the scalar r_d / r_f
    arguments are IGNORED; the time loop swaps per-segment operator
    sets at the static segment boundaries."""
    _validate_barrier_book(spec, s0, strike)
    run = _price_option_exec(spec, solver, american, dividends,
                             option_type, rate_schedule)
    return run(strike, s0, kappa, eta, sigma, rho, v0, r_d, r_f)


@functools.lru_cache(maxsize=None)
def _price_option_exec(spec, solver, american, dividends, option_type,
                       rate_schedule):
    """Cached jitted executable per static config: direct (eager) calls
    to price_option otherwise compile every lax loop piecemeal per call,
    land nothing in the persistent compilation cache, and re-pay the
    whole cost on the next call — measured as the dominant wall-clock of
    eager-calling tests on this 1-CPU host. Nested jit is transparent
    under callers' jit/vmap/jacfwd."""

    @jax.jit
    def run(strike, s0, kappa, eta, sigma, rho, v0, r_d, r_f):
        inst = prepare_instance(
            spec, solver, strike, s0, kappa, eta, sigma, rho, v0,
            r_d, r_f, option_type, rate_schedule=rate_schedule,
        )
        b_rate = operators.boundary_rate(r_d, r_f, option_type)
        u = run_time_loop(inst, solver, b_rate, american, dividends,
                          option_type, rate_schedule=rate_schedule)
        return u[inst.idx_v, inst.idx_s]

    return run


def price_and_v0_stencil(
    spec: GridSpec,
    solver: SolverConfig,
    strike,
    s0,
    kappa,
    eta,
    sigma,
    rho,
    v0,
    r_d,
    r_f,
    american: bool = False,
    dividends: Optional[DividendSchedule] = None,
    option_type: str = "call",
    rate_schedule=None,
):
    """(price, dPrice/dv0) from ONE solve: the v0 sensitivity is the
    discretization's own 3-point v-derivative stencil at the inserted v0
    node. v0 enters the discrete price ONLY through the grid (the PDE
    coefficients are v0-free), so the continuum dP/dv0 is dU/dv at
    (s0, v0) — reading it off the surface avoids differentiating through
    the grid motion, whose f32 tangents dominate the Jacobian error
    (see pallas.fused_do._v0_stencil_col; the two estimators agree to
    O(h^2), measured 2.5e-3 normalized on the reference grid).

    Boundary clipping mirrors greeks._surface_risk: the parabola is
    centered on the clipped interior node and EVALUATED at v0 (a no-op
    for interior idx_v, where v0 == vec_v[idx_v] by insertion)."""
    from heston_tpu.ops import coeff

    inst = prepare_instance(
        spec, solver, strike, s0, kappa, eta, sigma, rho, v0, r_d, r_f,
        option_type, rate_schedule=rate_schedule,
    )
    b_rate = operators.boundary_rate(r_d, r_f, option_type)
    u = run_time_loop(inst, solver, b_rate, american, dividends,
                      option_type, rate_schedule=rate_schedule)
    vv = inst.grid.vec_v
    j = jnp.clip(inst.idx_v, 1, spec.m2 - 1)
    h0 = vv[j] - vv[j - 1]
    h1 = vv[j + 1] - vv[j]
    bm, b0, bp = coeff.w_beta(h0, h1)
    dm, d0, dp = coeff.w_delta(h0, h1)
    col = u[:, inst.idx_s]
    first = bm * col[j - 1] + b0 * col[j] + bp * col[j + 1]
    second = dm * col[j - 1] + d0 * col[j] + dp * col[j + 1]
    return u[inst.idx_v, inst.idx_s], first + second * (v0 - vv[j])


def price_surface(
    spec: GridSpec,
    solver: SolverConfig,
    strike,
    s0,
    params: HestonParams,
    american: bool = False,
    dividends: Optional[DividendSchedule] = None,
    option_type: str = "call",
    rate_schedule=None,
):
    """Full terminal surface + grid (for exports / inspection)."""
    inst = prepare_instance(
        spec, solver, strike, s0, params.kappa, params.eta, params.sigma,
        params.rho, params.v0, params.r_d, params.r_f, option_type,
        rate_schedule=rate_schedule,
    )
    b_rate = operators.boundary_rate(params.r_d, params.r_f, option_type)
    u = run_time_loop(inst, solver, b_rate, american, dividends,
                      option_type, rate_schedule=rate_schedule)
    return u, inst.grid


@functools.partial(
    jax.jit,
    static_argnames=("spec", "solver", "american", "dividends",
                     "option_type", "rate_schedule"),
)
def _price_batch_impl(
    spec: GridSpec,
    solver: SolverConfig,
    strikes: Array,
    s0,
    kappa,
    eta,
    sigma,
    rho,
    v0,
    r_d,
    r_f,
    american: bool = False,
    dividends: Optional[DividendSchedule] = None,
    option_type: str = "call",
    rate_schedule=None,
) -> Array:
    if solver.solver_engine == "pallas":
        from heston_tpu.pallas import fused_do, fused_single

        if rate_schedule is None and fused_single.use_single(
                spec, solver, strikes.shape[0], dividends):
            # batch of ONE: the latency kernel (2-D [nv, ns] layout,
            # log-depth PCR along s) — the batched kernel's sequential
            # sweeps waste 127/128 lanes on a single instance. Curve
            # books take the batched kernel (per-segment launches).
            return fused_single.fused_price_single(
                spec, solver, strikes[0], s0, kappa, eta, sigma, rho,
                v0, r_d, r_f, american=american, dividends=dividends,
                option_type=option_type,
            ).reshape(1)
        if fused_do.use_fused(spec, solver):
            return fused_do.fused_price_batch(
                spec, solver, strikes, s0, kappa, eta, sigma, rho, v0,
                r_d, r_f, american=american, dividends=dividends,
                option_type=option_type, rate_schedule=rate_schedule,
            )
        # grid too large for the fused kernel's VMEM working set —
        # fall through to the XLA path

    def one(k):
        return price_option(
            spec, solver, k, s0, kappa, eta, sigma, rho, v0, r_d, r_f,
            american=american, dividends=dividends,
            option_type=option_type, rate_schedule=rate_schedule,
        )

    return jax.vmap(one)(strikes)


def price_batch(
    spec: GridSpec,
    solver: SolverConfig,
    strikes: Array,
    s0,
    kappa,
    eta,
    sigma,
    rho,
    v0,
    r_d,
    r_f,
    american: bool = False,
    dividends: Optional[DividendSchedule] = None,
    option_type: str = "call",
    rate_schedule=None,
) -> Array:
    """Batched pricing over a strike vector (the reference's one-team-per-
    option parallelism, ref: src/device_solver.hpp:53-185, as a vmap).

    solver_engine="pallas" routes to the fused whole-time-loop TPU kernel
    (heston_tpu.pallas.fused_do); "scan"/"pcr" run the XLA path.

    rate_schedule: optional config.RateSchedule (piecewise-constant
    term structures; framework extension) — the scalar r_d / r_f are
    then ignored. Curve books run at fused-kernel speed too: one launch
    per static rate segment, each with its own operator fields and
    boundary anchor (fused_do.fused_price_batch); batch-of-one curve
    books take the batched kernel (the PCR latency kernel bakes
    flat-rate constants).

    The barrier-book validation runs HERE, outside the jitted impl — a
    guard inside the jit only ever sees tracers and silently skips
    (caught in review: the gap-spot rejection never fired)."""
    _validate_barrier_book(spec, s0, strikes)
    return _price_batch_impl(
        spec, solver, strikes, s0, kappa, eta, sigma, rho, v0, r_d, r_f,
        american=american, dividends=dividends, option_type=option_type,
        rate_schedule=rate_schedule)


def price_knock_in(
    spec: GridSpec,
    solver: SolverConfig,
    strikes: Array,
    s0,
    kappa,
    eta,
    sigma,
    rho,
    v0,
    r_d,
    r_f,
    dividends: Optional[DividendSchedule] = None,
    option_type: str = "call",
) -> Array:
    """European knock-IN barrier prices via in–out parity:
    KI = vanilla − KO (framework extension). The parity is exact
    PATH-WISE under continuous monitoring — every path either touches
    the barrier (pays the KI payoff) or doesn't (pays the KO payoff) —
    so it holds under any dynamics, discrete dividends included.

    spec.barrier names the knock trigger (its "-out" kind; e.g. an
    up-and-in call passes Barrier("up-out", level)). No American
    variant: early exercise breaks the parity (an American KI is a
    genuinely path-dependent exercise problem).

    The two legs run on their own grids (the KO's truncated alive
    domain vs the vanilla's [0, s_max_mult*K]), so a few-per-mille
    discretization mismatch between legs is inherent at coarse grids —
    it vanishes under refinement, and `mc.price_european_call_mc(
    barrier=..., knock_in=True)` is the single-estimator cross-check."""
    if spec.barrier is None:
        raise ValueError(
            "price_knock_in needs spec.barrier (the knock trigger)")
    import dataclasses

    vanilla = price_batch(
        dataclasses.replace(spec, barrier=None), solver, strikes, s0,
        kappa, eta, sigma, rho, v0, r_d, r_f,
        dividends=dividends, option_type=option_type)
    ko = price_batch(
        spec, solver, strikes, s0, kappa, eta, sigma, rho, v0, r_d, r_f,
        dividends=dividends, option_type=option_type)
    return vanilla - ko


def price_batch_params(
    spec: GridSpec,
    solver: SolverConfig,
    strikes: Array,
    s0,
    params: HestonParams,
    american: bool = False,
    dividends: Optional[DividendSchedule] = None,
    option_type: str = "call",
    rate_schedule=None,
) -> Array:
    """Convenience wrapper taking a HestonParams dataclass."""
    return price_batch(
        spec, solver, strikes, s0, params.kappa, params.eta, params.sigma,
        params.rho, params.v0, params.r_d, params.r_f,
        american=american, dividends=dividends, option_type=option_type,
        rate_schedule=rate_schedule,
    )
