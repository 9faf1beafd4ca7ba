"""Levenberg–Marquardt calibration of the 5 Heston parameters.

Re-design of the reference's calibration stack (ref:
src/jacobian_computation.cpp, src/heston_calibration.cpp) for TPU:

* FD Jacobian: the reference runs 6 sequential PDE solves inside each GPU
  team (base + 5 bumps, ref: src/jacobian_computation.cpp:204-364). Here the
  bump axis is a SECOND vmap axis: one jitted executable solves all
  6 x num_options PDEs concurrently. The v0 bump rebuilds the variance grid
  and re-locates the extraction node automatically, because grid build and
  node lookup are part of the traced pricing function (replacing
  rebuild_variance_views + find_v0_index, ref: src/grid_pod.hpp:25-87).
* Normal equations: JtJ (5x5) and Jtr (5) by einsum; Marquardt damping
  JtJ_ii *= (1 + lambda) and a 5x5 linear solve (the reference uses
  KokkosBlas gemm/gemv + a hand-rolled device Gaussian elimination,
  ref: src/jacobian_computation.cpp:107-195; a 5x5 jnp.linalg.solve is the
  right tool on TPU). With a sharded option book the residual/Jacobian
  contractions reduce over ICI via psum (see heston_tpu.parallel).
* Damped accept/reject loop with parameter clamps on host — same control
  flow as the reference (ref: src/heston_calibration.cpp:206-417).

Multi-maturity chains: the reference gives each (maturity, strike) point its
own step count N = round(T_i * steps_per_year) (ref:
src/heston_calibration.cpp:2165-2213). vmap needs a uniform trip count, so
points are grouped by maturity (one compiled executable per distinct
maturity — reused across LM iterations) and the per-group results are
concatenated; see `CalibrationTargets`.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from heston_tpu.config import (
    CalibrationConfig,
    DividendSchedule,
    GridSpec,
    HestonParams,
    SolverConfig,
)
from heston_tpu.models import douglas

Array = jnp.ndarray

N_PARAMS = 5  # (kappa, eta, sigma, rho, v0)


@dataclasses.dataclass(frozen=True)
class CalibrationTargets:
    """Market data to fit: one entry per (strike, maturity) point."""

    strikes: np.ndarray          # (n_points,)
    maturities: np.ndarray       # (n_points,)
    prices: np.ndarray           # (n_points,)
    s0: float
    r_d: float
    r_f: float = 0.0
    american: bool = False
    dividends: Optional[DividendSchedule] = None
    option_type: str = "call"   # "put" = framework extension (ref is
                                # calls-only, src/bs.hpp:44)
    # Optional per-point least-squares weights w_i >= 0: the objective
    # becomes sum_i w_i r_i^2 (None = all ones = the reference's
    # unweighted price objective, src/heston_calibration.cpp:271-327).
    # Framework extension; see `vega_weights` for the market-standard
    # 1/vega^2 choice that fits implied vols to first order.
    weights: Optional[np.ndarray] = None

    def groups(self) -> List[Tuple[float, np.ndarray]]:
        """(maturity, point-index array) per distinct maturity, in order."""
        out = []
        for t in sorted(set(self.maturities.tolist())):
            out.append((t, np.nonzero(self.maturities == t)[0]))
        return out


def _kernel_dispatched(spec, solver) -> bool:
    """Whether price_batch will ACTUALLY run the fused Pallas kernel for
    this config (it falls back to the vmappable XLA path for non-DO
    schemes and oversized grids) — the FD bump loop must serialize only
    in the former case (pallas_call has no batching rule)."""
    if solver.solver_engine != "pallas":
        return False
    from heston_tpu.pallas import fused_do

    return fused_do.use_fused(spec, solver)


def _bumped_param_matrix(theta_vec: Array, eps: float) -> Array:
    """Rows: [base, kappa+eps, eta+eps, sigma+eps, rho+eps, v0+eps].

    Column order matches the reference Jacobian
    (ref: src/jacobian_computation.cpp:292-361)."""
    base = jnp.broadcast_to(theta_vec, (N_PARAMS + 1, N_PARAMS))
    bump = jnp.concatenate(
        [jnp.zeros((1, N_PARAMS), theta_vec.dtype),
         eps * jnp.eye(N_PARAMS, dtype=theta_vec.dtype)], axis=0)
    return base + bump


@functools.partial(
    jax.jit,
    static_argnames=("spec", "solver", "american", "dividends", "eps",
                     "option_type"),
)
def jacobian_and_prices(
    spec: GridSpec,
    solver: SolverConfig,
    strikes: Array,
    s0,
    theta_vec: Array,          # (5,) = (kappa, eta, sigma, rho, v0)
    r_d,
    r_f,
    eps: float = 1e-6,
    american: bool = False,
    dividends: Optional[DividendSchedule] = None,
    option_type: str = "call",
) -> Tuple[Array, Array]:
    """Returns (J [n_strikes, 5], base_prices [n_strikes]).

    6 * n_strikes PDE solves in one fused executable — the vmap x vmap
    equivalent of compute_jacobian (ref: src/jacobian_computation.cpp:204)."""

    def price_one(k, pvec):
        return douglas.price_option(
            spec, solver, k, s0, pvec[0], pvec[1], pvec[2], pvec[3], pvec[4],
            r_d, r_f, american=american, dividends=dividends,
            option_type=option_type,
        )

    pmat = _bumped_param_matrix(theta_vec, eps)              # (6, 5)
    # axes: bump (6) x strikes (B)
    prices = jax.vmap(
        lambda pvec: jax.vmap(lambda k: price_one(k, pvec))(strikes)
    )(pmat)                                                   # (6, B)
    base = prices[0]
    jac = ((prices[1:] - base[None, :]) / eps).T              # (B, 5)
    return jac, base


@functools.partial(
    jax.jit,
    static_argnames=("spec", "solver", "american", "dividends", "eps",
                     "option_type", "v0_mode", "rate_schedule"),
)
def jacobian_and_prices_ad(
    spec: GridSpec,
    solver: SolverConfig,
    strikes: Array,
    s0,
    theta_vec: Array,
    r_d,
    r_f,
    eps: float = 0.0,           # ignored; FD-signature compatibility
    american: bool = False,
    dividends: Optional[DividendSchedule] = None,
    option_type: str = "call",
    v0_mode: str = "stencil",
    rate_schedule=None,
) -> Tuple[Array, Array]:
    """EXACT forward-mode Jacobian for the host LM loop — drop-in for
    `jacobian_and_prices`. Required in float32, where a 1e-6 FD bump
    drowns in rounding noise (the on-chip loop already switches to AD;
    this is the host-loop counterpart). With solver_engine="pallas" the
    tangents ride THROUGH the fused kernel in one launch.

    v0_mode: "stencil" (default) takes the v0 column from the surface
    v-stencil (douglas.price_and_v0_stencil — one fewer tangent, far
    better f32 conditioning); "ad" differentiates through the v0 grid
    motion (kept for cross-checks).

    rate_schedule: optional config.RateSchedule (curve books) — the
    scalar r_d / r_f are then ignored and the tangents run the XLA
    linearize path (the forward-mode kernel bakes flat-rate
    constants)."""
    if v0_mode not in ("stencil", "ad"):
        raise ValueError(f"unknown v0_mode: {v0_mode!r}")
    stencil = v0_mode == "stencil"
    if solver.solver_engine == "pallas" and rate_schedule is None:
        from heston_tpu.pallas import fused_do

        n_tg = fused_do.JAC_TANGENTS if stencil else 5
        if fused_do.use_fused(spec, solver, n_tangents=n_tg,
                              american=american, dividends=dividends):
            base, jac = fused_do.fused_theta_jacobian(
                spec, solver, strikes, s0, jnp.asarray(theta_vec),
                r_d, r_f, american=american, dividends=dividends,
                option_type=option_type, v0_mode=v0_mode)
            return jac, base

    theta_vec = jnp.asarray(theta_vec)
    if stencil:
        v0 = theta_vec[4]

        def fleet4(tv4):
            def one(k):
                return douglas.price_and_v0_stencil(
                    spec, solver, k, s0, tv4[0], tv4[1], tv4[2], tv4[3],
                    v0, r_d, r_f, american=american, dividends=dividends,
                    option_type=option_type, rate_schedule=rate_schedule)
            pr, dv = jax.vmap(one)(strikes)
            return pr, dv

        base, jvp_fn, dv0_col = jax.linearize(
            fleet4, theta_vec[:4], has_aux=True)
        jac4 = jax.vmap(jvp_fn)(jnp.eye(4, dtype=base.dtype)).T
        return jnp.concatenate([jac4, dv0_col[:, None]], axis=1), base

    def fleet(tv):
        def price_one(k):
            return douglas.price_option(
                spec, solver, k, s0, tv[0], tv[1], tv[2], tv[3], tv[4],
                r_d, r_f, american=american, dividends=dividends,
                option_type=option_type, rate_schedule=rate_schedule)
        return jax.vmap(price_one)(strikes)

    base, jvp_fn = jax.linearize(fleet, theta_vec)
    jac = jax.vmap(jvp_fn)(jnp.eye(N_PARAMS, dtype=base.dtype)).T
    return jac, base


@functools.partial(
    jax.jit,
    static_argnames=("spec", "solver", "american", "dividends",
                     "option_type"),
)
def base_prices(
    spec: GridSpec,
    solver: SolverConfig,
    strikes: Array,
    s0,
    theta_vec: Array,
    r_d,
    r_f,
    american: bool = False,
    dividends: Optional[DividendSchedule] = None,
    option_type: str = "call",
) -> Array:
    """Batched pricing at one parameter set
    (ref: src/jacobian_computation.cpp:368 compute_base_prices)."""

    def price_one(k):
        return douglas.price_option(
            spec, solver, k, s0, theta_vec[0], theta_vec[1], theta_vec[2],
            theta_vec[3], theta_vec[4], r_d, r_f,
            american=american, dividends=dividends,
            option_type=option_type,
        )

    return jax.vmap(price_one)(strikes)


@jax.jit
def lm_update(jac: Array, residual: Array, lam, weights=None) -> Array:
    """Damped normal-equations step: solve (JtWJ * (1+lam on diag)) d = JtWr
    (ref: src/jacobian_computation.cpp:107-195; `weights` extends the
    reference's unweighted objective to sum_i w_i r_i^2 — None keeps
    exact reference behavior)."""
    wjac = jac if weights is None else jac * weights[:, None]
    jtj = wjac.T @ jac
    jtj = jtj * (1.0 + lam * jnp.eye(N_PARAMS, dtype=jac.dtype))
    jtr = wjac.T @ residual
    return jnp.linalg.solve(jtj, jtr)


def vega_weights(targets: "CalibrationTargets",
                 floor_frac: float = 0.05) -> np.ndarray:
    """Market-standard 1/vega^2 calibration weights (framework extension).

    To first order r_i = vega_i * (iv_model - iv_market), so weighting the
    price residuals by 1/vega_i^2 makes the LM objective the sum of squared
    IMPLIED-VOL errors — the quoting convention desks calibrate to. The
    reference's unweighted price objective (src/heston_calibration.cpp:
    271-327) over-weights deep ITM points whose prices are large but whose
    vol content is small.

    Vega is evaluated at each point's market implied vol (per-point
    maturity; escrowed-dividend-adjusted spot exactly as the reference's
    IV exports, src/heston_calibration.cpp:1500-1529; put prices convert
    through parity first). Weights are floored at (floor_frac * max_vega)
    ^-2 so far-OTM points cannot blow up the objective, and normalized to
    mean 1 (pure rescaling of the SSE; keeps cfg.tol meaningful).
    """
    from heston_tpu.models import bs
    from heston_tpu.ops import operators

    if operators.is_digital(targets.option_type):
        raise ValueError(
            "vega_weights is vanilla-only (BS vega/implied-vol have no "
            "meaning for cash-or-nothing digital quotes); use explicit "
            "weights for digital chains")
    ks = np.asarray(targets.strikes, np.float64)
    ts = np.asarray(targets.maturities, np.float64)
    ps = np.asarray(targets.prices, np.float64)
    vegas = np.empty_like(ks)
    for i in range(len(ks)):
        s_adj = targets.s0
        if targets.dividends is not None:
            s_adj = float(bs.escrowed_spot(
                targets.s0, ts[i], targets.r_d,
                np.asarray(targets.dividends.dates),
                np.asarray(targets.dividends.amounts),
                np.asarray(targets.dividends.percentages)))
        p_call = ps[i]
        if targets.option_type == "put":
            p_call = float(bs.put_to_call_parity(
                ps[i], s_adj, ks[i], targets.r_d, ts[i]))
        # intrinsic floor: a price at/below intrinsic has no vol content;
        # leave vega at the ATM-ish Newton start rather than failing
        iv = float(bs.implied_vol(p_call, s_adj, ks[i], targets.r_d, ts[i]))
        vegas[i] = float(bs.call_vega(s_adj, ks[i], targets.r_d,
                                      max(iv, 1e-4), ts[i]))
    floor = floor_frac * float(np.max(vegas))
    w = 1.0 / np.maximum(vegas, floor) ** 2
    return w / w.mean()


def lm_host_loop(market, cfg: CalibrationConfig, state, eval_step,
                 eval_prices, checkpoint_path=None, pkey: str = "",
                 verbose: bool = False, weights=None):
    """THE damped accept/reject Levenberg–Marquardt loop (clamps,
    Marquardt damping schedule, convergence tests, per-iteration
    checkpointing, resume-finished repricing) shared by the host driver
    (`calibrate`) and the distributed driver
    (`parallel.calibrate_sharded`) so their trajectories and checkpoint
    schemas cannot drift apart
    (ref: src/heston_calibration.cpp:206-417).

    eval_step(theta_vec, lam) -> (delta [5] np, base_prices [n] np,
    current_error float): one Jacobian pass + damped normal-equation
    solve, however the caller distributes it.
    eval_prices(theta_vec) -> [n] np: trial pricing.
    weights (optional [n]): least-squares weights — the trial error the
    accept/reject test uses becomes sum w_i r_i^2. Callers that pass
    weights here must weight eval_step's current_error/normal equations
    the same way (one objective everywhere).

    `state` is a checkpoint.LMState (fresh or resumed). Returns
    (theta_vec, lam, iters, final_error, converged, history, fitted)."""
    from heston_tpu.utils.checkpoint import LMState

    market = np.asarray(market)
    theta_vec = np.asarray(state.theta_vec)
    lam = state.lam
    history = state.history
    converged = state.converged
    final_error = state.final_error
    iters = start_iter = state.iteration
    fitted = np.zeros_like(market)

    for it in range(start_iter, cfg.max_iter):
        if converged:
            break
        iters = it + 1
        delta, base, current_error = eval_step(theta_vec, lam)
        fitted = np.asarray(base)
        delta = np.asarray(delta)
        new_vec = clamp_params(theta_vec + delta, cfg)
        delta_norm = float(np.linalg.norm(delta))

        if verbose:
            print(f"iter {iters}: sse={current_error:.6e} "
                  f"|delta|={delta_norm:.3e} lambda={lam:.1e}")

        if delta_norm < cfg.tol or current_error < cfg.tol:
            theta_vec = new_vec
            converged = True
            final_error = current_error
            history.append(dict(iter=iters, sse=current_error,
                                delta_norm=delta_norm, lam=lam,
                                accepted=True))
            if checkpoint_path:
                LMState(np.asarray(theta_vec), lam, iters, final_error,
                        converged, history, key=pkey
                        ).save(checkpoint_path)
            break

        new_prices = eval_prices(new_vec)
        new_resid = market - new_prices
        new_error = (float(new_resid @ new_resid) if weights is None
                     else float(new_resid @ (np.asarray(weights)
                                             * new_resid)))
        accepted = new_error < current_error
        if accepted:
            theta_vec = new_vec
            fitted = new_prices
            lam = max(lam * cfg.lambda_down, cfg.lambda_min)
        else:
            lam = min(lam * cfg.lambda_up, cfg.lambda_max)
        final_error = min(new_error, current_error)
        history.append(dict(iter=iters, sse=current_error,
                            new_sse=new_error, delta_norm=delta_norm,
                            lam=lam, accepted=accepted))
        if checkpoint_path:
            LMState(np.asarray(theta_vec), lam, iters, final_error,
                    converged, history, key=pkey).save(checkpoint_path)

    if iters == start_iter:
        # resumed from a finished checkpoint (converged, or max_iter
        # already reached): the loop body never ran, so price the final
        # parameters instead of returning the zeros placeholder
        fitted = eval_prices(theta_vec)
    return theta_vec, lam, iters, final_error, converged, history, fitted


def validate_group_steps(group_steps, n: int, n_steps=None) -> None:
    """Check (start, end, n_steps) maturity-group slices tile [0, n)
    contiguously IN ORDER. Every group_steps consumer indexes the book
    both positionally (per-lane step vectors are built by concatenating
    the groups) and by slice (per-group fallbacks take strikes[a:e]) —
    out-of-order, overlapping or gapped tuples would make those two
    views silently disagree, so fail loudly here instead.

    n_steps (optional): assert the launch step count equals the largest
    group's (callers whose solver is NOT rescaled internally)."""
    if not group_steps:
        return
    prev = 0
    for a, e, g in group_steps:
        if a != prev or e <= a or g < 1:
            raise ValueError(
                f"group_steps must tile [0, {n}) contiguously in order "
                f"(start==previous end, end>start, n_steps>=1); got "
                f"{tuple(group_steps)}")
        prev = e
    if prev != n:
        raise ValueError(
            f"group_steps cover [0, {prev}) but the book has {n} options")
    if n_steps is not None and n_steps != max(g for _, _, g in group_steps):
        raise ValueError("solver.n_steps must be max(group n_steps)")


def clamp_params(vec: np.ndarray, cfg: CalibrationConfig) -> np.ndarray:
    """Parameter clamps (ref: src/heston_calibration.cpp:286-290)."""
    return np.array([
        max(cfg.kappa_min, vec[0]),
        max(cfg.eta_min, vec[1]),
        max(cfg.sigma_min, vec[2]),
        min(cfg.rho_max, max(cfg.rho_min, vec[3])),
        max(cfg.v0_min, vec[4]),
    ])


def _clamp_vec_traced(vec: Array, cfg: CalibrationConfig) -> Array:
    """Traced version of the parameter clamps
    (ref: src/heston_calibration.cpp:286-290)."""
    return jnp.stack([
        jnp.maximum(cfg.kappa_min, vec[0]),
        jnp.maximum(cfg.eta_min, vec[1]),
        jnp.maximum(cfg.sigma_min, vec[2]),
        jnp.clip(vec[3], cfg.rho_min, cfg.rho_max),
        jnp.maximum(cfg.v0_min, vec[4]),
    ])


@functools.partial(
    jax.jit,
    static_argnames=("spec", "solver", "cfg", "american", "dividends",
                     "group_steps", "pricer", "option_type"),
)
def calibrate_device(
    spec: GridSpec,
    solver: SolverConfig,
    strikes: Array,              # (n_points,)
    market_prices: Array,        # (n_points,)
    s0,
    init_vec: Array,             # (5,)
    r_d,
    r_f,
    cfg: CalibrationConfig = CalibrationConfig(),
    american: bool = False,
    dividends=None,
    group_steps: Tuple[Tuple[int, int, int], ...] = (),
    pricer: str = "pde",
    option_type: str = "call",
    weights: Optional[Array] = None,
):
    """Device-resident Levenberg-Marquardt: the ENTIRE iteration loop runs
    inside one jitted lax.while_loop — Jacobian fleet, damped 5x5 solve,
    clamps, trial pricing and the accept/reject logic all on chip. The
    reference round-trips to the host every iteration for the update and
    bookkeeping (ref: src/heston_calibration.cpp:206-417); on TPU those
    round-trips (tunnel RPCs) would dominate, so the loop is fused.

    pricer="cf" swaps the PDE fleet for the semi-analytic
    characteristic-function pricer (European, no dividends) — a capability
    the reference does not have; the PDE path remains the general one.

    `group_steps`: optional static tuple of (start, end, n_steps) slices for
    multi-maturity chains — each contiguous point range prices with its own
    step count (the CalibrationPoint mechanism,
    ref: src/heston_calibration.cpp:2165-2213). Empty means a single group
    with solver.n_steps.

    `weights` (optional [n_points], traced): least-squares weights — the
    on-chip objective, normal equations and accept/reject all use
    sum w_i r_i^2 (None = the reference's unweighted objective; see
    `vega_weights`).

    Returns (theta_vec, info_dict). Besides the scalar fields, the dict
    carries info["history"]: per-iteration error/lam/accepted/params rows
    in preallocated [cfg.max_iter] arrays (rows past info["iterations"]
    are NaN) — the on-chip counterpart of the host driver's iteration
    history/CSV, for production forensics on rejected steps.
    """
    dtype = jnp.result_type(strikes.dtype, jnp.float32)
    market = market_prices.astype(dtype)
    wvec = None if weights is None else weights.astype(dtype)
    if wvec is not None and wvec.shape != market.shape:
        raise ValueError(
            f"weights shape {wvec.shape} != market shape {market.shape}")
    validate_group_steps(group_steps, int(strikes.shape[0]))
    groups = group_steps or ((0, int(strikes.shape[0]), solver.n_steps),)

    if cfg.jacobian_mode == "ad" and pricer == "pde" \
            and solver.solver_engine == "pallas":
        from heston_tpu.pallas import fused_do

        if not fused_do.use_fused(spec, solver,
                                  n_tangents=fused_do.JAC_TANGENTS,
                                  american=american,
                                  dividends=dividends):
            # AD cannot trace through pallas_call (input_output_aliases
            # has no JVP rule), and in the primal-fits-but-5-tangents-
            # don't VMEM window price_batch WOULD still dispatch the
            # fused kernel inside jax.linearize and crash at trace time.
            # Downgrade the WHOLE fleet (Jacobian linearize, residual
            # base AND trial pricing — one engine, so accept/reject
            # compares like with like) to the XLA engine.
            solver = dataclasses.replace(solver, solver_engine="scan")

    # One-launch mixed-maturity fleet: with the fused kernel, a
    # multi-group chain prices ALL maturities in a single launch via
    # per-lane step counts (the reference's CalibrationPoint packing,
    # ref: src/heston_calibration.cpp:2165-2213) instead of one
    # sequential launch per maturity group — bitwise-equal results.
    # Dividend schedules compose: events keep their shared step index
    # and lanes already past maturity get identity remap rows (the
    # reference's american+dividend multi-maturity scenario,
    # ref: src/heston_calibration.cpp:2936-3243).
    multi_nsteps = None
    sol_max = solver
    if (pricer == "pde" and len(groups) > 1
            and solver.solver_engine == "pallas"):
        from heston_tpu.pallas import fused_do

        n_max = max(n for _, _, n in groups)
        sol_max = dataclasses.replace(
            solver, n_steps=n_max,
            maturity=solver.maturity * n_max / max(solver.n_steps, 1))
        if fused_do.use_fused(spec, sol_max):
            multi_nsteps = jnp.asarray(np.concatenate(
                [np.full(b - a, n) for a, b, n in groups]))

    def fleet_jacobian(tv):
        if cfg.jacobian_mode == "ad":
            if pricer == "pde" and solver.solver_engine == "pallas":
                from heston_tpu.pallas import fused_do

                if (multi_nsteps is not None
                        and fused_do.use_fused(
                            spec, sol_max,
                            n_tangents=fused_do.JAC_TANGENTS,
                            american=american, dividends=dividends)):
                    # whole mixed-maturity Jacobian (primal + tangent
                    # surfaces, every maturity) in ONE kernel launch
                    bb, jj = fused_do.fused_theta_jacobian(
                        spec, sol_max, strikes, s0, tv, r_d, r_f,
                        american=american, dividends=dividends,
                        option_type=option_type,
                        n_steps_per=multi_nsteps)
                    return jj, bb
                if fused_do.use_fused(spec, solver,
                                      n_tangents=fused_do.JAC_TANGENTS,
                                      american=american,
                                      dividends=dividends):
                    # exact forward-mode AD THROUGH the fused kernel: one
                    # launch per maturity group carries the tangent
                    # surfaces alongside the primal (v0 rides as a
                    # surface stencil, not a tangent). use_fused guards the
                    # scheme (DO/CS/MCS/HV — trial pricing dispatches on
                    # the same predicate, so Jacobian and residuals always
                    # come from the SAME discretization) and the tangent-
                    # inclusive VMEM working set.
                    jacs, bases = [], []
                    for (a, b, n) in groups:
                        sol = dataclasses.replace(
                            solver, n_steps=n,
                            maturity=solver.maturity * n
                            / max(solver.n_steps, 1))
                        bb, jj = fused_do.fused_theta_jacobian(
                            spec, sol, strikes[a:b], s0, tv, r_d, r_f,
                            american=american, dividends=dividends,
                            option_type=option_type)
                        bases.append(bb)
                        jacs.append(jj)
                    return jnp.concatenate(jacs), jnp.concatenate(bases)
            if pricer == "pde":
                # XLA-engine exact-AD Jacobian, SAME formulation as the
                # fused branch (4 AD columns + the surface v-stencil v0
                # column) so the LM trajectory is engine-independent
                jacs, bases = [], []
                for (a, b, n) in groups:
                    sol = dataclasses.replace(
                        solver, n_steps=n,
                        maturity=solver.maturity * n
                        / max(solver.n_steps, 1))
                    jj, bb = jacobian_and_prices_ad(
                        spec, sol, strikes[a:b], s0, tv, r_d, r_f,
                        american=american, dividends=dividends,
                        option_type=option_type)
                    jacs.append(jj)
                    bases.append(bb)
                return jnp.concatenate(jacs), jnp.concatenate(bases)
            # cf pricer: v0 is a direct (smooth, grid-free) argument —
            # plain linearize over all 5 parameters is exact
            base, jvp_fn = jax.linearize(fleet_prices, tv)
            jac = jax.vmap(jvp_fn)(jnp.eye(N_PARAMS, dtype=tv.dtype)).T
            return jac, base
        # finite differences: 6-way bump axis over the whole fleet
        # (ref: src/jacobian_computation.cpp:292-361). When the fused
        # kernel actually runs, the bumps go as 6 sequential in-graph
        # kernel launches (pallas_call has no batching rule for the bump
        # vmap); when price_batch falls back to the XLA path (non-DO
        # scheme / oversized grid), the bump axis vmaps as usual.
        pmat = _bumped_param_matrix(tv, cfg.eps)
        if pricer == "pde" and _kernel_dispatched(spec, solver):
            prices = jnp.stack([fleet_prices(pmat[i])
                                for i in range(N_PARAMS + 1)])
        else:
            prices = jax.vmap(fleet_prices)(pmat)  # (6, n_points)
        base = prices[0]
        jac = ((prices[1:] - base[None, :]) / cfg.eps).T
        return jac, base

    if pricer == "cf":
        if american or dividends is not None:
            raise ValueError("pricer='cf' supports European chains only")
        from heston_tpu.models import heston_cf

        def fleet_prices(tv):
            outs = []
            for (a, b, n) in groups:
                # group maturity under the steps-per-year convention
                # (dt is shared: T_i = n_i * dt)
                t_group = solver.maturity * n / max(solver.n_steps, 1)
                outs.append(heston_cf.price_chain(
                    s0, strikes[a:b], tv[4], tv[0], tv[1], tv[2], tv[3],
                    r_d, t_group, option_type=option_type))
            return jnp.concatenate(outs)
    elif multi_nsteps is not None:
        def fleet_prices(tv):
            from heston_tpu.pallas import fused_do

            # one launch for the whole mixed-maturity book (per-lane
            # step counts) — also the trial-pricing path, so residuals
            # and Jacobian come from the same executable family
            return fused_do.fused_price_batch(
                spec, sol_max, strikes, s0, tv[0], tv[1], tv[2], tv[3],
                tv[4], r_d, r_f, american=american, dividends=dividends,
                option_type=option_type, n_steps_per=multi_nsteps)
    else:
        def fleet_prices(tv):
            outs = []
            for (a, b, n) in groups:
                sol = dataclasses.replace(
                    solver, n_steps=n,
                    maturity=solver.maturity * n / max(solver.n_steps, 1))
                outs.append(_price_group(sol, strikes[a:b], tv))
            return jnp.concatenate(outs)

    def _price_group(sol, ks, tv):
        # price_batch dispatches to the fused Pallas kernel when
        # solver_engine="pallas" (and the grid fits VMEM)
        return douglas.price_batch(
            spec, sol, ks, s0, tv[0], tv[1], tv[2], tv[3], tv[4],
            r_d, r_f, american=american, dividends=dividends,
            option_type=option_type)

    def lm_body(state):
        tv, lam, final_error, it, converged, fitted, hist = state
        jac, base = fleet_jacobian(tv)
        resid = market - base
        wres = resid if wvec is None else wvec * resid
        current_error = resid @ wres

        wjac = jac if wvec is None else jac * wvec[:, None]
        jtj = wjac.T @ jac
        jtj = jtj * (1.0 + lam * jnp.eye(N_PARAMS, dtype=jac.dtype))
        delta = jnp.linalg.solve(jtj, wjac.T @ resid)
        new_vec = _clamp_vec_traced(tv + delta, cfg)
        delta_norm = jnp.linalg.norm(delta)

        conv_now = (delta_norm < cfg.tol) | (current_error < cfg.tol)

        trial = fleet_prices(new_vec)
        new_resid = market - trial
        new_error = new_resid @ (new_resid if wvec is None
                                 else wvec * new_resid)
        accept = new_error < current_error

        tv_next = jnp.where(conv_now | accept, new_vec, tv)
        lam_next = jnp.where(
            accept,
            jnp.maximum(lam * cfg.lambda_down, cfg.lambda_min),
            jnp.minimum(lam * cfg.lambda_up, cfg.lambda_max))
        lam_next = jnp.where(conv_now, lam, lam_next)
        err_next = jnp.where(conv_now, current_error,
                             jnp.minimum(new_error, current_error))
        fitted_next = jnp.where(conv_now, base,
                                jnp.where(accept, trial, base))
        # per-iteration forensics (preallocated [max_iter] rows; the
        # host-loop driver keeps the analogous history/CSV — rows past
        # `iterations` stay NaN)
        hist = dict(
            error=hist["error"].at[it].set(current_error),
            lam=hist["lam"].at[it].set(lam),
            accepted=hist["accepted"].at[it].set(
                accept & ~conv_now),
            params=hist["params"].at[it].set(tv_next),
        )
        return (tv_next, lam_next, err_next, it + 1,
                converged | conv_now, fitted_next, hist)

    def lm_cond(state):
        _, _, _, it, converged, _, _ = state
        return (~converged) & (it < cfg.max_iter)

    hist0 = dict(
        error=jnp.full((cfg.max_iter,), jnp.nan, dtype),
        lam=jnp.full((cfg.max_iter,), jnp.nan, dtype),
        accepted=jnp.zeros((cfg.max_iter,), jnp.bool_),
        params=jnp.full((cfg.max_iter, N_PARAMS), jnp.nan, dtype),
    )
    init = (init_vec.astype(dtype), jnp.asarray(cfg.lambda_init, dtype),
            jnp.asarray(jnp.inf, dtype), jnp.int32(0), jnp.bool_(False),
            jnp.zeros_like(market), hist0)
    tv, lam, err, it, converged, fitted, hist = lax.while_loop(
        lm_cond, lm_body, init)
    return tv, dict(final_error=err, iterations=it, converged=converged,
                    lam=lam, fitted_prices=fitted, history=hist)


@dataclasses.dataclass
class CalibrationResult:
    params: HestonParams
    initial_params: HestonParams
    final_error: float
    iterations: int
    converged: bool
    fitted_prices: np.ndarray
    market_prices: np.ndarray
    strikes: np.ndarray
    history: List[Dict]
    total_pde_solves: int


def calibrate(
    targets: CalibrationTargets,
    spec: GridSpec,
    solver: SolverConfig,
    init: HestonParams,
    cfg: CalibrationConfig = CalibrationConfig(),
    steps_per_year: Optional[int] = None,
    verbose: bool = False,
    pricing_fns=None,
    checkpoint_path: Optional[str] = None,
) -> CalibrationResult:
    """Full LM driver (ref: src/heston_calibration.cpp:26-512 and the
    multi-maturity variants :2428-2935).

    `pricing_fns`: optional override (jac_fn, price_fn) with the signatures
    of `jacobian_and_prices` / `base_prices` partially applied over sharding
    (see heston_tpu.parallel.sharded) — the LM loop is agnostic to how the
    option book is distributed.

    `checkpoint_path`: if given, the LM state is persisted after every
    iteration and a pre-existing file resumes the run (crash recovery;
    the reference has no such facility, SURVEY.md §5).
    """
    from heston_tpu.utils.checkpoint import LMState, problem_key
    if pricing_fns is not None:
        jac_fn, price_fn = pricing_fns[0], pricing_fns[1]
    else:
        # cfg.jacobian_mode="ad": exact forward-mode Jacobian (mandatory
        # in float32, where the 1e-6 FD bump is rounding noise)
        jac_fn = (jacobian_and_prices_ad if cfg.jacobian_mode == "ad"
                  else jacobian_and_prices)
        price_fn = base_prices

    spy = steps_per_year if steps_per_year is not None else solver.n_steps
    groups = targets.groups()

    def solver_for(mat: float) -> SolverConfig:
        n = max(1, int(round(spy * mat)))
        return dataclasses.replace(solver, n_steps=n, maturity=mat)

    market = np.asarray(targets.prices)
    # the key fingerprints the PROBLEM, not the LM hyperparameters:
    # resuming with a larger max_iter (or looser tol) is the normal
    # continuation pattern and must load cleanly
    weights = (None if targets.weights is None
               else np.asarray(targets.weights, np.float64))
    if weights is not None and (weights.shape != market.shape
                                or np.any(weights < 0)):
        raise ValueError(
            f"weights must be >= 0 with shape {market.shape}; got shape "
            f"{weights.shape}")
    pkey = problem_key(targets.strikes, targets.prices,
                       targets.maturities, targets.s0, targets.r_d,
                       targets.r_f, targets.american,
                       targets.option_type, spec, solver, spy, weights)
    state = LMState.fresh(init, cfg.lambda_init)
    state.key = pkey
    state = state.maybe_resume(checkpoint_path)

    def eval_jacobian(tv):
        J = np.zeros((len(market), N_PARAMS))
        P = np.zeros(len(market))
        for mat, idx in groups:
            j, p = jac_fn(
                spec, solver_for(mat), jnp.asarray(targets.strikes[idx]),
                targets.s0, jnp.asarray(tv), targets.r_d, targets.r_f,
                eps=cfg.eps, american=targets.american,
                dividends=targets.dividends,
                option_type=targets.option_type,
            )
            J[idx] = np.asarray(j)
            P[idx] = np.asarray(p)
        return J, P

    def eval_prices(tv):
        P = np.zeros(len(market))
        for mat, idx in groups:
            P[idx] = np.asarray(price_fn(
                spec, solver_for(mat), jnp.asarray(targets.strikes[idx]),
                targets.s0, jnp.asarray(tv), targets.r_d, targets.r_f,
                american=targets.american, dividends=targets.dividends,
                option_type=targets.option_type,
            ))
        return P

    def eval_step(tv, lam_):
        J, base = eval_jacobian(tv)
        residual = market - base
        current_error = (float(residual @ residual) if weights is None
                         else float(residual @ (weights * residual)))
        delta = np.asarray(lm_update(
            jnp.asarray(J), jnp.asarray(residual), lam_,
            weights=None if weights is None else jnp.asarray(weights)))
        return delta, base, current_error

    (theta_vec, lam, iters, final_error, converged, history, fitted
     ) = lm_host_loop(market, cfg, state, eval_step, eval_prices,
                      checkpoint_path=checkpoint_path, pkey=pkey,
                      verbose=verbose, weights=weights)

    calibrated = dataclasses.replace(
        init, kappa=float(theta_vec[0]), eta=float(theta_vec[1]),
        sigma=float(theta_vec[2]), rho=float(theta_vec[3]),
        v0=float(theta_vec[4]))
    n_solves = len(market) * (N_PARAMS + 2) * iters - len(market)
    return CalibrationResult(
        params=calibrated,
        initial_params=init,
        final_error=final_error,
        iterations=iters,
        converged=converged,
        fitted_prices=fitted,
        market_prices=market,
        strikes=np.asarray(targets.strikes),
        history=history,
        total_pde_solves=n_solves,
    )
