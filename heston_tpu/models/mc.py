"""Monte-Carlo Heston oracle — vectorized Euler simulation.

Re-design of the reference's CPU path-by-path simulator
(ref: src/MC_hes.cpp:48-99) as a fully vectorized `jax.random` simulation:
all paths advance together in one `lax.scan` over time steps, so the TPU
VPU processes the entire path set per step (the reference loops paths on one
CPU core with rand()/Box–Muller).

Scheme (matching the reference exactly up to the RNG):
    dW_v = sqrt(dt) Z1,  dW_s = sqrt(dt) (rho Z1 + sqrt(1-rho^2) Z2)
    V += kappa (eta - V) dt + sigma sqrt(max(V,0)) dW_v
    S += (r_d - r_f) S dt + S sqrt(max(V,0)) dW_s
350 steps per year (ref: src/MC_hes.hpp N_DAYS_PER_YEAR), discounted payoff
mean + 95% confidence half-width (NORMAL_SCORE = 1.96).

Framework extensions beyond the reference: put payoffs, on-path discrete
dividend jumps (independently validates the PDE dividend goldens), a
Longstaff-Schwartz American pricer (`price_american_lsmc`) — the external
oracle for the PDE's lambda-multiplier LCP — and Andersen's
Quadratic-Exponential variance scheme (`scheme="qe"`, Andersen 2008
"Simple and efficient simulation of the Heston stochastic volatility
model"), which samples the variance transition from moment-matched
quadratic/exponential distributions and the log-spot from the exact
integrated-variance relation: orders of magnitude less time-
discretization bias than Euler at coarse steps (the Euler variants keep
the reference's dynamics bit-for-bit and stay the parity oracles).
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from heston_tpu.ops import operators

N_STEPS_PER_YEAR = 350
NORMAL_SCORE = 1.96


def feller_condition(kappa, eta, sigma) -> bool:
    """2*kappa*eta > sigma^2 (ref: src/MC_hes.cpp:18-20)."""
    return 2.0 * kappa * eta > sigma * sigma


def select_scheme(kappa, eta, sigma) -> str:
    """Feller-driven variance-scheme dispatch, the reference's automatic
    selection (ref: src/MC_hes.cpp:18-20, 102): the standard truncation
    simulator where 2*kappa*eta > sigma^2 keeps V positive in
    distribution, the reflection variant where the condition fails and
    the variance process piles mass at 0. Requires CONCRETE parameters
    (the choice is a host-side branch); pass scheme= explicitly from
    inside traced code."""
    try:
        return ("truncation"
                if feller_condition(float(kappa), float(eta), float(sigma))
                else "reflection")
    except TypeError as exc:
        raise TypeError(
            "scheme='auto' needs concrete kappa/eta/sigma (the Feller "
            "dispatch is a host-side branch); pass scheme='truncation' or "
            f"'reflection' explicitly from traced code: {exc}") from exc


def _dividend_jumps(dividends, t, n_steps: int):
    """Per-calendar-step (mult, sub, has_event) arrays folding the
    schedule's discrete jumps s -> s*(1-pct) - amount. Computed HOST-SIDE
    (requires a concrete maturity when a schedule is given — the step
    placement is Python arithmetic; without dividends `t` may stay
    traced).

    The schedule's dates are TIME-TO-MATURITY (the PDE applies the event
    before backward step n = floor(date/dt), config.events_for_step), so
    in calendar time the jump lands after forward step m = n_steps - n
    (0-based scan index). Same-step events compose in CALENDAR order =
    reverse date order — matching the PDE's sequential surface re-maps,
    whose U0(f_d1(f_d2(s))) composition corresponds to the larger-TTM
    (earlier-calendar) event hitting the forward spot path first."""
    mult = np.ones(n_steps)
    sub = np.zeros(n_steps)
    has = np.zeros(n_steps, dtype=bool)
    if dividends is not None and len(dividends) > 0:
        try:
            t = float(t)
        except TypeError as exc:
            raise TypeError(
                "Monte-Carlo dividend schedules need a concrete maturity "
                "t (the calendar step placement is host arithmetic); got "
                f"a traced value: {exc}") from exc
        dt = t / n_steps
        for n in range(1, n_steps + 1):
            m = n_steps - n
            for amt, pct in reversed(dividends.events_for_step(n, dt)):
                # compose "apply this event AFTER the current composite"
                mult[m] *= (1.0 - pct)
                sub[m] = sub[m] * (1.0 - pct) + amt
                has[m] = True
    return jnp.asarray(mult), jnp.asarray(sub), jnp.asarray(has)


def _simulate(key, s0, v0, r_d, r_f, kappa, eta, sigma, rho, t,
              mult, sub, has_ev, num_paths: int, n_steps: int,
              scheme: str, keep_panel: bool, antithetic: bool = False,
              barrier_kind: str | None = None, barrier_level=None,
              barrier_level_hi=None):
    """Shared forward simulator (Euler reference dynamics or Andersen
    QE + optional dividend jumps). Returns the terminal (s, v) — or the
    full [n_steps, paths] panels when keep_panel (for LSMC). The
    jump+clamp is applied ONLY on event steps, so without dividends the
    Euler dynamics are bit-identical to the reference's (no absorbing
    barrier at 0; Euler paths that cross zero keep evolving exactly as
    upstream).

    antithetic=True drives paths [0, P/2) with Z and their mirrors
    [P/2, P) with -Z (num_paths must be even): payoff PAIR means are the
    iid samples — `_mc_mean_ci` handles the estimator.

    barrier_kind/barrier_level ("up-out"/"down-out"): continuously-
    monitored knock-out. The simulator carries a per-path SURVIVAL
    WEIGHT instead of a binary alive flag: each step multiplies by the
    Brownian-bridge non-crossing probability
        1 - exp(-2 (b - x_n)(b - x_{n+1}) / (v_n dt)),   x = ln S
    (0 outright once an endpoint lands beyond the barrier) with the
    step's start-of-step variance as the bridge's local variance. This
    is the standard continuity correction: a discrete endpoint check
    alone OVERPRICES knock-outs at any finite step count (paths cross
    and come back between samples); the bridge weight removes the
    O(sqrt(dt)) bias and, being a conditional expectation, lowers the
    estimator variance vs killing paths by lottery. "double-out"
    multiplies the two one-sided weights — the neglected cross-term
    (bridging BOTH barriers within one step) is O(exp(-2 ln(H/L)^2 /
    (v dt))), far below MC noise at any sane step count."""
    dtype = jnp.result_type(float)
    dt = jnp.asarray(t / n_steps, dtype)
    sqrt_dt = jnp.sqrt(dt)
    rho_c = jnp.sqrt(1.0 - rho * rho)
    if scheme not in ("truncation", "reflection", "qe"):
        raise ValueError(f"unknown MC scheme: {scheme!r}")
    if antithetic and num_paths % 2:
        raise ValueError("antithetic variates need an even num_paths")
    if barrier_kind is not None:
        if barrier_kind not in ("up-out", "down-out", "double-out"):
            raise ValueError(f"unknown barrier kind: {barrier_kind!r}")
        bridge_checks = []                      # (log level, is_upper)
        if barrier_kind != "up-out":
            bridge_checks.append(
                (jnp.log(jnp.asarray(barrier_level, dtype)), False))
        if barrier_kind == "up-out":
            bridge_checks.append(
                (jnp.log(jnp.asarray(barrier_level, dtype)), True))
        elif barrier_kind == "double-out":
            bridge_checks.append(
                (jnp.log(jnp.asarray(barrier_level_hi, dtype)), True))
        tiny = jnp.asarray(jnp.finfo(dtype).tiny, dtype)

    if scheme == "qe":
        # Andersen-QE loop invariants. The variance transition V -> V'
        # over dt has exact conditional mean m and variance s2 (affine
        # in V); the log-spot uses the exact relation
        #   ln S' = ln S + (r_d-r_f) dt + K0 + K1 V + K2 V'
        #           + sqrt(K3 (V + V')) Z
        # with the central (gamma1 = gamma2 = 1/2) weights. Requires
        # kappa > 0 (every Heston calibration here does; the exact
        # moments divide by kappa).
        e_kdt = jnp.exp(-kappa * dt)
        sig2 = sigma * sigma
        var_c1 = sig2 * e_kdt * (1.0 - e_kdt) / kappa       # × V
        var_c2 = eta * sig2 * (1.0 - e_kdt) ** 2 / (2.0 * kappa)
        k0 = -rho * kappa * eta * dt / sigma
        k1 = 0.5 * dt * (kappa * rho / sigma - 0.5) - rho / sigma
        k2 = 0.5 * dt * (kappa * rho / sigma - 0.5) + rho / sigma
        k3 = 0.5 * dt * (1.0 - rho * rho)
        u_eps = jnp.asarray(jnp.finfo(dtype).eps, dtype)

    def _draws_qe(key_n):
        """(uniform for the variance sampler, normal for the spot).
        Antithetic mirrors are U -> 1-U (variance) and Z -> -Z (spot):
        both transition samplers are monotone in their draw, so the
        mirrored path is the QE analog of the Euler -Z path."""
        ku, kz = jax.random.split(key_n)
        if antithetic:
            uh = jax.random.uniform(ku, (num_paths // 2,), dtype)
            u = jnp.concatenate([uh, 1.0 - uh])
            zh = jax.random.normal(kz, (num_paths // 2,), dtype)
            z = jnp.concatenate([zh, -zh])
        else:
            u = jax.random.uniform(ku, (num_paths,), dtype)
            z = jax.random.normal(kz, (num_paths,), dtype)
        return jnp.clip(u, u_eps, 1.0 - u_eps), z

    def step(carry, xs):
        key_n, m_i, a_i, h_i = xs
        s, v, surv = carry
        if scheme == "qe":
            u, z_s = _draws_qe(key_n)
            vp = jnp.maximum(v, 0.0)    # defensive: QE keeps V' >= 0
            m = eta + (vp - eta) * e_kdt
            s2 = vp * var_c1 + var_c2
            psi = s2 / (m * m)          # m > 0 whenever eta > 0
            # quadratic branch (psi <= 1.5): V' = a (b + Z)^2 with Z
            # from the SAME uniform via the inverse normal CDF
            inv_psi = 2.0 / psi
            b2 = jnp.maximum(
                inv_psi - 1.0
                + jnp.sqrt(jnp.maximum(inv_psi * (inv_psi - 1.0), 0.0)),
                0.0)
            a = m / (1.0 + b2)
            zv = jax.scipy.special.ndtri(u)
            v_quad = a * (jnp.sqrt(b2) + zv) ** 2
            # exponential branch (psi > 1.5): mass p at 0 plus an
            # exponential tail, inverted from the same uniform
            p = (psi - 1.0) / (psi + 1.0)
            beta = (1.0 - p) / m
            v_exp = jnp.where(
                u <= p, 0.0,
                jnp.log((1.0 - p) / jnp.maximum(1.0 - u, u_eps)) / beta)
            v_new = jnp.where(psi <= 1.5, v_quad, v_exp)
            s_new = s * jnp.exp(
                (r_d - r_f) * dt + k0 + k1 * vp + k2 * v_new
                + jnp.sqrt(jnp.maximum(k3 * (vp + v_new), 0.0)) * z_s)
        else:
            if antithetic:
                zh = jax.random.normal(key_n, (2, num_paths // 2), dtype)
                z = jnp.concatenate([zh, -zh], axis=1)
            else:
                z = jax.random.normal(key_n, (2, num_paths), dtype)
            dw_v = sqrt_dt * z[0]
            dw_s = sqrt_dt * (rho * z[0] + rho_c * z[1])
            sqv = jnp.sqrt(jnp.maximum(v, 0.0))
            v_new = v + kappa * (eta - v) * dt + sigma * sqv * dw_v
            if scheme == "reflection":
                v_new = jnp.abs(v_new)
            s_new = s + (r_d - r_f) * s * dt + s * sqv * dw_s
        s_new = jnp.where(h_i, jnp.maximum(s_new * m_i - a_i, 0.0), s_new)
        if barrier_kind is not None:
            # Brownian-bridge survival over [s, s_new] in log space with
            # the start-of-step variance; dividend jumps land AT the
            # step end, so the post-jump spot is the bridge endpoint
            # (a jump through the barrier knocks via the endpoint test)
            x0 = jnp.log(jnp.maximum(s, tiny))
            x1 = jnp.log(jnp.maximum(s_new, tiny))
            bvar = jnp.maximum(jnp.maximum(v, 0.0) * dt, tiny)
            for b_log_i, up_i in bridge_checks:
                d0 = b_log_i - x0
                d1 = b_log_i - x1
                if not up_i:
                    d0, d1 = -d0, -d1
                p_cross = jnp.exp(-2.0 * d0 * d1 / bvar)
                surv = surv * jnp.where((d0 > 0.0) & (d1 > 0.0),
                                        1.0 - p_cross, 0.0)
        return ((s_new, v_new, surv),
                ((s_new, v_new) if keep_panel else None))

    keys = jax.random.split(key, n_steps)
    s_init = jnp.full((num_paths,), s0, dtype)
    v_init = jnp.full((num_paths,), v0, dtype)
    surv_init = jnp.ones((num_paths,), dtype)
    carry, panel = lax.scan(step, (s_init, v_init, surv_init),
                            (keys, mult, sub, has_ev))
    return (panel if keep_panel else carry)


def _mc_mean_ci(payoff, num_paths: int, antithetic: bool):
    """(mean, 95% half-width). Under antithetic pairing the iid samples
    are the PAIR means (path i with its mirror i + P/2) — estimating the
    variance from raw paths would ignore the negative within-pair
    covariance that is the whole point of the method."""
    if antithetic:
        half = num_paths // 2
        samples = 0.5 * (payoff[:half] + payoff[half:])
    else:
        samples = payoff
    n = samples.shape[0]
    mean = jnp.mean(samples)
    # standard error of the mean (the reference divides by M twice,
    # ref: src/MC_hes.cpp:91-94 — statistically corrected here)
    var_mean = (jnp.mean(samples**2) - mean**2) / n
    return mean, NORMAL_SCORE * jnp.sqrt(var_mean)


def price_european_call_mc(
    key: jax.Array,
    s0,
    v0,
    strike,
    r_d,
    r_f,
    kappa,
    eta,
    sigma,
    rho,
    t,
    num_paths: int = 100_000,
    n_steps: int = N_STEPS_PER_YEAR,
    scheme: str = "auto",
    option_type: str = "call",
    dividends=None,
    antithetic: bool = False,
    barrier=None,
    knock_in: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (price, 95% confidence half-width).

    scheme="auto" (default): Feller-driven dispatch between the variants
    below, the reference's automatic selection (ref: src/MC_hes.cpp:18-20).
    scheme="truncation": sqrt(max(V,0)) in the diffusion terms (the
    reference's standard variant, ref: src/MC_hes.cpp:48-99).
    scheme="reflection": V -> |V| after each update, for parameter sets that
    violate the Feller condition. The reference's reflection variant is
    disabled/broken (returns zeros, ref: src/MC_hes.cpp:102-156); this one
    works.
    scheme="qe": Andersen's Quadratic-Exponential scheme (framework
    extension; Andersen 2008) — moment-matched variance transition
    (quadratic Gaussian-square for psi <= 1.5, mass-at-zero +
    exponential tail above) and the exact log-spot/integrated-variance
    relation. Weak error is near-flat in dt: ~16 steps/year prices to
    within MC noise where Euler needs the reference's 350. Valid for
    any Feller ratio; requires kappa > 0.
    option_type="put" is a framework extension (the reference simulates
    calls only) — same paths, put payoff. `dividends`: discrete-dividend
    jumps s -> s*(1-pct) - cash applied on-path at the schedule's
    calendar times (requires a concrete `t`); validates the PDE dividend
    goldens independently. antithetic=True mirrors half the paths
    (variance reduction; even num_paths). `barrier`: a config.Barrier —
    continuously-monitored knock-out via per-step Brownian-bridge
    survival weights (see _simulate); the independent full-Heston
    cross-check of the PDE's barrier domain truncation. knock_in=True
    (requires barrier) weights by 1 - survival instead — the SAME paths
    price the knock-in, so MC(KI) + MC(KO) == MC(vanilla) exactly at
    any seed (in-out parity holds estimator-wise, not just in
    expectation)."""
    if scheme == "auto":
        scheme = select_scheme(kappa, eta, sigma)
    if knock_in and barrier is None:
        raise ValueError("knock_in=True needs a barrier (the trigger)")
    mult, sub, has_ev = _dividend_jumps(dividends, t, n_steps)
    return _euro_mc_impl(key, s0, v0, strike, r_d, r_f, kappa, eta, sigma,
                         rho, t, mult, sub, has_ev,
                         num_paths=num_paths, n_steps=n_steps,
                         scheme=scheme, option_type=option_type,
                         antithetic=antithetic, knock_in=knock_in,
                         barrier_kind=None if barrier is None
                         else barrier.kind,
                         barrier_level=0.0 if barrier is None
                         else barrier.level,
                         barrier_level_hi=0.0 if barrier is None
                         or barrier.level_hi is None
                         else barrier.level_hi)


@functools.partial(jax.jit,
                   static_argnames=("num_paths", "n_steps", "scheme",
                                    "option_type", "antithetic",
                                    "barrier_kind", "knock_in"))
def _euro_mc_impl(key, s0, v0, strike, r_d, r_f, kappa, eta, sigma, rho, t,
                  mult, sub, has_ev, num_paths: int, n_steps: int,
                  scheme: str, option_type: str, antithetic: bool = False,
                  barrier_kind: str | None = None, barrier_level=0.0,
                  barrier_level_hi=0.0, knock_in: bool = False):
    s_fin, _, surv = _simulate(key, s0, v0, r_d, r_f, kappa, eta, sigma,
                               rho, t, mult, sub, has_ev, num_paths,
                               n_steps, scheme, keep_panel=False,
                               antithetic=antithetic,
                               barrier_kind=barrier_kind,
                               barrier_level=barrier_level,
                               barrier_level_hi=barrier_level_hi)
    disc = jnp.exp(-r_d * t)
    weight = (1.0 - surv) if knock_in else surv
    payoff = disc * operators.payoff_value(
        s_fin, strike, option_type) * weight
    return _mc_mean_ci(payoff, num_paths, antithetic)


def price_american_lsmc(
    key: jax.Array,
    s0,
    v0,
    strike,
    r_d,
    r_f,
    kappa,
    eta,
    sigma,
    rho,
    t,
    num_paths: int = 100_000,
    n_steps: int = 50,
    scheme: str = "auto",
    option_type: str = "put",
    dividends=None,
    antithetic: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """American option by Longstaff-Schwartz least-squares Monte Carlo —
    an INDEPENDENT oracle for the PDE's lambda-multiplier LCP (framework
    extension; the reference has no American MC at all). Returns
    (price, 95% confidence half-width of the pathwise estimator; 0 when
    the immediate-exercise floor binds, since the returned price is then
    the deterministic intrinsic value).

    Forward Euler simulation shared with price_european_call_mc (same
    correlated increments, V reflection/truncation, dividend jumps),
    storing the (S, V) path panel; then standard backward induction: at
    each exercise date the continuation value is regressed on the basis
    [1, S/K, (S/K)^2, V, (S/K)*V] over in-the-money paths (weighted 5x5
    normal equations — no data-dependent shapes, jit-safe), and exercise
    is taken where intrinsic > continuation. LSMC's policy is suboptimal,
    so the estimate is slightly LOW-biased (~1e-2 ATM at these settings).

    scheme="auto" applies the same Feller-driven dispatch as the
    European pricer; scheme="qe" runs the Andersen QE transition (low
    time-discretization bias at LSMC's coarse exercise grid);
    antithetic=True mirrors half the paths (the regression sees both,
    the CI uses pair means).
    """
    if scheme == "auto":
        scheme = select_scheme(kappa, eta, sigma)
    mult, sub, has_ev = _dividend_jumps(dividends, t, n_steps)
    return _lsmc_impl(key, s0, v0, strike, r_d, r_f, kappa, eta, sigma,
                      rho, t, mult, sub, has_ev,
                      num_paths=num_paths, n_steps=n_steps, scheme=scheme,
                      option_type=option_type, antithetic=antithetic)


@functools.partial(jax.jit,
                   static_argnames=("num_paths", "n_steps", "scheme",
                                    "option_type", "antithetic"))
def _lsmc_impl(key, s0, v0, strike, r_d, r_f, kappa, eta, sigma, rho, t,
               mult, sub, has_ev, num_paths: int, n_steps: int,
               scheme: str, option_type: str, antithetic: bool = False):
    dtype = jnp.result_type(float)
    dt = jnp.asarray(t / n_steps, dtype)
    s_path, v_path = _simulate(key, s0, v0, r_d, r_f, kappa, eta, sigma,
                               rho, t, mult, sub, has_ev, num_paths,
                               n_steps, scheme, keep_panel=True,
                               antithetic=antithetic)
    # panels [n_steps, paths]: states AFTER steps 1..n_steps

    disc = jnp.exp(-r_d * dt)

    def exercise_value(s):
        return operators.payoff_value(s, strike, option_type)

    # terminal cashflow (per path, valued AT maturity)
    cf = exercise_value(s_path[-1])

    def backward(cf_next, panel):
        s, v = panel
        y = disc * cf_next                 # continuation, valued at this step
        ex = exercise_value(s)
        itm = (ex > 0.0).astype(dtype)
        # normalized features (s/K ~ O(1)) keep the Gram matrix
        # well-scaled — raw S/S^2 terms put ~1e13 on the diagonal and any
        # usable ridge then swamps the low-order coefficients
        sn = s / strike
        x = jnp.stack([jnp.ones_like(sn), sn, sn * sn, v, sn * v])
        xw = x * itm[None, :]
        gram = xw @ x.T                    # [5, 5]
        rhs = xw @ y                       # [5]
        # tiny ridge only guards degenerate panels (few ITM paths)
        beta = jnp.linalg.solve(
            gram + 1e-9 * num_paths * jnp.eye(5, dtype=dtype), rhs)
        cont = beta @ x
        take = (itm > 0.0) & (ex > cont)
        cf_here = jnp.where(take, ex, y)
        return cf_here, None

    # steps n_steps-1 .. 1 (no exercise at t=0 beyond the European floor)
    panels = (s_path[:-1][::-1], v_path[:-1][::-1])
    cf, _ = lax.scan(backward, cf, panels)
    pay0 = disc * cf                       # discount the final step to t=0
    mean, half = _mc_mean_ci(pay0, num_paths, antithetic)
    # immediate exercise at t=0 floors the price at intrinsic; the floored
    # value is deterministic, so the CI collapses with it
    floor = exercise_value(jnp.asarray(s0, dtype))
    return (jnp.maximum(mean, floor),
            jnp.where(mean >= floor, half, 0.0))
