"""Heston ADI operator assembly (A0 / A1 / A2) and boundary vectors.

The Heston PDE in (t, s, v) is split per in 't Hout–Foulon into
  A0 — mixed derivative rho*sigma*s*v * d2U/dsdv (explicit only),
  A1 — S-direction diffusion/drift/half-reaction (tridiagonal, implicit),
  A2 — V-direction diffusion/drift/half-reaction (pentadiagonal, implicit),
(ref: src/hes_mat_fac.cpp, src/hes_A2_mat.cpp, README.md of the reference).

TPU-native design decisions vs. the reference:

* Operators are pure functions of (grid, params) returning a pytree of
  banded coefficient arrays, built inside jit — matrix (re)builds for
  calibration bumps are just re-executions of fused elementwise code,
  replacing the reference's per-team on-device rebuilds
  (ref: src/hes_a1_kernels.hpp:49, src/hes_a2_shuffled_kernels.hpp:101).
* A0 is applied in separable form c .* Dv(Ds(U)) — two shifted
  multiply-add passes instead of a 9-point gather, exactly equal to the
  reference's 9-entry stencil (ref: src/hes_mat_fac.cpp:19-40) because the
  stencil coefficients factor as c * beta_s(k) * beta_v(l).
* A2's bands are 1-D in the v index: the reference duplicates identical
  band values across all s-levels purely for GPU memory-access layout
  (ref: src/hes_A2_mat.cpp:401 outer loop over i); on TPU they broadcast.
* Band storage is row-aligned: l2[r] = A[r][r-2], l1[r] = A[r][r-1],
  d[r] = A[r][r], u1[r] = A[r][r+1], u2[r] = A[r][r+2]. The reference's
  off-band views (lower_diags(j) = A[j+1][j] etc.) map onto this by a
  one-slot shift.

Solution layout: U[..., v, s], shape (m2+1, m1+1) — the v-major flat order
i + j*(m1+1) of the reference reshaped to 2-D.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from heston_tpu.ops import coeff
from heston_tpu.ops.grid import Grid

Array = jnp.ndarray


def shift(x: Array, k: int, axis: int) -> Array:
    """result[i] = x[i + k] along `axis`, zero outside. |k| <= 2 used here."""
    if k == 0:
        return x
    n = x.shape[axis]
    pad = [(0, 0)] * x.ndim
    if k > 0:
        pad[axis] = (0, k)
        padded = jnp.pad(x, pad)
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(k, k + n)
    else:
        pad[axis] = (-k, 0)
        padded = jnp.pad(x, pad)
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(0, n)
    return padded[tuple(idx)]


class HestonOperators(NamedTuple):
    """All per-instance operator data consumed by the DO stepper."""

    # A0 separable stencil: A0 U = a0_c * Dv(Ds(U))
    a0_c: Array                      # (m2+1, m1+1) rho*sigma*s*v on interior
    bs_wm: Array                     # (m1+1,) beta_s weights (0 on boundary)
    bs_w0: Array
    bs_wp: Array
    bv_wm: Array                     # (m2+1,) beta_v weights (0 on boundary)
    bv_w0: Array
    bv_wp: Array
    # A1 tridiagonal along s (row-aligned)
    a1_ml: Array                     # (m2+1, m1+1)
    a1_md: Array
    a1_mu: Array
    a1_iml: Array                    # implicit I - theta*dt*A1
    a1_imd: Array
    a1_imu: Array
    # A2 pentadiagonal along v (row-aligned, 1-D)
    a2_l2: Array                     # (m2+1,)
    a2_l1: Array
    a2_d: Array
    a2_u1: Array
    a2_u2: Array
    a2_il2: Array                    # implicit I - theta*dt*A2
    a2_il1: Array
    a2_id: Array
    a2_iu1: Array
    a2_iu2: Array
    # boundary vectors (b0 is identically zero for calls; b = b1 + b2)
    b1: Array                        # (m2+1, m1+1)
    b2: Array
    b: Array


def build_a1_bands(grid: Grid, r_d, r_f, option_type: str = "call"):
    """S-direction tridiagonal bands (ref: src/hes_mat_fac.cpp:61-91,
    src/hes_a1_kernels.hpp:49-107).

    Interior rows i = 1..m1-1 get 0.5*s^2*v*delta + (r_d-r_f)*s*beta - r_d/2;
    row m1 carries only -r_d/2 on the diagonal. Row 0 (s = 0): zero for
    calls (U(0) = 0 payoff boundary, implicit row becomes identity); for
    PUTS the s = 0 far field is U(0, tau) = K*e^{-r_d*tau}, and at s = 0
    every s-derivative term of A1 vanishes, so the row carries exactly
    the remaining -r_d/2 reaction — the put A2 diagonal supplies the
    other half on EVERY row (build_a2_bands extends the reaction to the
    top two rows), giving the full -r_d decay of the whole s = 0 column.
    Puts are a TPU-framework extension; the reference prices calls only."""
    m1 = grid.m1
    s = grid.vec_s
    v = grid.vec_v
    h0 = grid.dels[: m1 - 1]   # Delta_s[i-1] for node i = 1..m1-1
    h1 = grid.dels[1:m1]       # Delta_s[i]
    dm, d0, dp = coeff.w_delta(h0, h1)
    bm, b0, bp = coeff.w_beta(h0, h1)

    a = 0.5 * v[:, None] * (s[1:m1] ** 2)[None, :]     # (m2+1, m1-1)
    bb = ((r_d - r_f) * s[1:m1])[None, :]

    ml_int = a * dm[None, :] + bb * bm[None, :]
    md_int = a * d0[None, :] + bb * b0[None, :] - 0.5 * r_d
    mu_int = a * dp[None, :] + bb * bp[None, :]

    zcol = jnp.zeros((v.shape[0], 1), s.dtype)
    d_left = -0.5 * r_d if is_put(option_type) else 0.0
    ml = jnp.concatenate([zcol, ml_int, zcol], axis=1)
    md = jnp.concatenate(
        [jnp.full((v.shape[0], 1), d_left, s.dtype), md_int,
         jnp.full((v.shape[0], 1), -0.5 * r_d, s.dtype)], axis=1
    )
    mu = jnp.concatenate([zcol, mu_int, zcol], axis=1)
    return ml, md, mu


OPTION_TYPES = ("call", "put", "digital_call", "digital_put")


def _validate_option_type(option_type: str) -> str:
    if option_type not in OPTION_TYPES:
        raise ValueError(f"unknown option_type: {option_type!r}; "
                         f"expected one of {OPTION_TYPES}")
    return option_type


def is_put(option_type: str) -> bool:
    """Validated PUT-SIDE dispatch — THE predicate every option_type
    branch must use (scattered string comparisons with inconsistent
    unknown-value fallbacks let typos silently price the wrong product).

    True for payoffs that are in the money BELOW the strike (put,
    digital_put): they share the put far-field conventions — the s = 0
    column carries value (apply_dividend copies column 0 instead of
    zeroing; A1 row 0 carries the -r_d/2 reaction)."""
    return _validate_option_type(option_type) in ("put", "digital_put")


def is_digital(option_type: str) -> bool:
    """Cash-or-nothing payoff: pays 1 in the money at expiry/exercise
    (framework extension — the reference prices vanilla calls only).
    An AMERICAN digital is the at-exercise-paid one-touch: the LCP
    floor is the 0/1 payoff itself."""
    return _validate_option_type(option_type).startswith("digital")


def is_injection_free(option_type: str) -> bool:
    """True when the scheme needs NO boundary injection vectors
    (b1 = b2 = 0): every payoff except the vanilla call. Puts and
    digitals get their far fields from the full -r_d reaction instead
    (see build_a2_bands); the vanilla call keeps the reference's
    injected linear-in-s far field."""
    return _validate_option_type(option_type) != "call"


def intrinsic_value(vec_s, strike, option_type: str):
    """Signed intrinsic (s - K for calls, K - s for puts), not floored.
    Vanilla only — digital payoffs have no signed intrinsic; use
    payoff_value."""
    if is_digital(option_type):
        raise ValueError("intrinsic_value is vanilla-only; "
                         "use payoff_value for digitals")
    return strike - vec_s if is_put(option_type) else vec_s - strike


def payoff_value(vec_s, strike, option_type: str):
    """Floored terminal payoff at arbitrary spots: max(±(s-K), 0) for
    vanillas, the 0/1 cash-or-nothing indicator for digitals
    (call pays 1{s > K}, put pays 1{s < K} — strict, the standard
    cash-or-nothing convention). Pointwise — the Monte-Carlo payoff;
    PDE grids use grid_payoff."""
    if is_digital(option_type):
        ind = (vec_s < strike) if is_put(option_type) else (vec_s > strike)
        return ind.astype(vec_s.dtype)
    return jnp.maximum(intrinsic_value(vec_s, strike, option_type), 0.0)


def grid_payoff(vec_s, strike, option_type: str):
    """Terminal payoff AT THE GRID NODES (the PDE initial condition and
    the American exercise floor; s along the last axis).

    Vanillas: the pointwise payoff (reference-faithful). Digitals:
    CELL-AVERAGED indicator (Tavella-Randall smoothing; Pooley,
    Vetzal & Forsyth 2003) — point-sampling a discontinuity costs an
    O(h) quantization error at the strike cell that destroys the
    scheme's convergence order; averaging the indicator over each
    node's dual cell [s_{i-1/2}, s_{i+1/2}] restores it. One clipped
    affine expression serves every node:
    call = clip((s_{i+1/2} - K) / (s_{i+1/2} - s_{i-1/2}), 0, 1),
    put the mirror — their sum is EXACTLY 1 at every node, so the
    discrete cash parity digital_call + digital_put = all-cash is
    preserved."""
    if not is_digital(option_type):
        return payoff_value(vec_s, strike, option_type)
    n = vec_s.shape[-1]
    ids = jnp.arange(n)
    sp = shift(vec_s, +1, -1)
    sm = shift(vec_s, -1, -1)
    hi = jnp.where(ids == n - 1, vec_s, 0.5 * (vec_s + sp))
    lo = jnp.where(ids == 0, vec_s, 0.5 * (vec_s + sm))
    den = jnp.where(hi == lo, jnp.ones_like(hi), hi - lo)
    num = (strike - lo) if is_put(option_type) else (hi - strike)
    return jnp.clip(num / den, 0.0, 1.0)


def build_a2_bands(grid: Grid, r_d, kappa, eta, sigma, variant: str,
                   option_type: str = "call", barrier=None):
    """V-direction pentadiagonal bands, 1-D in the v index.

    variant="central": the v-major operator (no upwinding) used by the
      reference's single-option golden path (ref: src/hes_A2_mat.cpp:37-109).
    variant="upwind": the shuffled/production operator, which ADDS
      backward-upwind convection + repeated diffusion terms one row below
      each node with v > 1 (ref: src/hes_A2_mat.cpp:410-421,
      src/hes_a2_shuffled_kernels.hpp:129-138). The shifted row placement
      is a faithfully reproduced reference quirk — required to match its
      golden prices.

    Structure common to both variants (rows r = 0..m2-2 are active):
      r = 0:     one-sided gamma stencil for the convection (v=0 boundary),
                 using Delta_v[1], Delta_v[2] (reference quirk, gamma(0,.)).
      r >= 1:    central beta/delta stencil with coefficient index r-1.
      all active rows: reaction -r_d/2 on the diagonal.
      rows m2-1, m2: zero (implicit rows become identity) except for upwind
                 spill-over into row m2-1 — CALLS, the reference convention.
                 PUTS (framework extension) extend the -r_d/2 reaction to
                 these rows too: combined with A1's full interior rows the
                 top variance rows then evolve as Black-Scholes at
                 sigma^2 = v_max with the full -r_d reaction, which IS the
                 correct v_max far field (and makes the s = 0 column decay
                 at the full -r_d rate on every row, A1 + A2 supplying
                 -r_d/2 each) — no boundary injection vectors needed.
                 TOP-KNOCKED barrier calls (up-out / double-out) extend
                 the reaction the same way: their b2 injection is zeroed
                 (build_boundary_vectors), so without the reaction the
                 v_max rows would discount at only r_d/2 — the put
                 argument applies verbatim (the top rows then evolve as
                 the 1-D knock-out Black-Scholes far field at full -r_d).
    """
    m2 = grid.m2
    v = grid.vec_v
    dv = grid.delv
    dtype = v.dtype

    l2 = jnp.zeros(m2 + 1, dtype)
    l1 = jnp.zeros(m2 + 1, dtype)
    d = jnp.zeros(m2 + 1, dtype)
    u1 = jnp.zeros(m2 + 1, dtype)
    u2 = jnp.zeros(m2 + 1, dtype)

    # reaction term: rows 0..m2-2 (vanilla calls, reference-faithful) or
    # all rows (puts, digitals and top-knocked barrier calls — every
    # injection-free payoff, see docstring)
    full_react = (is_injection_free(option_type)
                  or (barrier is not None and barrier.knock_top))
    n_react = m2 + 1 if full_react else m2 - 1
    d = d.at[:n_react].add(-0.5 * r_d)

    # row 0: gamma one-sided stencil (v ~ 0), spacings Delta_v[1], Delta_v[2]
    temp0 = kappa * (eta - v[0])
    g0, g1, g2 = coeff.w_gamma(dv[1], dv[2])
    d = d.at[0].add(temp0 * g0)
    u1 = u1.at[0].add(temp0 * g1)
    u2 = u2.at[0].add(temp0 * g2)

    # rows 1..m2-2: central stencil with coefficient index j-1
    h0 = dv[: m2 - 2]          # Delta_v[j-1], j = 1..m2-2
    h1 = dv[1 : m2 - 1]        # Delta_v[j]
    dm, d0, dp = coeff.w_delta(h0, h1)
    bm, b0, bp = coeff.w_beta(h0, h1)
    vj = v[1 : m2 - 1]
    temp = kappa * (eta - vj)
    temp2 = 0.5 * sigma * sigma * vj
    rows = np.arange(1, m2 - 1)
    l1 = l1.at[rows].add(temp * bm + temp2 * dm)
    d = d.at[rows].add(temp * b0 + temp2 * d0)
    u1 = u1.at[rows].add(temp * bp + temp2 * dp)

    if variant == "upwind":
        # additional terms at rows r = j+1 wherever v_j > 1 (j = 1..m2-2)
        am, a1_, a0_ = coeff.w_alpha(h0, h1)   # alpha_v(j, -2/-1/0)
        mask = (vj > 1.0).astype(dtype)
        rows_up = rows + 1                      # scatter one row below
        l2 = l2.at[rows_up].add(mask * temp * am)
        l1 = l1.at[rows_up].add(mask * (temp * a1_ + temp2 * dm))
        d = d.at[rows_up].add(mask * (temp * a0_ + temp2 * d0))
        u1 = u1.at[rows_up].add(mask * temp2 * dp)
    elif variant != "central":
        raise ValueError(f"unknown A2 variant: {variant!r}")

    return l2, l1, d, u1, u2


def boundary_rate(r_d, r_f, option_type: str = "call"):
    """Growth rate of the boundary-vector time scaling e^{rate*dt*n}
    (the reference's stepper factor, ref: src/solver.hpp:65-68).

    Calls: r_f, reference-faithful — including the reference's
    ORIENTATION quirk: combined with efac = e^{-r_f dt (N-1)} the
    injected value runs e^{-r_f (T - tau)} rather than the analytic
    far field's e^{-r_f tau}; unobservable in every reference test
    (they all set r_f = 0) and kept for parity.

    Puts and digitals have NO injection vectors at all (b1 = b2 = 0,
    see build_boundary_vectors) so the rate never matters; r_d is
    returned for definiteness."""
    return r_d if is_injection_free(option_type) else r_f


def rate_segment_structure(n_steps: int, delta_t: float, maturity: float,
                           rate_schedule, option_type: str = "call"):
    """STATIC per-segment structure for a config.RateSchedule: a tuple
    of (n_lo, n_hi, r_d, r_f, b_rate, anchor) — 1-based inclusive step
    ranges ascending over 1..n_steps, all plain Python floats (resolved
    at trace time). Shared by the XLA time loop (models.douglas) and
    the fused kernel's per-segment launches (pallas.fused_do).

    The anchor generalizes the flat-rate boundary scaling exactly: with
    I(tau) the running integral of the STEP-PIECEWISE boundary rate
    (boundary_rate per step), the injected boundary value at step n
    must be b_raw * exp(I(n*dt) - I((N-1)*dt)). Within segment k the
    stepper multiplies e^{b_rate_k*dt*n}, so the segment's vectors are
    baked with anchor_k = exp(-b_rate_k*dt*min(n_hi_k, N-1) - tail_k),
    tail_k the integral over the LATER segments' steps up to N-1. A
    single segment reduces to the flat formula e^{-rate*dt*(N-1)}
    identically."""
    per = rate_schedule.step_rates(n_steps, delta_t, maturity)
    brate = [boundary_rate(rd, rf, option_type) for rd, rf in per]
    out = []
    for (n_lo, n_hi, rd, rf) in rate_schedule.step_segments(
            n_steps, delta_t, maturity):
        br = boundary_rate(rd, rf, option_type)
        tail = delta_t * sum(brate[m - 1] for m in range(n_hi + 1, n_steps))
        anchor = math.exp(-br * delta_t * min(n_hi, n_steps - 1) - tail)
        out.append((n_lo, n_hi, rd, rf, br, anchor))
    return tuple(out)


def build_boundary_vectors(grid: Grid, r_d, r_f, n_steps: int, delta_t: float,
                           option_type: str = "call", strike=None,
                           barrier=None, anchor=None):
    """Boundary injection vectors b1 (S-direction) and b2 (V-direction).

    Calls: includes the reference's flat-index placement of b1 at
    m1*(j+1) — which is NOT the S_max column for j >= 1; reproduced exactly
    (ref: src/BoundaryConditions.hpp:70-80, src/hes_boundary_kernels.hpp:53-66).
    b0 (mixed) is identically zero; b = b0 + b1 + b2.

    Puts (framework extension — the reference prices calls only):
    b1 = b2 = 0. No injection is needed anywhere: U -> 0 at s_max; the
    s = 0 far field U(0, tau) = K*e^{-r_d*tau} emerges from the full
    -r_d reaction (A1 row 0 + the put A2 diagonal, see build_a1_bands /
    build_a2_bands); and the v_max rows evolve as Black-Scholes at
    sigma^2 = v_max, the correct finite-v_max far field. Being
    injection-free also sidesteps the reference's boundary time-scaling
    orientation quirk (see boundary_rate). `strike` is accepted for API
    symmetry but unused.

    anchor: optional override of the baked time-scaling anchor
    e^{-rate*dt*(n_steps-1)} — used by piecewise-constant rate
    schedules, where each rate segment's boundary vectors carry its own
    anchor exp(-integral of the boundary rate from the segment-local
    step origin to (n_steps-1)*dt) so the stepper's within-segment
    e^{rate*dt*n} factor lands every step on
    exp(-[I((N-1)dt) - I(tau)]), I the running integral of the
    step-piecewise boundary rate (the flat-rate formula's exact
    generalization; see models.douglas.prepare_instance).
    """
    m1, m2 = grid.m1, grid.m2
    s = grid.vec_s
    dtype = s.dtype
    shape = (m2 + 1, m1 + 1)

    rate = boundary_rate(r_d, r_f, option_type)
    if anchor is None:
        efac = jnp.exp(jnp.asarray(-rate * delta_t * (n_steps - 1), dtype))
    else:
        efac = jnp.asarray(anchor, dtype)

    if barrier is not None and barrier.knock_top:
        # a top-knocked (up-out / double-out) far s boundary IS the
        # barrier: Dirichlet 0, so no injection anywhere (the barrier
        # column starts at 0 — payoff masked — and every operator keeps
        # a zero column at zero; the v_max rows get the full -r_d
        # reaction from build_a2_bands, the same injection-free far
        # field as the put treatment below).
        z = jnp.zeros(shape, dtype)
        return z, z, z

    if is_injection_free(option_type):
        # puts AND digitals: far fields emerge from the full -r_d
        # reaction (digital call at s_max: A1 row-m1 -r_d/2 + the full
        # A2 reaction -r_d/2 decay the flat payoff 1 to exactly
        # e^{-r_d tau}, the cash-or-nothing far field)
        b1 = jnp.zeros(shape, dtype)
        b2 = jnp.zeros(shape, dtype)
    else:
        # b1: flat indices m1*(j+1), j = 0..m2 (static index arithmetic)
        flat = np.array([m1 * (j + 1) for j in range(m2 + 1)])
        rows = flat // (m1 + 1)
        cols = flat % (m1 + 1)
        vals = (r_d - r_f) * s[m1] * efac * jnp.ones((m2 + 1,), dtype)
        if barrier is not None and barrier.knock_bottom:
            # the reference's flat placement maps to (row j, col m1-j),
            # which lands in COLUMN 0 at j = m1 whenever m2 >= m1 — for
            # a down-out that column is the Dirichlet-0 barrier and must
            # receive no injection
            vals = jnp.where(jnp.asarray(cols) == 0,
                             jnp.zeros((), dtype), vals)
        b1 = jnp.zeros(shape, dtype).at[rows, cols].set(vals)
        # b2: top variance row (j = m2), s-nodes 1..m1
        b2 = jnp.zeros(shape, dtype).at[m2, 1:].set(
            -0.5 * r_d * s[1:] * efac)

    return b1, b2, b1 + b2


def build_operators(
    grid: Grid,
    kappa,
    eta,
    sigma,
    rho,
    r_d,
    r_f,
    theta: float,
    delta_t: float,
    n_steps: int,
    a2_variant: str = "upwind",
    option_type: str = "call",
    strike=None,
    barrier=None,
    boundary_anchor=None,
) -> HestonOperators:
    """Assemble every operator for one option instance (pure / vmappable).

    barrier: a config.Barrier — knock-out options are injection-free
    (b1 = b2 = 0; the knocked boundary column starts at 0 and every
    operator keeps it there, see build_boundary_vectors).

    boundary_anchor: optional override of the boundary vectors' baked
    time-scaling anchor (rate-schedule segments; see
    build_boundary_vectors)."""
    m1, m2 = grid.m1, grid.m2
    s, v = grid.vec_s, grid.vec_v
    dtype = s.dtype

    # --- A0 separable stencil (ref: src/hes_mat_fac.cpp:19-40) ---
    bs_m, bs_0, bs_p = coeff.w_beta(grid.dels[: m1 - 1], grid.dels[1:m1])
    bv_m, bv_0, bv_p = coeff.w_beta(grid.delv[: m2 - 1], grid.delv[1:m2])
    z1 = jnp.zeros(1, dtype)

    def pad1(x):
        return jnp.concatenate([z1, x, z1])

    interior_mask = jnp.zeros((m2 + 1, m1 + 1), dtype)
    interior_mask = interior_mask.at[1:m2, 1:m1].set(1.0)
    a0_c = rho * sigma * interior_mask * v[:, None] * s[None, :]

    # --- A1 ---
    a1_ml, a1_md, a1_mu = build_a1_bands(grid, r_d, r_f, option_type)
    td = theta * delta_t
    a1_iml = -td * a1_ml
    a1_imd = 1.0 - td * a1_md
    a1_imu = -td * a1_mu

    # --- A2 ---
    a2_l2, a2_l1, a2_d, a2_u1, a2_u2 = build_a2_bands(
        grid, r_d, kappa, eta, sigma, a2_variant, option_type, barrier
    )
    a2_il2 = -td * a2_l2
    a2_il1 = -td * a2_l1
    a2_id = 1.0 - td * a2_d
    a2_iu1 = -td * a2_u1
    a2_iu2 = -td * a2_u2

    # --- boundaries ---
    b1, b2, b = build_boundary_vectors(grid, r_d, r_f, n_steps, delta_t,
                                       option_type, strike, barrier,
                                       boundary_anchor)

    return HestonOperators(
        a0_c=a0_c,
        bs_wm=pad1(bs_m), bs_w0=pad1(bs_0), bs_wp=pad1(bs_p),
        bv_wm=pad1(bv_m), bv_w0=pad1(bv_0), bv_wp=pad1(bv_p),
        a1_ml=a1_ml, a1_md=a1_md, a1_mu=a1_mu,
        a1_iml=a1_iml, a1_imd=a1_imd, a1_imu=a1_imu,
        a2_l2=a2_l2, a2_l1=a2_l1, a2_d=a2_d, a2_u1=a2_u1, a2_u2=a2_u2,
        a2_il2=a2_il2, a2_il1=a2_il1, a2_id=a2_id,
        a2_iu1=a2_iu1, a2_iu2=a2_iu2,
        b1=b1, b2=b2, b=b,
    )


# ---------------------------------------------------------------------------
# Operator application (explicit multiplies) — all fused elementwise code.
# ---------------------------------------------------------------------------

def a0_multiply(ops: HestonOperators, u: Array) -> Array:
    """A0 U = c .* Dv(Ds(U)) — equals the reference 9-point stencil
    (ref: src/hes_mat_fac.hpp:90-120, src/hes_a0_kernels.hpp:57-94)."""
    ds = (
        ops.bs_wm * shift(u, -1, -1)
        + ops.bs_w0 * u
        + ops.bs_wp * shift(u, +1, -1)
    )
    dv = (
        ops.bv_wm[:, None] * shift(ds, -1, -2)
        + ops.bv_w0[:, None] * ds
        + ops.bv_wp[:, None] * shift(ds, +1, -2)
    )
    return ops.a0_c * dv


def a1_multiply(ops: HestonOperators, u: Array) -> Array:
    """Tridiagonal multiply along s (ref: src/hes_a1_kernels.hpp:109-135)."""
    return (
        ops.a1_ml * shift(u, -1, -1)
        + ops.a1_md * u
        + ops.a1_mu * shift(u, +1, -1)
    )


def a2_multiply(ops: HestonOperators, u: Array) -> Array:
    """Pentadiagonal multiply along v
    (ref: src/hes_a2_shuffled_kernels.hpp:178-239)."""
    c = lambda band: band[:, None]
    return (
        c(ops.a2_l2) * shift(u, -2, -2)
        + c(ops.a2_l1) * shift(u, -1, -2)
        + c(ops.a2_d) * u
        + c(ops.a2_u1) * shift(u, +1, -2)
        + c(ops.a2_u2) * shift(u, +2, -2)
    )
