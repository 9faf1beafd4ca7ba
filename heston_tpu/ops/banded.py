"""Batched tridiagonal / pentadiagonal solvers for the ADI implicit steps.

The reference runs Thomas sweeps sequentially inside one GPU thread per grid
line (ref: src/hes_a1_kernels.hpp:137-161, src/hes_a2_shuffled_kernels.hpp:
241-299). On TPU the equivalent design is:

* FACTOR ONCE, SOLVE MANY: the implicit matrices (I - theta*dt*A) are
  time-independent, so the LU-style coefficient sweeps (`w`/`temp` for
  tridiagonal, `c`/`c2`/`m` for pentadiagonal) are hoisted out of the time
  loop. Each DO step then only runs the rhs forward/backward substitutions.
* The substitutions are first/second-order AFFINE recurrences, offered in
  two engines:
    - "scan":  `lax.scan` along the line, all other axes (option batch x
               grid lines) vectorized into the VPU lanes. Exactly the
               reference's arithmetic order.
    - "pcr":   log-depth parallel prefix via `lax.associative_scan` over
               the affine maps (Blelloch-style), trading ~4x FLOPs for
               O(log n) sequential depth.

Conventions: bands are row-aligned (l1[r] = A[r][r-1], u1[r] = A[r][r+1]...).
Tridiagonal systems solve along the LAST axis (the s direction of
U[..., v, s]); pentadiagonal systems solve along AXIS -2 (the v direction)
with 1-D bands broadcast over the trailing s axis.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

Array = jnp.ndarray


# ---------------------------------------------------------------------------
# Affine recurrence primitives
# ---------------------------------------------------------------------------

def _affine1_scan(a: Array, b: Array) -> Array:
    """s_j = a_j * s_{j-1} + b_j (s_{-1} = 0) via sequential scan over axis 0."""

    def body(carry, ab):
        aj, bj = ab
        s = aj * carry + bj
        return s, s

    init = jnp.zeros_like(b[0])
    _, out = lax.scan(body, init, (a, b))
    return out


def _affine1_pcr(a: Array, b: Array) -> Array:
    """Same recurrence via associative scan (log-depth)."""

    def combine(l, r):
        al, bl = l
        ar, br = r
        return ar * al, ar * bl + br

    _, out = lax.associative_scan(combine, (a, b), axis=0)
    return out


def _affine2_scan(g: Array, h: Array, r: Array) -> Array:
    """d_j = r_j - g_j * d_{j-1} - h_j * d_{j-2} (d_{-1}=d_{-2}=0), scan."""

    def body(carry, ghr):
        d1, d2 = carry
        gj, hj, rj = ghr
        d = rj - gj * d1 - hj * d2
        return (d, d1), d

    z = jnp.zeros_like(r[0])
    _, out = lax.scan(body, (z, z), (g, h, r))
    return out


def _affine2_pcr(g: Array, h: Array, r: Array) -> Array:
    """Second-order affine recurrence via 2x2 affine-map associative scan.

    State y_j = (d_j, d_{j-1}); y_j = M_j y_{j-1} + t_j with
    M_j = [[-g_j, -h_j], [1, 0]], t_j = (r_j, 0).
    """
    # g/h may be broadcastable against r (1-D bands vs 2-D rhs slices);
    # associative_scan needs uniform leaf shapes.
    g = jnp.broadcast_to(g, r.shape)
    h = jnp.broadcast_to(h, r.shape)
    zeros = jnp.zeros_like(r)
    ones = jnp.ones_like(r)
    m11, m12 = -g, -h
    m21, m22 = ones, zeros
    t1, t2 = r, zeros

    def combine(l, r_):
        a11, a12, a21, a22, u1, u2 = l
        b11, b12, b21, b22, v1, v2 = r_
        # compose: (B, v) o (A, u) = (B A, B u + v)
        c11 = b11 * a11 + b12 * a21
        c12 = b11 * a12 + b12 * a22
        c21 = b21 * a11 + b22 * a21
        c22 = b21 * a12 + b22 * a22
        w1 = b11 * u1 + b12 * u2 + v1
        w2 = b21 * u1 + b22 * u2 + v2
        return c11, c12, c21, c22, w1, w2

    res = lax.associative_scan(combine, (m11, m12, m21, m22, t1, t2), axis=0)
    return res[4]


def _check_engine(engine):
    if engine not in ("scan", "pcr"):
        raise ValueError(
            f"unknown banded-solver engine {engine!r}; 'pallas' is handled "
            "at the price_batch level, not inside the banded solvers")


def _affine1(a, b, engine):
    _check_engine(engine)
    return _affine1_pcr(a, b) if engine == "pcr" else _affine1_scan(a, b)


def _affine2(g, h, r, engine):
    _check_engine(engine)
    return _affine2_pcr(g, h, r) if engine == "pcr" else _affine2_scan(g, h, r)


def _flip(x):
    return jnp.flip(x, axis=0)


# ---------------------------------------------------------------------------
# Tridiagonal (A1, along the last axis)
# ---------------------------------------------------------------------------

class TridiagFactor(NamedTuple):
    """Precomputed Thomas forward coefficients.

    w[i] = ml[i] / temp[i-1]; temp[i] = md[i] - w[i] * mu[i-1]
    (ref: src/hes_a1_kernels.hpp:145-151) plus the backward-substitution
    affine coefficients alpha = -mu/temp, and 1/temp."""

    w: Array
    inv_temp: Array
    alpha_back: Array   # -mu / temp


def tridiag_factor(ml: Array, md: Array, mu: Array) -> TridiagFactor:
    """Factor I-theta*dt*A1 bands (row-aligned, ml[...,0] must be 0)."""
    ml_t = jnp.moveaxis(ml, -1, 0)
    md_t = jnp.moveaxis(md, -1, 0)
    mu_t = jnp.moveaxis(mu, -1, 0)

    def body(temp_prev_and_mu_prev, bands):
        temp_prev, mu_prev = temp_prev_and_mu_prev
        mli, mdi, mui = bands
        w = mli / temp_prev
        temp = mdi - w * mu_prev
        return (temp, mui), (w, temp)

    init = (jnp.ones_like(md_t[0]), jnp.zeros_like(md_t[0]))
    _, (w_t, temp_t) = lax.scan(body, init, (ml_t, md_t, mu_t))
    inv_temp_t = 1.0 / temp_t
    alpha_t = -mu_t * inv_temp_t
    back = lambda x: jnp.moveaxis(x, 0, -1)
    return TridiagFactor(back(w_t), back(inv_temp_t), back(alpha_t))


def tridiag_solve(fac: TridiagFactor, rhs: Array, engine: str = "scan") -> Array:
    """Solve along the last axis given a factorization.

    Forward:  d_i = rhs_i - w_i d_{i-1}
    Backward: x_i = (d_i - mu_i x_{i+1}) / temp_i
    (ref: src/hes_a1_kernels.hpp:141-160, identical arithmetic for "scan")."""
    w_t = jnp.moveaxis(fac.w, -1, 0)
    rhs_t = jnp.moveaxis(rhs, -1, 0)
    d_t = _affine1(-w_t, rhs_t, engine)

    inv_temp_t = jnp.moveaxis(fac.inv_temp, -1, 0)
    alpha_t = jnp.moveaxis(fac.alpha_back, -1, 0)
    x_rev = _affine1(_flip(alpha_t), _flip(d_t * inv_temp_t), engine)
    return jnp.moveaxis(_flip(x_rev), 0, -1)


# ---------------------------------------------------------------------------
# Pentadiagonal (A2, along axis -2, 1-D bands broadcast over s)
# ---------------------------------------------------------------------------

class PentaFactor(NamedTuple):
    """Precomputed pentadiagonal LU-style sweep coefficients.

    Follows the reference recurrence exactly
    (ref: src/hes_a2_shuffled_kernels.hpp:241-299) with
      L_j  = l1_j - l2_j * c_{j-2}
      m_j  = 1 / (d_j - L_j * c_{j-1} - l2_j * c2_{j-2})
      c_j  = (u1_j - L_j * c2_{j-1}) * m_j
      c2_j = u2_j * m_j
    The j = 0, 1 start-up rows emerge from zero-padded carries because
    l1_0 = l2_0 = l2_1 = 0 for row-aligned bands.
    """

    c: Array      # (..., n)
    c2: Array
    gm: Array     # L_j * m_j  (forward rhs coefficient on d_{j-1})
    hm: Array     # l2_j * m_j (forward rhs coefficient on d_{j-2})
    m: Array      # 1 / den


def penta_factor(l2: Array, l1: Array, d: Array, u1: Array, u2: Array) -> PentaFactor:
    """Factor row-aligned pentadiagonal bands (shape (..., n))."""
    args = [jnp.moveaxis(x, -1, 0) for x in (l2, l1, d, u1, u2)]

    def body(carry, bands):
        c1p, c2p, cc1p, cc2p = carry  # c_{j-1}, c_{j-2}, c2_{j-1}, c2_{j-2}
        l2j, l1j, dj, u1j, u2j = bands
        L = l1j - l2j * c2p
        den = dj - L * c1p - l2j * cc2p
        m = 1.0 / den
        c = (u1j - L * cc1p) * m
        c2 = u2j * m
        return (c, c1p, c2, cc1p), (c, c2, L * m, l2j * m, m)

    z = jnp.zeros_like(args[2][0])
    _, outs = lax.scan(body, (z, z, z, z), tuple(args))
    back = lambda x: jnp.moveaxis(x, 0, -1)
    return PentaFactor(*[back(o) for o in outs])


def penta_solve(fac: PentaFactor, rhs: Array, engine: str = "scan") -> Array:
    """Solve along axis -2 of rhs; factor arrays have shape (..., n) and are
    broadcast over the trailing rhs axis.

    Forward:  d'_j = m_j rhs_j - gm_j d'_{j-1} - hm_j d'_{j-2}
    Backward: x_j  = d'_j - c_j x_{j+1} - c2_j x_{j+2}
    (ref: src/hes_a2_shuffled_kernels.hpp:278-296)."""

    def bcast(band):
        # (..., n) -> (n, ..., 1) aligned with rhs slices (n, ..., k)
        return jnp.moveaxis(band, -1, 0)[..., None]

    rhs_t = jnp.moveaxis(rhs, -2, 0)
    m = bcast(fac.m)
    dprime = _affine2(bcast(fac.gm), bcast(fac.hm), m * rhs_t, engine)

    c = bcast(fac.c)
    c2 = bcast(fac.c2)
    x_rev = _affine2(_flip(c), _flip(c2), _flip(dprime), engine)
    return jnp.moveaxis(_flip(x_rev), 0, -2)
