"""Semi-analytic Heston pricing via the characteristic function.

The reference validates against Monte-Carlo and stored prototype values
only (ref: src/MC_hes.cpp, src/solver.cpp:399). This module adds the
standard closed-form benchmark: the Heston (1993) price computed with the
Albrecher et al. "little Heston trap" characteristic function and
Gauss–Legendre quadrature of the two risk-neutral probabilities. Fully
jax-traceable (complex64/128), vmappable over strikes — an independent
oracle for the PDE solver's converged prices.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from heston_tpu.ops.operators import is_digital, is_put

Array = jnp.ndarray


@functools.lru_cache(maxsize=None)
def _gl_nodes(n: int, u_max: float):
    """Gauss-Legendre nodes/weights on (0, u_max) (host-side, cached)."""
    x, w = np.polynomial.legendre.leggauss(n)
    return (0.5 * u_max * (x + 1.0)), (0.5 * u_max * w)


def _cf(phi, t, s0, v0, kappa, eta, sigma, rho, r):
    """'Little trap' Heston characteristic function of log(S_t)."""
    a = kappa * eta
    b = kappa
    d = jnp.sqrt((rho * sigma * 1j * phi - b) ** 2
                 + sigma**2 * (1j * phi + phi**2))
    g = (b - rho * sigma * 1j * phi - d) / (b - rho * sigma * 1j * phi + d)
    exp_dt = jnp.exp(-d * t)
    cc = (1j * phi * r * t
          + a / sigma**2 * (
              (b - rho * sigma * 1j * phi - d) * t
              - 2.0 * jnp.log((1.0 - g * exp_dt) / (1.0 - g))))
    dd = ((b - rho * sigma * 1j * phi - d) / sigma**2
          * (1.0 - exp_dt) / (1.0 - g * exp_dt))
    return jnp.exp(cc + dd * v0 + 1j * phi * jnp.log(s0))


def call_price(
    s0, strike, v0, kappa, eta, sigma, rho, r, t,
    n_quad: int = 256, u_max: float = 200.0,
) -> Array:
    """European call under Heston: S0*P1 - K*exp(-rT)*P2."""
    u, w = _gl_nodes(n_quad, u_max)
    u = jnp.asarray(u)
    w = jnp.asarray(w)
    k_log = jnp.log(jnp.asarray(strike, jnp.result_type(float)))

    cf2 = _cf(u, t, s0, v0, kappa, eta, sigma, rho, r)
    cf1 = (_cf(u - 1j, t, s0, v0, kappa, eta, sigma, rho, r)
           / _cf(-1j * jnp.ones_like(u), t, s0, v0, kappa, eta, sigma,
                 rho, r))

    integ1 = jnp.real(jnp.exp(-1j * u * k_log) * cf1 / (1j * u))
    integ2 = jnp.real(jnp.exp(-1j * u * k_log) * cf2 / (1j * u))
    p1 = 0.5 + (w @ integ1) / jnp.pi
    p2 = 0.5 + (w @ integ2) / jnp.pi
    return s0 * p1 - strike * jnp.exp(-r * t) * p2


def put_price(
    s0, strike, v0, kappa, eta, sigma, rho, r, t,
    n_quad: int = 256, u_max: float = 200.0,
) -> Array:
    """European put via put-call parity (exact for European exercise):
    P = C - S0 + K*exp(-rT). Oracle for the PDE put extension (the
    reference prices calls only)."""
    c = call_price(s0, strike, v0, kappa, eta, sigma, rho, r, t,
                   n_quad=n_quad, u_max=u_max)
    return c - s0 + strike * jnp.exp(-r * t)


def digital_price(
    s0, strike, v0, kappa, eta, sigma, rho, r, t,
    n_quad: int = 256, u_max: float = 200.0,
    option_type: str = "digital_call",
) -> Array:
    """European cash-or-nothing digital under Heston (framework
    extension; the reference prices vanilla calls only): the digital
    call paying 1{S_T > K} is e^{-rT} * P2 — the SAME risk-neutral
    exercise probability P2 as the vanilla decomposition
    S0*P1 - K*e^{-rT}*P2; the digital put is e^{-rT} * (1 - P2)."""
    u, w = _gl_nodes(n_quad, u_max)
    u = jnp.asarray(u)
    w = jnp.asarray(w)
    k_log = jnp.log(jnp.asarray(strike, jnp.result_type(float)))
    cf2 = _cf(u, t, s0, v0, kappa, eta, sigma, rho, r)
    integ2 = jnp.real(jnp.exp(-1j * u * k_log) * cf2 / (1j * u))
    p2 = 0.5 + (w @ integ2) / jnp.pi
    if is_put(option_type):
        p2 = 1.0 - p2
    return jnp.exp(-r * t) * p2


def price_chain(s0, strikes: Array, v0, kappa, eta, sigma, rho, r, t,
                n_quad: int = 256, option_type: str = "call") -> Array:
    """Vmapped semi-analytic chain pricing (vanillas and digitals)."""
    if is_digital(option_type):
        base = functools.partial(digital_price, option_type=option_type)
    elif is_put(option_type):
        base = put_price
    else:
        base = call_price
    fn = lambda k: base(s0, k, v0, kappa, eta, sigma, rho, r, t,
                        n_quad=n_quad)
    return jax.vmap(fn)(strikes)
