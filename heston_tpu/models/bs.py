"""Black–Scholes closed-form oracle + implied-vol inversion.

JAX re-design of the reference's BlackScholes helper (ref: src/bs.hpp):
closed-form call via erfc (ref: src/bs.hpp:44-54), vega
(ref: src/bs.hpp:124-127), synthetic market-data generation at flat vol 0.2
(ref: src/bs.hpp:57-114), and implied vol via Newton with bisection fallback
(ref: src/bs.hpp:131-192) — here as `lax.while_loop`s so the whole inversion
is jit/vmap-able over an option chain.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from heston_tpu.ops.operators import is_digital, is_put  # validated

Array = jnp.ndarray

MARKET_VOL = 0.2  # flat vol used for synthetic chains (ref: src/bs.hpp:65)


def call_price(s, k, r, vol, t) -> Array:
    """European call, erfc form (ref: src/bs.hpp:44-54)."""
    sqrt_t = jnp.sqrt(t)
    d1 = (jnp.log(s / k) + (r + 0.5 * vol * vol) * t) / (vol * sqrt_t)
    d2 = d1 - vol * sqrt_t
    inv_sqrt2 = 1.0 / jnp.sqrt(2.0)
    return (
        s * jax.scipy.special.erfc(-d1 * inv_sqrt2) / 2.0
        - k * jnp.exp(-r * t) * jax.scipy.special.erfc(-d2 * inv_sqrt2) / 2.0
    )


def put_price(s, k, r, vol, t) -> Array:
    """European put via put-call parity (framework extension — the
    reference is calls-only; oracle for the PDE put support)."""
    return call_price(s, k, r, vol, t) - s + k * jnp.exp(-r * t)


def call_vega(s, k, r, vol, t) -> Array:
    """dPrice/dVol (ref: src/bs.hpp:124-127)."""
    d1 = (jnp.log(s / k) + (r + 0.5 * vol * vol) * t) / (vol * jnp.sqrt(t))
    return s * jnp.exp(-0.5 * d1 * d1) * jnp.sqrt(t / (2.0 * jnp.pi))


def digital_price(s, k, r, vol, t,
                  option_type: str = "digital_call") -> Array:
    """European cash-or-nothing digital (framework extension):
    call = e^{-rT} N(d2), put = e^{-rT} N(-d2) — the BS-limit oracle
    for the PDE digital support."""
    sqrt_t = jnp.sqrt(t)
    d1 = (jnp.log(s / k) + (r + 0.5 * vol * vol) * t) / (vol * sqrt_t)
    d2 = d1 - vol * sqrt_t
    inv_sqrt2 = 1.0 / jnp.sqrt(2.0)
    n_d2 = jax.scipy.special.erfc(-d2 * inv_sqrt2) / 2.0   # N(d2)
    prob = 1.0 - n_d2 if is_put(option_type) else n_d2
    return jnp.exp(-r * t) * prob


def _price_fn(option_type: str):
    """Closed-form dispatch over the four payoff kinds."""
    if is_digital(option_type):
        import functools

        return functools.partial(digital_price, option_type=option_type)
    return put_price if is_put(option_type) else call_price


def put_to_call_parity(p, s, k, r, t) -> Array:
    """European put price -> parity-equivalent call price
    C = P + S - K e^{-rT} (exact for European exercise; lets the
    call-based implied-vol inversion serve put chains)."""
    return p + s - k * jnp.exp(-r * t)


def generate_market_data(s0, t, r_d, strikes: Array, vol=MARKET_VOL,
                         option_type: str = "call") -> Array:
    """Synthetic market chain at flat vol (ref: src/bs.hpp:57-76).
    option_type="put" is a framework extension (the reference is
    calls-only)."""
    fn = put_price if is_put(option_type) else call_price
    return fn(s0, strikes, r_d, vol, t)


def escrowed_spot(s0, t, r_d, dates, amounts, percentages):
    """Escrowed-dividend spot adjustment: s0 minus the PV of cash dividends
    and of s0*pct proportional dividends paid before maturity
    (ref: src/bs.hpp:93-104; the reference's dividend calibrations feed
    exactly this adjusted spot to its implied-vol inversion,
    ref: src/heston_calibration.cpp:1500-1529)."""
    s_adj = s0
    for date, amt, pct in zip(dates, amounts, percentages):
        if date < t:
            s_adj = s_adj - amt * jnp.exp(-r_d * date)
            s_adj = s_adj - (s0 * pct) * jnp.exp(-r_d * date)
    return s_adj


def generate_market_data_with_dividends(
    s0, t, r_d, strikes: Array, dates, amounts, percentages, vol=MARKET_VOL,
    option_type: str = "call",
) -> Array:
    """Escrowed-dividend-adjusted synthetic chain (ref: src/bs.hpp:78-114):
    spot reduced by PV of cash dividends and by s0*pct discounted."""
    fn = put_price if is_put(option_type) else call_price
    return fn(escrowed_spot(s0, t, r_d, dates, amounts, percentages),
              strikes, r_d, vol, t)


def implied_vol(
    price_target,
    s,
    k,
    r,
    t,
    v_init=0.5,
    epsilon=1e-8,
    max_newton: int = 100,
    max_bisect: int = 200,
) -> Array:
    """Implied vol: Newton iteration with bisection fallback
    (ref: src/bs.hpp:164-192 reverse_BS / reverse_BS_dic), as bounded
    while_loops (jit/vmap-safe)."""
    dtype = jnp.result_type(float)
    price_target = jnp.asarray(price_target, dtype)

    def newton_cond(state):
        x, it, fail = state
        c = call_price(s, k, r, x, t)
        return (jnp.abs(c - price_target) > epsilon) & (it < max_newton) & ~fail

    def newton_body(state):
        x, it, _ = state
        c = call_price(s, k, r, x, t)
        v = call_vega(s, k, r, x, t)
        fail = jnp.abs(v) < 1e-10
        x_new = jnp.where(fail, x, x - (c - price_target) / v)
        # guard against divergence into non-positive vols
        fail = fail | (x_new <= 0.0) | ~jnp.isfinite(x_new)
        return (jnp.where(fail, x, x_new), it + 1, fail)

    x0 = jnp.asarray(v_init, dtype)
    x, it, fail = lax.while_loop(
        newton_cond, newton_body, (x0, jnp.int32(0), jnp.bool_(False))
    )
    fail = fail | (it >= max_newton)

    def bisect_cond(state):
        a, b, x, it = state
        c = call_price(s, k, r, x, t)
        return (jnp.abs(c - price_target) > epsilon) & (it < max_bisect)

    def bisect_body(state):
        a, b, x, it = state
        c = call_price(s, k, r, x, t)
        hi = c > price_target
        a_new = jnp.where(hi, a, x)
        b_new = jnp.where(hi, x, b)
        return (a_new, b_new, 0.5 * (a_new + b_new), it + 1)

    a0 = jnp.asarray(0.001, dtype)
    b0 = jnp.asarray(1.0, dtype)
    _, _, x_bis, _ = lax.while_loop(
        bisect_cond, bisect_body, (a0, b0, 0.5 * (a0 + b0), jnp.int32(0))
    )
    return jnp.where(fail, x_bis, x)


implied_vol_chain = jax.jit(
    jax.vmap(implied_vol, in_axes=(0, None, 0, None, None))
)
