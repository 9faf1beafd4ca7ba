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


@functools.partial(
    jax.jit, static_argnames=("spec", "solver", "american", "dividends",
                              "option_type"))
def price_and_greeks(
    spec: GridSpec,
    solver: SolverConfig,
    strike,
    s0,
    kappa, eta, sigma, rho, v0, r_d, r_f,
    american: bool = False,
    dividends: Optional[DividendSchedule] = None,
    option_type: str = "call",
) -> Dict[str, jax.Array]:
    """Price + (delta, vega_v0, and the five model-parameter sensitivities)
    for one option via forward-mode AD.

    With solver_engine="pallas" the five parameter sensitivities come
    from the fused kernel's forward-mode variant (one launch,
    fused_do.fused_theta_jacobian); delta needs s-grid-motion tangents
    (the spot moves the grid itself) that the kernel does not carry, so
    its single tangent runs through the XLA path."""
    dtype = jnp.result_type(float)

    if solver.solver_engine == "pallas":
        from heston_tpu.pallas import fused_do

        if fused_do.use_fused(spec, solver, n_tangents=5):
            import dataclasses

            tv = jnp.stack([jnp.asarray(v, dtype)
                            for v in (kappa, eta, sigma, rho, v0)])
            base, jac = fused_do.fused_theta_jacobian(
                spec, solver, jnp.asarray(strike, dtype)[None], s0, tv,
                r_d, r_f, american=american, dividends=dividends,
                option_type=option_type)

            xla_solver = dataclasses.replace(solver, solver_engine="scan")

            def price_s0(s):
                return douglas.price_option(
                    spec, xla_solver, strike, s, kappa, eta, sigma, rho,
                    v0, r_d, r_f, american=american, dividends=dividends,
                    option_type=option_type)

            _, delta = jax.jvp(price_s0, (jnp.asarray(s0, dtype),),
                               (jnp.ones((), dtype),))
            return {
                "price": base[0],
                "delta": delta,
                "d_kappa": jac[0, 0],
                "d_eta": jac[0, 1],
                "d_sigma": jac[0, 2],
                "d_rho": jac[0, 3],
                "vega_v0": jac[0, 4],
            }

    def price_fn(x):
        s0_, kappa_, eta_, sigma_, rho_, v0_ = x
        return douglas.price_option(
            spec, solver, strike, s0_, kappa_, eta_, sigma_, rho_, v0_,
            r_d, r_f, american=american, dividends=dividends,
            option_type=option_type)

    x = jnp.stack([jnp.asarray(v, dtype)
                   for v in (s0, kappa, eta, sigma, rho, v0)])
    price, jvp_fn = jax.linearize(price_fn, x)
    grads = jax.vmap(jvp_fn)(jnp.eye(6, dtype=x.dtype))
    return {
        "price": price,
        "delta": grads[0],
        "d_kappa": grads[1],
        "d_eta": grads[2],
        "d_sigma": grads[3],
        "d_rho": grads[4],
        "vega_v0": grads[5],
    }
