"""Multi-chip walkthrough: shard an option book over a device mesh,
run whole-book risk, and calibrate a mixed-maturity chain with the
fully-distributed LM driver.

By default the script self-provisions 8 virtual CPU devices so the
sharding semantics (and the collective layout) are identical to a real
pod slice without touching an accelerator — and without hanging when a
TPU plugin's backend is unreachable (this machine's axon tunnel hangs
backend init inside a C call when down, docs/DESIGN.md §5.8). Set
HESTON_EXAMPLE_BACKEND=tpu to span the real chips instead.

    python examples/distributed.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# must happen before jax initializes its backends
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax

if os.environ.get("HESTON_EXAMPLE_BACKEND", "cpu") != "tpu":
    # in-process config, not the JAX_PLATFORMS env var — the env route
    # still initializes (and can hang on) an unreachable TPU plugin
    jax.config.update("jax_platforms", "cpu")

if jax.default_backend() == "cpu":
    jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

from heston_tpu import GridSpec, HestonParams, SolverConfig
from heston_tpu.config import CalibrationConfig, GOLDEN_DIVIDENDS
from heston_tpu.models import bs
from heston_tpu.parallel import (
    batch_greeks_sharded,
    calibrate_sharded,
    make_mesh,
    price_batch_sharded,
)


def main():
    params = HestonParams()
    spec = GridSpec(m1=30, m2=15)
    solver = SolverConfig(n_steps=10, theta=0.8, maturity=1.0,
                          a2_variant="upwind", solver_engine="pallas")
    mesh = make_mesh()          # 1-D mesh over every visible device
    print(f"mesh: {mesh.devices.size} devices "
          f"({mesh.devices.flat[0].platform})")
    tv = jnp.array(params.bumpable())

    # --- 1. sharded pricing: each chip prices its shard, zero
    # communication (the TPU-native form of one-team-per-option) -------
    book = jnp.linspace(70.0, 130.0, 24)
    prices = price_batch_sharded(
        mesh, spec, solver, book, 100.0, tv, params.r_d, params.r_f,
        american=True, dividends=GOLDEN_DIVIDENDS)
    print("sharded book prices:", np.round(np.asarray(prices[:6]), 4), "...")

    # --- 2. sharded whole-book risk, MIXED maturities in one per-lane
    # launch per shard ---------------------------------------------------
    groups = ((0, 12, 5), (12, 24, 10))     # T=0.5 and T=1.0 halves
    risk = batch_greeks_sharded(
        mesh, spec, solver, book, 100.0, tv, params.r_d, params.r_f,
        american=True, group_steps=groups)
    print("mixed-book delta:", np.round(np.asarray(risk["delta"][:6]), 4),
          "...")

    # --- 3. fully-distributed mixed-maturity calibration: the chain
    # stays sharded for every Jacobian pass (one forward-mode launch per
    # shard) and every trial pricing; JtJ/Jtr reduce over ICI ------------
    market = jnp.concatenate([
        bs.generate_market_data(100.0, 0.5, params.r_d, book[:12]),
        bs.generate_market_data(100.0, 1.0, params.r_d, book[12:]),
    ])
    tv_fit, info = calibrate_sharded(
        mesh, spec, solver, book, market, 100.0,
        jnp.array([1.0, 0.05, 0.4, -0.5, 0.05]), params.r_d, params.r_f,
        cfg=CalibrationConfig(max_iter=5, tol=1e-8, jacobian_mode="ad"),
        group_steps=groups)
    print(f"calibrated in {info['iterations']} iterations, "
          f"sse={info['final_error']:.4e}:",
          np.round(np.asarray(tv_fit), 4))


if __name__ == "__main__":
    main()
