"""float32 vs float64 pricing accuracy.

The reference runs float64 everywhere (CUDA); TPU-native production runs
float32. The BASELINE target is price RMSE < 1e-4 vs reference values —
float32 achieves ~1e-6 on the full scheme."""

import jax
import jax.numpy as jnp
import numpy as np

from heston_tpu.config import GOLDEN_DIVIDENDS, GridSpec, SolverConfig
from heston_tpu.models import douglas


def test_float32_rmse_within_target(params):
    p = params
    spec = GridSpec(m1=50, m2=25)
    solver = SolverConfig(n_steps=20, a2_variant="upwind")
    ks64 = jnp.linspace(70.0, 130.0, 40, dtype=jnp.float64)
    ks32 = ks64.astype(jnp.float32)
    args64 = (p.kappa, p.eta, p.sigma, p.rho, p.v0, p.r_d, p.r_f)
    args32 = tuple(jnp.float32(v) for v in args64)
    for kw in (dict(), dict(american=True, dividends=GOLDEN_DIVIDENDS)):
        p64 = np.array(douglas.price_batch(
            spec, solver, ks64, 100.0, *args64, **kw))
        p32 = np.array(douglas.price_batch(
            spec, solver, ks32, jnp.float32(100.0), *args32, **kw))
        rmse = float(np.sqrt(np.mean((p64 - p32) ** 2)))
        assert rmse < 1e-4, f"f32 rmse {rmse} exceeds target for {kw}"
