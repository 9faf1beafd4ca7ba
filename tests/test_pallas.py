"""Fused Pallas kernel correctness (interpret mode on CPU).

The real-TPU timing/cross-check runs in bench.py; here the kernel logic is
verified against the XLA path in interpret mode on a small configuration.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heston_tpu.config import GOLDEN_DIVIDENDS, GridSpec, SolverConfig
from heston_tpu.models import douglas
from heston_tpu.pallas import fused_do

SPEC = GridSpec(m1=10, m2=8)
SOLVER = SolverConfig(n_steps=4, a2_variant="upwind")


@pytest.mark.parametrize("kw", [
    dict(),
    dict(american=True),
    dict(american=True, dividends=GOLDEN_DIVIDENDS),
])
def test_fused_kernel_matches_xla(params, kw):
    p = params
    ks = jnp.linspace(80.0, 120.0, 6, dtype=jnp.float32)
    args32 = tuple(jnp.float32(a) for a in (
        100.0, p.kappa, p.eta, p.sigma, p.rho, p.v0, p.r_d, p.r_f))
    want = np.array(douglas.price_batch(SPEC, SOLVER, ks, *args32, **kw))
    got = np.array(jax.jit(
        lambda k: fused_do.fused_price_batch(
            SPEC, SOLVER, k, 100.0, p.kappa, p.eta, p.sigma, p.rho, p.v0,
            p.r_d, p.r_f, interpret=True, **kw))(ks))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-4)
