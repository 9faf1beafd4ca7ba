"""On-chip decomposition probe for the batch500 headline (round-5 perf
bisect, VERDICT r4 #1): times the fused launch under feature subsets to
attribute the 0.80 -> 1.04 ms regression. Run: python scripts/perf_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from heston_tpu.config import (GOLDEN_DIVIDENDS, GridSpec, HestonParams,
                               SolverConfig)
from heston_tpu.pallas import fused_do
from heston_tpu.benchmarks import timed_scan
from heston_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

p = HestonParams()
spec = GridSpec(m1=50, m2=25)
solver = SolverConfig(n_steps=20, theta=0.8, maturity=1.0,
                      a2_variant="upwind", solver_engine="pallas")
batch = 500
strikes = jnp.linspace(70.0, 130.0, batch, dtype=jnp.float32)


def run(label, american, dividends):
    fn = lambda ks: fused_do.fused_price_batch(
        spec, solver, ks, 100.0, p.kappa, p.eta, p.sigma, p.rho,
        p.v0, p.r_d, p.r_f, american=american, dividends=dividends)
    out = np.array(jax.jit(fn)(strikes))
    assert np.all(np.isfinite(out))
    t = timed_scan(fn, strikes, reps=500, samples=3)
    print(f"{label:28s} {t*1e3:8.4f} ms")
    return t


if __name__ == "__main__":
    t0 = time.time()
    full = run("amer+div4 (headline)", True, GOLDEN_DIVIDENDS)
    amer = run("amer, no div", True, None)
    euro_div = run("euro+div4", False, GOLDEN_DIVIDENDS)
    euro = run("euro, no div", False, None)
    print(f"remap cost (amer): {(full-amer)*1e3:.4f} ms "
          f"({(full-amer)/full*100:.1f}% of headline)")
    print(f"remap cost (euro): {(euro_div-euro)*1e3:.4f} ms")
    print(f"american projection cost: {(amer-euro)*1e3:.4f} ms")
    print(f"total probe wall: {time.time()-t0:.1f}s")
