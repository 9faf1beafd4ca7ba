"""A/B the dividend-remap comp handling on-chip (round-5 bisect).
Run: python scripts/perf_ab.py  — times euro+div4 and amer+div4 with
HESTON_AB_NOFOLD toggled (kernel rebuilt per setting via lru_cache keying
on nothing env-related, so each setting runs in its own subprocess).
"""
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys, json
sys.path.insert(0, %r)
import jax, jax.numpy as jnp, numpy as np
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
strikes = jnp.linspace(70.0, 130.0, 500, dtype=jnp.float32)
out = {}
for label, amer in (("euro_div", False), ("amer_div", True)):
    fn = lambda ks: fused_do.fused_price_batch(
        spec, solver, ks, 100.0, p.kappa, p.eta, p.sigma, p.rho,
        p.v0, p.r_d, p.r_f, american=amer, dividends=GOLDEN_DIVIDENDS)
    np.array(jax.jit(fn)(strikes))
    out[label] = timed_scan(fn, strikes, reps=500, samples=3)
print("@@RESULT " + json.dumps(out))
""" % (ROOT,)

if __name__ == "__main__":
    for name, env in (("fold", {}), ("nofold", {"HESTON_AB_NOFOLD": "1"})):
        e = dict(os.environ, **env)
        r = subprocess.run([sys.executable, "-c", CHILD], env=e,
                           capture_output=True, text=True, timeout=560)
        line = [l for l in r.stdout.splitlines()
                if l.startswith("@@RESULT")]
        if not line:
            print(name, "FAILED", r.stdout[-500:], r.stderr[-500:])
            continue
        res = json.loads(line[0][len("@@RESULT "):])
        print(f"{name:8s} " + "  ".join(
            f"{k}={v*1e3:.4f}ms" for k, v in res.items()))
