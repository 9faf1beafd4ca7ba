"""Headline benchmark: 500 American options with discrete dividends, batched.

Reference baseline: 0.02 s for the same batch on an NVIDIA A100
(ref: README.md:16; sweep definition ref: src/perfomance_test.cpp:50-54 —
m1=50, m2=25, N=20, 10 timed runs). vs_baseline > 1 means faster than the
A100 number.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Env knobs:
  HESTON_BENCH_DTYPE   float32 (default) | float64
  HESTON_BENCH_BATCH   batch size (default 500)
  HESTON_BENCH_ENGINE  pallas (default) | scan | pcr
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_SECONDS = 0.02  # A100 (ref: README.md:16)


def main():
    dtype_name = os.environ.get("HESTON_BENCH_DTYPE", "float32")
    batch = int(os.environ.get("HESTON_BENCH_BATCH", "500"))
    engine = os.environ.get("HESTON_BENCH_ENGINE", "pallas")
    if dtype_name == "float64":
        jax.config.update("jax_enable_x64", True)

    from heston_tpu.config import (
        GOLDEN_DIVIDENDS,
        GridSpec,
        HestonParams,
        SolverConfig,
    )
    from heston_tpu.models import douglas
    from heston_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    dev = jax.devices()[0]
    p = HestonParams()
    spec = GridSpec(m1=50, m2=25)
    solver = SolverConfig(n_steps=20, theta=0.8, maturity=1.0,
                          a2_variant="upwind", solver_engine=engine)
    dtype = jnp.float64 if dtype_name == "float64" else jnp.float32
    strikes = jnp.linspace(70.0, 130.0, batch, dtype=dtype)

    # NOTE: keep the jitted callable's HLO stable across bench.py edits
    # (argument-passing form, no baked-in constants) so the compilation
    # cache keeps hitting.
    def make_priced(eng):
        if eng == "pallas":
            from heston_tpu.pallas import fused_do

            return jax.jit(lambda ks: fused_do.fused_price_batch(
                spec, solver, ks, 100.0, p.kappa, p.eta, p.sigma, p.rho,
                p.v0, p.r_d, p.r_f,
                american=True, dividends=GOLDEN_DIVIDENDS,
            ))
        return jax.jit(lambda ks: douglas.price_batch(
            spec, solver, ks, 100.0, p.kappa, p.eta, p.sigma,
            p.rho, p.v0, p.r_d, p.r_f,
            american=True, dividends=GOLDEN_DIVIDENDS,
        ))

    priced = make_priced(engine)

    def run():
        return priced(strikes)

    # compile + sanity (np.array forces a real device->host fetch; plain
    # block_until_ready does not synchronize through the axon tunnel).
    # If the pallas engine fails to compile/run in this environment, fall
    # back to the XLA path rather than producing no benchmark at all.
    try:
        out = np.array(run())
    except Exception as exc:  # pragma: no cover - environment safety net
        if engine != "pallas":
            raise
        print(f"# pallas engine failed ({type(exc).__name__}); "
              "falling back to scan", flush=True)
        engine = "scan-fallback"
        priced = make_priced("scan")
        out = np.array(run())
    assert np.all(np.isfinite(out)), "non-finite prices"

    # Amortized device throughput: enqueue R batches back-to-back and fetch
    # the last — the per-batch device time, excluding the tunnel's ~35 ms
    # RPC round-trip. This mirrors the reference benchmark's
    # total_runtime / runs CSV methodology (ref: src/perfomance_test.cpp:214).
    # 50 reps per sample: the tunnel's ~35 ms RPC for the final fetch
    # amortizes to <1 ms; the reference methodology likewise times fenced
    # device runs without per-run host transfers.
    reps = 50
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [run() for _ in range(reps)]
        np.array(outs[-1])
        samples.append((time.perf_counter() - t0) / reps)
    value = float(np.median(samples))

    extras = {}
    if engine == "pallas" and os.environ.get(
            "HESTON_BENCH_SELFTEST", "1") != "0":
        extras.update(_selftest(spec, solver, p, dtype))
        extras.update(_single_option_golden_grid(p, dtype))

    print(json.dumps({
        "metric": f"american_dividend_batch{batch}_m1_50_m2_25_N20_"
                  f"{dtype_name}_{engine}_{dev.platform}",
        "value": value,
        "unit": "s",
        "vs_baseline": BASELINE_SECONDS / value,
        **extras,
    }))
    return 0


def _selftest(spec, solver, p, dtype):
    """On-chip fused-vs-XLA cross-check for all four solver variants.

    Interpret-mode CPU tests have missed a real-TPU crash mode here once
    (HBM-DMA variant, round 1) — this runs the actual Mosaic kernel on the
    actual chip and reports the max RMSE across variants in the bench
    JSON line."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from heston_tpu.config import GOLDEN_DIVIDENDS
    from heston_tpu.models import douglas
    from heston_tpu.pallas import fused_do

    xla_solver = dataclasses.replace(solver, solver_engine="scan")
    ks = jnp.linspace(75.0, 125.0, 64, dtype=dtype)
    rmses = {}
    for tag, kw in [
        ("euro", {}),
        ("amer", dict(american=True)),
        ("div", dict(dividends=GOLDEN_DIVIDENDS)),
        ("amer_div", dict(american=True, dividends=GOLDEN_DIVIDENDS)),
    ]:
        fused = np.array(jax.jit(lambda k, kw=kw: fused_do.fused_price_batch(
            spec, solver, k, 100.0, p.kappa, p.eta, p.sigma, p.rho,
            p.v0, p.r_d, p.r_f, **kw))(ks))
        want = np.array(jax.jit(lambda k, kw=kw: douglas.price_batch(
            spec, xla_solver, k, 100.0, p.kappa, p.eta, p.sigma, p.rho,
            p.v0, p.r_d, p.r_f, **kw))(ks))
        rmses[tag] = float(np.sqrt(np.mean((fused - want) ** 2)))
    return {
        "selftest_rmse": rmses,
        "selftest_rmse_max": max(rmses.values()),
    }


def _single_option_golden_grid(p, dtype):
    """Single-option latency at the reference's golden/headline config
    m1=100, m2=75, N=20 (ref: src/solver.cpp:348; A100: 0.003 s,
    ref README.md:14) — runs the fused kernel since round 2."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from heston_tpu.config import GridSpec, SolverConfig
    from heston_tpu.models import douglas

    spec = GridSpec(m1=100, m2=75)
    solver = SolverConfig(n_steps=20, theta=0.8, maturity=1.0,
                          a2_variant="central", solver_engine="pallas")
    ks = jnp.array([100.0], dtype=dtype)
    fn = jax.jit(lambda k: douglas.price_batch(
        spec, solver, k, 100.0, p.kappa, p.eta, p.sigma, p.rho,
        p.v0, p.r_d, p.r_f))
    np.array(fn(ks))  # compile
    reps = 20
    t0 = time.perf_counter()
    outs = [fn(ks) for _ in range(reps)]
    np.array(outs[-1])
    dt = (time.perf_counter() - t0) / reps
    return {
        "single_option_100x75_s": dt,
        "single_option_vs_a100": 0.003 / dt,
    }


if __name__ == "__main__":
    sys.exit(main())
