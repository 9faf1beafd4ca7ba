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

    import subprocess

    try:
        # watchdog: backend init HANGS inside a C call (not errors) when
        # the axon tunnel is half-down, so an in-process SIGALRM never
        # fires — probe device init in a SUBPROCESS with a hard timeout
        # and convert a hang/failure into the parseable outage line.
        # Costs one extra backend init (~10-20 s healthy) per bench run;
        # HESTON_BENCH_NO_PROBE=1 skips it.
        if os.environ.get("HESTON_BENCH_NO_PROBE", "0") != "1":
            probe = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=600, capture_output=True, text=True)
            if probe.returncode != 0:
                raise RuntimeError(
                    f"device probe failed: {probe.stderr.strip()[-200:]}")
        dev = jax.devices()[0]
    except Exception as exc:  # pragma: no cover - environment safety net
        # the axon TPU tunnel can be down (observed: RuntimeError
        # "Unable to initialize backend 'axon': UNAVAILABLE"); emit ONE
        # parseable JSON line naming the outage instead of producing no
        # artifact at all
        print(json.dumps({
            "metric": f"american_dividend_batch{batch}_m1_50_m2_25_N20_"
                      f"{dtype_name}_{engine}_unavailable",
            "value": None,
            "unit": "s",
            "vs_baseline": None,
            "error": f"backend init failed: "
                     f"{type(exc).__name__}: {exc}"[:300],
        }))
        return 1
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

            return lambda ks: fused_do.fused_price_batch(
                spec, solver, ks, 100.0, p.kappa, p.eta, p.sigma, p.rho,
                p.v0, p.r_d, p.r_f,
                american=True, dividends=GOLDEN_DIVIDENDS,
            )
        return lambda ks: douglas.price_batch(
            spec, solver, ks, 100.0, p.kappa, p.eta, p.sigma,
            p.rho, p.v0, p.r_d, p.r_f,
            american=True, dividends=GOLDEN_DIVIDENDS,
        )

    priced = make_priced(engine)

    # compile + sanity (np.array forces a real device->host fetch; plain
    # block_until_ready does not synchronize through the axon tunnel).
    # If the pallas engine fails to compile/run in this environment, fall
    # back to the XLA path rather than producing no benchmark at all.
    try:
        out = np.array(jax.jit(priced)(strikes))
    except Exception as exc:  # pragma: no cover - environment safety net
        if engine != "pallas":
            raise
        print(f"# pallas engine failed ({type(exc).__name__}); "
              "falling back to scan", flush=True)
        engine = "scan-fallback"
        priced = make_priced("scan")
        out = np.array(jax.jit(priced)(strikes))
    assert np.all(np.isfinite(out)), "non-finite prices"

    value = _device_time_per_call(priced, strikes)

    extras = {"harness_floor_s": _harness_floor(strikes)}
    if engine == "pallas" and os.environ.get(
            "HESTON_BENCH_SELFTEST", "1") != "0":
        # each extras block fails SOFT (error string in the JSON instead
        # of losing the whole artifact): the headline above is already
        # measured, and a regression in one secondary metric must not
        # erase the others
        for name, block in [
            ("selftest", lambda: _selftest(spec, solver, p, dtype)),
            ("single_option", lambda: _single_option_golden_grid(p, dtype)),
            ("schemes", lambda: _scheme_timings(spec, p, batch, dtype)),
            ("lm", lambda: _lm_timing(spec, p, dtype)),
            ("lm_multi", lambda: _lm_multi_timing(spec, p, dtype)),
            ("book_risk", lambda: _book_risk(spec, p, batch, dtype)),
            ("mixed5000", lambda: _throughput_mixed(spec, p, dtype)),
            ("cpu_arm", lambda: _cpu_arm(spec, p, batch, value)),
        ]:
            try:
                extras.update(block())
            except Exception as exc:  # pragma: no cover - safety net
                extras[f"{name}_error"] = f"{type(exc).__name__}: {exc}"[:300]

    print(json.dumps({
        "metric": f"american_dividend_batch{batch}_m1_50_m2_25_N20_"
                  f"{dtype_name}_{engine}_{dev.platform}",
        "value": value,
        "unit": "s",
        "vs_baseline": BASELINE_SECONDS / value,
        **extras,
    }))
    return 0


def _device_time_per_call(fn, example, reps: int = 500, samples: int = 3):
    """Median per-call DEVICE time: the reps are chained inside ONE jitted
    lax.scan (each rep's input depends on the previous rep's output, so
    nothing can be elided or reordered), and the host measures a single
    dispatch + fetch around all of them.

    Why: a single jitted-call dispatch through this machine's axon tunnel
    costs ~1.4 ms of HOST time — timing a Python loop of per-rep calls
    (the round-1 methodology) therefore measures the host, not the chip,
    for anything faster than that. The reference's CSV methodology
    (total_runtime / runs around fenced device runs,
    ref: src/perfomance_test.cpp:214) assumes ~us-scale launch cost; the
    in-graph scan is the honest TPU equivalent.

    Reps sizing: one dispatch+fetch round trip costs a FIXED ~29 ms on
    this tunnel regardless of scan length (measured: floor*reps is
    constant at reps = 50/200/500, and a trivial `x*2` body measures
    29ms/reps exactly), so the floor it adds per rep is 29e-3/reps —
    0.58 ms at the round-2 reps=50 (dominating sub-ms kernels!) vs
    0.058 ms at reps=500. The floor is measured with a trivial body and
    reported alongside (see _harness_floor) rather than subtracted.

    Thin alias of the shared harness heston_tpu.benchmarks.timed_scan
    (one implementation for bench.py and the CSV sweeps)."""
    from heston_tpu.benchmarks import timed_scan

    return timed_scan(fn, example, reps=reps, samples=samples)


def _harness_floor(example, reps: int = 500):
    """Per-rep cost of the timing harness itself (trivial body): the
    fixed ~29 ms dispatch+fetch RPC of this tunnel divided by reps.
    Included in every reported number (NOT subtracted); reported so the
    overstatement is visible."""
    import jax.numpy as jnp

    return _device_time_per_call(lambda x: x * 2.0, example, reps=reps)


def _selftest(spec, solver, p, dtype):
    """On-chip cross-check of the fused kernel against the XLA path run in
    FLOAT64 (the true error of the f32 kernel, not the difference of two
    f32 roundings) for all four solver variants.

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

    ks = np.linspace(75.0, 125.0, 64)
    rmses = {}
    for tag, kw in [
        ("euro", {}),
        ("amer", dict(american=True)),
        ("div", dict(dividends=GOLDEN_DIVIDENDS)),
        ("amer_div", dict(american=True, dividends=GOLDEN_DIVIDENDS)),
        ("put_euro", dict(option_type="put")),
        ("put_amer_div", dict(american=True, dividends=GOLDEN_DIVIDENDS,
                              option_type="put")),
        ("cs", dict(scheme="cs")),
        ("mcs", dict(scheme="mcs")),
        ("hv", dict(scheme="hv")),
        # fused Rannacher window = extra launches of the same kernel at
        # (theta=1, dt/2); interpret-equality is not enough (see
        # docstring) so both the plain and the dividend-chunked damped
        # paths get a real-Mosaic check
        ("rann", dict(rannacher_steps=2)),
        ("rann_amer_div", dict(rannacher_steps=2, american=True,
                               dividends=GOLDEN_DIVIDENDS)),
        # cash-or-nothing digitals (round 3): cell-averaged payoff +
        # injection-free far fields; the American arm certifies the
        # static-pin one-touch scheme on real Mosaic
        ("digital", dict(option_type="digital_call")),
        ("digital_amer", dict(american=True,
                              option_type="digital_call")),
    ]:
        kw = dict(kw)
        rep = {k: kw.pop(k) for k in ("scheme", "rannacher_steps")
               if k in kw}
        sol = dataclasses.replace(solver, **rep) if rep else solver
        xsol = dataclasses.replace(sol, solver_engine="scan")
        fused = np.array(jax.jit(lambda k, kw=kw, sol=sol:
                                 fused_do.fused_price_batch(
            spec, sol, k, 100.0, p.kappa, p.eta, p.sigma, p.rho,
            p.v0, p.r_d, p.r_f, **kw))(jnp.asarray(ks, dtype)))
        with jax.enable_x64():
            want = np.array(jax.jit(
                lambda k, kw=kw, xsol=xsol: douglas.price_batch(
                    spec, xsol, k, 100.0, p.kappa, p.eta, p.sigma,
                    p.rho, p.v0, p.r_d, p.r_f, **kw)
            )(jnp.asarray(ks, jnp.float64)))
        rmses[tag] = float(np.sqrt(np.mean((fused - want) ** 2)))
    # latency-kernel damped window (fused_single two-phase run): route
    # through price_batch's batch==1 dispatch so the real entry path is
    # what executes on-chip
    sol1 = dataclasses.replace(solver, rannacher_steps=2)
    xsol1 = dataclasses.replace(sol1, solver_engine="scan")
    k1 = np.array([100.0])
    got1 = np.array(jax.jit(lambda k: douglas.price_batch(
        spec, sol1, k, 100.0, p.kappa, p.eta, p.sigma, p.rho,
        p.v0, p.r_d, p.r_f))(jnp.asarray(k1, dtype)))
    with jax.enable_x64():
        want1 = np.array(jax.jit(lambda k: douglas.price_batch(
            spec, xsol1, k, 100.0, p.kappa, p.eta, p.sigma, p.rho,
            p.v0, p.r_d, p.r_f))(jnp.asarray(k1, jnp.float64)))
    rmses["single_rann"] = float(np.sqrt(np.mean((got1 - want1) ** 2)))
    # latency-kernel in-kernel dividend re-maps + American floor (round-3
    # extension): real-Mosaic check of the segmented single-option path
    kwd = dict(american=True, dividends=GOLDEN_DIVIDENDS)
    got_d = np.array(jax.jit(lambda k: douglas.price_batch(
        spec, solver, k, 100.0, p.kappa, p.eta, p.sigma, p.rho,
        p.v0, p.r_d, p.r_f, **kwd))(jnp.asarray(k1, dtype)))
    with jax.enable_x64():
        want_d = np.array(jax.jit(lambda k: douglas.price_batch(
            spec, dataclasses.replace(solver, solver_engine="scan"),
            k, 100.0, p.kappa, p.eta, p.sigma, p.rho, p.v0, p.r_d,
            p.r_f, **kwd))(jnp.asarray(k1, jnp.float64)))
    rmses["single_amer_div"] = float(np.sqrt(np.mean(
        (got_d - want_d) ** 2)))
    # knock-out barrier kernel (static column masks): the American-floor
    # mask and the up-out dividend-remap re-knock are real-Mosaic paths
    # interpret mode cannot certify — one arm covers both
    from heston_tpu.config import Barrier

    spec_b = dataclasses.replace(spec, barrier=Barrier("up-out", 160.0))
    kwb = dict(american=True, dividends=GOLDEN_DIVIDENDS)
    got_b = np.array(jax.jit(lambda k: fused_do.fused_price_batch(
        spec_b, solver, k, 100.0, p.kappa, p.eta, p.sigma, p.rho,
        p.v0, p.r_d, p.r_f, **kwb))(jnp.asarray(ks, dtype)))
    with jax.enable_x64():
        want_b = np.array(jax.jit(lambda k: douglas.price_batch(
            spec_b, dataclasses.replace(solver, solver_engine="scan"),
            k, 100.0, p.kappa, p.eta, p.sigma, p.rho, p.v0, p.r_d,
            p.r_f, **kwb))(jnp.asarray(ks, jnp.float64)))
    rmses["barrier_amer_div"] = float(np.sqrt(np.mean(
        (got_b - want_b) ** 2)))
    rmses["jac"] = _selftest_jac(spec, solver, p, dtype)
    rmses["jac_cs"] = _selftest_jac(
        spec, dataclasses.replace(solver, scheme="cs"), p, dtype)
    return {
        "selftest_rmse": rmses,
        "selftest_rmse_max": max(rmses.values()),
    }


def _selftest_jac(spec, solver, p, dtype):
    """On-chip cross-check of the FORWARD-MODE Mosaic kernel — the path
    the whole on-chip LM rests on, previously validated in interpret
    mode only (which has already missed one real-Mosaic crash): price
    RMSE of the fused f32 Jacobian launch's BASE against f64, plus the
    Jacobian itself normalized per entry by max(1, |J64|) so the
    K-dollar-scale vega column doesn't mask kappa-scale errors (raw
    entry magnitudes span 4 orders)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from heston_tpu.models import calibration as calib
    from heston_tpu.pallas import fused_do

    ks = np.linspace(75.0, 125.0, 64)
    tv = np.array([p.kappa, p.eta, p.sigma, p.rho, p.v0])
    _, jac32 = jax.jit(lambda k, t: fused_do.fused_theta_jacobian(
        spec, solver, k, 100.0, t, p.r_d, p.r_f))(
            jnp.asarray(ks, dtype), jnp.asarray(tv, dtype))
    xla_solver = dataclasses.replace(solver, solver_engine="scan")
    with jax.enable_x64():
        jac64, _ = jax.jit(lambda k, t: calib.jacobian_and_prices_ad(
            spec, xla_solver, k, 100.0, t, p.r_d, p.r_f))(
                jnp.asarray(ks, jnp.float64), jnp.asarray(tv, jnp.float64))
    j32 = np.array(jac32)
    j64 = np.array(jac64)
    rel = (j32 - j64) / np.maximum(1.0, np.abs(j64))
    return float(np.sqrt(np.mean(rel ** 2)))


def _lm_timing(spec, p, dtype):
    """Wall time of the fully on-chip 60-strike LM calibration with the
    fused-kernel AD Jacobian (one jitted while_loop = one dispatch;
    reference scenario size, ref: src/heston_calibration.cpp:58)."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from heston_tpu.config import CalibrationConfig, SolverConfig
    from heston_tpu.models import bs, calibration as calib

    solver = SolverConfig(n_steps=20, theta=0.8, maturity=1.0,
                          a2_variant="upwind", solver_engine="pallas")
    strikes = jnp.asarray(np.array([70.0 + i for i in range(60)]), dtype)
    market = bs.generate_market_data(100.0, 1.0, p.r_d, strikes)
    init = jnp.asarray([1.2, 0.05, 0.4, -0.5, 0.05], dtype)
    cfg = CalibrationConfig(max_iter=15, tol=0.1, jacobian_mode="ad")

    def run(init_vec):
        return calib.calibrate_device(
            spec, solver, strikes, market, 100.0, init_vec, p.r_d, p.r_f,
            cfg=cfg)

    tv, info = jax.jit(run)(init)   # compile + warm
    tv = np.asarray(tv)
    iters = int(np.asarray(info["iterations"]))
    assert np.all(np.isfinite(tv))
    # chain full LM runs inside one jitted scan (serial dependency via a
    # perturbed start vector) — the same fixed-RPC amortization as
    # _device_time_per_call; the round-2 Python-loop harness paid ~5 ms
    # of host dispatch/fetch per rep on top of the device time
    dt = _device_time_per_call(lambda iv: run(iv)[0], init, reps=100)
    return {"lm60_ad_pallas_s": dt, "lm60_iterations": iters}


def _lm_multi_timing(spec, p, dtype):
    """Wall time of the on-chip LM over the reference's 10-maturity x
    20-strike European ladder (ref: src/heston_calibration.cpp:2460-2494)
    — the flagship multi-maturity calibration. Since round 3 the mixed-
    maturity Jacobian (primal + 5 tangents, ALL maturities) is ONE fused
    launch per pass via per-lane step counts instead of 10 sequential
    per-group launches."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from heston_tpu.config import CalibrationConfig, SolverConfig
    from heston_tpu.models import bs, calibration as calib

    spy = 20
    mats = [0.1 * (i + 1) for i in range(10)]
    per = 20
    ks_one = np.array([100.0 * 0.8 + i * 0.4 * 100.0 / per
                       for i in range(per)])
    strikes = np.tile(ks_one, len(mats))
    market = np.concatenate([
        np.asarray(bs.generate_market_data(
            100.0, float(t), p.r_d, jnp.asarray(ks_one))) for t in mats])
    group_steps = tuple(
        (i * per, (i + 1) * per, max(1, int(round(spy * t))))
        for i, t in enumerate(mats))
    solver = SolverConfig(n_steps=spy, theta=0.8, maturity=1.0,
                          a2_variant="upwind", solver_engine="pallas")
    init = jnp.asarray([1.2, 0.05, 0.4, -0.5, 0.05], dtype)
    cfg = CalibrationConfig(max_iter=15, tol=0.1, jacobian_mode="ad")

    def run(init_vec):
        return calib.calibrate_device(
            spec, solver, jnp.asarray(strikes, dtype),
            jnp.asarray(market, dtype), 100.0, init_vec, p.r_d, p.r_f,
            cfg=cfg, group_steps=group_steps)

    tv, info = jax.jit(run)(init)   # compile + warm
    tv = np.asarray(tv)
    iters = int(np.asarray(info["iterations"]))
    assert np.all(np.isfinite(tv))
    dt = _device_time_per_call(lambda iv: run(iv)[0], init, reps=50)
    out = {"lm_multi200_s": dt, "lm_multi200_iterations": iters,
           "lm_multi200_sse": float(np.asarray(info["final_error"]))}

    # the reference's LARGEST scenario: american + dividends over the
    # same 200-point ladder (ref: src/heston_calibration.cpp:3245-3821)
    # — still one fused launch per Jacobian pass (per-lane dividend
    # events ride identity remap rows past each lane's maturity)
    from heston_tpu.config import GOLDEN_DIVIDENDS

    def run_ad(init_vec):
        return calib.calibrate_device(
            spec, solver, jnp.asarray(strikes, dtype),
            jnp.asarray(market, dtype), 100.0, init_vec, p.r_d, p.r_f,
            cfg=cfg, group_steps=group_steps, american=True,
            dividends=GOLDEN_DIVIDENDS)

    tv2, info2 = jax.jit(run_ad)(init)
    assert np.all(np.isfinite(np.asarray(tv2)))
    out["lm_multi200_amer_div_s"] = _device_time_per_call(
        lambda iv: run_ad(iv)[0], init, reps=50)
    out["lm_multi200_amer_div_iterations"] = int(
        np.asarray(info2["iterations"]))
    return out


def _book_risk(spec, p, batch, dtype):
    """Whole-book production risk pass: price + delta + gamma + calendar
    theta for every option (American + dividends) in one fused-kernel
    launch plus stencil epilogues (models.greeks.batch_greeks). The
    reference has no batched-greeks analog."""
    import dataclasses

    import jax.numpy as jnp

    from heston_tpu.config import GOLDEN_DIVIDENDS, SolverConfig
    from heston_tpu.models import greeks

    solver = SolverConfig(n_steps=20, theta=0.8, maturity=1.0,
                          a2_variant="upwind", solver_engine="pallas")
    ks = jnp.linspace(70.0, 130.0, batch, dtype=dtype)

    def fn(k):
        # consume ALL four outputs — returning only one would let XLA
        # dead-code-eliminate the others and the timing would be a lie
        r = greeks.batch_greeks(
            spec, solver, k, 100.0, p.kappa, p.eta, p.sigma, p.rho, p.v0,
            p.r_d, p.r_f, american=True, dividends=GOLDEN_DIVIDENDS)
        return r["price"] + r["delta"] + r["gamma"] + r["theta"]

    dt = _device_time_per_call(fn, ks, reps=500)
    out = {f"book_risk{batch}_s": dt}

    # mixed-maturity book (10 maturities, per-lane step counts): the
    # whole book's risk still runs in ONE fused launch
    n_groups = 10
    per = batch // n_groups
    groups = tuple((i * per,
                    batch if i == n_groups - 1 else (i + 1) * per,
                    2 * (i + 1)) for i in range(n_groups))
    sol_mx = dataclasses.replace(solver, n_steps=20, maturity=1.0)

    def fn_mx(k):
        r = greeks.batch_greeks(
            spec, sol_mx, k, 100.0, p.kappa, p.eta, p.sigma, p.rho, p.v0,
            p.r_d, p.r_f, american=True, dividends=GOLDEN_DIVIDENDS,
            group_steps=groups)
        return r["price"] + r["delta"] + r["gamma"] + r["theta"]

    out[f"book_risk{batch}_multi10_s"] = _device_time_per_call(
        fn_mx, ks, reps=500)
    return out


def _scheme_timings(spec, p, batch, dtype):
    """Craig-Sneyd / modified-CS / Hundsdorfer-Verwer batch timings: all
    three reference schemes (plus the HV extension) run at fused-kernel
    speed (VERDICT r2 'weak #1' — the reference ships a production
    shuffled CS stepper, ref: src/solver.hpp:781-907)."""
    import dataclasses

    import jax.numpy as jnp

    from heston_tpu.config import GOLDEN_DIVIDENDS, SolverConfig
    from heston_tpu.pallas import fused_do

    base = SolverConfig(n_steps=20, theta=0.8, maturity=1.0,
                        a2_variant="upwind", solver_engine="pallas")
    ks = jnp.linspace(70.0, 130.0, batch, dtype=dtype)
    out = {}
    for scheme in ("cs", "mcs", "hv"):
        sol = dataclasses.replace(base, scheme=scheme)

        def fn(k, sol=sol):
            return fused_do.fused_price_batch(
                spec, sol, k, 100.0, p.kappa, p.eta, p.sigma, p.rho,
                p.v0, p.r_d, p.r_f, american=True,
                dividends=GOLDEN_DIVIDENDS)

        v = np.array(jax.jit(fn)(ks))
        assert np.all(np.isfinite(v))
        out[f"batch{batch}_{scheme}_amer_div_s"] = _device_time_per_call(
            fn, ks, reps=200)
    return out


def _throughput_mixed(spec, p, dtype):
    """Large MIXED-maturity book throughput (5000 options, 10 maturities,
    per-lane step counts): the book spans several lane tiles, so sorted-
    by-maturity tiles exit the time loop early (European arm; the
    American+dividend arm keeps static segment bounds and freezes lanes
    instead — both are ONE launch)."""
    import dataclasses

    import jax.numpy as jnp

    from heston_tpu.config import GOLDEN_DIVIDENDS, SolverConfig
    from heston_tpu.pallas import fused_do

    solver = SolverConfig(n_steps=20, theta=0.8, maturity=1.0,
                          a2_variant="upwind", solver_engine="pallas")
    b = 5000
    n_groups = 10
    per = b // n_groups
    ks = jnp.tile(jnp.linspace(70.0, 130.0, per, dtype=dtype), n_groups)
    nst = jnp.repeat(2 * (jnp.arange(n_groups, dtype=jnp.int32) + 1), per)

    out = {}
    for name, kw in (("euro", {}),
                     ("amer_div", dict(american=True,
                                       dividends=GOLDEN_DIVIDENDS))):
        def fn(k, kw=kw):
            return fused_do.fused_price_batch(
                spec, solver, k, 100.0, p.kappa, p.eta, p.sigma, p.rho,
                p.v0, p.r_d, p.r_f, n_steps_per=nst, **kw)

        v = np.array(jax.jit(fn)(ks))
        assert np.all(np.isfinite(v))
        dt = _device_time_per_call(fn, ks, reps=100)
        out[f"mixed5000_{name}_s"] = dt
        out[f"mixed5000_{name}_options_per_s"] = b / dt
    return out


def _cpu_arm(spec, p, batch, tpu_value):
    """Same batch through the native OpenMP C++ engine
    (csrc/heston_cpu.cpp::ht_do_solve_batch) — the framework's analog of
    the reference's OpenMP performance-test build whose CPU numbers back
    the README GPU-vs-CPU 30x claim (ref: src/perfomance_test.cpp:507).
    Host wall-time via the shared sweep; the key carries the ACTUAL
    OpenMP thread count (honors OMP_NUM_THREADS), so tpu_vs_cpu is
    explicitly a vs-that-many-threads figure."""
    from heston_tpu import benchmarks
    from heston_tpu.config import GOLDEN_DIVIDENDS, SolverConfig
    from heston_tpu.utils import native

    solver = SolverConfig(n_steps=20, theta=0.8, maturity=1.0,
                          a2_variant="upwind")
    row = benchmarks.run_sweep(
        spec=spec, solver=solver, params=p, instances=(batch,),
        american=True, dividends=GOLDEN_DIVIDENDS, engine="cpu")[0]
    cpu = row["total_runtime_s"]
    return {
        f"cpu_batch{batch}_omp{native.omp_threads()}t_s": cpu,
        "tpu_vs_cpu": cpu / tpu_value,
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

    from heston_tpu.config import GOLDEN_DIVIDENDS

    spec = GridSpec(m1=100, m2=75)
    solver = SolverConfig(n_steps=20, theta=0.8, maturity=1.0,
                          a2_variant="central", solver_engine="pallas")
    ks = jnp.array([100.0], dtype=dtype)
    dt = _device_time_per_call(
        lambda k: douglas.price_batch(
            spec, solver, k, 100.0, p.kappa, p.eta, p.sigma, p.rho,
            p.v0, p.r_d, p.r_f), ks, reps=500)
    # the reference's OTHER single-instance headline: the golden
    # American+dividend scenario (ref: src/solver.cpp:1091) — since
    # round 3 the latency kernel runs dividend re-maps in-kernel
    dt_ad = _device_time_per_call(
        lambda k: douglas.price_batch(
            spec, solver, k, 100.0, p.kappa, p.eta, p.sigma, p.rho,
            p.v0, p.r_d, p.r_f, american=True,
            dividends=GOLDEN_DIVIDENDS), ks, reps=500)
    return {
        "single_option_100x75_s": dt,
        "single_option_vs_a100": 0.003 / dt,
        "single_option_amer_div_100x75_s": dt_ad,
    }


if __name__ == "__main__":
    sys.exit(main())
