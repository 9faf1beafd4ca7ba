"""Headline benchmark: 500 American options with discrete dividends, batched.

Reference baseline: 0.02 s for the same batch on an NVIDIA A100
(ref: README.md:16; sweep definition ref: src/perfomance_test.cpp:50-54 —
m1=50, m2=25, N=20, 10 timed runs). vs_baseline > 1 means faster than the
A100 number.

Output protocol (round 4 — indestructible artifact pipeline):
  - Each metric is streamed as its OWN JSON line the moment it is
    measured; the LAST line is always the aggregate
    {"metric", "value", "unit", "vs_baseline", ...}.
  - The process that the driver invokes is a pure-Python SUPERVISOR that
    never imports jax (backend init hangs inside a C call when the TPU
    tunnel is half-down — round 3 lost its entire artifact to exactly
    that, BENCH_r03 rc=124 with zero metrics). All measurement runs in a
    CHILD process; the supervisor relays its metric lines, enforces a
    probe window for the first sign of life after backend init and a
    global wall-clock deadline, and on expiry kills the child's process
    group, flushes the aggregate assembled from the partials already
    received, and exits 0.
  - Measurement ORDER: device probe -> core on-chip selftests (the
    correctness evidence) -> headline batch -> single-option latency ->
    extended selftests -> schemes/LM/risk/throughput extras -> CPU arm.
  - Roofline fields (<prefix>_pct_vpu_peak etc., utils/roofline.py)
    relate each fixed-shape launch to the chip's ceilings.

Env knobs:
  HESTON_BENCH_DTYPE        float32 (default) | float64
  HESTON_BENCH_BATCH        batch size (default 500)
  HESTON_BENCH_ENGINE       pallas (default) | scan | pcr
  HESTON_BENCH_SELFTEST     0 disables the on-chip selftest arms
  HESTON_BENCH_DEADLINE_S   global wall-clock budget (default 420)
  HESTON_BENCH_PROBE_S      first-metric window (default 60)
  HESTON_BENCH_FAKE_HANG    test hook: init|mid|ok (no jax touched)
"""

import json
import os
import sys
import time

BASELINE_SECONDS = 0.02  # A100 (ref: README.md:16)
METRIC_PREFIX = "@@METRIC "


def main():
    if os.environ.get("HESTON_BENCH_CHILD") == "1":
        return child_main()
    return supervisor_main()


# --------------------------------------------------------------------------
# supervisor — NO jax imports anywhere on this path
# --------------------------------------------------------------------------

def supervisor_main():
    """Spawn/monitor the measuring child. Beyond the round-4 probe
    window + global deadline, round 5 adds STALL RECOVERY: this
    machine's axon backend can wedge on ONE specific executable (hang
    inside a C call, while trivial jits still work — DESIGN.md 5.6);
    without recovery the first wedged selftest arm burns the whole
    window (observed live: a 420 s run that died inside arm `euro`
    with 17 stages unmeasured). When no metric line arrives for
    HESTON_BENCH_STALL_S (default 150 s) the supervisor kills the
    child, adds the in-flight stage/arm to a skip list, and respawns —
    one wedged executable now costs one skipped arm, not the window."""
    import signal
    import subprocess
    import threading

    deadline_s = float(os.environ.get("HESTON_BENCH_DEADLINE_S", "420"))
    probe_s = float(os.environ.get("HESTON_BENCH_PROBE_S", "60"))
    stall_s = float(os.environ.get("HESTON_BENCH_STALL_S", "150"))
    max_respawns = int(os.environ.get("HESTON_BENCH_RESPAWNS", "3"))
    t0 = time.time()

    acc = {}
    # wedged units persist across runs (the wedge is per-executable and
    # durable — an entry that hung once hangs on every later load):
    # preload the quarantine so a known-wedged unit costs this run
    # nothing instead of another 150 s stall. Entries expire after
    # HESTON_BENCH_QUARANTINE_TTL_S (executables get new hashes on any
    # code change anyway, so stale tokens are harmless but retired).
    skips = _quarantine_load()
    completed = set()    # units measured by an earlier child this run
    outage = None
    notes = [f"{tok} preloaded from quarantine" for tok in skips]
    attempt = 0

    while True:
        env = dict(os.environ, HESTON_BENCH_CHILD="1",
                   HESTON_BENCH_SKIP=",".join(
                       list(skips) + sorted(completed)))
        try:
            proc = subprocess.Popen(
                [sys.executable, os.path.abspath(__file__)],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True, env=env, start_new_session=True)
        except Exception as exc:  # pragma: no cover - spawn failure
            print(json.dumps(_fallback_aggregate(
                {}, f"could not spawn child: {exc}")), flush=True)
            return 0

        spawn_t = time.time()
        state = {"first_metric": False, "last_line": time.time(),
                 "marker": None, "data_since_marker": True}
        drained = threading.Event()

        def reader(proc=proc, state=state, drained=drained):
            try:
                for raw in proc.stdout:
                    line = raw.rstrip("\n")
                    state["last_line"] = time.time()
                    if line.startswith(METRIC_PREFIX):
                        try:
                            d = json.loads(line[len(METRIC_PREFIX):])
                        except ValueError:
                            continue
                        state["first_metric"] = True
                        if "arm" in d or "stage" in d:
                            # the PREVIOUS unit finished if it produced
                            # data: a respawned child skips it instead
                            # of re-measuring (a respawn re-ran 260 s
                            # of already-measured arms before this)
                            prev = state["marker"]
                            if prev and state["data_since_marker"]:
                                completed.add(f"{prev[0]}:{prev[1]}")
                            kind = "arm" if "arm" in d else "stage"
                            state["marker"] = (kind, d[kind])
                            state["data_since_marker"] = False
                        else:
                            state["data_since_marker"] = True
                        for k, v in d.items():
                            # deep-merge dict-valued metrics (the
                            # selftest summary of a respawned child
                            # covers only its own arms)
                            if (isinstance(v, dict)
                                    and isinstance(acc.get(k), dict)):
                                acc[k].update(v)
                            else:
                                acc[k] = v
                        print(json.dumps(d), flush=True)
                    elif line:
                        # child chatter / warnings: relay as comments so
                        # the driver's tail parser never mistakes them
                        # for data
                        print("# " + line, flush=True)
            finally:
                drained.set()

        threading.Thread(target=reader, daemon=True).start()

        stalled = None
        while True:
            if proc.poll() is not None:
                drained.wait(timeout=15)
                break
            now = time.time()
            if not state["first_metric"] and now - spawn_t > probe_s:
                outage = (f"no sign of life within probe window "
                          f"{probe_s:.0f}s — backend init hang/outage")
                break
            if now - t0 > deadline_s:
                outage = (f"global deadline {deadline_s:.0f}s expired;"
                          " partial results flushed")
                break
            if (state["first_metric"]
                    and now - state["last_line"] > stall_s):
                marker = state["marker"]
                if (marker and marker[0] == "arm"
                        and not state["data_since_marker"]):
                    stalled = f"arm:{marker[1]}"
                elif marker:
                    stalled = f"stage:{marker[1]}"
                else:   # pragma: no cover - stall before any marker
                    stalled = "stage:selftest_core"
                break
            time.sleep(0.25)

        if outage is not None or stalled is not None:
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except (ProcessLookupError, PermissionError, OSError):
                pass
            try:
                proc.wait(timeout=10)
            except Exception:
                pass
            drained.wait(timeout=5)

        if stalled is None:
            rc = proc.returncode
            break
        # wedged-executable recovery: skip the in-flight unit, respawn
        notes.append(f"{stalled} wedged (no output {stall_s:.0f}s), "
                     "skipped on respawn")
        skips.append(stalled)
        _quarantine_add(stalled)
        attempt += 1
        rc = proc.returncode
        # a respawn is only worth it if a child can at least re-init the
        # backend inside the remaining window (probe_s is that estimate)
        if (attempt > max_respawns
                or time.time() - t0 + probe_s > deadline_s):
            outage = outage or (
                f"gave up after {attempt} stall respawns")
            break
        print(json.dumps({"respawn": attempt, "skipping": skips}),
              flush=True)
        # a SIGKILLed child's device lease lingers server-side for a
        # few seconds; an immediate respawn sees FAILED_PRECONDITION on
        # every execute (observed live: one respawn burned 11 stages
        # that way). Let the lease lapse first.
        time.sleep(min(20.0, max(0.0, deadline_s - (time.time() - t0))))

    final = dict(acc)
    if isinstance(final.get("selftest_rmse"), dict):
        # respawned children emit partial summaries; the merged dict is
        # the authoritative count
        final["selftest_arms_run"] = len(final["selftest_rmse"])
    if notes:
        final["wedge_notes"] = notes
    if outage:
        final["outage"] = outage
    if rc not in (0, None) and not outage and not notes:
        final["child_rc"] = rc
    # journal fill from the SUPERVISOR side: a deadline/stall-killed
    # child never reaches its own _emit_journal_fill, which round 5's
    # first wedge-lottery run demonstrated by shipping an aggregate
    # with no fill at all. The journal is plain JSON — no jax needed.
    fill = dict(final.get("journal_fill") or {})
    now = time.time()
    for k, rec in _journal_load().items():
        if (k not in final and k not in fill
                and isinstance(rec, dict) and "ts" in rec):
            fill[k] = {"value": rec["value"],
                       "age_s": round(now - rec["ts"])}
    if fill:
        final["journal_fill"] = fill
    if final.get("value") is None:
        final = _fallback_aggregate(final, outage or f"child rc={rc}"
                                    " before headline")
    final["elapsed_s"] = round(time.time() - t0, 3)
    print(json.dumps(final), flush=True)
    return 0


_QUARANTINE_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "benchmarks", "bench_quarantine.json")


def _quarantine_load():
    """Un-expired wedged-unit tokens from previous runs (see
    supervisor_main). Pure JSON — used on the no-jax supervisor path."""
    if os.environ.get("HESTON_BENCH_FAKE_HANG"):
        return []   # protocol tests must not see real machine state
    ttl = float(os.environ.get("HESTON_BENCH_QUARANTINE_TTL_S", "86400"))
    try:
        with open(_QUARANTINE_PATH) as f:
            q = json.load(f)
    except (OSError, ValueError):
        return []
    now = time.time()
    return [tok for tok, ts in q.items()
            if isinstance(ts, (int, float)) and now - ts < ttl
            # THE metric: never skip the headline preemptively — worst
            # case it re-stalls once (150 s), best case the backend
            # recovered and the run carries a fresh value
            and tok != "stage:headline"]


def _quarantine_add(token):
    if os.environ.get("HESTON_BENCH_FAKE_HANG"):
        return      # protocol tests must not pollute machine state
    try:
        with open(_QUARANTINE_PATH) as f:
            q = json.load(f)
    except (OSError, ValueError):
        q = {}
    q[token] = time.time()
    try:
        os.makedirs(os.path.dirname(_QUARANTINE_PATH), exist_ok=True)
        with open(_QUARANTINE_PATH, "w") as f:
            json.dump(q, f)
    except OSError:  # pragma: no cover
        pass


def _fallback_aggregate(partial, reason):
    out = dict(partial)
    out.setdefault(
        "metric",
        f"american_dividend_batch{os.environ.get('HESTON_BENCH_BATCH', '500')}"
        f"_m1_50_m2_25_N20_{os.environ.get('HESTON_BENCH_DTYPE', 'float32')}"
        f"_{os.environ.get('HESTON_BENCH_ENGINE', 'pallas')}_unavailable")
    out["value"] = None
    out["unit"] = "s"
    out["vs_baseline"] = None
    out["error"] = str(reason)[:300]
    return out


# --------------------------------------------------------------------------
# child — all measurement; streams @@METRIC lines, exits cleanly before
# the supervisor deadline via the stage budget below
# --------------------------------------------------------------------------

_JOURNAL_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "benchmarks", "bench_journal.json")
_EMITTED_KEYS = set()


def _journal_load():
    try:
        with open(_JOURNAL_PATH) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _journal_update(d):
    """Persist measured metrics (not stage/skip/error markers) so a
    later deadline-bounded run can fill its aggregate with the last
    measurement of any stage it had to skip — explicitly age-labeled
    (see _emit_journal_fill). One run cannot hold every stage's
    executable-load overhead inside the 420 s window even fully cached;
    the journal keeps the full surface in the artifact without
    laundering stale numbers as fresh ones."""
    if os.environ.get("HESTON_BENCH_FAKE_HANG"):
        return  # protocol tests must not pollute the journal
    keep = {k: v for k, v in d.items()
            if not (k in ("stage", "arm", "t_s", "journal_fill",
                          "metric", "value", "unit", "vs_baseline")
                    or k.startswith("selftest_budget_exceeded")
                    or k.endswith("_skipped") or k.endswith("_error"))}
    # The headline record carries its name in `metric` and its time in
    # `value`; persist it under the metric-name key so later runs (and the
    # cpu_arm fallback) can look it up by name instead of the generic
    # aggregate field names.
    if "metric" in d and "value" in d:
        keep[d["metric"]] = d["value"]
    if not keep:
        return
    j = _journal_load()
    now = time.time()
    for k, v in keep.items():
        j[k] = {"value": v, "ts": now}
    try:
        os.makedirs(os.path.dirname(_JOURNAL_PATH), exist_ok=True)
        with open(_JOURNAL_PATH, "w") as f:
            json.dump(j, f)
    except OSError:
        pass


def _emit_journal_fill():
    """Emit prior-run measurements for every metric NOT measured in this
    run, under the separate `journal_fill` key with per-metric age in
    seconds — never merged into the top-level (fresh) fields."""
    j = _journal_load()
    now = time.time()
    fill = {k: {"value": rec["value"], "age_s": round(now - rec["ts"])}
            for k, rec in j.items() if k not in _EMITTED_KEYS}
    if fill:
        emit({"journal_fill": fill})


def emit(d):
    _EMITTED_KEYS.update(d.keys())
    _journal_update(d)
    print(METRIC_PREFIX + json.dumps(d), flush=True)


class StageBudget:
    """Deadline-aware stage gate: a stage only starts if its estimated
    cost (plus a safety margin for the supervisor's kill path) still fits
    the global deadline; otherwise it is skipped LOUDLY with a per-stage
    skip record, so the child exits cleanly with everything measured so
    far rather than being killed mid-stage."""

    def __init__(self, margin_s: float = 25.0):
        self.t0 = time.time()
        self.deadline = float(os.environ.get("HESTON_BENCH_DEADLINE_S",
                                             "420"))
        self.margin = margin_s

    def run(self, name, est_s, fn):
        if f"stage:{name}" in _SKIP_TOKENS:
            emit({f"{name}_skipped": "wedged executable "
                                     "(supervisor stall recovery)"})
            return None
        if time.time() - self.t0 + est_s + self.margin > self.deadline:
            emit({f"{name}_skipped": "deadline"})
            return None
        emit({"stage": name, "t_s": round(time.time() - self.t0, 1)})
        try:
            return fn()
        except Exception as exc:  # soft-fail: one stage must not erase
            msg = f"{type(exc).__name__}: {exc}"
            if "FAILED_PRECONDITION" in msg:
                # a just-killed sibling's device lease can linger a few
                # seconds (respawn path); settle once and retry the
                # stage before recording the failure
                time.sleep(10.0)
                try:
                    return fn()
                except Exception as exc2:
                    msg = f"{type(exc2).__name__}: {exc2}"
            emit({f"{name}_error": msg[:300]})
            return None


def child_main():
    fake = os.environ.get("HESTON_BENCH_FAKE_HANG")
    if fake == "init":
        time.sleep(10 ** 6)
    if fake == "crash":
        emit({"device_kind": "fake", "platform": "fake"})
        emit({"selftest_rmse_euro": 1e-6, "selftest_rmse_max": 1e-6})
        return 3
    if fake in ("mid", "ok"):
        emit({"device_kind": "fake", "platform": "fake"})
        emit({"selftest_rmse_euro": 1e-6, "selftest_rmse_max": 1e-6})
        emit({"metric": "fake_headline", "value": 0.5, "unit": "s",
              "vs_baseline": BASELINE_SECONDS / 0.5})
        if fake == "mid":
            time.sleep(10 ** 6)
        return 0
    if fake == "stall":
        # wedged-executable simulation: hang INSIDE arm `euro`; a
        # respawn with that arm skipped completes the run
        emit({"device_kind": "fake", "platform": "fake"})
        emit({"stage": "selftest_core", "t_s": 0.0})
        if _arm_start("euro"):
            time.sleep(10 ** 6)
        emit({"selftest_rmse_amer": 2e-6, "selftest_rmse_max": 2e-6})
        emit({"metric": "fake_headline", "value": 0.5, "unit": "s",
              "vs_baseline": BASELINE_SECONDS / 0.5})
        return 0

    budget = StageBudget()
    dtype_name = os.environ.get("HESTON_BENCH_DTYPE", "float32")
    batch = int(os.environ.get("HESTON_BENCH_BATCH", "500"))
    engine = os.environ.get("HESTON_BENCH_ENGINE", "pallas")

    import jax
    import jax.numpy as jnp
    import numpy as np

    if dtype_name == "float64":
        jax.config.update("jax_enable_x64", True)

    from heston_tpu.config import (
        GOLDEN_DIVIDENDS,
        GridSpec,
        HestonParams,
        SolverConfig,
    )
    from heston_tpu.models import douglas

    # The persistent XLA cache is the only way the full surface fits one
    # deadline window (cold compiles total tens of minutes) — but axon
    # cache HITS have been observed to wedge the backend for some
    # executables (DESIGN.md 5.6). HESTON_BENCH_CACHE=0 runs cold for
    # A/B-ing that failure mode.
    if os.environ.get("HESTON_BENCH_CACHE", "1") != "0":
        from heston_tpu.utils.cache import enable_compilation_cache

        enable_compilation_cache()

    dev = jax.devices()[0]  # backend init: supervisor probe covers a hang
    emit({"device_kind": dev.device_kind, "platform": dev.platform})

    p = HestonParams()
    spec = GridSpec(m1=50, m2=25)
    solver = SolverConfig(n_steps=20, theta=0.8, maturity=1.0,
                          a2_variant="upwind", solver_engine=engine)
    dtype = jnp.float64 if dtype_name == "float64" else jnp.float32
    strikes = jnp.linspace(70.0, 130.0, batch, dtype=dtype)

    selftest_on = (engine == "pallas"
                   and os.environ.get("HESTON_BENCH_SELFTEST", "1") != "0")

    # 1) core on-chip selftests FIRST — the correctness evidence
    # (VERDICT r3 #1): these have caught a real-TPU Mosaic crash that
    # interpret mode missed (round 1)
    if selftest_on:
        budget.run("selftest_core", 120,
                   lambda: _selftest_core(spec, solver, p, dtype))

    # 2) headline batch metric
    headline = budget.run(
        "headline", 60,
        lambda: _headline(spec, solver, p, strikes, batch, engine,
                          dtype_name, dev))
    value = headline if headline else None

    # 3) single-option latency (the other reference headline)
    budget.run("single_option", 40,
               lambda: _single_option_golden_grid(p, dtype))

    # 4) extended selftest arms (schemes/digitals/barriers/Rannacher/AD)
    if selftest_on:
        budget.run("selftest_ext", 150,
                   lambda: _selftest_ext(spec, solver, p, dtype))

    # 5) perf extras — ROTATED: a 420 s window cannot hold every stage's
    # executable-load overhead even fully cached, so stages missing from
    # the journal run first, then the stalest; over successive runs the
    # whole surface stays covered and journal_fill labels the rest by age
    if selftest_on or engine == "pallas":
        cpu_ref = value or _journal_load().get(
            "american_dividend_batch500_m1_50_m2_25_N20_"
            "float32_pallas_tpu", {}).get("value")
        extras = [
            ("schemes", 50, lambda: _scheme_timings(spec, p, batch, dtype),
             f"batch{batch}_cs_amer_div_s"),
            ("lm", 35, lambda: _lm_timing(spec, p, dtype),
             "lm60_ad_pallas_s"),
            ("lm_multi", 55, lambda: _lm_multi_timing(spec, p, dtype),
             "lm_multi200_s"),
            ("lm_multi_ad", 50,
             lambda: _lm_multi_ad_timing(spec, p, dtype),
             "lm_multi200_amer_div_s"),
            ("book_risk", 50, lambda: _book_risk(spec, p, batch, dtype),
             f"book_risk{batch}_s"),
            ("mixed5000", 60, lambda: _throughput_mixed(spec, p, dtype),
             "mixed5000_euro_s"),
        ]
        if cpu_ref:
            extras.append(("cpu_arm", 30,
                           lambda: _cpu_arm(spec, p, batch, cpu_ref),
                           f"cpu_batch{batch}_omp1t_s"))
        j = _journal_load()
        extras.sort(key=lambda e: (e[3] in j,
                                   j.get(e[3], {}).get("ts", 0.0)))
        for name, est, fn, _key in extras:
            budget.run(name, est, fn)
    _emit_journal_fill()
    return 0


def _headline(spec, solver, p, strikes, batch, engine, dtype_name, dev):
    import jax
    import numpy as np

    from heston_tpu.config import GOLDEN_DIVIDENDS
    from heston_tpu.models import douglas
    from heston_tpu.utils import roofline

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
    try:
        out = np.array(jax.jit(priced)(strikes))
    except Exception as exc:
        if engine != "pallas":
            raise
        emit({"headline_pallas_error":
              f"{type(exc).__name__}: {exc}"[:300]})
        engine = "scan-fallback"
        priced = make_priced("scan")
        out = np.array(jax.jit(priced)(strikes))
    assert np.all(np.isfinite(out)), "non-finite prices"

    value = _device_time_per_call(priced, strikes)
    rec = {
        "metric": f"american_dividend_batch{batch}_m1_50_m2_25_N20_"
                  f"{dtype_name}_{engine}_{dev.platform}",
        "value": value,
        "unit": "s",
        "vs_baseline": BASELINE_SECONDS / value,
        "harness_floor_s": _harness_floor(strikes),
    }
    rec.update(roofline.report(
        f"batch{batch}", value,
        roofline.batch_launch_flops(
            batch, spec.m1, spec.m2, solver.n_steps, scheme="do",
            american=True, n_dividends=len(GOLDEN_DIVIDENDS.dates)),
        roofline.launch_hbm_bytes(batch), dev.device_kind))
    emit(rec)
    return value


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
    this tunnel regardless of scan length, so the floor it adds per rep
    is 29e-3/reps; the floor is measured with a trivial body and reported
    alongside (see _harness_floor) rather than subtracted.

    Thin alias of the shared harness heston_tpu.benchmarks.timed_scan."""
    from heston_tpu.benchmarks import timed_scan

    return timed_scan(fn, example, reps=reps, samples=samples)


def _harness_floor(example, reps: int = 500):
    """Per-rep cost of the timing harness itself (trivial body): the
    fixed ~29 ms dispatch+fetch RPC of this tunnel divided by reps.
    Included in every reported number (NOT subtracted); reported so the
    overstatement is visible."""
    return _device_time_per_call(lambda x: x * 2.0, example, reps=reps)


# On-chip f32-vs-f64 RMSE budget PER ARM (VERDICT r3 #8: one global 1e-4
# max let a regression in one variant hide under the loosest arm). Values
# = the 2026-08-20 real-TPU capture x ~2.5-3 margin, capped at the 1e-4
# BASELINE target (measured: euro 5.5e-6, amer 1.28e-5, div 1.31e-5,
# amer_div 8.6e-6, jac 1.0e-5, put_euro 1.10e-5, put_amer_div 1.17e-5,
# cs 7.9e-6, mcs 1.64e-5, hv 5.2e-6, rann 1.26e-5, rann_amer_div
# 1.15e-5, digital 1.0e-6, digital_amer 1.57e-5, single_rann 6.6e-7,
# single_amer_div 5.0e-7, barrier_amer_div 4.47e-5, jac_cs 1.12e-5).
SELFTEST_BUDGET = {
    "euro": 2e-5, "amer": 4e-5, "div": 4e-5, "amer_div": 3e-5,
    "put_euro": 3e-5, "put_amer_div": 3.5e-5,
    "cs": 2.5e-5, "mcs": 5e-5, "hv": 2e-5,
    "rann": 4e-5, "rann_amer_div": 3.5e-5,
    "digital": 5e-6, "digital_amer": 5e-5,
    "single_rann": 3e-6, "single_amer_div": 3e-6,
    "barrier_amer_div": 1e-4,
    "jac": 3e-5, "jac_cs": 3.5e-5,  # normalized Jacobian-entry RMSE
}

_SELFTEST_SEEN = {}


# Fingerprint revision: embedded into each selftest/LM executable's
# graph as an exact no-op (x + float(REV)*0.0). Bump it when a cached
# executable wedges permanently (the axon cache-hit hang, DESIGN.md
# 5.6): the new constant gives every arm a fresh module fingerprint, so
# the wedged server-side entries are never touched again. rev history:
# 1 = implicit (round 4/5 originals; euro-arm + lm_multi_ad entries
# wedged 2026-08-20), 2 = first rotation.
_FP_REV = 2


def _fp(x):
    """Exact fingerprint no-op: x + float(_FP_REV) * 0.0 == x, but the
    revision constant lands in the jaxpr/HLO, changing the compile-cache
    key without changing a single bit of any result."""
    import jax.numpy as jnp

    return x + jnp.asarray(float(_FP_REV), x.dtype) * jnp.asarray(
        0.0, x.dtype)


# units the supervisor told us to skip after a wedged-executable stall
# ("arm:euro" / "stage:lm_multi" tokens — see supervisor_main)
_SKIP_TOKENS = set(
    t for t in os.environ.get("HESTON_BENCH_SKIP", "").split(",") if t)


def _arm_start(tag):
    """Emit the arm marker, or the skip record if the supervisor flagged
    this arm as wedged on a previous attempt. Returns True to proceed."""
    if f"arm:{tag}" in _SKIP_TOKENS:
        emit({f"selftest_skipped_{tag}": "wedged executable "
                                         "(supervisor stall recovery)"})
        return False
    emit({"arm": tag})
    return True


def _selftest_arm(tag, got, want):
    import numpy as np

    rmse = float(np.sqrt(np.mean((np.asarray(got) - np.asarray(want))
                                 ** 2)))
    _SELFTEST_SEEN[tag] = rmse
    # running max rides every per-arm line so a deadline kill can never
    # erase the summary
    rec = {f"selftest_rmse_{tag}": rmse,
           "selftest_rmse_max": max(_SELFTEST_SEEN.values())}
    if rmse > SELFTEST_BUDGET.get(tag, 1e-4):
        rec[f"selftest_budget_exceeded_{tag}"] = SELFTEST_BUDGET.get(
            tag, 1e-4)
    emit(rec)


def _cpu_f64_jit(fn):
    """jit a reference-side computation in float64 ON THE HOST CPU
    backend: the selftest 'want' arm needs f64 accuracy, and f64 on TPU
    is slow software emulation — round 4's first capture attempt spent
    its whole 420 s deadline compiling/running 4 arms' TPU-f64
    references. The comparison target doesn't need the chip at all."""
    import jax

    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:  # pragma: no cover - no host CPU backend
        return jax.jit(fn)

    def run(*args):
        with jax.default_device(cpu):
            return jax.jit(fn)(*args)

    return run


def _emit_selftest_summary():
    if not _SELFTEST_SEEN:
        return   # every arm skipped (respawn after full coverage)
    emit({"selftest_rmse": dict(_SELFTEST_SEEN),
          "selftest_rmse_max": max(_SELFTEST_SEEN.values()),
          "selftest_arms_over_budget": sorted(
              t for t, v in _SELFTEST_SEEN.items()
              if v > SELFTEST_BUDGET.get(t, 1e-4)),
          "selftest_arms_run": len(_SELFTEST_SEEN)})


def _run_selftest_arms(spec, solver, p, dtype, arms, group):
    """On-chip cross-check of the fused kernel against the XLA path run in
    FLOAT64 (the true error of the f32 kernel, not the difference of two
    f32 roundings). Interpret-mode CPU tests have missed a real-TPU crash
    mode here once (HBM-DMA variant, round 1) — this runs the actual
    Mosaic kernel on the actual chip.

    ROUND-5 WINDOW FIX: every arm of the group runs inside ONE jitted
    call — one executable, one ~10-15 s tunnel load, instead of one per
    arm (per-arm loads alone were ~200 s of the 420 s window). `group`
    is the marker/skip unit the supervisor's stall recovery acts on;
    per-arm RMSEs are still computed and streamed individually. The f64
    references stay per-arm jits on the host CPU backend (no tunnel)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from heston_tpu.models import douglas
    from heston_tpu.pallas import fused_do

    ks = np.linspace(75.0, 125.0, 64)
    cfgs = []
    for tag, kw in arms:
        kw = dict(kw)
        rep = {k: kw.pop(k) for k in ("scheme", "rannacher_steps")
               if k in kw}
        sol = dataclasses.replace(solver, **rep) if rep else solver
        cfgs.append((tag, kw, sol))

    grouped = f"arm:{group}" not in _SKIP_TOKENS
    if grouped:
        emit({"arm": group})

        def all_arms(k):
            k = _fp(k)
            return tuple(fused_do.fused_price_batch(
                spec, sol, k, 100.0, p.kappa, p.eta, p.sigma, p.rho,
                p.v0, p.r_d, p.r_f, **kw) for _, kw, sol in cfgs)

        fused_all = jax.jit(all_arms)(jnp.asarray(ks, dtype))
    else:
        # the GROUP executable wedged on a previous attempt: fall back
        # to one executable per arm (different HLO hashes — an
        # individually wedged arm then stalls/skips on its own)
        fused_all = [None] * len(cfgs)

    for (tag, kw, sol), fused in zip(cfgs, fused_all):
        if fused is None:
            if not _arm_start(tag):
                continue
            fused = jax.jit(lambda k, kw=kw, sol=sol:
                            fused_do.fused_price_batch(
                spec, sol, _fp(k), 100.0, p.kappa, p.eta, p.sigma,
                p.rho, p.v0, p.r_d, p.r_f, **kw))(
                    jnp.asarray(ks, dtype))
        xsol = dataclasses.replace(sol, solver_engine="scan")
        with jax.enable_x64():
            want = np.array(_cpu_f64_jit(
                lambda k, kw=kw, xsol=xsol: douglas.price_batch(
                    spec, xsol, k, 100.0, p.kappa, p.eta, p.sigma,
                    p.rho, p.v0, p.r_d, p.r_f, **kw)
            )(jnp.asarray(ks, jnp.float64)))
        _selftest_arm(tag, np.array(fused), want)


def _selftest_core(spec, solver, p, dtype):
    from heston_tpu.config import GOLDEN_DIVIDENDS

    _run_selftest_arms(spec, solver, p, dtype, [
        ("euro", {}),
        ("amer", dict(american=True)),
        ("div", dict(dividends=GOLDEN_DIVIDENDS)),
        ("amer_div", dict(american=True, dividends=GOLDEN_DIVIDENDS)),
    ], group="core")
    # the forward-mode Mosaic kernel — the path the on-chip LM rests on
    _selftest_jac_arm("jac", spec, solver, p, dtype)
    _emit_selftest_summary()


def _selftest_ext(spec, solver, p, dtype):
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from heston_tpu.config import Barrier, GOLDEN_DIVIDENDS
    from heston_tpu.models import douglas
    from heston_tpu.pallas import fused_do

    _run_selftest_arms(spec, solver, p, dtype, [
        ("put_euro", dict(option_type="put")),
        ("put_amer_div", dict(american=True, dividends=GOLDEN_DIVIDENDS,
                              option_type="put")),
        ("cs", dict(scheme="cs")),
        ("mcs", dict(scheme="mcs")),
        ("hv", dict(scheme="hv")),
        # fused Rannacher window = extra launches of the same kernel at
        # (theta=1, dt/2); both the plain and the dividend-chunked damped
        # paths get a real-Mosaic check
        ("rann", dict(rannacher_steps=2)),
        ("rann_amer_div", dict(rannacher_steps=2, american=True,
                               dividends=GOLDEN_DIVIDENDS)),
        # cash-or-nothing digitals: cell-averaged payoff + injection-free
        # far fields; the American arm certifies the static-pin one-touch
        # scheme on real Mosaic
        ("digital", dict(option_type="digital_call")),
        ("digital_amer", dict(american=True,
                              option_type="digital_call")),
    ], group="ext")

    # latency-kernel damped window (fused_single two-phase run): route
    # through price_batch's batch==1 dispatch so the real entry path is
    # what executes on-chip
    # PCR latency-kernel arms (damped window + in-kernel dividend
    # re-maps/American floor), one jitted call = one executable load
    k1 = np.array([100.0])
    if _arm_start("singles"):
        sol1 = dataclasses.replace(solver, rannacher_steps=2)
        xsol1 = dataclasses.replace(sol1, solver_engine="scan")
        kwd = dict(american=True, dividends=GOLDEN_DIVIDENDS)
        got1, got_d = jax.jit(lambda k: (
            douglas.price_batch(
                spec, sol1, _fp(k), 100.0, p.kappa, p.eta, p.sigma,
                p.rho, p.v0, p.r_d, p.r_f),
            douglas.price_batch(
                spec, solver, _fp(k), 100.0, p.kappa, p.eta, p.sigma,
                p.rho, p.v0, p.r_d, p.r_f, **kwd)))(
                    jnp.asarray(k1, dtype))
        with jax.enable_x64():
            want1 = np.array(_cpu_f64_jit(lambda k: douglas.price_batch(
                spec, xsol1, k, 100.0, p.kappa, p.eta, p.sigma, p.rho,
                p.v0, p.r_d, p.r_f))(jnp.asarray(k1, jnp.float64)))
            want_d = np.array(_cpu_f64_jit(lambda k: douglas.price_batch(
                spec, dataclasses.replace(solver, solver_engine="scan"),
                k, 100.0, p.kappa, p.eta, p.sigma, p.rho, p.v0, p.r_d,
                p.r_f, **kwd))(jnp.asarray(k1, jnp.float64)))
        _selftest_arm("single_rann", np.array(got1), want1)
        _selftest_arm("single_amer_div", np.array(got_d), want_d)

    # knock-out barrier kernel (static column masks): the American-floor
    # mask and the up-out dividend-remap re-knock are real-Mosaic paths
    # interpret mode cannot certify — one arm covers both
    ks = np.linspace(75.0, 125.0, 64)
    if _arm_start("barrier_amer_div"):
        spec_b = dataclasses.replace(spec,
                                     barrier=Barrier("up-out", 160.0))
        kwb = dict(american=True, dividends=GOLDEN_DIVIDENDS)
        got_b = np.array(jax.jit(lambda k: fused_do.fused_price_batch(
            spec_b, solver, _fp(k), 100.0, p.kappa, p.eta, p.sigma,
            p.rho, p.v0, p.r_d, p.r_f, **kwb))(jnp.asarray(ks, dtype)))
        with jax.enable_x64():
            want_b = np.array(_cpu_f64_jit(lambda k: douglas.price_batch(
                spec_b,
                dataclasses.replace(solver, solver_engine="scan"),
                k, 100.0, p.kappa, p.eta, p.sigma, p.rho, p.v0, p.r_d,
                p.r_f, **kwb))(jnp.asarray(ks, jnp.float64)))
        _selftest_arm("barrier_amer_div", got_b, want_b)

    import dataclasses as _dc

    _selftest_jac_arm("jac_cs", spec,
                      _dc.replace(solver, scheme="cs"), p, dtype)
    _emit_selftest_summary()


def _selftest_jac_arm(tag, spec, solver, p, dtype):
    """On-chip cross-check of the FORWARD-MODE Mosaic kernel: the fused
    f32 Jacobian vs the f64 XLA AD Jacobian, normalized per entry by
    max(1, |J64|) so the K-dollar-scale vega column doesn't mask
    kappa-scale errors (raw entry magnitudes span 4 orders)."""
    if not _arm_start(tag):
        return
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
        jac64, _ = _cpu_f64_jit(lambda k, t: calib.jacobian_and_prices_ad(
            spec, xla_solver, k, 100.0, t, p.r_d, p.r_f))(
                jnp.asarray(ks, jnp.float64), jnp.asarray(tv, jnp.float64))
    j32 = np.array(jac32)
    j64 = np.array(jac64)
    rel = (j32 - j64) / np.maximum(1.0, np.abs(j64))
    _selftest_arm(tag, rel, 0.0 * rel)


def _iv_rmse(fitted, market, strikes, s0, r_d, mat_slices):
    """RMSE of implied-vol differences between fitted and market prices
    (the reference's fit-quality export, heston_calibration.cpp:443-511).
    mat_slices: [(lo, hi, maturity)] chain segments. Inverted on the host
    CPU backend in f64 — quality evidence, not a timed path."""
    import jax
    import numpy as np

    from heston_tpu.models import bs

    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:  # pragma: no cover
        cpu = None
    diffs = []
    with jax.enable_x64():
        for lo, hi, t in mat_slices:
            def invert(prices, lo=lo, hi=hi, t=t):
                return bs.implied_vol_chain(
                    jnp.asarray(np.asarray(prices)[lo:hi], jnp.float64),
                    float(s0), jnp.asarray(strikes[lo:hi], jnp.float64),
                    float(r_d), float(t))
            import jax.numpy as jnp
            if cpu is not None:
                with jax.default_device(cpu):
                    iv_f = np.asarray(invert(fitted))
                    iv_m = np.asarray(invert(market))
            else:  # pragma: no cover
                iv_f, iv_m = np.asarray(invert(fitted)), np.asarray(
                    invert(market))
            diffs.append(iv_f - iv_m)
    d = np.concatenate(diffs)
    d = d[np.isfinite(d)]
    return float(np.sqrt(np.mean(d ** 2))) if d.size else float("nan")


def _lm_timing(spec, p, dtype):
    """Wall time of the fully on-chip 60-strike LM calibration with the
    fused-kernel AD Jacobian (one jitted while_loop = one dispatch;
    reference scenario size, ref: src/heston_calibration.cpp:58)."""
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
    dt = _device_time_per_call(lambda iv: run(iv)[0], init, reps=100)
    # converged-fit quality next to the timing (ref exports fit SSE +
    # IV diffs, src/heston_calibration.cpp:331, 443-511): final SSE and
    # the fitted-vs-market implied-vol RMSE at the converged params
    emit({"lm60_ad_pallas_s": dt, "lm60_iterations": iters,
          "lm60_final_sse": float(np.asarray(info["final_error"])),
          "lm60_iv_rmse": _iv_rmse(
              np.asarray(info["fitted_prices"]), np.asarray(market),
              np.asarray(strikes), 100.0, p.r_d, [(0, 60, 1.0)])})


def _lm_multi_timing(spec, p, dtype):
    """Wall time of the on-chip LM over the reference's 10-maturity x
    20-strike European ladder (ref: src/heston_calibration.cpp:2460-2494)
    — the flagship multi-maturity calibration: the mixed-maturity
    Jacobian (primal + tangents, ALL maturities) is ONE fused launch per
    pass via per-lane step counts."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from heston_tpu.config import CalibrationConfig, SolverConfig
    from heston_tpu.models import bs, calibration as calib

    strikes, market, group_steps, solver, cfg, mats, per = \
        _lm_multi_ladder(spec, p, dtype)
    init = jnp.asarray([1.2, 0.05, 0.4, -0.5, 0.05], dtype)

    def run(init_vec):
        return calib.calibrate_device(
            spec, solver, jnp.asarray(strikes, dtype),
            jnp.asarray(market, dtype), 100.0, init_vec, p.r_d, p.r_f,
            cfg=cfg, group_steps=group_steps)

    tv, info = jax.jit(run)(init)   # compile + warm
    tv = np.asarray(tv)
    iters = int(np.asarray(info["iterations"]))
    assert np.all(np.isfinite(tv))
    dt = _device_time_per_call(lambda iv: run(iv)[0], init, reps=30)
    sse = float(np.asarray(info["final_error"]))
    emit({"lm_multi200_s": dt, "lm_multi200_iterations": iters,
          "lm_multi200_sse": sse, "lm_multi200_final_sse": sse,
          "lm_multi200_iv_rmse": _iv_rmse(
              np.asarray(info["fitted_prices"]), market, strikes, 100.0,
              p.r_d, [(i * per, (i + 1) * per, t)
                      for i, t in enumerate(mats)])})


def _lm_multi_ladder(spec, p, dtype):
    """Shared 10-maturity x 20-strike ladder setup."""
    import jax.numpy as jnp
    import numpy as np

    from heston_tpu.config import CalibrationConfig, SolverConfig
    from heston_tpu.models import bs

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
    cfg = CalibrationConfig(max_iter=15, tol=0.1, jacobian_mode="ad")
    return strikes, market, group_steps, solver, cfg, mats, per


def _lm_multi_ad_timing(spec, p, dtype):
    """The reference's LARGEST scenario: american + dividends over the
    200-point ladder (ref: src/heston_calibration.cpp:3245-3821) —
    still one fused launch per Jacobian pass (per-lane dividend events
    ride identity remap rows past each lane's maturity). Its OWN bench
    stage: the executable is the biggest in the suite and must not
    hold the euro-ladder metric (or the rest of the window) hostage."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from heston_tpu.config import GOLDEN_DIVIDENDS
    from heston_tpu.models import calibration as calib

    strikes, market, group_steps, solver, cfg, _, _ = _lm_multi_ladder(
        spec, p, dtype)
    init = jnp.asarray([1.2, 0.05, 0.4, -0.5, 0.05], dtype)

    def run_ad(init_vec):
        return calib.calibrate_device(
            spec, solver, jnp.asarray(strikes, dtype),
            jnp.asarray(market, dtype), 100.0, _fp(init_vec), p.r_d,
            p.r_f, cfg=cfg, group_steps=group_steps, american=True,
            dividends=GOLDEN_DIVIDENDS)

    tv2, info2 = jax.jit(run_ad)(init)
    assert np.all(np.isfinite(np.asarray(tv2)))
    emit({"lm_multi200_amer_div_s": _device_time_per_call(
              lambda iv: run_ad(iv)[0], init, reps=12),
          "lm_multi200_amer_div_iterations": int(
              np.asarray(info2["iterations"]))})


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

    emit({f"book_risk{batch}_s": _device_time_per_call(fn, ks, reps=500)})

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

    emit({f"book_risk{batch}_multi10_s": _device_time_per_call(
        fn_mx, ks, reps=500)})


def _scheme_timings(spec, p, batch, dtype):
    """Craig-Sneyd / modified-CS / Hundsdorfer-Verwer batch timings: all
    three reference schemes (plus the HV extension) run at fused-kernel
    speed (the reference ships a production shuffled CS stepper,
    ref: src/solver.hpp:781-907)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from heston_tpu.config import GOLDEN_DIVIDENDS, SolverConfig
    from heston_tpu.pallas import fused_do
    from heston_tpu.utils import roofline

    base = SolverConfig(n_steps=20, theta=0.8, maturity=1.0,
                        a2_variant="upwind", solver_engine="pallas")
    ks = jnp.linspace(70.0, 130.0, batch, dtype=dtype)
    dk = jax.devices()[0].device_kind
    for scheme in ("cs", "mcs", "hv"):
        sol = dataclasses.replace(base, scheme=scheme)

        def fn(k, sol=sol):
            return fused_do.fused_price_batch(
                spec, sol, k, 100.0, p.kappa, p.eta, p.sigma, p.rho,
                p.v0, p.r_d, p.r_f, american=True,
                dividends=GOLDEN_DIVIDENDS)

        # correctness of cs/mcs/hv vs f64 is certified by the selftest
        # arms; a separate plain-jit warmup here would cost one more
        # executable load through the tunnel per scheme
        t = _device_time_per_call(fn, ks, reps=150)
        rec = {f"batch{batch}_{scheme}_amer_div_s": t}
        rec[f"batch{batch}_{scheme}_pct_vpu_peak"] = roofline.report(
            "x", t, roofline.batch_launch_flops(
                batch, spec.m1, spec.m2, base.n_steps, scheme=scheme,
                american=True, n_dividends=len(GOLDEN_DIVIDENDS.dates)),
            roofline.launch_hbm_bytes(batch), dk)["x_pct_vpu_peak"]
        emit(rec)


def _throughput_mixed(spec, p, dtype):
    """Large MIXED-maturity book throughput (5000 options, 10 maturities,
    per-lane step counts): the book spans several lane tiles, so sorted-
    by-maturity tiles exit the time loop early (European arm; the
    American+dividend arm keeps static segment bounds and freezes lanes
    instead — both are ONE launch)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from heston_tpu.config import GOLDEN_DIVIDENDS, SolverConfig
    from heston_tpu.pallas import fused_do
    from heston_tpu.utils import roofline

    solver = SolverConfig(n_steps=20, theta=0.8, maturity=1.0,
                          a2_variant="upwind", solver_engine="pallas")
    b = 5000
    n_groups = 10
    per = b // n_groups
    ks = jnp.tile(jnp.linspace(70.0, 130.0, per, dtype=dtype), n_groups)
    nst = jnp.repeat(2 * (jnp.arange(n_groups, dtype=jnp.int32) + 1), per)
    dk = jax.devices()[0].device_kind
    # per-group step counts 2,4,...,20 -> flops summed over groups
    flops_per_pt_step = roofline.step_flops(spec.m1, spec.m2, "do", True)

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
        total_flops = float(per * flops_per_pt_step
                            * sum(2 * (i + 1) for i in range(n_groups)))
        emit({f"mixed5000_{name}_s": dt,
              f"mixed5000_{name}_options_per_s": b / dt,
              f"mixed5000_{name}_pct_vpu_peak": roofline.report(
                  "x", dt, total_flops, roofline.launch_hbm_bytes(b),
                  dk)["x_pct_vpu_peak"]})


def _cpu_arm(spec, p, batch, tpu_value):
    """Same batch through the native OpenMP C++ engine
    (csrc/heston_cpu.cpp::ht_do_solve_batch) — the framework's analog of
    the reference's OpenMP performance-test build whose CPU numbers back
    the README GPU-vs-CPU 30x claim (ref: src/perfomance_test.cpp:507).
    Host wall-time via the shared sweep; the key carries the ACTUAL
    OpenMP thread count (honors OMP_NUM_THREADS)."""
    from heston_tpu import benchmarks
    from heston_tpu.config import GOLDEN_DIVIDENDS, SolverConfig
    from heston_tpu.utils import native

    solver = SolverConfig(n_steps=20, theta=0.8, maturity=1.0,
                          a2_variant="upwind")
    row = benchmarks.run_sweep(
        spec=spec, solver=solver, params=p, instances=(batch,),
        american=True, dividends=GOLDEN_DIVIDENDS, engine="cpu")[0]
    cpu = row["total_runtime_s"]
    emit({f"cpu_batch{batch}_omp{native.omp_threads()}t_s": cpu,
          "tpu_vs_cpu": cpu / tpu_value})


def _single_option_golden_grid(p, dtype):
    """Single-option latency at the reference's golden/headline config
    m1=100, m2=75, N=20 (ref: src/solver.cpp:348; A100: 0.003 s,
    ref README.md:14) — runs the fused PCR latency kernel."""
    import jax
    import jax.numpy as jnp

    from heston_tpu.config import GOLDEN_DIVIDENDS, GridSpec, SolverConfig
    from heston_tpu.models import douglas
    from heston_tpu.utils import roofline

    spec = GridSpec(m1=100, m2=75)
    solver = SolverConfig(n_steps=20, theta=0.8, maturity=1.0,
                          a2_variant="central", solver_engine="pallas")
    ks = jnp.array([100.0], dtype=dtype)
    # reps=2000 shrinks the tunnel's fixed ~29 ms dispatch+fetch RPC to
    # ~15 us/rep so the per-call number is dominated by the kernel, and
    # the same-reps trivial-body floor decomposes the remainder:
    # kernel-only ~= end-to-end - floor (both reported, nothing
    # subtracted silently)
    reps = 2000
    dt = _device_time_per_call(
        lambda k: douglas.price_batch(
            spec, solver, k, 100.0, p.kappa, p.eta, p.sigma, p.rho,
            p.v0, p.r_d, p.r_f), ks, reps=reps)
    floor = _harness_floor(ks, reps=reps)
    dk = jax.devices()[0].device_kind
    rec = {"single_option_100x75_s": dt,
           "single_option_floor_s": floor,
           "single_option_kernel_s": max(dt - floor, 0.0),
           "single_option_vs_a100": 0.003 / dt}
    rec.update({k: v for k, v in roofline.report(
        "single_option", dt,
        roofline.batch_launch_flops(1, spec.m1, spec.m2, solver.n_steps),
        roofline.launch_hbm_bytes(1), dk).items()
        if k.startswith("single_option")})
    emit(rec)
    # the reference's OTHER single-instance headline: the golden
    # American+dividend scenario (ref: src/solver.cpp:1091) — the
    # latency kernel runs dividend re-maps in-kernel
    dt_ad = _device_time_per_call(
        lambda k: douglas.price_batch(
            spec, solver, k, 100.0, p.kappa, p.eta, p.sigma, p.rho,
            p.v0, p.r_d, p.r_f, american=True,
            dividends=GOLDEN_DIVIDENDS), ks, reps=reps)
    emit({"single_option_amer_div_100x75_s": dt_ad,
          "single_option_amer_div_kernel_s": max(dt_ad - floor, 0.0)})


if __name__ == "__main__":
    sys.exit(main())
