"""bench.py artifact-pipeline indestructibility (VERDICT r3 #1).

Round 3 lost its entire driver bench artifact to a backend-init hang
(BENCH_r03.json: rc=124, parsed=null). These tests run the REAL bench.py
supervisor against a child faked (via HESTON_BENCH_FAKE_HANG — a pure
protocol path that never imports jax) into every failure mode that
matters, and assert that a parseable aggregate JSON line still lands and
the process exits 0 so the driver's `timeout` never fires first.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

BENCH = str(Path(__file__).resolve().parent.parent / "bench.py")


def _run(fake, probe_s, deadline_s, timeout=60):
    env = dict(os.environ,
               HESTON_BENCH_FAKE_HANG=fake,
               HESTON_BENCH_PROBE_S=str(probe_s),
               HESTON_BENCH_DEADLINE_S=str(deadline_s))
    env.pop("HESTON_BENCH_CHILD", None)
    res = subprocess.run([sys.executable, BENCH], capture_output=True,
                         text=True, env=env, timeout=timeout)
    lines = [ln for ln in res.stdout.splitlines() if ln.strip()]
    assert lines, f"no output at all; stderr={res.stderr[-500:]}"
    final = json.loads(lines[-1])
    return res, lines, final


def test_healthy_fake_run_aggregates_partials():
    res, lines, final = _run("ok", probe_s=30, deadline_s=60)
    assert res.returncode == 0
    assert final["value"] == 0.5
    assert final["vs_baseline"] == 0.02 / 0.5
    assert final["selftest_rmse_euro"] == 1e-6
    assert "outage" not in final
    # each metric was ALSO streamed as its own JSON line before the
    # aggregate (the driver keeps tail — partial lines survive a crash)
    streamed = [json.loads(ln) for ln in lines[:-1]
                if ln.startswith("{")]
    assert any("selftest_rmse_euro" in d for d in streamed)
    assert any(d.get("metric") == "fake_headline" for d in streamed)


def test_backend_init_hang_yields_outage_record():
    """The round-3 killer: child hangs before any output (backend init
    stuck in a C call). The supervisor's probe window must convert that
    into a structured outage aggregate within seconds, rc=0."""
    res, _, final = _run("init", probe_s=2, deadline_s=30)
    assert res.returncode == 0
    assert final["value"] is None
    assert final["vs_baseline"] is None
    assert "probe window" in final["outage"]
    assert "unavailable" in final["metric"]


def test_mid_run_hang_flushes_partials():
    """Child hangs AFTER some metrics were measured: the global deadline
    must kill it and the aggregate must still carry every metric already
    streamed (round 3 lost already-measured numbers to exactly this)."""
    res, lines, final = _run("mid", probe_s=30, deadline_s=5, timeout=90)
    assert res.returncode == 0
    assert "deadline" in final["outage"]
    # the partials measured before the hang survived into the aggregate
    assert final["selftest_rmse_euro"] == 1e-6
    assert final["value"] == 0.5      # headline landed before the hang
    assert final["metric"] == "fake_headline"


def test_wedged_arm_respawn_skips_and_completes():
    """Round-5 stall recovery: the axon backend can wedge on ONE
    executable (observed live: arm `euro` hung a whole 420 s window).
    The supervisor must detect the stall, respawn the child with that
    arm skipped, and the rest of the surface must land — rc=0, headline
    measured, a skip record and wedge note in the aggregate."""
    env = dict(os.environ,
               HESTON_BENCH_FAKE_HANG="stall",
               HESTON_BENCH_PROBE_S="30",
               HESTON_BENCH_DEADLINE_S="60",
               HESTON_BENCH_STALL_S="2")
    env.pop("HESTON_BENCH_CHILD", None)
    res = subprocess.run([sys.executable, BENCH], capture_output=True,
                         text=True, env=env, timeout=90)
    lines = [ln for ln in res.stdout.splitlines() if ln.strip()]
    final = json.loads(lines[-1])
    assert res.returncode == 0
    assert final["value"] == 0.5                  # run completed
    assert final["selftest_rmse_amer"] == 2e-6    # post-wedge arm ran
    assert final["selftest_skipped_euro"].startswith("wedged")
    assert any("arm:euro" in n for n in final["wedge_notes"])
    assert "outage" not in final


def test_child_crash_yields_partial_aggregate():
    res, _, final = _run("crash", probe_s=30, deadline_s=60)
    assert res.returncode == 0
    assert final["child_rc"] == 3
    assert final["selftest_rmse_euro"] == 1e-6
    assert final["value"] is None
    assert "error" in final


def test_quarantine_roundtrip_and_ttl(tmp_path, monkeypatch):
    """Wedged-unit quarantine: persisted tokens come back until their
    TTL lapses; protocol-test runs (FAKE_HANG) see no machine state."""
    import time as _time

    import bench

    monkeypatch.setattr(bench, "_QUARANTINE_PATH",
                        str(tmp_path / "q.json"))
    monkeypatch.delenv("HESTON_BENCH_FAKE_HANG", raising=False)
    assert bench._quarantine_load() == []
    bench._quarantine_add("arm:euro")
    assert bench._quarantine_load() == ["arm:euro"]
    # expire it
    monkeypatch.setenv("HESTON_BENCH_QUARANTINE_TTL_S", "0")
    _time.sleep(0.01)
    assert bench._quarantine_load() == []
    # FAKE_HANG isolation: neither reads nor writes
    monkeypatch.setenv("HESTON_BENCH_QUARANTINE_TTL_S", "86400")
    monkeypatch.setenv("HESTON_BENCH_FAKE_HANG", "ok")
    assert bench._quarantine_load() == []
    bench._quarantine_add("arm:fake")
    monkeypatch.delenv("HESTON_BENCH_FAKE_HANG")
    assert bench._quarantine_load() == ["arm:euro"]


def test_fingerprint_noop_is_exact():
    """_fp embeds the revision constant in the graph WITHOUT changing a
    single bit of the result (x + float(rev)*0.0 == x)."""
    import numpy as np

    import bench

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    x = jnp.asarray(np.linspace(-5.0, 700.0, 64), jnp.float32)
    np.testing.assert_array_equal(np.array(jax.jit(bench._fp)(x)),
                                  np.array(x))
