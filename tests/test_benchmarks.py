"""Benchmark-sweep harness tests (tiny sizes, XLA engine, CPU)."""

import csv

from heston_tpu.config import GridSpec, SolverConfig
from heston_tpu import benchmarks


def test_run_sweep_produces_reference_format_csv(tmp_path):
    rows = benchmarks.run_sweep(
        spec=GridSpec(m1=12, m2=8),
        solver=SolverConfig(n_steps=3),
        instances=(1, 4),
        engine="xla",
        reps=2,
        csv_path=str(tmp_path / "sweep.csv"),
    )
    assert [r["instances"] for r in rows] == [1, 4]
    assert all(r["total_runtime_s"] > 0 for r in rows)
    assert all("device" in r for r in rows)
    lines = list(csv.reader((tmp_path / "sweep.csv").open()))
    # header + 2 rows, reference columns (ref: src/perfomance_test.cpp:214)
    assert lines[0][:4] == ["m1", "m2", "n_steps", "instances"]
    assert len(lines) == 3
    # throughput = instances / total_runtime
    assert abs(float(lines[1][6]) - 1 / float(lines[1][4])) < 1e-6
