"""Regenerate the checked-in convergence artifacts (CSV parity with the
reference's ConvergenceExporter, ref: src/solver.cpp:50-312):

  benchmarks/convergence_grid.csv   — spatial sweep (timestep fixed)
  benchmarks/convergence_steps.csv  — timestep sweep (grid fixed)

Run on the host CPU backend in float64 (accuracy artifacts, not perf):
  python scripts/gen_convergence.py [grid|steps|both]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from heston_tpu import benchmarks  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benchmarks")


def main(which: str = "both") -> None:
    if which in ("grid", "both"):
        rows = benchmarks.run_convergence_study(
            m2_values=(15, 25, 50, 75, 100, 125, 150),
            csv_path=os.path.join(OUT, "convergence_grid.csv"))
        for r in rows:
            print("grid", r)
    if which in ("steps", "both"):
        rows = benchmarks.run_timestep_study(
            n_values=(10, 20, 40, 80, 160, 320),
            csv_path=os.path.join(OUT, "convergence_steps.csv"))
        for r in rows:
            print("steps", r)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "both")
