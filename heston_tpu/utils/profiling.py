"""Tracing / profiling hooks.

The reference instruments every phase with chrono spans printed to stdout
and names its Kokkos kernels for nvprof (ref: src/solver.hpp:50-94,
src/device_solver.hpp:86). The TPU equivalents here:

* `phase(name)` — wall-clock span context manager (device-synchronized),
* `scope(name)` — `jax.named_scope`, making framework phases visible in
  XLA/TPU profiler traces,
* `trace(dir)` — capture a jax.profiler trace for xprof/tensorboard.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List

import jax

scope = jax.named_scope


class PhaseTimer:
    """Accumulates named wall-clock spans (device-synchronized)."""

    def __init__(self):
        self.spans: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            self.spans.setdefault(name, []).append(
                time.perf_counter() - t0)

    def report(self) -> str:
        lines = []
        for name, ts in self.spans.items():
            lines.append(
                f"{name}: n={len(ts)} total={sum(ts):.4f}s "
                f"mean={sum(ts) / len(ts):.4f}s")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XLA/TPU profiler trace viewable in xprof/tensorboard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
