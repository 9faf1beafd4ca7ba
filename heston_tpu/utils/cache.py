"""Persistent XLA compilation cache setup.

The fused Pallas kernel's fully-unrolled sweeps take minutes to compile;
the persistent cache makes that a one-time cost per machine."""

import os
from pathlib import Path

import jax


def enable_compilation_cache(path: str | None = None) -> str:
    cache_dir = path or os.environ.get(
        "HESTON_COMPILE_CACHE",
        str(Path.home() / ".cache" / "heston_tpu_xla"),
    )
    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
