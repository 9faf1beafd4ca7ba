"""Multi-chip scaling: option-book sharding over a device mesh.

The reference is single-GPU (SURVEY.md §2.5); its batch axis (one Kokkos
team per option) is here a sharded vmap axis over `jax.sharding.Mesh`, with
the only cross-chip communication the calibration normal-equation reductions
(JtJ 5x5, Jtr 5) riding ICI via psum.
"""

from heston_tpu.parallel.sharded import (
    make_mesh,
    shard_batch,
    price_batch_sharded,
    batch_greeks_sharded,
    jacobian_normal_eq_sharded,
    calibrate_sharded,
    sharded_pricing_fns,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "price_batch_sharded",
    "batch_greeks_sharded",
    "jacobian_normal_eq_sharded",
    "calibrate_sharded",
    "sharded_pricing_fns",
]
