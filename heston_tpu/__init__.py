"""heston_tpu — TPU-native Heston PDE pricing & calibration framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
Kokkos/CUDA codebase (BCW-dot/PDE-based-Heston-Solver-GPU-accelerated):

* 2-D Heston PDE priced with the Douglas (DO) ADI finite-difference scheme on
  a non-uniform sinh-stretched grid (ref: src/solver.hpp, src/grid.cpp).
* European / American / discrete-dividend / American-dividend option variants
  (ref: src/solver.hpp:19-664, src/device_solver.hpp:196-942).
* Batched "one instance per option" pricing — here `jax.vmap` over the option
  book instead of one Kokkos team per option (ref: src/device_solver.hpp:53).
* Levenberg–Marquardt calibration of (kappa, eta, sigma, rho, v0) with a
  finite-difference Jacobian — here a 6-way vmap over parameter bumps
  (ref: src/jacobian_computation.cpp, src/heston_calibration.cpp).
* Black–Scholes and Monte-Carlo oracles (ref: src/bs.hpp, src/MC_hes.cpp).
* Multi-chip scaling via `jax.sharding.Mesh` + `shard_map`, with psum'd
  normal equations (the reference is single-GPU; this is the TPU-native
  extension of its batch parallelism).

Layout convention: the solution surface is U[..., v, s] with shape
(m2+1, m1+1) — v-major, matching the reference's flat index i + j*(m1+1)
(ref: src/hes_mat_fac.hpp:64).
"""

from heston_tpu.config import (
    HestonParams,
    GridSpec,
    SolverConfig,
    DividendSchedule,
    RateSchedule,
    CalibrationConfig,
    GOLDEN_DIVIDENDS,
)


def price_batch(*args, **kwargs):
    """Top-level convenience: models.douglas.price_batch."""
    from heston_tpu.models import douglas

    return douglas.price_batch(*args, **kwargs)


def calibrate(*args, **kwargs):
    """Top-level convenience: models.calibration.calibrate."""
    from heston_tpu.models import calibration

    return calibration.calibrate(*args, **kwargs)


__all__ = [
    "HestonParams",
    "GridSpec",
    "SolverConfig",
    "DividendSchedule",
    "RateSchedule",
    "CalibrationConfig",
    "GOLDEN_DIVIDENDS",
    "price_batch",
    "calibrate",
]

__version__ = "0.1.0"
