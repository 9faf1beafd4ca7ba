"""Finite-difference stencil weights on non-uniform grids.

Vectorized re-design of the reference's positional coefficient functions
(ref: src/coeff.cpp:7-100). Each helper takes the two spacings that the
corresponding reference function reads and returns the 3 stencil weights as
arrays, so operator assembly is pure array arithmetic (no per-node control
flow — XLA-friendly).

Naming follows the reference:
  delta — central 2nd derivative   (ref: src/coeff.cpp:7-28)
  beta  — central 1st derivative   (ref: src/coeff.cpp:55-76)
  alpha — backward (upwind) 1st derivative (ref: src/coeff.cpp:31-52)
  gamma — forward one-sided 1st derivative (ref: src/coeff.cpp:79-100)

For reference index i:
  delta(i, .) / beta(i, .) read Delta[i], Delta[i+1]    (centered at node i+1)
  alpha(i, .)             reads Delta[i-1], Delta[i]    (centered at node i)
  gamma(i, .)             reads Delta[i+1], Delta[i+2]  (note: NOT Delta[i] —
      this reference quirk is preserved; the v=0 one-sided stencil uses the
      spacings one slot to the right).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

Array = jnp.ndarray
Triple = Tuple[Array, Array, Array]


def w_delta(h0: Array, h1: Array) -> Triple:
    """Central 2nd-derivative weights (positions -1, 0, +1)."""
    s = h0 + h1
    return (2.0 / (h0 * s), -2.0 / (h0 * h1), 2.0 / (h1 * s))


def w_beta(h0: Array, h1: Array) -> Triple:
    """Central 1st-derivative weights (positions -1, 0, +1)."""
    s = h0 + h1
    return (-h1 / (h0 * s), (h1 - h0) / (h0 * h1), h0 / (h1 * s))


def w_alpha(hm: Array, h0: Array) -> Triple:
    """Backward upwind 1st-derivative weights (positions -2, -1, 0)."""
    s = hm + h0
    return (h0 / (hm * s), (-hm - h0) / (hm * h0), (hm + 2.0 * h0) / (h0 * s))


def w_gamma(h1: Array, h2: Array) -> Triple:
    """Forward one-sided 1st-derivative weights (positions 0, +1, +2)."""
    s = h1 + h2
    return ((-2.0 * h1 - h2) / (h1 * s), s / (h1 * h2), -h1 / (h2 * s))
