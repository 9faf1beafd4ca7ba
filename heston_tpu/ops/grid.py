"""Sinh-stretched non-uniform grids with spot/variance-node insertion.

Re-designs the reference grid construction (ref: src/grid.cpp:16-96) as pure,
trace-able JAX functions: shapes are static, values may be traced (so the
calibration v0-bump simply re-runs the same compiled grid code with v0+eps,
replacing the reference's on-device bubble-sort rebuild,
ref: src/grid_pod.hpp:25-73).

Construction (identical semantics to the reference):

  S-grid:  xi_i = asinh(-K/c) + i * dxi,  dxi = (asinh((S-K)/c) - asinh(-K/c))/m1
           s_i = K + c*sinh(xi_i)
           then S_0 is appended, the m1+2 values are sorted, and the LARGEST
           value is dropped (push/sort/pop, ref: src/grid.cpp:34-37) — note
           this intentionally discards the nominal S_max node.
  V-grid:  eta_j = j * deta, deta = asinh(V/d)/m2; v_j = d*sinh(eta_j)
           then V_0 inserted the same way (ref: src/grid.cpp:53-56).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from heston_tpu.config import GridSpec


class Grid(NamedTuple):
    """Grid node vectors and spacings.

    vec_s: (m1+1,) stock nodes, ascending.
    vec_v: (m2+1,) variance nodes, ascending.
    dels:  (m1,)  forward differences of vec_s.
    delv:  (m2,)  forward differences of vec_v.
    """

    vec_s: jnp.ndarray
    vec_v: jnp.ndarray
    dels: jnp.ndarray
    delv: jnp.ndarray

    @property
    def m1(self) -> int:
        return self.vec_s.shape[-1] - 1

    @property
    def m2(self) -> int:
        return self.vec_v.shape[-1] - 1


def _insert_and_crop(nodes: jnp.ndarray, value) -> jnp.ndarray:
    """Insert `value` into the ascending `nodes`, drop the largest node.

    Exactly the reference's push_back / sort / pop_back
    (ref: src/grid.cpp:34-37) — but since `nodes` is already sorted, the
    insertion point is a comparison count and the result is assembled
    with shifts + selects instead of jnp.sort: bitwise-identical values
    (stable sort places `value` after equal nodes, i.e. at
    count(nodes <= value)), no O(n log n) sorting network per option,
    and — decisive for the AD Jacobian — no permutation gathers in the
    tangent (sort's JVP gathers scalarize per lane on TPU). If `value`
    exceeds every node it lands at the end and is itself the dropped
    largest, reproducing the reference's S_max-discarding quirk. Keeps
    the shape static for jit/vmap.

    One divergence from the reference: if `value` already coincides
    with a node to within 1e-12 relative, the nodes are returned
    unchanged. The reference's push/sort/pop would keep both copies,
    and the (near-)zero spacing turns every FD coefficient into
    NaN/garbage (weights ~1/h^2 explode) — a degenerate grid, not a
    behavior worth reproducing. The near-collision happens in perfectly
    natural configurations: an ATM up-out barrier at level = 2K makes
    the sinh domain symmetric about the strike, so node m1/2 lands on
    S_0 = K up to the arcsinh/sinh round-trip's ulp — a bitwise-only
    guard would leave a 1e-14 spacing in the grid."""
    value = jnp.asarray(value, nodes.dtype)
    n = nodes.shape[0]
    idx = jnp.sum((nodes <= value).astype(jnp.int32))
    i = jnp.arange(n)
    shifted = jnp.concatenate([nodes[:1], nodes[:-1]])  # nodes[i-1]
    inserted = jnp.where(i < idx, nodes,
                         jnp.where(i == idx, value, shifted))
    dup = jnp.any(jnp.abs(nodes - value)
                  <= 1e-12 * jnp.maximum(1.0, jnp.abs(value)))
    return jnp.where(dup, nodes, inserted)


def _sinh_s_nodes(m1: int, s_lo, s_max, strike, c, dtype):
    """Raw sinh-spaced nodes on [s_lo, s_max] concentrated at `strike`
    (no insertion)."""
    lo = jnp.arcsinh((jnp.asarray(s_lo, dtype) - strike) / c)
    hi = jnp.arcsinh((jnp.asarray(s_max, dtype) - strike) / c)
    dxi = (hi - lo) / m1
    i = jnp.arange(m1 + 1, dtype=dtype)
    return strike + c * jnp.sinh(lo + i * dxi)


def make_s_nodes(m1: int, s_max: jnp.ndarray, s0, strike, c) -> jnp.ndarray:
    """Stock-direction sinh nodes with S_0 inserted."""
    dtype = jnp.result_type(float)
    strike = jnp.asarray(strike, dtype)
    c = jnp.asarray(c, dtype)
    nodes = _sinh_s_nodes(m1, 0.0, s_max, strike, c, dtype)
    return _insert_and_crop(nodes, jnp.asarray(s0, dtype))


def make_barrier_s_nodes(m1: int, barrier, s_max, s0, strike,
                         c) -> jnp.ndarray:
    """Stock-direction sinh nodes for a knock-out domain, S_0 inserted.

    The alive domain is [barrier.lo, barrier.hi(s_max)] (up-out:
    [0, level]; down-out: [level, s_max]; double-out:
    [level, level_hi]). Both endpoints are re-pinned exactly after the
    sinh round-trip (~1 ulp of arcsinh/sinh roundoff): node 0 is either
    exactly 0 (the call payoff / boundary arguments assume it) or a
    Dirichlet barrier location. When the TOP node is itself a barrier
    (up-out / double-out), S_0 is inserted among the lower m1 nodes
    only — the vanilla insert's drop-the-max quirk would move the
    barrier itself; a knocked/vanilla BOTTOM node survives any insert
    (S_0 > node 0 inserts at index >= 1)."""
    dtype = jnp.result_type(float)
    strike = jnp.asarray(strike, dtype)
    c = jnp.asarray(c, dtype)
    s0 = jnp.asarray(s0, dtype)
    lo = barrier.lo
    hi = barrier.hi(s_max)
    nodes = _sinh_s_nodes(m1, lo, hi, strike, c, dtype)
    nodes = nodes.at[0].set(lo)
    if barrier.knock_top:
        nodes = nodes.at[-1].set(barrier.hi(None))
        inner = _insert_and_crop(nodes[:-1], s0)
        return jnp.concatenate([inner, nodes[-1:]])
    return _insert_and_crop(nodes, s0)


def make_v_nodes(m2: int, v_max, v0, d) -> jnp.ndarray:
    """Variance-direction sinh nodes with V_0 inserted."""
    dtype = jnp.result_type(float)
    d = jnp.asarray(d, dtype)
    deta = jnp.arcsinh(jnp.asarray(v_max, dtype) / d) / m2
    j = jnp.arange(m2 + 1, dtype=dtype)
    nodes = d * jnp.sinh(j * deta)
    return _insert_and_crop(nodes, jnp.asarray(v0, dtype))


def make_grid(spec: GridSpec, s0, strike, v0) -> Grid:
    """Build the full pricing grid for one option instance.

    All value inputs may be traced scalars; `spec` fields are static.
    Mirrors Grid::Grid (ref: src/grid.cpp:16-61) including the S_0 / V_0
    insertion and delta recomputation.
    """
    dtype = jnp.result_type(float)
    strike = jnp.asarray(strike, dtype)
    if spec.barrier is not None:
        vec_s = make_barrier_s_nodes(
            spec.m1, spec.barrier, spec.s_max_mult * strike, s0, strike,
            spec.c_mult * strike)
    else:
        vec_s = make_s_nodes(
            spec.m1, spec.s_max_mult * strike, s0, strike,
            spec.c_mult * strike)
    vec_v = make_v_nodes(spec.m2, spec.v_max, v0, spec.v_max / spec.d_div)
    return Grid(
        vec_s=vec_s,
        vec_v=vec_v,
        dels=jnp.diff(vec_s),
        delv=jnp.diff(vec_v),
    )


def make_uniform_grid(m1: int, m2: int, s0, v0, s_min, s_max,
                      v_min, v_max) -> Grid:
    """Uniformly spaced grid with the same S_0/V_0 insert-and-crop
    semantics as the sinh grids — the reference's debug/validation grid
    (ref: src/grid.cpp:112-164). Note the reference applies the same
    push/sort/pop to the uniform nodes, so the largest nominal node is
    dropped; reproduced here via _insert_and_crop."""
    dtype = jnp.result_type(float)
    i = jnp.arange(m1 + 1, dtype=dtype)
    j = jnp.arange(m2 + 1, dtype=dtype)
    ds = (jnp.asarray(s_max, dtype) - s_min) / m1
    dv = (jnp.asarray(v_max, dtype) - v_min) / m2
    vec_s = _insert_and_crop(s_min + i * ds, jnp.asarray(s0, dtype))
    vec_v = _insert_and_crop(v_min + j * dv, jnp.asarray(v0, dtype))
    return Grid(vec_s=vec_s, vec_v=vec_v,
                dels=jnp.diff(vec_s), delv=jnp.diff(vec_v))


def rebuild_variance(spec: GridSpec, grid: Grid, v0_new) -> Grid:
    """Rebuild only the variance direction for a new v0.

    The pure-function equivalent of GridViews::rebuild_variance_views
    (ref: src/grid_pod.hpp:25-73), used for the dPrice/dv0 Jacobian column.
    """
    vec_v = make_v_nodes(spec.m2, spec.v_max, v0_new, spec.v_max / spec.d_div)
    return Grid(
        vec_s=grid.vec_s, vec_v=vec_v, dels=grid.dels, delv=jnp.diff(vec_v)
    )


def interp_at(grid: Grid, u: jnp.ndarray, s, v) -> jnp.ndarray:
    """Bilinear interpolation of the surface U[v, s] at (s, v).

    The reference uses exact node lookup for extraction (guaranteed by the
    S0/V0 insertion) but also carries an interpolated-extraction variant for
    rebuilt grids (ref: src/device_solver.cpp:1725-1758); this is the
    general form — robust when the query point is not a node."""
    i = jnp.clip(jnp.searchsorted(grid.vec_s, s, side="right") - 1,
                 0, grid.m1 - 1)
    j = jnp.clip(jnp.searchsorted(grid.vec_v, v, side="right") - 1,
                 0, grid.m2 - 1)
    s0n, s1n = grid.vec_s[i], grid.vec_s[i + 1]
    v0n, v1n = grid.vec_v[j], grid.vec_v[j + 1]
    ws = (s - s0n) / jnp.where(s1n == s0n, 1.0, s1n - s0n)
    wv = (v - v0n) / jnp.where(v1n == v0n, 1.0, v1n - v0n)
    return ((1 - wv) * ((1 - ws) * u[j, i] + ws * u[j, i + 1])
            + wv * ((1 - ws) * u[j + 1, i] + ws * u[j + 1, i + 1]))


def validate_book(spec, s0: float, strikes) -> None:
    """Reject option books the discretization cannot represent.

    The reference silently prices garbage when the spot falls outside the
    per-strike S-domain [0, s_max_mult*K) — the insertion drops the spot
    node and the node search falls back to index 0 (ref: src/grid.cpp:34-37,
    src/grid_pod.hpp:75-87). Host-side guard; call before batch pricing."""
    import numpy as np

    ks = np.asarray(strikes, dtype=float)
    bad = ks[s0 >= spec.s_max_mult * ks]
    if bad.size:
        raise ValueError(
            f"spot {s0} falls outside the S-grid (>= {spec.s_max_mult}*K) "
            f"for strikes {bad.tolist()}; these options cannot be priced "
            f"on this grid family")
    b = spec.barrier
    if b is not None:
        # a spot at/past a knock-out boundary is already knocked out
        # (price identically 0) and the grid cannot even hold its node
        if b.knock_top and s0 >= b.hi(None):
            raise ValueError(
                f"spot {s0} is at or above the {b.kind} barrier "
                f"{b.hi(None)}; the option is knocked out (price 0)")
        if b.knock_bottom and s0 <= b.level:
            raise ValueError(
                f"spot {s0} is at or below the {b.kind} barrier "
                f"{b.level}; the option is knocked out (price 0)")
        if b.knock_top:
            # a top-knocked grid inserts S_0 among the LOWER m1 nodes
            # only (the pinned barrier node must not move,
            # make_barrier_s_nodes). A spot in the last raw cell — above
            # the highest interior node but below the barrier — would be
            # inserted at the end and itself cropped: absent from the
            # grid, find_node falls back to index 0, and the book prices
            # the s-domain's FIRST column (~0 for a call). Reject it
            # loudly instead: it is an under-resolved configuration
            # (raise m1 or the level to widen the last cell).
            hi = b.hi(None)
            cs = spec.c_mult * ks
            lo_xi = np.arcsinh((b.lo - ks) / cs)
            hi_xi = np.arcsinh((hi - ks) / cs)
            top_inner = ks + cs * np.sinh(
                lo_xi + (spec.m1 - 1) * (hi_xi - lo_xi) / spec.m1)
            bad = ks[s0 > top_inner]
            if bad.size:
                raise ValueError(
                    f"spot {s0} falls between the highest interior "
                    f"s-node and the {b.kind} barrier {hi} for strikes "
                    f"{bad.tolist()}: the spot node cannot be inserted "
                    f"without moving the barrier. Increase m1 (finer "
                    f"grid resolves the last cell) or move the barrier.")


def find_node(nodes: jnp.ndarray, value, tol: float = 1e-10) -> jnp.ndarray:
    """Index of the node equal to `value` within `tol`; 0 if absent.

    Replicates the reference's equality search including its fall-back to
    index 0 (ref: src/grid_pod.hpp:75-87, src/device_solver.hpp:163-178).
    Returns a traced int32 scalar.
    """
    hit = jnp.abs(nodes - value) < tol
    return jnp.argmax(hit).astype(jnp.int32)
