"""Fused Douglas ADI time loop as a single Pallas TPU kernel.

Why: the XLA path spends its time on loop-iteration overhead — each DO step
issues ~200 tiny while-loop iterations for the tridiagonal/pentadiagonal
sweeps (~2-5us each), giving ~16-20 ms for the 500-option batch. This kernel
keeps the ENTIRE time loop of a tile of options resident in VMEM: one
pallas_call runs all steps of a segment, the recurrence sweeps are fully
unrolled over the (static) grid extents, and per-iteration cost drops to VPU
latency. The reference achieves the same effect on GPU by running the whole
time loop inside one thread-team (ref: src/device_solver.hpp:196-266); this
is the TPU-native equivalent.

Layout: batch in the LANE dimension (tile = 128 options). All fields are
[m2+1, m1+1, 128] (v, s, options) so that
  * the pentadiagonal sweep along v indexes the outermost dim,
  * the tridiagonal sweep along s runs as a fori_loop with dynamic
    sublane indexing (unroll=True switches to fully static unrolled
    sweeps — identical runtime on v5e but ~7x slower to compile),
  * every arithmetic op vectorizes across the option lanes.

VMEM economy (the v5e budget is 16 MiB):
  * only U / lambda / payoff and the three A1 bands are full 3-D fields;
    both implicit factorizations are computed in-kernel into scratch,
  * A0's coefficient rho*sigma*s*v is applied as a separable outer product
    of two 2-D fields,
  * the boundary vectors b1/b2 are injected DURING the solve sweeps from
    2-D fields + static position masks (they are rank-1 in structure:
    b1 = scalar x quirky-position mask, b2 = one v-row;
    ref: src/BoundaryConditions.hpp:70-80),
  * tiles run sequentially via lax.map (no double-buffered pipeline).

The discrete-dividend surface re-maps (data-dependent gathers) happen
OUTSIDE the kernel between time-loop segments — the schedule is static, so
a solve is a handful of kernel launches with XLA glue, mirroring
models/douglas.run_time_loop.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from heston_tpu.config import DividendSchedule, GridSpec, SolverConfig
from heston_tpu.models import douglas
from heston_tpu.ops import banded
from heston_tpu.ops import grid as gridmod
from heston_tpu.ops import operators

TILE = 128

# VMEM capacity heuristic for the fused kernel: ~11 full 3-D fields
# (inputs + scratch + step temporaries) must fit the 16 MiB budget.
_VMEM_BUDGET_BYTES = 14 * 1024 * 1024
_FIELDS_RESIDENT = 11


def fits_vmem(spec, dtype_bytes: int = 4) -> bool:
    """Whether the fused kernel's working set fits VMEM for this grid.
    The production grid (m1=50, m2=25) fits; m1=100, m2=75 does not —
    price_batch falls back to the XLA path there."""
    field = (spec.m2 + 1) * (spec.m1 + 8) * TILE * dtype_bytes  # sublane pad
    return _FIELDS_RESIDENT * field <= _VMEM_BUDGET_BYTES


def _shift_s(x, k):
    """result[:, i, :] = x[:, i+k, :], zero outside (sublane axis)."""
    n = x.shape[1]
    if k > 0:
        pad = jnp.zeros_like(x[:, :k, :])
        return jnp.concatenate([x[:, k:, :], pad], axis=1)
    pad = jnp.zeros_like(x[:, :(-k), :])
    return jnp.concatenate([pad, x[:, :n + k, :]], axis=1)


def _shift_v(x, k):
    """result[j] = x[j+k], zero outside (outermost axis)."""
    n = x.shape[0]
    if k > 0:
        pad = jnp.zeros_like(x[:k])
        return jnp.concatenate([x[k:], pad], axis=0)
    pad = jnp.zeros_like(x[:(-k)])
    return jnp.concatenate([pad, x[:n + k]], axis=0)


def _b1_colrows(m1: int, m2: int):
    """Static b1 positions, grouped by s-column.

    b1 lives at flat indices m1*(j+1), j = 0..m2 (the reference's layout
    quirk, ref: src/BoundaryConditions.hpp:70-74). Returns
    {col: [row, ...]}."""
    nv, ns = m2 + 1, m1 + 1
    by_col = {}
    for j in range(nv):
        flat = m1 * (j + 1)
        r, c = divmod(flat, ns)
        if r < nv:
            by_col.setdefault(c, []).append(r)
    return by_col


def _make_kernel(m1: int, m2: int, theta: float, delta_t: float,
                 american: bool, unroll: bool, div_plan=None,
                 n_events: int = 0):
    """div_plan: optional static tuple of (seg_start, seg_end,
    n_events_after) triples. When given, the launch runs those time-loop
    segments with dividend re-maps between them; each re-map is a dense
    R-matrix contraction over the s axis (the re-map is linear with <= 2
    nonzeros per output column, ref: src/solver.hpp:382-425). The R
    matrices arrive as ordinary VMEM inputs, statically indexed — an
    HBM+DMA variant crashes this TPU runtime (see memory notes)."""
    nv, ns = m2 + 1, m1 + 1
    dt = delta_t
    td = theta * delta_t
    b1_rows = _b1_colrows(m1, m2)

    def kernel(*refs):
        (n0_ref, n1_ref, rf_ref,
         u_ref, *rest) = refs
        if american:
            (lam_ref, iml_ref, imd_ref, imu_ref,
             sfac_ref, vfac_ref,
             bsm_ref, bs0_ref, bsp_ref, bvm_ref, bv0_ref, bvp_ref,
             al2_ref, al1_ref, ad_ref, au1_ref, au2_ref,
             pgm_ref, phm_ref, pm_ref, pc_ref, pc2_ref,
             b1v_ref, b2r_ref, vecs_ref, kk_ref,
             *tail) = rest
            r_refs = tail[:n_events]
            if div_plan is not None:
                (uo_ref, lamo_ref,
                 w_ref, itmp_ref, d_ref, ustg_ref) = tail[n_events:]
            else:
                (uo_ref, lamo_ref, w_ref, itmp_ref, d_ref) = tail
        else:
            (iml_ref, imd_ref, imu_ref,
             sfac_ref, vfac_ref,
             bsm_ref, bs0_ref, bsp_ref, bvm_ref, bv0_ref, bvp_ref,
             al2_ref, al1_ref, ad_ref, au1_ref, au2_ref,
             pgm_ref, phm_ref, pm_ref, pc_ref, pc2_ref,
             b1v_ref, b2r_ref, vecs_ref, kk_ref,
             *tail) = rest
            r_refs = tail[:n_events]
            if div_plan is not None:
                (uo_ref,
                 w_ref, itmp_ref, d_ref, ustg_ref) = tail[n_events:]
            else:
                (uo_ref, w_ref, itmp_ref, d_ref) = tail

        rf = rf_ref[0]
        n0 = n0_ref[0]
        n1 = n1_ref[0]

        iml = iml_ref[:]
        imd = imd_ref[:]
        imu = imu_ref[:]

        # Thomas factorization of the A1 implicit system, once per launch
        # (fori_loop with dynamic sublane indexing keeps compile small)
        t0 = imd[:, 0, :]
        itmp_ref[:, 0, :] = 1.0 / t0
        w_ref[:, 0, :] = jnp.zeros_like(t0)

        def fac_body(i, temp_prev):
            wi = iml_ref[:, i, :] / temp_prev
            temp = imd_ref[:, i, :] - wi * imu_ref[:, i - 1, :]
            w_ref[:, i, :] = wi
            itmp_ref[:, i, :] = 1.0 / temp
            return temp
        lax.fori_loop(1, ns, fac_body, t0)

        # loop-invariant 2-D fields
        sfac = sfac_ref[:]              # [ns, T] rho*sigma*s (interior mask)
        vfac = vfac_ref[:]              # [nv, T] v (interior mask)
        bsm, bs0, bsp = bsm_ref[:], bs0_ref[:], bsp_ref[:]
        bvm, bv0, bvp = bvm_ref[:], bv0_ref[:], bvp_ref[:]
        l2b, l1b = al2_ref[:], al1_ref[:]
        db, u1b, u2b = ad_ref[:], au1_ref[:], au2_ref[:]
        b1v = b1v_ref[0]                # [T] boundary scalar per option
        b2r = b2r_ref[:]                # [ns, T] bottom-row boundary values
        # static position masks, built from iota (no captured constants)
        dtype = b2r.dtype
        row_ids = lax.broadcasted_iota(jnp.int32, (nv, ns), 0)
        col_ids = lax.broadcasted_iota(jnp.int32, (nv, ns), 1)
        b1_mask = jnp.zeros((nv, ns), dtype)
        for col, rows in b1_rows.items():
            for r in rows:
                b1_mask = b1_mask + (
                    (row_ids == r) & (col_ids == col)).astype(dtype)
        bottom2d = ((row_ids == nv - 1) & (col_ids >= 1)).astype(dtype)
        smax_mask = (col_ids != ns - 1).astype(dtype)   # [nv, ns]
        if american:
            # payoff is v-independent: reconstruct from the s-grid
            u0row = jnp.maximum(vecs_ref[:] - kk_ref[0][None, :], 0.0)
            u0 = u0row[None, :, :]

        def bandv(band):
            return band[:, None, :]

        def step(n, carry):
            if american:
                u, lam_c = carry
            else:
                u = carry
            nf = n.astype(u.dtype)
            e0 = jnp.exp(rf * dt * (nf - 1.0))
            e1 = jnp.exp(rf * dt * nf)
            kb1 = dt * e0 + td * (e1 - e0)   # total b1 coefficient (rhs1)
            kb2a = dt * e0                   # b2 coefficient entering rhs1
            kb2b = td * (e1 - e0)            # b2 coefficient entering rhs2

            # rhs1 built with minimal live intermediates:
            #   rhs1 = u + dt*a0r + (dt-td)*a1r + dt*a2r [+ dt*lam] + bnd
            # with a1r = (u - M u)/td  =>  (dt-td)*a1r = c1*(u - M u)
            c1 = (dt - td) / td
            # accumulate rhs1 in the solve workspace ref to cap live temps
            dsu = bsm * _shift_s(u, -1) + bs0 * u + bsp * _shift_s(u, 1)
            d_ref[:] = dt * (vfac[:, None, :] * sfac[None, :, :]) * (
                bvm[:, None, :] * _shift_v(dsu, -1)
                + bv0[:, None, :] * dsu
                + bvp[:, None, :] * _shift_v(dsu, 1))
            d_ref[:] = d_ref[:] + ((1.0 + c1) * u - c1 * (
                iml * _shift_s(u, -1) + imd * u + imu * _shift_s(u, 1)))
            # A2 applied explicitly (a2r stays live for rhs2)
            a2r = (bandv(l2b) * _shift_v(u, -2) + bandv(l1b) * _shift_v(u, -1)
                   + bandv(db) * u + bandv(u1b) * _shift_v(u, 1)
                   + bandv(u2b) * _shift_v(u, 2))
            # boundary injections as rank-1 full-array adds
            # (b1 = scalar x static mask; b2 = one v-row)
            bnd1 = ((kb1 * b1v) * b1_mask[:, :, None]
                    + kb2a * bottom2d[:, :, None] * b2r[None, :, :])
            if american:
                d_ref[:] = d_ref[:] + (dt * a2r + dt * lam_c + bnd1)
            else:
                d_ref[:] = d_ref[:] + (dt * a2r + bnd1)

            # tridiagonal solve along s; the backward substitution writes
            # in-place over the forward sweep (each row is read exactly
            # once, at its own step); rhs1 is already staged in d_ref
            if unroll:
                dprev = d_ref[:, 0, :]
                for i in range(1, ns):
                    dprev = d_ref[:, i, :] - w_ref[:, i, :] * dprev
                    d_ref[:, i, :] = dprev
                xnext = d_ref[:, ns - 1, :] * itmp_ref[:, ns - 1, :]
                d_ref[:, ns - 1, :] = xnext
                for i in range(ns - 2, -1, -1):
                    xnext = (d_ref[:, i, :]
                             - imu[:, i, :] * xnext) * itmp_ref[:, i, :]
                    d_ref[:, i, :] = xnext
            else:
                def tri_fwd(i, dprev):
                    dnew = d_ref[:, i, :] - w_ref[:, i, :] * dprev
                    d_ref[:, i, :] = dnew
                    return dnew
                lax.fori_loop(1, ns, tri_fwd, d_ref[:, 0, :])
                xlast = d_ref[:, ns - 1, :] * itmp_ref[:, ns - 1, :]
                d_ref[:, ns - 1, :] = xlast

                def tri_bwd(k, xnext):
                    i = ns - 2 - k
                    xnew = (d_ref[:, i, :]
                            - imu_ref[:, i, :] * xnext
                            ) * itmp_ref[:, i, :]
                    d_ref[:, i, :] = xnew
                    return xnew
                lax.fori_loop(0, ns - 1, tri_bwd, xlast)
            y1 = d_ref[:]

            # pentadiagonal solve along v (same in-place scheme)
            rhs2 = (y1 - td * a2r
                    + kb2b * bottom2d[:, :, None] * b2r[None, :, :])
            d_ref[:] = rhs2
            if unroll:
                dp1 = pm_ref[0] * d_ref[0]
                d_ref[0] = dp1
                dp2 = jnp.zeros_like(dp1)
                for j in range(1, nv):
                    dpj = (pm_ref[j] * d_ref[j] - pgm_ref[j] * dp1
                           - phm_ref[j] * dp2)
                    d_ref[j] = dpj
                    dp2, dp1 = dp1, dpj
                x1 = d_ref[nv - 1]
                x2 = jnp.zeros_like(x1)
                for j in range(nv - 2, -1, -1):
                    xj = d_ref[j] - pc_ref[j] * x1 - pc2_ref[j] * x2
                    d_ref[j] = xj
                    x2, x1 = x1, xj
            else:
                dp0 = pm_ref[0] * d_ref[0]
                d_ref[0] = dp0

                def pen_fwd(j, carry):
                    dp1, dp2 = carry
                    dpj = (pm_ref[j] * d_ref[j] - pgm_ref[j] * dp1
                           - phm_ref[j] * dp2)
                    d_ref[j] = dpj
                    return (dpj, dp1)
                lax.fori_loop(1, nv, pen_fwd, (dp0, jnp.zeros_like(dp0)))

                def pen_bwd(k, carry):
                    x1, x2 = carry
                    j = nv - 2 - k
                    xj = d_ref[j] - pc_ref[j] * x1 - pc2_ref[j] * x2
                    d_ref[j] = xj
                    return (xj, x1)
                lax.fori_loop(0, nv - 1, pen_bwd,
                              (d_ref[nv - 1], jnp.zeros_like(dp0)))
            u_bar = d_ref[:]

            if american:
                u_new = jnp.maximum(u_bar - dt * lam_c, u0)
                # multiplier update, zeroed on the s_max column via mask
                lam_new = (jnp.maximum(0.0, lam_c + (u0 - u_bar) / dt)
                           * smax_mask[:, :, None])
                return (u_new, lam_new)
            return u_bar

        def remap(u, e_idx):
            """u <- contract(u, R_e) over the s axis (dense linear re-map;
            staged through scratch so the contraction reads refs, which
            support dynamic sublane indexing)."""
            r_ref = r_refs[e_idx]
            ustg_ref[:] = u
            d_ref[:] = jnp.zeros_like(u)

            def contract(c, _):
                d_ref[:] = d_ref[:] + (ustg_ref[:, c, :][:, None, :]
                                       * r_ref[c, :, :][None, :, :])
                return 0
            lax.fori_loop(0, ns, contract, 0)
            return d_ref[:]

        if div_plan is None:
            if american:
                u_fin, lam_fin = lax.fori_loop(n0, n1, step,
                                               (u_ref[:], lam_ref[:]))
                uo_ref[:] = u_fin
                lamo_ref[:] = lam_fin
            else:
                uo_ref[:] = lax.fori_loop(n0, n1, step, u_ref[:])
        else:
            carry = (u_ref[:], lam_ref[:]) if american else u_ref[:]
            e_idx = 0
            for (seg_a, seg_b, k_events) in div_plan:
                if seg_b > seg_a:
                    carry = lax.fori_loop(seg_a, seg_b, step, carry)
                for _ in range(k_events):
                    if american:
                        uu, ll = carry
                        carry = (remap(uu, e_idx), ll)
                    else:
                        carry = remap(carry, e_idx)
                    e_idx += 1
            if american:
                uo_ref[:] = carry[0]
                lamo_ref[:] = carry[1]
            else:
                uo_ref[:] = carry

    return kernel


@functools.lru_cache(maxsize=None)
def _segment_call(m1: int, m2: int, theta: float, delta_t: float,
                  american: bool, dtype_name: str, interpret: bool,
                  unroll: bool = False, div_plan=None, n_events: int = 0):
    """pallas_call for ONE batch tile; tiles are mapped sequentially
    outside (lax.map). A grid-over-tiles variant was tried and exceeds
    the 16 MiB VMEM budget once Mosaic adds pipeline buffers + step
    temporaries (18-21 MiB); per-tile launches fit comfortably."""
    nv, ns = m2 + 1, m1 + 1
    dtype = jnp.dtype(dtype_name)
    kernel = _make_kernel(m1, m2, theta, delta_t, american, unroll,
                          div_plan, n_events)

    big_spec = lambda: pl.BlockSpec((nv, ns, TILE), lambda t: (0, 0, t),
                                    memory_space=pltpu.VMEM,
                                    pipeline_mode=pl.Buffered(1))
    sb_spec = lambda: pl.BlockSpec((ns, TILE), lambda t: (0, t),
                                   memory_space=pltpu.VMEM)
    vb_spec = lambda: pl.BlockSpec((nv, TILE), lambda t: (0, t),
                                   memory_space=pltpu.VMEM)
    one_spec = lambda: pl.BlockSpec((1, TILE), lambda t: (0, t),
                                    memory_space=pltpu.VMEM)
    smem1 = lambda: pl.BlockSpec((1,), lambda t: (0,),
                                 memory_space=pltpu.SMEM)

    n_big = 5 if american else 4
    in_specs = (
        [smem1(), smem1(), smem1()]          # n0, n1, rf
        + [big_spec()] * n_big               # u [, lam], iml, imd, imu
        + [sb_spec(), vb_spec()]             # sfac, vfac
        + [sb_spec()] * 3 + [vb_spec()] * 3  # bs, bv weights
        + [vb_spec()] * 10                   # a2 bands + penta factors
        + [one_spec(), sb_spec()]            # b1v, b2r
        + [sb_spec(), one_spec()]            # vec_s, strike
        + [pl.BlockSpec((ns, ns, TILE), lambda t: (0, 0, t),
                        memory_space=pltpu.VMEM)] * n_events   # R matrices
    )
    big = jax.ShapeDtypeStruct((nv, ns, TILE), dtype)
    out_shape = [big, big] if american else [big]
    out_specs = [big_spec()] * len(out_shape)

    scratch = [
        pltpu.VMEM((nv, ns, TILE), dtype),   # w  (Thomas multipliers)
        pltpu.VMEM((nv, ns, TILE), dtype),   # 1/temp
        pltpu.VMEM((nv, ns, TILE), dtype),   # d (solve workspace)
    ]
    if div_plan is not None:
        scratch.append(pltpu.VMEM((nv, ns, TILE), dtype))  # staged U

    # alias the state through the call: u -> out0 (, lam -> out1)
    aliases = {3: 0}
    if american:
        aliases[4] = 1

    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        input_output_aliases=aliases,
        interpret=interpret,
    )


def _prepare_batched(spec, solver, strikes, s0, kappa, eta, sigma, rho, v0,
                     r_d, r_f):
    """vmap the existing operator assembly over the book, then transpose
    every field to batch-last tiles."""

    def one(k):
        g = gridmod.make_grid(spec, s0, k, v0)
        ops = operators.build_operators(
            g, kappa, eta, sigma, rho, r_d, r_f, solver.theta,
            solver.delta_t, solver.n_steps, solver.a2_variant)
        u0 = jnp.maximum(g.vec_s[None, :] - k, 0.0) * jnp.ones(
            (spec.m2 + 1, 1), g.vec_s.dtype)
        # separable A0 coefficient: rho*sigma*s (cols 1..m1-1) x v (rows
        # 1..m2-1); product equals ops.a0_c
        scol = rho * sigma * g.vec_s
        scol = scol.at[0].set(0.0).at[-1].set(0.0)
        vrow = g.vec_v
        vrow = vrow.at[0].set(0.0).at[-1].set(0.0)
        # boundary data: b1 scalar + bottom-row values
        efac = jnp.exp(jnp.asarray(
            -r_f * solver.delta_t * (solver.n_steps - 1), g.vec_s.dtype))
        b1val = (r_d - r_f) * g.vec_s[-1] * efac
        b2row = (-0.5 * r_d * g.vec_s * efac).at[0].set(0.0)
        idx_s = gridmod.find_node(g.vec_s, s0)
        idx_v = gridmod.find_node(g.vec_v, v0)
        return ops, u0, scol, vrow, b1val, b2row, g.vec_s, idx_s, idx_v

    return jax.vmap(one)(strikes)


def _build_remap_matrices(vec_s, events, dtype):
    """Dense per-option re-map matrices R_e[c, i] with
    U_new[:, i] = sum_c U[:, c] R[c, i] — the linear form of
    models.douglas.apply_dividend (<= 2 nonzeros per column)."""
    b, ns = vec_s.shape
    m1 = ns - 1
    c_ids = jnp.arange(ns)[None, :, None]               # [1, c, 1]
    mats = []
    for amount, pct in events:
        new_s = vec_s * (1.0 - pct) - amount            # [B, i]
        # first strictly-greater index as a comparison count (vectorized;
        # vmapped searchsorted scalarizes on TPU)
        idx = jnp.sum(vec_s[:, :, None] <= new_s[:, None, :],
                      axis=1).astype(jnp.int32)
        idx = jnp.where(idx > m1, 0, idx)
        lo = jnp.maximum(idx - 1, 0)
        s_lo = jnp.take_along_axis(vec_s, lo, 1)
        s_hi = jnp.take_along_axis(vec_s, idx, 1)
        w = (new_s - s_lo) / jnp.where(s_hi == s_lo, 1.0, s_hi - s_lo)
        interior = ((1.0 - w)[:, None, :] * (c_ids == lo[:, None, :])
                    + w[:, None, :] * (c_ids == idx[:, None, :]))
        left = (c_ids == 0) * jnp.ones_like(new_s)[:, None, :]
        r = jnp.where((idx == 0)[:, None, :], left, interior)
        r = jnp.where((new_s > 0.0)[:, None, :], r, 0.0)
        mats.append(r.astype(dtype))                     # [B, c, i]
    return mats


MAX_EVENTS_PER_LAUNCH = 2  # VMEM headroom: each R costs ns*ns*TILE floats


def _chunk_dividend_plan(solver, dividends):
    """Split the static schedule into launch chunks of
    <= MAX_EVENTS_PER_LAUNCH events. Returns a list of
    (plan_tuple, [events...]) where plan covers a contiguous step range."""
    items = []      # (step, [(amount, pct), ...]) in order
    for n in range(1, solver.n_steps + 1):
        ev = dividends.events_for_step(n, solver.delta_t)
        if ev:
            items.append((n, ev))
    chunks = []
    cur_plan = []
    cur_events = []
    seg_start = 1
    for step_n, ev in items:
        if len(cur_events) + len(ev) > MAX_EVENTS_PER_LAUNCH and cur_events:
            cur_plan.append((seg_start, step_n, 0))
            chunks.append((tuple(cur_plan), cur_events))
            cur_plan, cur_events = [], []
            seg_start = step_n
        cur_plan.append((seg_start, step_n, len(ev)))
        cur_events.extend(ev)
        seg_start = step_n
    cur_plan.append((seg_start, solver.n_steps + 1, 0))
    chunks.append((tuple(cur_plan), cur_events))
    return chunks


def fused_price_batch(
    spec: GridSpec,
    solver: SolverConfig,
    strikes: jnp.ndarray,
    s0,
    kappa, eta, sigma, rho, v0, r_d, r_f,
    american: bool = False,
    dividends: Optional[DividendSchedule] = None,
    interpret: bool = False,
    unroll: bool = False,
) -> jnp.ndarray:
    """Drop-in replacement for models.douglas.price_batch running the time
    loop in the fused Pallas kernel. Jit-wrap the caller."""
    b = strikes.shape[0]
    n_tiles = -(-b // TILE)
    pad = n_tiles * TILE - b
    strikes_p = jnp.concatenate(
        [strikes, jnp.broadcast_to(strikes[-1:], (pad,))]) if pad else strikes

    (ops, u0, scol, vrow, b1val, b2row, vec_s, idx_s, idx_v
     ) = _prepare_batched(spec, solver, strikes_p, s0, kappa, eta, sigma,
                          rho, v0, r_d, r_f)
    dtype = u0.dtype
    nv, ns = spec.m2 + 1, spec.m1 + 1

    # A2 implicit factorization once in XLA (small 1-D bands); the A1
    # Thomas factorization happens inside the kernel (scratch)
    a2_fac = jax.vmap(banded.penta_factor)(
        ops.a2_il2, ops.a2_il1, ops.a2_id, ops.a2_iu1, ops.a2_iu2)

    def tiles3(x):   # [B, nv, ns] -> [n_tiles, nv, ns, TILE]
        return jnp.moveaxis(x.reshape(n_tiles, TILE, nv, ns), 1, -1)

    def tiles2(x):   # [B, n] -> [n_tiles, n, TILE]
        return jnp.moveaxis(x.reshape(n_tiles, TILE, -1), 1, -1)

    def tiles1(x):   # [B] -> [n_tiles, 1, TILE]
        return x.reshape(n_tiles, 1, TILE)

    fields = dict(
        u=tiles3(u0),
        lam=jnp.zeros_like(tiles3(u0)),
        iml=tiles3(ops.a1_iml), imd=tiles3(ops.a1_imd),
        imu=tiles3(ops.a1_imu),
        sfac=tiles2(scol), vfac=tiles2(vrow),
        bsm=tiles2(ops.bs_wm), bs0=tiles2(ops.bs_w0), bsp=tiles2(ops.bs_wp),
        bvm=tiles2(ops.bv_wm), bv0=tiles2(ops.bv_w0), bvp=tiles2(ops.bv_wp),
        al2=tiles2(ops.a2_l2), al1=tiles2(ops.a2_l1), ad=tiles2(ops.a2_d),
        au1=tiles2(ops.a2_u1), au2=tiles2(ops.a2_u2),
        pgm=tiles2(a2_fac.gm), phm=tiles2(a2_fac.hm), pm=tiles2(a2_fac.m),
        pc=tiles2(a2_fac.c), pc2=tiles2(a2_fac.c2),
        b1v=tiles1(b1val), b2r=tiles2(b2row),
        vecs=tiles2(vec_s), kk=tiles1(strikes_p),
    )

    call = _segment_call(spec.m1, spec.m2, solver.theta, solver.delta_t,
                         american, dtype.name, interpret, unroll)
    inv_keys = ["iml", "imd", "imu", "sfac", "vfac",
                "bsm", "bs0", "bsp", "bvm", "bv0", "bvp",
                "al2", "al1", "ad", "au1", "au2",
                "pgm", "phm", "pm", "pc", "pc2",
                "b1v", "b2r", "vecs", "kk"]

    def run_segment(n0, n1, u, lam):
        n0a = jnp.asarray([n0], jnp.int32)
        n1a = jnp.asarray([n1], jnp.int32)
        rfa = jnp.asarray([r_f], dtype)
        if american:
            def per_tile(args):
                ut, lamt, *inv = args
                return call(n0a, n1a, rfa, ut, lamt, *inv)
            outs = lax.map(per_tile,
                           (u, lam, *[fields[k] for k in inv_keys]))
            return outs[0], outs[1]

        def per_tile(args):
            ut, *inv = args
            out = call(n0a, n1a, rfa, ut, *inv)
            return out[0]
        out = lax.map(per_tile, (u, *[fields[k] for k in inv_keys]))
        return out, lam

    u = fields["u"]
    lam = fields["lam"]
    if dividends is not None and len(dividends) > 0:
        # run the schedule as a few plan-chunk launches; the re-maps happen
        # IN-KERNEL as dense R-matrix contractions (R = VMEM inputs)
        n0a = jnp.asarray([0], jnp.int32)   # unused by plan kernels
        n1a = jnp.asarray([0], jnp.int32)
        rfa = jnp.asarray([r_f], dtype)
        inv = [fields[k] for k in inv_keys]
        for plan, events in _chunk_dividend_plan(solver, dividends):
            mats = _build_remap_matrices(vec_s, events, dtype)
            r_tiles = [jnp.moveaxis(m.reshape(n_tiles, TILE, ns, ns), 1, -1)
                       for m in mats]
            chunk_call = _segment_call(
                spec.m1, spec.m2, solver.theta, solver.delta_t, american,
                dtype.name, interpret, unroll, plan, len(events))
            if american:
                def per_tile(args):
                    ut, lamt, *rest_args = args
                    rs = rest_args[:len(r_tiles)]
                    inv_t = rest_args[len(r_tiles):]
                    return chunk_call(n0a, n1a, rfa, ut, lamt,
                                      *inv_t, *rs)
                outs = lax.map(per_tile, (u, lam, *r_tiles, *inv))
                u, lam = outs[0], outs[1]
            else:
                def per_tile(args):
                    ut, *rest_args = args
                    rs = rest_args[:len(r_tiles)]
                    inv_t = rest_args[len(r_tiles):]
                    out = chunk_call(n0a, n1a, rfa, ut, *inv_t, *rs)
                    return out[0]
                u = lax.map(per_tile, (u, *r_tiles, *inv))
    else:
        u, lam = run_segment(1, solver.n_steps + 1, u, lam)

    # price extraction: U[idx_v, idx_s] per option
    u_bf = jnp.moveaxis(u, -1, 1).reshape(n_tiles * TILE, nv, ns)
    prices = jax.vmap(lambda ub, iv, is_: ub[iv, is_])(u_bf, idx_v, idx_s)
    return prices[:b]
