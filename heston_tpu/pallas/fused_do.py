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

Layout: batch in the LANE dimension (tile auto-sized 128..1024 options),
s on the OUTER axis, v on the sublane axis: big fields are
[m1+1, m2+1, tile] (s, v, options). Why s-major: the tridiagonal sweep
along s is the longest sequential recurrence (m1+1 iterations, twice per
step), and slicing the outer axis yields dense [m2+1, tile] vector
blocks — slicing a SUBLANE axis instead (round-1 layout) wastes 7/8 of
every vector register on a 1-sublane strip. The pentadiagonal sweep
along v gets the same outer-axis treatment by staging its rhs through a
v-major transpose scratch (2 in-kernel transposes per step). unroll=True
switches the sweeps to fully static unrolled form (identical runtime on
v5e but ~7x slower to compile).

VMEM economy (v5e physical VMEM is well beyond the compiler's 16 MiB
default scoped cap — the kernel raises it via CompilerParams and the
golden grid m1=100, m2=75 runs fused with a ~54 MiB working set):
  * only U / lambda (and the K tangent surfaces in forward mode) are
    full 3-D fields; the A1 bands are carried in their exact rank-2 form
    v_j*P[i] + Q[i] (six [ns, tile] fields; the implicit rows and the
    Thomas factorization are derived in-kernel into scratch),
  * A0's coefficient rho*sigma*s*v is applied as a separable outer product
    of two 2-D fields,
  * the boundary vectors b1/b2 are injected DURING the solve sweeps from
    2-D fields + static position masks (they are rank-1 in structure:
    b1 = scalar x quirky-position mask, b2 = one v-row;
    ref: src/BoundaryConditions.hpp:70-80),
  * dividend re-maps run IN-KERNEL: each event's linear re-map matrix has
    <= 2 nonzeros per output column (linear interpolation,
    ref: src/solver.hpp:382-425), so it is carried as four [ns, tile]
    fields (two source indices + two weights) and the matrix row for
    source column c is reconstructed on the fly during the contraction,
  * batch tiles are iterated by the PALLAS GRID within one launch.

Forward-mode AD: _make_kernel(n_tangents=K) carries K tangent surfaces
through the loop (see fused_theta_jacobian) — tangent solves reuse the
primal factorizations via dx = T^-1 (dr - dT x), so the flagship
calibration's exact 5-parameter Jacobian is ONE kernel launch.

TPU perf traps encoded here (measured on this v5e): vmapped scalar
gathers / take_along_axis / searchsorted all scalarize per lane — every
index operation is a comparison-count or one-hot contraction instead.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from heston_tpu.config import DividendSchedule, GridSpec, SolverConfig
from heston_tpu.models import douglas
from heston_tpu.ops import coeff
from heston_tpu.ops import grid as gridmod
from heston_tpu.ops import operators

TILE = 128

# VMEM capacity model for the fused kernel: ~14 full 3-D fields (5 state/
# band inputs + 2 outputs + 3 scratch + Mosaic step temporaries) must fit
# the chip's VMEM. The 16 MiB figure of round 1 was only the compiler's
# default scoped-vmem cap — the kernel raises it via CompilerParams
# (vmem_limit_bytes below) and the reference's golden grid m1=100, m2=75
# (~54 MiB working set) compiles and runs on v5e at 0.67 ms/option.
# The budget/limit scale with the chip's physical VMEM: on v5e
# (128 MiB physical) the measured-safe budget is 64 MiB (1/2) with a
# 100 MiB compiler cap (100/128); other kinds apply the SAME ratios to
# their physical size — conservative where a kind is unknown. Truly
# oversized grids (e.g. the m1=300 convergence studies) still fall back
# to the XLA path.
_MIB = 1024 * 1024
_VMEM_PHYSICAL_BY_KIND = (
    # (device_kind substring, physical VMEM bytes per core) — public
    # figures; first match wins, scanned in order
    ("v2", 16 * _MIB),
    ("v3", 16 * _MIB),
    ("v4", 128 * _MIB),
    ("v5", 128 * _MIB),     # both v5 lite (measured here) and v5p
    ("v6", 128 * _MIB),     # conservative for Trillium
)
_DEFAULT_PHYSICAL = 128 * _MIB
# 14 measured in round 2 (5 state/band inputs + 2 outputs + 3 scratch +
# Mosaic step temporaries) + 1 for the compensated-summation carry the
# round-3 kernel threads through the time loop (see step())
_FIELDS_RESIDENT = 15
# Craig-Sneyd corrector: the A0(z2) field plus re-staged rhs stay live
# across the re-run of both solves
_CS_EXTRA_FIELDS = 2
# modified Craig-Sneyd: additionally the full L(z2) field
_MCS_EXTRA_FIELDS = 3
# Hundsdorfer-Verwer: like MCS (L(z2) + staged rhs) — the corrector's w2
# increment replaces (not adds to) the live set of the final update
_HV_EXTRA_FIELDS = 3


def _scheme_extra_fields(scheme: str) -> int:
    """Scheme-dependent extra resident VMEM fields (see fits_vmem)."""
    return {"cs": _CS_EXTRA_FIELDS, "mcs": _MCS_EXTRA_FIELDS,
            "hv": _HV_EXTRA_FIELDS}.get(scheme, 0)


@functools.lru_cache(maxsize=None)
def _vmem_physical_bytes() -> int:
    """Physical VMEM of the attached accelerator (the v5e default for
    CPU/interpret backends, where VMEM is not real but the gate must
    stay deterministic and match the chip the tests model)."""
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:  # pragma: no cover - backend init failure
        return _DEFAULT_PHYSICAL
    for sub, size in _VMEM_PHYSICAL_BY_KIND:
        if sub in kind:
            return size
    return _DEFAULT_PHYSICAL


def _vmem_budget_bytes(physical: Optional[int] = None) -> int:
    return (physical or _vmem_physical_bytes()) // 2


def _vmem_limit_bytes(physical: Optional[int] = None) -> int:
    return (physical or _vmem_physical_bytes()) * 100 // 128


def _field_bytes(spec, tile: int, dtype_bytes: int) -> int:
    # s-major [ns, nv, tile]: nv pads to a sublane multiple of 8
    nv_pad = -8 * (-(spec.m2 + 1) // 8)
    return (spec.m1 + 1) * nv_pad * tile * dtype_bytes


def fits_vmem(spec, dtype_bytes: int = 4, n_tangents: int = 0,
              vmem_physical: Optional[int] = None,
              extra_fields: int = 0) -> bool:
    """Whether the fused kernel's working set fits VMEM for this grid at
    the minimum tile width. Both reference grids (m1=50, m2=25 production
    and m1=100, m2=75 golden) fit; price_batch falls back to the XLA path
    beyond. The forward-mode kernel holds ~3 extra full fields per
    tangent (carry in/out + live temporaries), so AD callers must gate
    with n_tangents=JAC_TANGENTS (4 under the default v0_mode="stencil";
    5 with grid-motion v0 tangents) — the primal fitting does NOT imply
    the Jacobian variant fits (at the golden grid it does not).
    `vmem_physical` overrides the device-derived physical VMEM size
    (capacity-model tests for other chip generations); `extra_fields`
    adds scheme-dependent resident fields (the Craig-Sneyd corrector
    keeps ~2 more full fields live across its re-run of the staged
    solves)."""
    field = _field_bytes(spec, 128, dtype_bytes)
    return ((_FIELDS_RESIDENT + extra_fields + 3 * n_tangents) * field
            <= _vmem_budget_bytes(vmem_physical))


def _live_dtype_bytes() -> int:
    return 8 if jax.config.read("jax_enable_x64") else 4


def _scheme_tangent_extra_fields(scheme: str, n_tangents: int) -> int:
    """Scheme + forward-mode resident VMEM fields: the CS/MCS tangent
    phase keeps the predictor increments (z2p) AND the corrector's
    stage-1 increment (z1c) live across the whole tangent loop — two
    fields beyond the primal corrector's. HV additionally keeps the
    corrector's stage-2 increment (w2c, the anchor of its tangent
    penta solve)."""
    extra = _scheme_extra_fields(scheme)
    if n_tangents and scheme in ("cs", "mcs"):
        extra += 2
    elif n_tangents and scheme == "hv":
        extra += 3
    return extra


def _exercise_tangent_extra_fields(n_tangents: int, american: bool,
                                   dividends,
                                   dtype_bytes: int = 4) -> int:
    """Extra resident VMEM fields for forward-mode kernels with an
    American floor and/or dividend re-maps.

    Calibrated from a REAL-CHIP compile failure (2026-08-20, v5e): the
    200-point mixed-ladder american+dividend Jacobian at tile 256 needed
    108.8 MiB scoped VMEM against the model's 45 MiB (3-fields-per-
    tangent only) — the tangent remap/floor temporaries the Mosaic
    scheduler keeps live cost ~(3 + n_events) additional fields PER
    tangent. Counting them drops the chosen tile to 128, which fits.
    Zero when there are no tangents or no exercise/dividend features
    (the plain price kernels have compiled at the old model's tiles for
    three rounds of on-chip captures). Applied to the f32 working set
    only: f32 is the production on-chip dtype the calibration was
    measured at; the f64 interpret/test paths keep the historical model
    (their VMEM is not real, and gating them off would silently retire
    the one-launch contract coverage the f64 suite provides)."""
    if dtype_bytes != 4:
        return 0
    if not n_tangents or not (american or dividends):
        return 0
    n_events = len(dividends.dates) if dividends else 0
    return (3 + n_events) * n_tangents


def _barrier_positions(spec):
    """Static tuple of knocked s indices for the kernels' barrier masks
    (lru_cache-hashable): None for vanilla specs, else a subset of
    (0, m1) — (m1,) up-out, (0,) down-out, (0, m1) double-out."""
    barrier = getattr(spec, "barrier", None)
    if barrier is None:
        return None
    return tuple(p for p, k in ((0, barrier.knock_bottom),
                                (spec.m1, barrier.knock_top)) if k)


def use_fused(spec, solver, n_tangents: int = 0, american: bool = False,
              dividends=None) -> bool:
    """THE dispatch predicate for every fused-kernel call site
    (price_batch, calibrate_device's AD Jacobian, greeks, the sharded
    LM): the kernel implements the Douglas, Craig-Sneyd, modified
    Craig-Sneyd and Hundsdorfer-Verwer schemes — forward-mode tangents
    included for all four
    — requires the pallas engine, and its working set (tangent
    surfaces, the CS corrector's extra live fields, the live dtype
    width) must fit VMEM. Call sites must not re-derive any part of
    this condition (a missed scheme check here once produced a
    DO-Jacobian / CS-residual mismatch in calibrate_device).

    Rannacher start-up damping (solver.rannacher_steps > 0) runs fused
    too: the damp window is its own launches of the same kernel at
    static (theta=1, delta_t/2) — see _run_chunks — so it needs no
    extra VMEM beyond the main scheme's. Knock-out barrier specs run
    fused as well (the barrier is a static s-column mask — see
    _make_kernel's barrier_pos)."""
    if solver.scheme not in ("do", "cs", "mcs", "hv"):
        return False
    extra = (_scheme_tangent_extra_fields(solver.scheme, n_tangents)
             + _exercise_tangent_extra_fields(n_tangents, american,
                                              dividends,
                                              _live_dtype_bytes()))
    return (solver.solver_engine == "pallas"
            and fits_vmem(spec, _live_dtype_bytes(), n_tangents,
                          extra_fields=extra))


def pick_tile(spec, batch: int, dtype_bytes: int = 4,
              n_tangents: int = 0, strict: bool = True,
              vmem_physical: Optional[int] = None,
              extra_fields: int = 0) -> int:
    """Widest WELL-PERFORMING lane-tile whose working set fits VMEM.

    Measured on v5e (round 5, batch-500 american+dividend headline):
    256 lanes is the sweet spot — 0.867 ms vs 0.908 ms at 512 and
    1.051 ms at 128. Wider tiles amortize the sequential sweeps' per-
    iteration overhead over more lanes, but a 512-lane working set
    (~64 MiB with scratch) runs close enough to the VMEM budget that
    the multi-segment dividend launches degrade; 256 keeps ~2x
    headroom and pipelines tiles through the pallas grid instead. The
    forward-mode kernel holds ~3 extra full fields per tangent (carry
    in/out + live temporaries).

    strict=False (interpret mode, where VMEM is not real) falls back to
    the minimum tile when nothing fits."""
    n_fields = _FIELDS_RESIDENT + extra_fields + 3 * n_tangents
    budget = _vmem_budget_bytes(vmem_physical)
    b_pad = max(128, -128 * (-batch // 128))
    for tile in (256, 128):
        if tile <= b_pad and (n_fields * _field_bytes(
                spec, tile, dtype_bytes) <= budget):
            return tile
    if not strict:
        return 128
    # Even the minimum tile exceeds the budget: the caller skipped the
    # fits_vmem(n_tangents=...) gate. Fail loudly here instead of letting
    # Mosaic reject the oversized kernel with a scoped-VMEM error.
    raise ValueError(
        f"fused kernel working set exceeds VMEM at the minimum tile for "
        f"grid ({spec.m1}, {spec.m2}) with {n_tangents} tangents; gate "
        f"the call with fused_do.use_fused/fits_vmem and fall back to "
        f"the XLA path")


def _shift_s(x, k):
    """result[i] = x[i+k], zero outside (s = outermost axis)."""
    n = x.shape[0]
    if k > 0:
        pad = jnp.zeros_like(x[:k])
        return jnp.concatenate([x[k:], pad], axis=0)
    pad = jnp.zeros_like(x[:(-k)])
    return jnp.concatenate([pad, x[:n + k]], axis=0)


def _shift_v(x, k):
    """result[:, j, :] = x[:, j+k, :], zero outside (v = sublane axis)."""
    n = x.shape[1]
    if k > 0:
        pad = jnp.zeros_like(x[:, :k, :])
        return jnp.concatenate([x[:, k:, :], pad], axis=1)
    pad = jnp.zeros_like(x[:, :(-k), :])
    return jnp.concatenate([pad, x[:, :n + k, :]], axis=1)


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
                 n_events: int = 0, n_tangents: int = 0,
                 put: bool = False, per_lane_steps: bool = False,
                 scheme: str = "do",
                 barrier_pos: "Optional[tuple[int, ...]]" = None,
                 digital: bool = False):
    """div_plan: optional static tuple of (seg_start, seg_end,
    n_events_after) triples. When given, the launch runs those time-loop
    segments with dividend re-maps between them. Each re-map is linear
    with <= 2 nonzeros per output column (linear interpolation on the
    s-grid, ref: src/solver.hpp:382-425), so it arrives as four compact
    [ns, TILE] VMEM fields per event — source indices i0/i1 and weights
    w0/w1 — and the dense matrix row for source column c is reconstructed
    on the fly inside the contraction loop. (An HBM+DMA staged variant
    crashes this TPU runtime — see memory notes; plain VMEM inputs are
    the reliable path.)

    n_tangents = K > 0 builds the FORWARD-MODE variant: the kernel also
    carries K tangent surfaces (du_k [, dlam_k]) through the time loop,
    consuming per-tangent 2-D field tangents. Supported tangent
    directions are the five Heston parameters: their only influence on
    the discretization is through the v-grid (dvfl), the A0 coefficient
    (dsfac/dvfac), the v-direction beta weights (dbv*), and the explicit
    A2 bands (da*) — the A1 P/Q bands, s-grid quantities, boundary data
    and dividend re-maps are parameter-independent (tangent zero). Each
    implicit solve's tangent reuses the PRIMAL factorization:
    x = T^-1 r  =>  dx = T^-1 (dr - dT x).

    barrier_pos: static tuple of a knock-out barrier's knocked s
    indices ((m1,) up-out, (0,) down-out, (0, m1) double-out, None for
    vanilla — see _barrier_positions). The ONLY in-kernel effect
    is masking the reconstructed American payoff floor — the input u0 /
    boundary fields arrive pre-masked from _prepare_batched, the
    operator rows keep a zero column at zero by construction (boundary
    rows are reaction-only), and _build_remap_fields zeroes an up-out's
    remap row, so state, compensation and every tangent stay 0 on the
    knocked column through the whole launch.

    per_lane_steps=True adds a [1, TILE] per-lane step-count field: the
    launch runs max(n) steps and lane i freezes (keeps its state, all
    tangents included) once n > n_i — so a WHOLE mixed-maturity
    calibration chain prices in ONE launch under the shared-dt
    steps-per-year convention T_i = n_i * dt (the reference packs per-
    point time_steps/delta_t into one kernel the same way,
    ref: src/heston_calibration.cpp:2165-2213). COMPOSES with div_plan:
    the step-window convention date in [n*dt, (n+1)*dt) assigns every
    event the SAME step index for every maturity (the reference's
    per-point window check does the same under shared dt,
    ref: src/device_solver.hpp:433-437), so the plan is shared; lanes
    whose n_i < event step get IDENTITY remap rows from
    _build_remap_fields — bitwise-equal to per-group launches, which
    never reach that step for those lanes."""
    nv, ns = m2 + 1, m1 + 1
    dt = delta_t
    td = theta * delta_t
    K = n_tangents
    b1_rows = _b1_colrows(m1, m2)
    if scheme not in ("do", "cs", "mcs", "hv"):
        raise ValueError(f"fused kernel implements 'do'/'cs'/'mcs'/'hv' "
                         f"only, got {scheme!r}")

    def kernel(*refs):
        (n0_ref, n1_ref, rf_ref,
         u_ref, *rest) = refs
        rest = list(rest)
        lam_ref = rest.pop(0) if american else None
        (a1pl_ref, a1ql_ref, a1pd_ref, a1qd_ref, a1pu_ref, a1qu_ref,
         vfl_ref, sfac_ref, vfac_ref,
         bsm_ref, bs0_ref, bsp_ref, bvm_ref, bv0_ref, bvp_ref,
         al2_ref, al1_ref, ad_ref, au1_ref, au2_ref,
         b1v_ref, b2r_ref, vecs_ref, kk_ref) = rest[:24]
        rest = rest[24:]
        nst_ref = rest.pop(0) if per_lane_steps else None
        r_refs = rest[:4 * n_events]
        rest = rest[4 * n_events:]
        du_refs = rest[:K]
        rest = rest[K:]
        dlam_refs = []
        if american:
            dlam_refs = rest[:K]
            rest = rest[K:]
        tg_refs = []                      # per k: 11 2-D tangent fields
        for _ in range(K):
            tg_refs.append(rest[:11])
            rest = rest[11:]
        uo_ref = rest.pop(0)
        lamo_ref = rest.pop(0) if american else None
        duo_refs = [rest.pop(0) for _ in range(K)]
        dlamo_refs = [rest.pop(0) for _ in range(K)] if american else []
        (w_ref, itmp_ref, d_ref, e_ref,
         pgm_ref, phm_ref, pm_ref, pc_ref, pc2_ref) = rest

        rf = rf_ref[0]
        n0 = n0_ref[0]
        n1 = n1_ref[0]
        if per_lane_steps:
            # per-TILE early exit: this tile's own max step count bounds
            # its time loop (the loop bound is an SMEM scalar already, so
            # this costs nothing structurally). Steps past the tile max
            # would freeze every lane (see `act` below) — skipping them
            # is bitwise-identical, and a book sorted by maturity turns
            # short-maturity tiles into genuinely shorter launches.
            # Exact: step counts are integers << 2^24 in f32.
            tile_n1 = jnp.max(nst_ref[0]).astype(n1.dtype) + 1
        else:
            tile_n1 = None

        # The A1 bands are RANK-2 in (s, v):
        #   band[i, j] = v_j * P[i] + Q[i]
        # (exact: A1 = 0.5 s^2 v delta + (r_d - r_f) s beta - r_d/2, the
        # only v dependence is the linear diffusion coefficient;
        # ref: src/hes_mat_fac.cpp:61-91). The EXPLICIT bands are carried
        # as six [ns, T] fields + the raw v-grid [nv, T]; the implicit
        # rows I - td*A1 are derived in-kernel (same arithmetic as the
        # XLA assembly — and the explicit multiply avoids the f32
        # cancellation of reconstructing td*A1u as u - (I - td*A1)u).
        vfull = vfl_ref[:]                                  # [nv, T]

        def a1row(p_ref, q_ref, i):
            """Explicit-band row i as a dense [nv, T] block."""
            return vfull * p_ref[i][None, :] + q_ref[i][None, :]

        def a1row_imp(p_ref, q_ref, i, diag=False):
            """Implicit (I - td*A1) band row i."""
            row = -td * a1row(p_ref, q_ref, i)
            return row + 1.0 if diag else row

        def a1full(p_ref, q_ref):
            """Whole explicit band as [ns, nv, T]."""
            return (vfull[None, :, :] * p_ref[:][:, None, :]
                    + q_ref[:][:, None, :])

        def sdiffs(x):
            """Both s-neighbor differences of x — shared by ds_of and the
            A1 multiply so each step traverses x along s only once."""
            return _shift_s(x, -1) - x, _shift_s(x, 1) - x

        # Thomas factorization of the A1 implicit system. s is the OUTER
        # axis, so each sweep iteration touches a dense [nv, TILE] block.
        # Runs once per tile — and again after dividend re-maps, which
        # borrow w_ref as their accumulator.
        def factorize():
            t0 = a1row_imp(a1pd_ref, a1qd_ref, 0, diag=True)
            itmp_ref[0] = 1.0 / t0
            w_ref[0] = jnp.zeros_like(t0)

            def fac_body(i, temp_prev):
                wi = a1row_imp(a1pl_ref, a1ql_ref, i) / temp_prev
                temp = (a1row_imp(a1pd_ref, a1qd_ref, i, diag=True)
                        - wi * a1row_imp(a1pu_ref, a1qu_ref, i - 1))
                w_ref[i] = wi
                itmp_ref[i] = 1.0 / temp
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
        # static position masks over (s, v), built from iota (no captured
        # constants). b1 lives at v-major flat indices m1*(j+1) — here that
        # is mask[s=col, v=row].
        dtype = b2r.dtype
        s_ids = lax.broadcasted_iota(jnp.int32, (ns, nv), 0)
        v_ids = lax.broadcasted_iota(jnp.int32, (ns, nv), 1)
        b1_mask = jnp.zeros((ns, nv), dtype)
        for col, rows in b1_rows.items():
            for r in rows:
                b1_mask = b1_mask + (
                    (s_ids == col) & (v_ids == r)).astype(dtype)
        bottom2d = ((v_ids == nv - 1) & (s_ids >= 1)).astype(dtype)
        smax_mask = (s_ids != ns - 1).astype(dtype)   # [ns, nv]
        if american:
            # payoff is v-independent: reconstruct from the s-grid
            if digital:
                # cell-averaged digital indicator — EXACTLY
                # operators.grid_payoff's clipped affine form, so the
                # floor matches the XLA path's (the one-touch LCP);
                # padded-lane den guard keeps 0-padded s columns finite
                vs = vecs_ref[:]                      # [ns, T]
                kk = kk_ref[0][None, :]
                sp = jnp.concatenate([vs[1:], jnp.zeros_like(vs[:1])], 0)
                sm = jnp.concatenate([jnp.zeros_like(vs[:1]), vs[:-1]], 0)
                _si = lax.broadcasted_iota(jnp.int32, (ns, 1), 0)
                hi = jnp.where(_si == ns - 1, vs, 0.5 * (vs + sp))
                lo = jnp.where(_si == 0, vs, 0.5 * (vs + sm))
                den = jnp.where(hi == lo, jnp.ones_like(hi), hi - lo)
                num = (kk - lo) if put else (hi - kk)
                u0row = jnp.clip(num / den, 0.0, 1.0)
            else:
                intrinsic = (kk_ref[0][None, :] - vecs_ref[:] if put
                             else vecs_ref[:] - kk_ref[0][None, :])
                u0row = jnp.maximum(intrinsic, 0.0)
            if barrier_pos:
                # knocked column(s): Dirichlet 0 from the payoff onward
                # — the exercise floor must not resurrect them
                _bs = lax.broadcasted_iota(jnp.int32, (ns, 1), 0)
                for _bp in barrier_pos:
                    u0row = jnp.where(_bs == _bp,
                                      jnp.zeros_like(u0row), u0row)
            u0 = u0row[:, None, :]

        def bandv(band):
            # a 1-D v band [nv, T] broadcast over the outer s axis
            return band[None, :, :]

        def factorize_penta():
            """LU-style sweep coefficients of the implicit A2 system
            I - td*A2, derived from the explicit bands in-kernel (the
            round-1 design precomputed them with an XLA lax.scan in the
            field prep, ~26 sequential host-graph ops per call). Exactly
            banded.penta_factor's recurrence
            (ref: src/hes_a2_shuffled_kernels.hpp:241-299)."""
            zrow = jnp.zeros_like(vfull[0])
            # statically unrolled (nv <= ~150 rows of [T]-wide ops):
            # dynamic sublane writes on 2-D scratch hit a Mosaic relayout
            # bug ("non-singleton logical dimension is replicated"),
            # static indices lower cleanly
            c1p, c2p, cc1p, cc2p = zrow, zrow, zrow, zrow
            for j in range(nv):
                il2 = -td * al2_ref[j]
                il1 = -td * al1_ref[j]
                idd = 1.0 - td * ad_ref[j]
                iu1 = -td * au1_ref[j]
                iu2 = -td * au2_ref[j]
                big_l = il1 - il2 * c2p
                m = 1.0 / (idd - big_l * c1p - il2 * cc2p)
                c = (iu1 - big_l * cc1p) * m
                c2 = iu2 * m
                pc_ref[j] = c
                pc2_ref[j] = c2
                pgm_ref[j] = big_l * m
                phm_ref[j] = il2 * m
                pm_ref[j] = m
                c1p, c2p, cc1p, cc2p = c, c1p, c2, cc1p

        factorize()
        factorize_penta()

        # ---- explicit multiplies in DIFFERENCE FORM (f32 accuracy):
        # every explicit stencil here is zero-sum up to an analytic
        # reaction (first/second-derivative weights sum to 0; the A1/A2
        # rows add exactly -r_d/2 on their diagonal — operators.py
        # build_a1_bands/build_a2_bands). The insert-and-sort grid quirk
        # can land the spot/v0 node ~1e-2 from a natural node, making
        # the weights O(1/h^2) ~ 1e4: the plain band-multiply form then
        # cancels O(1e4*u) terms to an O(1) result and f32 loses ~1e-4
        # ABSOLUTE per step (the round-2 euro selftest sat at 86% of
        # budget for exactly this reason). Difference form computes the
        # neighbor DIFFERENCES first — exact for close values — so the
        # big weights multiply small numbers and the reaction enters as
        # its analytic value (read off the band rows: a1qd[m1] = -r_d/2,
        # a1qd[0] = row-0 reaction, 0 for calls / -r_d/2 for puts).
        react_row = a1qd_ref[ns - 1]                      # [T] = -r_d/2
        _s_iota = lax.broadcasted_iota(jnp.int32, (ns, 1), 0)
        react_s2 = jnp.where(_s_iota == 0, a1qd_ref[0][None, :],
                             react_row[None, :])          # [ns, T]
        _v_iota = lax.broadcasted_iota(jnp.int32, (nv, 1), 0)
        # A2 reaction rows: 0..m2-2 (vanilla calls) / all (puts,
        # digitals AND top-knocked barriers) — exactly the rows
        # build_a2_bands adds -r_d/2 to
        knock_top = bool(barrier_pos) and (ns - 1) in barrier_pos
        n_react = nv if (put or digital or knock_top) else nv - 2
        react_v2 = jnp.where(_v_iota < n_react, react_row[None, :],
                             jnp.zeros_like(react_row)[None, :])

        # loop-invariant full fields — the A0 coefficient product and
        # both boundary injection patterns (only their SCALAR step
        # coefficients kb1/kb2a/kb2b vary per step). HOISTED out of the
        # time loop only for single-segment launches: measured on v5e
        # (batch-500 headline), hoisting wins ~4-6% there (three fewer
        # fused rebuild passes per step), but in a multi-segment
        # dividend launch ANY hoisting — one shared set of values OR a
        # fresh set per segment — runs ~25% slower (0.86 -> 1.10 ms):
        # Mosaic materializes full-field values captured by fori_loops
        # that coexist with the remap phases instead of folding them
        # into the step's fused pass. Dividend launches therefore
        # rebuild the three products inside every step, where they fuse.
        _hoist = div_plan is None
        if _hoist:
            c_a0_h = sfac[:, None, :] * vfac[None, :, :]
            b1f_h = b1_mask[:, :, None] * b1v[None, None, :]
            b2f_h = bottom2d[:, :, None] * b2r[:, None, :]

        def get_c_a0():
            return (c_a0_h if _hoist
                    else sfac[:, None, :] * vfac[None, :, :])

        def get_b1f():
            return (b1f_h if _hoist
                    else b1_mask[:, :, None] * b1v[None, None, :])

        def get_b2f():
            return (b2f_h if _hoist
                    else bottom2d[:, :, None] * b2r[:, None, :])

        def ds_of(x):
            """beta_s first-derivative stencil along s (A0 inner factor;
            zero-sum weights, difference form)."""
            return (bsm[:, None, :] * (_shift_s(x, -1) - x)
                    + bsp[:, None, :] * (_shift_s(x, 1) - x))

        def dv_of(x, wm, wp):
            """beta_v stencil along v with the given weight rows
            (zero-sum; the center weight is implied, difference form)."""
            return (wm[None, :, :] * (_shift_v(x, -1) - x)
                    + wp[None, :, :] * (_shift_v(x, 1) - x))

        def a1mul_d(dlo, dhi, x):
            """Explicit A1 multiply on precomputed s-diffs, with the
            rank-2 band regrouped: band = v*P + Q, so
            A1 x = v*(Pl*dlo + Pu*dhi) + (Ql*dlo + Qu*dhi) + react*x —
            two fewer full-field traversals than materializing both
            dense bands (a1full) before multiplying."""
            pterm = (a1pl_ref[:][:, None, :] * dlo
                     + a1pu_ref[:][:, None, :] * dhi)
            qterm = (a1ql_ref[:][:, None, :] * dlo
                     + a1qu_ref[:][:, None, :] * dhi)
            return (vfull[None, :, :] * pterm + qterm
                    + react_s2[:, None, :] * x)

        def a1mul(x):
            """Explicit A1 tridiagonal multiply (difference form +
            analytic reaction row)."""
            dlo, dhi = sdiffs(x)
            return a1mul_d(dlo, dhi, x)

        def a2mul(x, c2, c1b, cu1, cu2, react=None):
            """Pentadiagonal multiply along v (difference form; `react`
            is the analytic diagonal rowsum — None for tangent bands,
            whose rows are zero-sum)."""
            acc = (bandv(c2) * (_shift_v(x, -2) - x)
                   + bandv(c1b) * (_shift_v(x, -1) - x)
                   + bandv(cu1) * (_shift_v(x, 1) - x)
                   + bandv(cu2) * (_shift_v(x, 2) - x))
            if react is not None:
                acc = acc + react[None, :, :] * x
            return acc

        def tri_solve():
            """In-place tridiagonal solve of d_ref along s (outer axis —
            every iteration is a dense [nv, TILE] block op); the backward
            substitution writes over the forward sweep (each row is read
            exactly once, at its own step)."""
            if unroll:
                dprev = d_ref[0]
                for i in range(1, ns):
                    dprev = d_ref[i] - w_ref[i] * dprev
                    d_ref[i] = dprev
                xnext = d_ref[ns - 1] * itmp_ref[ns - 1]
                d_ref[ns - 1] = xnext
                for i in range(ns - 2, -1, -1):
                    xnext = (d_ref[i]
                             - a1row_imp(a1pu_ref, a1qu_ref, i) * xnext
                             ) * itmp_ref[i]
                    d_ref[i] = xnext
            else:
                def tri_fwd(i, dprev):
                    dnew = d_ref[i] - w_ref[i] * dprev
                    d_ref[i] = dnew
                    return dnew
                lax.fori_loop(1, ns, tri_fwd, d_ref[0])
                xlast = d_ref[ns - 1] * itmp_ref[ns - 1]
                d_ref[ns - 1] = xlast

                def tri_bwd(k, xnext):
                    i = ns - 2 - k
                    xnew = (d_ref[i]
                            - a1row_imp(a1pu_ref, a1qu_ref, i) * xnext
                            ) * itmp_ref[i]
                    d_ref[i] = xnew
                    return xnew
                lax.fori_loop(0, ns - 1, tri_bwd, xlast)

        def penta_solve():
            """In-place pentadiagonal solve of e_ref along v (v-major
            staging so the sweep also iterates the OUTER axis)."""
            if unroll:
                dp1 = pm_ref[0] * e_ref[0]
                e_ref[0] = dp1
                dp2 = jnp.zeros_like(dp1)
                for j in range(1, nv):
                    dpj = (pm_ref[j] * e_ref[j] - pgm_ref[j] * dp1
                           - phm_ref[j] * dp2)
                    e_ref[j] = dpj
                    dp2, dp1 = dp1, dpj
                x1 = e_ref[nv - 1]
                x2 = jnp.zeros_like(x1)
                for j in range(nv - 2, -1, -1):
                    xj = e_ref[j] - pc_ref[j] * x1 - pc2_ref[j] * x2
                    e_ref[j] = xj
                    x2, x1 = x1, xj
            else:
                dp0 = pm_ref[0] * e_ref[0]
                e_ref[0] = dp0

                def pen_fwd(j, carry):
                    dp1, dp2 = carry
                    dpj = (pm_ref[j] * e_ref[j] - pgm_ref[j] * dp1
                           - phm_ref[j] * dp2)
                    e_ref[j] = dpj
                    return (dpj, dp1)
                lax.fori_loop(1, nv, pen_fwd, (dp0, jnp.zeros_like(dp0)))

                def pen_bwd(k, carry):
                    x1, x2 = carry
                    j = nv - 2 - k
                    xj = e_ref[j] - pc_ref[j] * x1 - pc2_ref[j] * x2
                    e_ref[j] = xj
                    return (xj, x1)
                lax.fori_loop(0, nv - 1, pen_bwd,
                              (e_ref[nv - 1], jnp.zeros_like(dp0)))

        def two_sum(a, b):
            """Branch-free error-free sum (Knuth 2Sum): s = fl(a + b),
            err = a + b - s exactly. XLA/Mosaic preserve IEEE evaluation
            order (no reassociation), so the cancellation is real."""
            s = a + b
            bb = s - a
            err = (a - (s - bb)) + (b - bb)
            return s, err

        def fast_two_sum(a, b):
            """Dekker Fast2Sum — 3 VPU ops instead of 2Sum's 6. Exact
            when exp(a) >= exp(b): true for the state update's a = u
            vs b = dt-scale increment everywhere the captured rounding
            matters (|u| >= |b| wherever eps*|u| dominates); where
            u < |b| the residual error is at eps*|increment| scale,
            orders below the surface RMSE. Used ONLY for the per-step
            state update; remaps keep the unconditional 2Sum."""
            s = a + b
            err = b - (s - a)
            return s, err

        def unpack(carry):
            i = 0
            u = carry[i]; i += 1
            lam_c = None
            if american:
                lam_c = carry[i]; i += 1
            comp = carry[i]; i += 1
            dus = carry[i:i + K]; i += K
            dlams = carry[i:i + K] if american else ()
            return u, lam_c, comp, dus, dlams

        def step(n, carry):
            u, lam_c, comp, dus, dlams = unpack(carry)
            c_a0, b1f, b2f = get_c_a0(), get_b1f(), get_b2f()
            nf = n.astype(u.dtype)
            e0 = jnp.exp(rf * dt * (nf - 1.0))
            e1 = jnp.exp(rf * dt * nf)
            kb1 = dt * e0 + td * (e1 - e0)   # total b1 coefficient (rhs1)
            kb2a = dt * e0                   # b2 coefficient entering rhs1
            kb2b = td * (e1 - e0)            # b2 coefficient entering rhs2

            # DELTA FORM of the Douglas step (f32 accuracy: the round-2
            # full-value form lost ~half its error budget to adds and
            # recurrence roundoff at the magnitude of u; here the solves
            # run on O(dt*L u) increments and u enters via exactly ONE
            # add per step). With z = increment, T = I - td*A:
            #   T1 z1 = dt*((A0+A1+A2) u + lam) + bnd1
            #   T2 z2 = z1 + kb2b*b2
            #   u'    = u + z2
            # Identical algebra to rhs1/rhs2 of models.douglas._do_step
            # (substitute y1 = u + z1): bnd1 carries the SAME kb1/kb2a
            # boundary coefficients.
            dlo, dhi = sdiffs(u)
            dsu = bsm[:, None, :] * dlo + bsp[:, None, :] * dhi
            a2r = a2mul(u, l2b, l1b, u1b, u2b, react_v2)
            # boundary injections: scalar coefficients times the hoisted
            # loop-invariant patterns b1f/b2f
            bnd1 = kb1 * b1f + kb2a * b2f
            lu = c_a0 * dv_of(dsu, bvm, bvp) + a1mul_d(dlo, dhi, u) + a2r
            # the LCP multiplier is carried PRE-SCALED as dtlam = dt*lam
            # (lam_c here): the rhs needs dt*(L u + lam) and the update
            # needs z2 - dt*lam, so the dt-scaled carry saves a multiply
            # and a divide per step (and two roundings)
            rhs1 = dt * lu + bnd1
            if american:
                rhs1 = rhs1 + lam_c
            d_ref[:] = rhs1

            tri_solve()
            z1 = d_ref[:]

            # the b2 boundary term lives ONLY on v-row nv-1 (host prep
            # zeroes b2r[0], so bottom2d's s>=1 mask is already in the
            # data): add it to that single row AFTER the transpose —
            # [ns, T] row op instead of a full-field multiply-add
            e_ref[:] = jnp.swapaxes(z1, 0, 1)
            e_ref[nv - 1] = e_ref[nv - 1] + kb2b * b2r
            penta_solve()
            z2 = jnp.swapaxes(e_ref[:], 0, 1)
            # predictor-stage increments, needed by the CS/MCS/HV tangent
            # phase (for scheme="do" they alias z1/z2; z1c is the
            # corrector's stage-1 increment; w2c is HV's stage-2
            # increment relative to y2)
            z1p, z2p, z1c, w2c = z1, z2, None, None

            if scheme == "cs":
                # Craig-Sneyd corrector (ref: src/solver.hpp:678-778):
                # one extra A0 apply and a re-run of BOTH staged solves
                # with the predictor's increment feeding the mixed-
                # derivative term. In delta form (y2 = u + z2, A0
                # linear): the corrector's stage-1 rhs is exactly the
                # predictor's rhs1 plus 0.5*dt*A0(z2). rhs1 is REBUILT
                # here rather than kept live across the predictor's
                # solves — cheap VPU work that caps resident VMEM
                # (_CS_EXTRA_FIELDS) instead of +4 full fields.
                a0z2 = c_a0 * dv_of(ds_of(z2), bvm, bvp)
                # rhs1 is REBUILT from u (not reused from the predictor):
                # keeping dsu/dlo/dhi live across the predictor's two
                # solves would cost 3 resident fields — cheap VPU work
                # instead (see _CS_EXTRA_FIELDS)
                lu2 = (c_a0 * dv_of(ds_of(u), bvm, bvp)
                       + a1mul(u) + a2mul(u, l2b, l1b, u1b, u2b, react_v2))
                rhs1c = (dt * lu2 + (0.5 * dt) * a0z2
                         + kb1 * b1f + kb2a * b2f)
                if american:
                    rhs1c = rhs1c + lam_c
                d_ref[:] = rhs1c
                tri_solve()
                z1c = d_ref[:]
                e_ref[:] = jnp.swapaxes(z1c, 0, 1)
                e_ref[nv - 1] = e_ref[nv - 1] + kb2b * b2r
                penta_solve()
                z2 = jnp.swapaxes(e_ref[:], 0, 1)
            elif scheme == "mcs":
                # modified Craig-Sneyd (in 't Hout-Foulon; the
                # reference's MCS is marked broken, src/solver.hpp:915):
                # y0_hat = y0 + theta*dt*A0(y2 - u) and y0_tilde adds
                # (1/2 - theta)*dt*(L y2 + b e_n - L u - b e_nm1). In
                # delta form (y2 = u + z2, operators linear) the
                # corrector's stage-1 rhs is the predictor's rhs1 plus
                # td*A0(z2) + (1/2-theta)*dt*(L z2 + (e1-e0)*(b1+b2)).
                a0z2 = c_a0 * dv_of(ds_of(z2), bvm, bvp)
                lz2 = (a0z2 + a1mul(z2)
                       + a2mul(z2, l2b, l1b, u1b, u2b, react_v2))
                lu2 = (c_a0 * dv_of(ds_of(u), bvm, bvp)
                       + a1mul(u) + a2mul(u, l2b, l1b, u1b, u2b, react_v2))
                kmc = (0.5 - theta) * dt * (e1 - e0)
                rhs1c = (dt * lu2 + td * a0z2
                         + ((0.5 - theta) * dt) * lz2
                         + (kb1 + kmc) * b1f + (kb2a + kmc) * b2f)
                if american:
                    rhs1c = rhs1c + lam_c
                d_ref[:] = rhs1c
                tri_solve()
                z1c = d_ref[:]
                e_ref[:] = jnp.swapaxes(z1c, 0, 1)
                e_ref[nv - 1] = e_ref[nv - 1] + kb2b * b2r
                penta_solve()
                z2 = jnp.swapaxes(e_ref[:], 0, 1)
            elif scheme == "hv":
                # Hundsdorfer-Verwer (framework extension; in 't Hout &
                # Foulon 2010) in delta form with the corrector increment
                # taken RELATIVE TO y2 = u + z2 (w = y~ - y2), so the
                # second-stage t_n boundary terms cancel:
                #   T1 w1 = dt*(L u [+lam]) + (dt*e0 + khv)*(b1 + b2)
                #           + 0.5*dt*L z2 - z2
                #   T2 w2 = w1;   u' = u + (z2 + w2)
                a0z2 = c_a0 * dv_of(ds_of(z2), bvm, bvp)
                lz2 = (a0z2 + a1mul(z2)
                       + a2mul(z2, l2b, l1b, u1b, u2b, react_v2))
                lu2 = (c_a0 * dv_of(ds_of(u), bvm, bvp)
                       + a1mul(u) + a2mul(u, l2b, l1b, u1b, u2b, react_v2))
                khv = 0.5 * dt * (e1 - e0)
                rhs1c = (dt * lu2 + (0.5 * dt) * lz2 - z2
                         + (dt * e0 + khv) * (b1f + b2f))
                if american:
                    rhs1c = rhs1c + lam_c
                d_ref[:] = rhs1c
                tri_solve()
                z1c = d_ref[:]
                e_ref[:] = jnp.swapaxes(z1c, 0, 1)
                penta_solve()
                w2c = jnp.swapaxes(e_ref[:], 0, 1)
                z2 = z2 + w2c

            # ---- compensated state update: the ONE u-scale add per step
            # (the delta form's whole point) still rounds at eps*|u| ~
            # 1.2e-5 absolute in f32, and 20 steps random-walk that to
            # the ~2.5-5.5e-5 selftest RMSEs of round 3. 2Sum captures
            # that rounding exactly into a compensation field `comp`
            # carried through the loop (true state = u + comp; comp is
            # folded into the output at the end of the launch). The
            # small-scale terms (z2, dt*lam, comp) are summed first —
            # their roundings are at eps*|z2| ~ 1e-8, negligible.
            if american and digital:
                # STATIC-PIN + BOX projection for the 0/1 obstacle (see
                # douglas._do_step): pin u = payoff on full-payoff
                # nodes (cell-averaged u0 == 1 exactly), project the
                # rest onto [payoff, 1] — the value is bounded above by
                # the unit cash for r_d >= 0, so clipping the ringing's
                # positive lobes is exact; lam_c stays 0 and the
                # compensation resets wherever either bound binds
                t_inc = z2 + comp
                q, err = fast_two_sum(u, t_inc)
                pin = u0 == 1.0
                qm = jnp.maximum(q, u0)
                u_new = jnp.where(pin, u0, jnp.minimum(qm, 1.0))
                interior = jnp.logical_and(
                    jnp.logical_and(q > u0, qm < 1.0),
                    jnp.logical_not(pin))
                comp_new = jnp.where(interior, err,
                                     jnp.zeros_like(err))
                lam_arg = None
                lam_new = lam_c
            elif american:
                t_inc = (z2 - lam_c) + comp
                q, err = fast_two_sum(u, t_inc)  # q + err = u_bar - dt*lam
                u_new = jnp.maximum(q, u0)
                comp_new = jnp.where(q > u0, err, jnp.zeros_like(err))
                # dt*(lam_c/dt + (u0 - u_bar)/dt) with
                # u_bar = q + err + lam_c is ALGEBRAICALLY
                # (u0 - q) - err — and (u0 - q) is a cancellation of two
                # like-scale values (exact by Sterbenz where the
                # constraint is near-active, i.e. exactly where lam
                # matters). lam_arg is the dt-scaled multiplier dt*lam.
                lam_arg = (u0 - q) - err
                lam_new = (jnp.maximum(0.0, lam_arg)
                           * smax_mask[:, :, None])
            else:
                t_inc = z2 + comp
                q, err = fast_two_sum(u, t_inc)
                u_new, comp_new, lam_new = q, err, lam_c

            # ---- tangent phase: for each direction k, push the tangent
            # surface through the SAME step using the primal increments
            # (z1, z2) and factorizations; dx = T^-1 (dr - dT x), i.e.
            # dz = T^-1 (dR + td * dA * z).
            new_dus, new_dlams = [], []
            for k in range(K):
                (dvfl, dsfk, dvfk, dbvm, dbv0, dbvp,
                 dal2, dal1, dad, dau1, dau2) = [r[:] for r in tg_refs[k]]
                du = dus[k]

                def mt_exp(x, dvfl=dvfl):
                    """Tangent EXPLICIT-A1 multiply: d(band) = dvfl x P
                    (P/Q are parameter-independent; P rows are the
                    zero-sum diffusion weights, so difference form is
                    exact — the implied center is -(pl+pu))."""
                    return ((dvfl[None, :, :] * a1pl_ref[:][:, None, :])
                            * (_shift_s(x, -1) - x)
                            + (dvfl[None, :, :] * a1pu_ref[:][:, None, :])
                            * (_shift_s(x, 1) - x))

                # d/dtheta of the explicit A2 result on u, plus A2 on du
                # (tangent bands are zero-sum: the -r_d/2 reaction is
                # parameter-independent, so react=None)
                a2t = (a2mul(u, dal2, dal1, dau1, dau2)
                       + a2mul(du, l2b, l1b, u1b, u2b, react_v2))
                # d/dtheta of A0 u: coefficient motion + v-weight motion
                # + A0 on du (s-weights are parameter-independent)
                a0t = ((dsfk[:, None, :] * vfac[None, :, :]
                        + sfac[:, None, :] * dvfk[None, :, :])
                       * dv_of(dsu, bvm, bvp)
                       + c_a0 * dv_of(dsu, dbvm, dbvp)
                       + c_a0 * dv_of(ds_of(du), bvm, bvp))
                # tangent of T1 z1 = R1 (boundary tangents are zero for
                # parameter directions): dz1 = T1^-1 (dR1 + td * dA1 z1)
                trhs = dt * (a0t + mt_exp(u) + a1mul(du) + a2t)
                if american:
                    trhs = trhs + dlams[k]   # dlam carried dt-scaled
                d_ref[:] = trhs + td * mt_exp(z1p)
                tri_solve()
                # tangent penta: T2 z2 = z1 + kb2b*b2 gives
                # dz2 = T2^-1 (dz1 + td * dA2 z2)
                e_ref[:] = jnp.swapaxes(
                    d_ref[:]
                    + td * a2mul(z2p, dal2, dal1, dau1, dau2), 0, 1)
                penta_solve()
                dz2p = jnp.swapaxes(e_ref[:], 0, 1)

                if scheme != "do":
                    # corrector tangent: differentiate the corrector's
                    # stage-1 rhs (predictor rhs + the A0/L(z2p) terms)
                    # and re-run both staged tangent solves against the
                    # corrector's primal increments (z1c, final z2).
                    # dA0(x) = coefficient motion + v-weight motion;
                    # A0(dx) completes the product rule.
                    def a0_tan(x):
                        dsx = ds_of(x)
                        return ((dsfk[:, None, :] * vfac[None, :, :]
                                 + sfac[:, None, :] * dvfk[None, :, :])
                                * dv_of(dsx, bvm, bvp)
                                + c_a0 * dv_of(dsx, dbvm, dbvp))

                    da0z2 = a0_tan(z2p) + c_a0 * dv_of(ds_of(dz2p),
                                                       bvm, bvp)
                    if scheme == "cs":
                        crhs = trhs + (0.5 * dt) * da0z2
                    else:   # mcs / hv share d(L z2p)
                        # full d/dtheta of L(z2p) (the boundary terms
                        # are parameter-independent)
                        dlz2 = (da0z2 + mt_exp(z2p)
                                + a2mul(z2p, dal2, dal1, dau1, dau2)
                                + a1mul(dz2p)
                                + a2mul(dz2p, l2b, l1b, u1b, u2b,
                                        react_v2))
                        if scheme == "mcs":
                            # d/dtheta of td*A0(z2p)
                            #   + (1/2-theta)*dt*L(z2p)
                            crhs = (trhs + td * da0z2
                                    + ((0.5 - theta) * dt) * dlz2)
                        else:   # hv: d/dtheta of 0.5*dt*L(z2p) - z2p
                            crhs = trhs - dz2p + (0.5 * dt) * dlz2
                    d_ref[:] = crhs + td * mt_exp(z1c)
                    tri_solve()
                    # stage-2 tangent anchors at the corrector's OWN
                    # penta solution: z2 (relative to u) for CS/MCS,
                    # w2c (relative to y2) for HV
                    a2anchor = w2c if scheme == "hv" else z2
                    e_ref[:] = jnp.swapaxes(
                        d_ref[:]
                        + td * a2mul(a2anchor, dal2, dal1, dau1, dau2),
                        0, 1)
                    penta_solve()
                    dw = jnp.swapaxes(e_ref[:], 0, 1)
                    # HV's total increment tangent is d(z2p) + d(w2)
                    dubar = du + (dz2p + dw if scheme == "hv" else dw)
                else:
                    dubar = du + dz2p

                if american and digital:
                    # static-pin + box: pinned/clipped nodes are
                    # constants (tangent 0); elsewhere the exact
                    # min(max(.)) JVP (0.5 on ties), branching on the
                    # SAME primal values (q, qm); dlam stays 0
                    dm = jnp.where(q > u0, dubar,
                                   jnp.where(q < u0, 0.0, 0.5 * dubar))
                    du_new = jnp.where(
                        u0 == 1.0, 0.0,
                        jnp.where(qm < 1.0, dm,
                                  jnp.where(qm > 1.0, 0.0, 0.5 * dm)))
                    new_dus.append(du_new)
                    new_dlams.append(dlams[k])
                elif american:
                    # match XLA's maximum-JVP exactly (0.5 weight on
                    # ties), branching on the SAME compensated primal
                    # values (q, lam_arg) the state update used
                    da = dubar - dlams[k]
                    du_new = jnp.where(
                        q > u0, da, jnp.where(q < u0, 0.0, 0.5 * da))
                    darg = dlams[k] - dubar   # tangent of dt-scaled lam_arg
                    dlam_new = jnp.where(
                        lam_arg > 0.0, darg,
                        jnp.where(lam_arg < 0.0, 0.0, 0.5 * darg)
                    ) * smax_mask[:, :, None]
                    new_dus.append(du_new)
                    new_dlams.append(dlam_new)
                else:
                    new_dus.append(dubar)

            if per_lane_steps:
                # mixed-maturity launch: lane i freezes (state AND
                # tangents) once the shared step counter passes its own
                # n_i — identical arithmetic to a dedicated n_i-step
                # launch for every active step, so the one-launch path is
                # bitwise-equal to the per-maturity-group path
                act = (nst_ref[0] >= nf)[None, None, :]
                u_new = jnp.where(act, u_new, u)
                comp_new = jnp.where(act, comp_new, comp)
                if american:
                    lam_new = jnp.where(act, lam_new, lam_c)
                new_dus = [jnp.where(act, nd, d)
                           for nd, d in zip(new_dus, dus)]
                new_dlams = [jnp.where(act, nd, d)
                             for nd, d in zip(new_dlams, dlams)]
            if american:
                return (u_new, lam_new, comp_new, *new_dus, *new_dlams)
            return (u_new, comp_new, *new_dus)

        def remap(u, e_idx, ev_step=None):
            """u <- contract(u, R_e) over the s axis, returning
            (value, err) with err the exactly-captured rounding of the
            final u-scale add. R_e is rank-structured:
            R_e[c, i] = w0[i]*(i0[i]==c) + w1[i]*(i1[i]==c)
            (2-point interpolation), so its row for source column c is
            rebuilt on the fly from the four compact [ns, TILE] fields.
            s is the outer axis, so both the staged read (d_ref[c]) and
            the accumulation are dense [nv, TILE] block ops. w_ref is
            borrowed as the accumulator; the caller re-runs factorize()
            before the next time-loop segment.

            DIFFERENCE FORM (f32): the weights of each output column sum
            to W in {0, 1} (1 - w + w, or all-zero for a call column
            pushed below s = 0), so u_new = W*u + sum_c rc*(u[c] - u[i])
            — the interpolation arrives as a small-scale correction to
            the column's own value (2-3 roundings at eps*|u| per event
            in the plain form, which would dominate once the step adds
            are compensated) and the single remaining u-scale add is
            2Sum-captured into the returned err."""
            i0 = r_refs[4 * e_idx][:]
            w0 = r_refs[4 * e_idx + 1][:]
            i1 = r_refs[4 * e_idx + 2][:]
            w1 = r_refs[4 * e_idx + 3][:]
            wsum = jnp.where(w0 + w1 > 0.5, jnp.ones_like(w0),
                             jnp.zeros_like(w0))              # exact {0,1}
            d_ref[:] = u
            w_ref[:] = jnp.zeros_like(u)

            def contract(c, _):
                cf = c.astype(i0.dtype)
                rc = (w0 * (i0 == cf).astype(w0.dtype)
                      + w1 * (i1 == cf).astype(w0.dtype))    # [ns, T]
                w_ref[:] = w_ref[:] + (rc[:, None, :]
                                       * (d_ref[c][None, :, :] - d_ref[:]))
                return 0
            # per-TILE event skip in mixed-maturity books: when every
            # lane of this tile matured before the event (tile max step
            # < ev_step), every remap row is the IDENTITY (see
            # _build_remap_fields nsteps) and each identity column's
            # contraction term is exactly rc*(d[i]-d[i]) = 0 — so the
            # whole O(ns^2) contraction can be skipped (w_ref stays 0,
            # wsum is 1, output = u exactly)
            n_hi = ns
            if ev_step is not None and tile_n1 is not None:
                n_hi = jnp.where(tile_n1 > ev_step, ns, 0)
            lax.fori_loop(0, n_hi, contract, 0)
            return two_sum(wsum[:, None, :] * d_ref[:], w_ref[:])

        carry = [u_ref[:]]
        if american:
            # dt-scaled multiplier carry (see the rhs1 comment in step)
            carry.append(dt * lam_ref[:])
        carry.append(jnp.zeros_like(u_ref[:]))   # compensation field
        carry += [r[:] for r in du_refs]
        carry += [dt * r[:] for r in dlam_refs]
        carry = tuple(carry)

        if div_plan is None:
            # per-lane books: the bound is ALREADY an SMEM scalar, so
            # min() with the tile max keeps the while-loop lowering (and
            # with it bitwise equality to the per-group launches) while
            # letting short-maturity tiles exit early.
            hi = n1 if tile_n1 is None else jnp.minimum(n1, tile_n1)
            carry = lax.fori_loop(n0, hi, step, carry)
        else:
            e_idx = 0
            w_dirty = False   # w_ref clobbered by a remap staging?
            for (seg_a, seg_b, k_events) in div_plan:
                if seg_b > seg_a:
                    if w_dirty:
                        if tile_n1 is None:
                            factorize()
                        else:
                            # skip the re-factorization sweep for tiles
                            # whose segment loop below is empty (their
                            # lanes all matured — w/itmp are never read
                            # again); pl.when is legal here because
                            # factorize only writes refs
                            @pl.when(tile_n1 > seg_a)
                            def _refac():
                                factorize()
                        w_dirty = False
                    # per-TILE early exit for mixed-maturity dividend
                    # books too: steps past the tile's own max lane
                    # count would freeze every lane (see `act`), so
                    # clamping each segment's bound is arithmetically
                    # identical and a maturity-sorted book's short
                    # tiles skip most of the ladder (round-4's mixed
                    # 5000-option american+dividend launch ran every
                    # tile to the full 20 steps — half its 7% VPU
                    # utilization was frozen-lane work). The dynamic
                    # bound switches the fori lowering scan->while,
                    # which shifts real-chip results by ~1 ulp vs the
                    # per-group launches (fusion/FMA contraction);
                    # interpret-mode equality is unaffected.
                    hi_seg = (seg_b if tile_n1 is None
                              else jnp.minimum(seg_b, tile_n1))
                    carry = lax.fori_loop(seg_a, hi_seg, step, carry)
                for _ in range(k_events):
                    # the re-map is linear and parameter-independent, so
                    # it applies identically to u, the compensation and
                    # every tangent. The compensation is FOLDED into u
                    # (2Sum: u_f + res == u + comp exactly) before the
                    # remap rather than remapped in its own O(ns^2)
                    # contraction — the round-4 second contraction per
                    # event cost ~10% of the batch500 headline. The
                    # fold's sub-ulp residue `res` is dropped (its remap
                    # would cost a full contraction to move an
                    # eps*|u|-scale field a few columns): at most one
                    # uncompensated rounding per event, measured well
                    # inside every selftest arm's budget. The u remap's
                    # own captured rounding e2 restarts the compensation.
                    u_c, lam_c, comp_c, dus, dlams = unpack(carry)
                    if barrier_pos or put:
                        # barrier and put kernels keep the full comp
                        # remap: the knock discontinuity (and the put's
                        # deep-ITM K-scale plateau, whose remap copies
                        # column 0) puts eps*|u|-scale compensation
                        # right where the remap moves mass — folding it
                        # into u costs 3x the arm RMSE there (measured:
                        # up-out amer+div 4.9e-5 -> 1.4e-4 over the
                        # 1e-4 budget; put amer+div 1.2e-5 -> 2.8e-5
                        # against a 3.5e-5 budget)
                        u_c, e2 = remap(u_c, e_idx, seg_b)
                        comp_c = remap(comp_c, e_idx, seg_b)[0] + e2
                    else:
                        u_f, _res = two_sum(u_c, comp_c)
                        u_c, e2 = remap(u_f, e_idx, seg_b)
                        comp_c = e2
                    dus = [remap(d, e_idx, seg_b)[0] for d in dus]
                    carry = tuple(([u_c, lam_c] if american else [u_c])
                                  + [comp_c] + list(dus) + list(dlams))
                    e_idx += 1
                    w_dirty = True

        u_c, lam_c, comp_c, dus, dlams = unpack(carry)
        # fold the compensation into the output representation (the one
        # rounding the output dtype cannot avoid)
        uo_ref[:] = u_c + comp_c
        if american:
            lamo_ref[:] = lam_c / dt   # un-scale the dt*lam carry
        for k in range(K):
            duo_refs[k][:] = dus[k]
            if american:
                dlamo_refs[k][:] = dlams[k] / dt

    return kernel


@functools.lru_cache(maxsize=None)
def _segment_call(m1: int, m2: int, theta: float, delta_t: float,
                  american: bool, dtype_name: str, interpret: bool,
                  unroll: bool = False, div_plan=None, n_events: int = 0,
                  n_tiles: int = 1, tile: int = TILE, n_tangents: int = 0,
                  put: bool = False, per_lane_steps: bool = False,
                  scheme: str = "do",
                  barrier_pos: "Optional[tuple[int, ...]]" = None,
                  digital: bool = False):
    """pallas_call for the WHOLE batch: tiles are iterated by the pallas
    grid within one launch (Mosaic pipelines the per-tile HBM<->VMEM
    traffic; scratch is re-initialized per tile by the kernel).
    n_tangents > 0 builds the forward-mode variant (see _make_kernel);
    per_lane_steps adds the [1, tile] step-count input for one-launch
    mixed-maturity books."""
    nv, ns = m2 + 1, m1 + 1
    K = n_tangents
    dtype = jnp.dtype(dtype_name)
    kernel = _make_kernel(m1, m2, theta, delta_t, american, unroll,
                          div_plan, n_events, n_tangents, put,
                          per_lane_steps, scheme, barrier_pos,
                          digital=digital)

    big_spec = lambda: pl.BlockSpec((ns, nv, tile), lambda t: (0, 0, t),
                                    memory_space=pltpu.VMEM,
                                    pipeline_mode=pl.Buffered(1))
    sb_spec = lambda: pl.BlockSpec((ns, tile), lambda t: (0, t),
                                   memory_space=pltpu.VMEM)
    vb_spec = lambda: pl.BlockSpec((nv, tile), lambda t: (0, t),
                                   memory_space=pltpu.VMEM)
    one_spec = lambda: pl.BlockSpec((1, tile), lambda t: (0, t),
                                    memory_space=pltpu.VMEM)
    smem1 = lambda: pl.BlockSpec((1,), lambda t: (0,),
                                 memory_space=pltpu.SMEM)

    n_big = 2 if american else 1
    n_state = n_big * (1 + K)               # u [, lam], du_k [, dlam_k]
    # per-tangent 2-D fields: dvfl, dsfac, dvfac, dbv*(3), da2 bands (5)
    tg_specs = ([vb_spec(), sb_spec()] + [vb_spec()] * 9) * K
    in_specs = (
        [smem1(), smem1(), smem1()]          # n0, n1, rf
        + [big_spec()] * n_big               # u [, lam]
        + [sb_spec()] * 6 + [vb_spec()]      # A1 P/Q bands, vfull
        + [sb_spec(), vb_spec()]             # sfac, vfac
        + [sb_spec()] * 3 + [vb_spec()] * 3  # bs, bv weights
        + [vb_spec()] * 5                    # explicit a2 bands
        + [one_spec(), sb_spec()]            # b1v, b2r
        + [sb_spec(), one_spec()]            # vec_s, strike
        + ([one_spec()] if per_lane_steps else [])   # per-lane n_steps
        + [sb_spec()] * (4 * n_events)       # remap i0/w0/i1/w1 per event
        + [big_spec()] * (n_state - n_big)   # du_k [, dlam_k]
        + tg_specs
    )
    big = jax.ShapeDtypeStruct((ns, nv, n_tiles * tile), dtype)
    out_shape = [big] * n_state
    out_specs = [big_spec()] * n_state

    scratch = [
        pltpu.VMEM((ns, nv, tile), dtype),   # w  (Thomas multipliers;
                                             # doubles as remap accum)
        pltpu.VMEM((ns, nv, tile), dtype),   # 1/temp
        pltpu.VMEM((ns, nv, tile), dtype),   # d (solve workspace)
        pltpu.VMEM((nv, ns, tile), dtype),   # e (v-major penta staging)
    ] + [pltpu.VMEM((nv, tile), dtype)] * 5  # penta factors (in-kernel)

    # alias the state through the call: u -> out0 (, lam -> out1), and
    # each tangent carry to its output. Output order: u [, lam],
    # du_0..K-1 [, dlam_0..K-1]; tangent inputs sit right after the remap
    # fields.
    aliases = {3: 0}
    if american:
        aliases[4] = 1
    tg_in_base = (3 + n_big + 24 + (1 if per_lane_steps else 0)
                  + 4 * n_events)
    for k in range(n_state - n_big):
        aliases[tg_in_base + k] = n_big + k

    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        input_output_aliases=aliases,
        interpret=interpret,
        # the default scoped-vmem cap (16 MiB) is below the chip's real
        # VMEM; the single-launch working set (state + scratch + Mosaic
        # step temporaries) measures ~18 MiB at the production grid and
        # ~54 MiB at the golden grid (both verified running on v5e)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit_bytes()),
    )


def _prepare_batched(spec, solver, strikes, s0, kappa, eta, sigma, rho, v0,
                     r_d, r_f, option_type="call", nsteps=None,
                     anchor=None):
    """vmap the existing operator assembly over the book, then transpose
    every field to batch-last tiles. `nsteps`: optional per-option step
    counts (mixed-maturity books) — they scale each option's boundary
    data through its OWN e^{-rate dt (n_i - 1)} factor. `anchor`:
    optional static override of that baked boundary time-scaling factor
    (rate-schedule segments, see operators.rate_segment_structure;
    uniform books only — callers gate per-lane + schedule off)."""
    put = operators.is_put(option_type)
    barrier = getattr(spec, "barrier", None)
    if nsteps is None:
        nsteps = jnp.full(strikes.shape, solver.n_steps,
                          jnp.result_type(float))

    def one(k, nsf):
        g = gridmod.make_grid(spec, s0, k, v0)
        # per-option nsf (mixed-maturity books) so ops.b carries each
        # option's OWN e^{-rate dt (n_i - 1)} boundary scaling — surface
        # consumers (batch_greeks' theta epilogue) stay exact per lane
        ops = operators.build_operators(
            g, kappa, eta, sigma, rho, r_d, r_f, solver.theta,
            solver.delta_t, nsf, solver.a2_variant,
            option_type, k, barrier, anchor)
        dtype = g.vec_s.dtype
        u0 = operators.grid_payoff(
            g.vec_s[None, :], k, option_type) * jnp.ones(
            (spec.m2 + 1, 1), dtype)
        if barrier is not None:
            # knocked at expiry too: Dirichlet 0 from the payoff onward
            # (the rule shared with douglas.prepare_instance)
            u0 = barrier.mask_payoff(u0)
        # separable A0 coefficient: rho*sigma*s (cols 1..m1-1) x v (rows
        # 1..m2-1); product equals ops.a0_c
        scol = rho * sigma * g.vec_s
        scol = scol.at[0].set(0.0).at[-1].set(0.0)
        vrow = g.vec_v
        vrow = vrow.at[0].set(0.0).at[-1].set(0.0)
        # rank-2 form of the EXPLICIT A1 bands: A1[i, j] =
        # vec_v[j] * P[i] + Q[i]; the kernel derives the implicit rows
        # I - td*A1 itself (a1row_imp). Boundary rows: row 0 zero (its
        # implicit row is identity), row m1 keeps only the -r_d/2
        # reaction (ref: src/hes_mat_fac.cpp:61-91).
        m1 = spec.m1
        h0 = g.dels[: m1 - 1]
        h1 = g.dels[1:m1]
        dm, d0, dp = coeff.w_delta(h0, h1)
        bm, b0, bp = coeff.w_beta(h0, h1)
        s_int = g.vec_s[1:m1]
        a = 0.5 * s_int * s_int
        bb = (r_d - r_f) * s_int

        def cat(left, mid, right):
            return jnp.concatenate(
                [jnp.full((1,), left, dtype), mid,
                 jnp.full((1,), right, dtype)])

        a1pl = cat(0.0, a * dm, 0.0)
        a1ql = cat(0.0, bb * bm, 0.0)
        a1pd = cat(0.0, a * d0, 0.0)
        # puts: row 0 (s = 0) carries the -r_d/2 reaction of the far
        # field U(0, tau) = K e^{-r_d tau} (see operators.build_a1_bands)
        q_left = -0.5 * r_d if put else 0.0
        a1qd = cat(q_left, bb * b0 - 0.5 * r_d, -0.5 * r_d)
        a1pu = cat(0.0, a * dp, 0.0)
        a1qu = cat(0.0, bb * bp, 0.0)
        # boundary data: b1 scalar + bottom-row values, scaled through
        # time at operators.boundary_rate (r_f calls / r_d puts)
        rate = operators.boundary_rate(r_d, r_f, option_type)
        if anchor is None:
            efac = jnp.exp(jnp.asarray(
                -rate * solver.delta_t * (nsf - 1.0), dtype))
        else:
            efac = jnp.asarray(anchor, dtype)
        if (operators.is_injection_free(option_type)
                or (barrier is not None and barrier.knock_top)):
            # no injection vectors for puts/digitals or top-knocked
            # barriers — the up-out/double-out far s boundary IS the
            # Dirichlet-0 barrier (operators.build_boundary_vectors);
            # down-out CALLS keep the vanilla vectors (their far
            # boundary is the usual s_max)
            b1val = jnp.zeros((), dtype)
            b2row = jnp.zeros_like(g.vec_s)
        else:
            b1val = (r_d - r_f) * g.vec_s[-1] * efac
            b2row = (-0.5 * r_d * g.vec_s * efac).at[0].set(0.0)
        idx_s = gridmod.find_node(g.vec_s, s0)
        idx_v = gridmod.find_node(g.vec_v, v0)
        return (ops, u0, (a1pl, a1ql, a1pd, a1qd, a1pu, a1qu), g.vec_v,
                scol, vrow, b1val, b2row, g.vec_s, idx_s, idx_v)

    return jax.vmap(one)(strikes, nsteps)


def _build_remap_fields(vec_s, events, dtype, option_type="call",
                        nsteps=None, barrier=None):
    """Compact per-option re-map fields: the dense matrix
    R_e[c, i] (U_new[:, i] = sum_c U[:, c] R[c, i]) of
    models.douglas.apply_dividend has <= 2 nonzeros per output column i,
    so per event only (i0, w0, i1, w1), each [B, ns], is stored:
    R_e[c, i] = w0[i]*(i0[i]==c) + w1[i]*(i1[i]==c). Indices are carried
    in the kernel dtype (exact for node counts << 2^24).

    `events` are (step, amount, pct) triples; `nsteps` (optional,
    [B] per-option step counts of a mixed-maturity launch) turns the
    rows of options whose maturity ends BEFORE an event's step into the
    IDENTITY map (i0 = i1 = own column, w0 = 1, w1 = 0) — their
    per-maturity-group launches never reach that step, and the identity
    keeps the one-launch path bitwise-equal (the difference-form remap
    contributes exactly 0 and two_sum(u, 0) = (u, 0)).

    Calls zero the surface where the dividend pushes new_s <= 0 (the
    reference's convention, exact because U(0) = 0 for calls); puts copy
    column 0 instead (U(0) ~ K there — zeroing would destroy the put's
    deep-ITM region).

    `barrier`: an UP-OUT knock-out zeroes the weights of the barrier
    column ns-1 (wsum 0 -> output 0), matching
    douglas.apply_dividend(barrier=...)'s re-knock; a down-out needs no
    mask — its bottom node falls below the grid and the idx == 0
    fall-through copies column 0, which is already 0."""
    b, ns = vec_s.shape
    m1 = ns - 1
    c_ids = jnp.arange(ns, dtype=jnp.int32)[None, :, None]   # [1, c, 1]
    own = jnp.broadcast_to(
        jnp.arange(ns, dtype=dtype)[None, :], (b, ns))       # identity i0/i1
    fields = []
    for step_n, amount, pct in events:
        new_s = vec_s * (1.0 - pct) - amount            # [B, i]
        # first strictly-greater index as a comparison count, and the
        # grid values at lo/idx as one-hot contractions — vectorized:
        # both vmapped searchsorted AND take_along_axis scalarize into
        # per-lane gathers on TPU (measured ~2 ms for 4 events at B=512,
        # vs ~0.2 ms for the one-hot forms)
        idx = jnp.sum(vec_s[:, :, None] <= new_s[:, None, :],
                      axis=1).astype(jnp.int32)
        idx = jnp.where(idx > m1, 0, idx)
        lo = jnp.maximum(idx - 1, 0)
        oh_lo = (c_ids == lo[:, None, :]).astype(dtype)       # [B, c, i]
        oh_hi = (c_ids == idx[:, None, :]).astype(dtype)
        s_lo = jnp.sum(vec_s[:, :, None] * oh_lo, axis=1)
        s_hi = jnp.sum(vec_s[:, :, None] * oh_hi, axis=1)
        w = (new_s - s_lo) / jnp.where(s_hi == s_lo, 1.0, s_hi - s_lo)
        valid = (jnp.ones_like(new_s) if operators.is_put(option_type)
                 else (new_s > 0.0).astype(dtype))
        is_left = idx == 0        # left extrapolation: copy column 0
        i0 = jnp.where(is_left, 0, lo).astype(dtype)
        i1 = jnp.where(is_left, 0, idx).astype(dtype)
        # Sterbenz pairing: derive the complement from whichever weight
        # is >= 0.5, so 1 - x is EXACT and the pair sums to exactly 1.0
        # in the kernel dtype. The kernel's difference-form remap (see
        # _make_kernel.remap) implicitly weights the column's own value
        # by (1 - w0 - w1); a 2^-25-scale residual there multiplies
        # O(100)-scale surface values
        wc = w.astype(dtype)
        one = jnp.asarray(1.0, dtype)
        w0i = one - wc                      # exact where wc >= 0.5
        w1i = jnp.where(wc >= 0.5, wc, one - w0i)  # exact complement else
        w0 = valid * jnp.where(is_left, 1.0, w0i).astype(dtype)
        w1 = valid * jnp.where(is_left, 0.0, w1i).astype(dtype)
        if barrier is not None and barrier.knock_top:
            # re-knock the barrier column (BEFORE the frozen-lane
            # identity below: a frozen lane must keep its state exactly,
            # knocked column included — which is already 0)
            w0 = w0.at[:, -1].set(0.0)
            w1 = w1.at[:, -1].set(0.0)
        if nsteps is not None:
            act = (jnp.asarray(nsteps) >= step_n)[:, None]   # [B, 1]
            i0 = jnp.where(act, i0, own)
            i1 = jnp.where(act, i1, own)
            w0 = jnp.where(act, w0, jnp.ones_like(w0))
            w1 = jnp.where(act, w1, jnp.zeros_like(w1))
        fields.append((i0, w0, i1, w1))                  # each [B, ns]
    return fields


MAX_EVENTS_PER_LAUNCH = 8  # compact fields: 4 x [ns, TILE] per event


def _chunk_dividend_plan(solver, dividends, n_lo=1, n_hi=None,
                         to_local=None, local_end=None):
    """Split the static schedule into launch chunks of
    <= MAX_EVENTS_PER_LAUNCH events. Returns a list of
    (plan_tuple, [(step, amount, pct)...]) where plan covers a
    contiguous step range.

    `n_lo..n_hi` (inclusive, MAIN step indexing) select the phase
    window; `to_local` maps a main step to the phase-local index the
    kernel's time loop runs on (the Rannacher damp phase runs sub-steps
    k = 2n-1, 2n per main step n), and `local_end` is the phase-local
    exclusive loop end. Defaults reproduce the single-phase plan."""
    n_hi = solver.n_steps if n_hi is None else n_hi
    to_local = (lambda n: n) if to_local is None else to_local
    local_end = (n_hi + 1) if local_end is None else local_end
    items = []      # (local_step, [(local_step, amount, pct), ...])
    for n in range(n_lo, n_hi + 1):
        ev = [(to_local(n), a, p)
              for (a, p) in dividends.events_for_step(n, solver.delta_t)]
        if ev:
            items.append((to_local(n), ev))
    chunks = []
    cur_plan = []
    cur_events = []
    seg_start = to_local(n_lo)
    for step_n, ev in items:
        if len(cur_events) + len(ev) > MAX_EVENTS_PER_LAUNCH and cur_events:
            cur_plan.append((seg_start, step_n, 0))
            chunks.append((tuple(cur_plan), cur_events))
            cur_plan, cur_events = [], []
            seg_start = step_n
        cur_plan.append((seg_start, step_n, len(ev)))
        cur_events.extend(ev)
        seg_start = step_n
    cur_plan.append((seg_start, local_end, 0))
    chunks.append((tuple(cur_plan), cur_events))
    return chunks


def _assemble(spec, solver, strikes_p, s0, kappa, eta, sigma, rho, v0,
              r_d, r_f, option_type="call", nsteps_p=None, anchor=None):
    """Build every kernel input field (batch-last, s-major) plus the
    extraction indices for a padded strike vector. Also returns the
    vmapped HestonOperators so surface consumers (fused_surface_batch ->
    batch_greeks' theta epilogue) don't re-run the whole assembly.
    `nsteps_p`: padded per-option step counts — adds the "nst" field the
    per-lane-steps kernel consumes. `anchor`: boundary time-scaling
    override for rate-schedule segments (see _prepare_batched)."""
    (ops, u0, a1pq, vfull, scol, vrow, b1val, b2row, vec_s, idx_s, idx_v
     ) = _prepare_batched(spec, solver, strikes_p, s0, kappa, eta, sigma,
                          rho, v0, r_d, r_f, option_type, nsteps_p,
                          anchor)

    # batch goes LAST (the lane axis); the pallas grid walks tile-blocks.
    # Big fields are s-major in the kernel: [s, v, options].
    def tiles3(x):   # [B, nv, ns] -> [ns, nv, B]
        return jnp.transpose(x, (2, 1, 0))

    def tiles2(x):   # [B, n] -> [n, B]
        return jnp.moveaxis(x, 0, -1)

    def tiles1(x):   # [B] -> [1, B]
        return x.reshape(1, -1)

    fields = dict(
        u=tiles3(u0),
        lam=jnp.zeros_like(tiles3(u0)),
        a1pl=tiles2(a1pq[0]), a1ql=tiles2(a1pq[1]),
        a1pd=tiles2(a1pq[2]), a1qd=tiles2(a1pq[3]),
        a1pu=tiles2(a1pq[4]), a1qu=tiles2(a1pq[5]),
        vfl=tiles2(vfull),
        sfac=tiles2(scol), vfac=tiles2(vrow),
        bsm=tiles2(ops.bs_wm), bs0=tiles2(ops.bs_w0), bsp=tiles2(ops.bs_wp),
        bvm=tiles2(ops.bv_wm), bv0=tiles2(ops.bv_w0), bvp=tiles2(ops.bv_wp),
        al2=tiles2(ops.a2_l2), al1=tiles2(ops.a2_l1), ad=tiles2(ops.a2_d),
        au1=tiles2(ops.a2_u1), au2=tiles2(ops.a2_u2),
        b1v=tiles1(b1val), b2r=tiles2(b2row),
        vecs=tiles2(vec_s), kk=tiles1(strikes_p),
    )
    if nsteps_p is not None:
        fields["nst"] = tiles1(jnp.asarray(nsteps_p, u0.dtype))
    return fields, vec_s, idx_s, idx_v, ops


_INV_KEYS = ("a1pl", "a1ql", "a1pd", "a1qd", "a1pu", "a1qu", "vfl",
             "sfac", "vfac",
             "bsm", "bs0", "bsp", "bvm", "bv0", "bvp",
             "al2", "al1", "ad", "au1", "au2",
             "b1v", "b2r", "vecs", "kk")

# per-tangent 2-D field keys consumed by the forward-mode kernel, in the
# kernel's expected order (all parameter-dependent discretization data)
_TANGENT_KEYS = ("vfl", "sfac", "vfac", "bvm", "bv0", "bvp",
                 "al2", "al1", "ad", "au1", "au2")


def _pad_strikes(spec, strikes, n_tangents=0, strict=True, nsteps=None,
                 extra_fields=0):
    b = strikes.shape[0]
    dtype_bytes = _live_dtype_bytes()
    tile = pick_tile(spec, b, dtype_bytes, n_tangents, strict=strict,
                     extra_fields=extra_fields)
    n_tiles = -(-b // tile)
    pad = n_tiles * tile - b

    def pad_last(x):
        return jnp.concatenate(
            [x, jnp.broadcast_to(x[-1:], (pad,))]) if pad else x

    nsteps_p = None if nsteps is None else pad_last(jnp.asarray(nsteps))
    return pad_last(strikes), tile, n_tiles, nsteps_p


def _run_chunks(spec, solver, american, dividends, dtype, interpret,
                unroll, n_tiles, tile, fields, vec_s, tangents=(),
                option_type="call", rate_segments=None):
    """Run the (possibly dividend-segmented) time loop as chunk launches.
    `tangents`: optional list of K dicts of 2-D tangent fields (keys =
    _TANGENT_KEYS) plus state tangents are taken as zeros. Returns
    (u, lam, [du_k...]).

    `rate_segments`: optional tuple of (n_lo, n_hi, b_rate, seg_fields)
    — ascending inclusive MAIN-step ranges covering 1..n_steps, one per
    piecewise-constant rate segment (operators.rate_segment_structure).
    Each phase window is additionally split at the segment boundaries
    and every piece launches with ITS segment's operator fields and
    boundary rate; state (u, lam) crosses launches through the aliased
    outputs exactly as it does for dividend chunks. Uniform books only
    (callers gate per-lane + schedule off); tangent launches don't
    support segments (the fused Jacobian falls back to XLA)."""
    put = operators.is_put(option_type)
    dig = operators.is_digital(option_type)
    barrier = getattr(spec, "barrier", None)
    bpos = _barrier_positions(spec)
    K = len(tangents)
    per_lane = "nst" in fields
    if rate_segments and (per_lane or K):
        raise ValueError(
            "rate_segments compose with neither per-lane step counts "
            "nor tangent launches — callers must route those to the "
            "XLA path")
    inv_base = [fields[k] for k in _INV_KEYS]
    rfa = jnp.asarray([fields["rf_val"]], dtype)
    u = fields["u"]
    lam = fields["lam"]
    dus = [jnp.zeros_like(u) for _ in range(K)]
    dlams = [jnp.zeros_like(u) for _ in range(K)] if american else []
    tg = [t[k] for t in tangents for k in _TANGENT_KEYS]

    def unpack_outs(outs):
        outs = list(outs)
        u_ = outs.pop(0)
        lam_ = outs.pop(0) if american else None
        dus_ = [outs.pop(0) for _ in range(K)]
        dlams_ = [outs.pop(0) for _ in range(K)] if american else []
        return u_, lam_, dus_, dlams_

    def state_args():
        return ([u, lam] if american else [u]) + dus + dlams

    # Phase list: the optional Rannacher start-up window (theta=1
    # Douglas at delta_t/2, sub-steps k = 2n-1, 2n per damped main step
    # n — see models.douglas._phase_plan for the convention and
    # docs/DESIGN.md §9) followed by the main phase. The damp phase is
    # launches of the SAME kernel at different static constants: the
    # implicit bands are derived in-kernel from theta*delta_t, and the
    # boundary fields stay the main phase's (their baked
    # e^{-rate*dt*(N-1)} + the damp kernel's e^{rate*(dt/2)*k} land on
    # the same absolute times). State (u, lam, tangents) crosses
    # launches through the aliased outputs as it already does for
    # dividend chunking.
    R = (min(solver.rannacher_steps, solver.n_steps)
         if solver.rannacher_steps else 0)
    phases = []
    if R:
        nst_damp = None
        if per_lane:
            # lane i damps min(n_i, R) of its own steps -> 2*min(n_i, R)
            # sub-steps; the freeze and remap-identity comparisons in
            # damp-local indices are then EXACTLY equivalent to the
            # main-index comparisons of a per-group damped run
            nst_damp = 2 * jnp.minimum(
                fields["nst"], jnp.asarray(R, fields["nst"].dtype))
        phases.append(dict(theta=1.0, delta_t=solver.delta_t / 2.0,
                           scheme="do", n_lo=1, n_hi=R,
                           to_local=lambda n: 2 * n - 1,
                           local_lo=1, local_end=2 * R + 1, nst=nst_damp))
    phases.append(dict(theta=solver.theta, delta_t=solver.delta_t,
                       scheme=solver.scheme, n_lo=R + 1,
                       n_hi=solver.n_steps, to_local=lambda n: n,
                       local_lo=R + 1, local_end=solver.n_steps + 1,
                       nst=fields["nst"] if per_lane else None))

    for ph in phases:
        if ph["local_end"] <= ph["local_lo"]:
            continue
        # split the phase window at the static rate-segment boundaries;
        # the default is one piece spanning the whole phase
        if rate_segments:
            pieces = []
            for (s_lo, s_hi, br, f_seg) in rate_segments:
                lo = max(ph["n_lo"], s_lo)
                hi = min(ph["n_hi"], s_hi)
                if lo > hi:
                    continue
                pieces.append((lo, hi, [f_seg[k] for k in _INV_KEYS],
                               jnp.asarray([br], dtype)))
        else:
            pieces = [(ph["n_lo"], ph["n_hi"],
                       inv_base + ([ph["nst"]] if per_lane else []),
                       rfa)]
        for (lo, hi, inv, rfa_p) in pieces:
            local_lo = ph["to_local"](lo)
            local_end = ph["to_local"](hi + 1)
            phase_events = (
                dividends is not None and len(dividends) > 0
                and any(dividends.events_for_step(n, solver.delta_t)
                        for n in range(lo, hi + 1)))
            if phase_events:
                n0a = jnp.asarray([0], jnp.int32)  # unused by plan kernels
                n1a = jnp.asarray([0], jnp.int32)
                nst_per = ph["nst"][0] if per_lane else None
                for plan, events in _chunk_dividend_plan(
                        solver, dividends, n_lo=lo, n_hi=hi,
                        to_local=ph["to_local"], local_end=local_end):
                    rmf = _build_remap_fields(vec_s, events, dtype,
                                              option_type, nsteps=nst_per,
                                              barrier=barrier)
                    r_args = [jnp.moveaxis(f, 0, -1)
                              for ev in rmf for f in ev]
                    chunk_call = _segment_call(
                        spec.m1, spec.m2, ph["theta"], ph["delta_t"],
                        american, dtype.name, interpret, unroll, plan,
                        len(events), n_tiles, tile, K, put,
                        per_lane_steps=per_lane, scheme=ph["scheme"],
                        barrier_pos=bpos, digital=dig)
                    sa = state_args()
                    outs = chunk_call(n0a, n1a, rfa_p, sa[0],
                                      *( [sa[1]] if american else [] ),
                                      *inv, *r_args,
                                      *sa[(2 if american else 1):], *tg)
                    u, lam, dus, dlams = unpack_outs(outs)
            else:
                call = _segment_call(spec.m1, spec.m2, ph["theta"],
                                     ph["delta_t"], american, dtype.name,
                                     interpret, unroll, n_tiles=n_tiles,
                                     tile=tile, n_tangents=K, put=put,
                                     per_lane_steps=per_lane,
                                     scheme=ph["scheme"], barrier_pos=bpos,
                                     digital=dig)
                n0a = jnp.asarray([local_lo], jnp.int32)
                n1a = jnp.asarray([local_end], jnp.int32)
                sa = state_args()
                outs = call(n0a, n1a, rfa_p, sa[0],
                            *( [sa[1]] if american else [] ), *inv,
                            *sa[(2 if american else 1):], *tg)
                u, lam, dus, dlams = unpack_outs(outs)
    if not american:
        # the kernel carries no multiplier state for European books; hand
        # back the zero field so consumers (fused_surface_batch) always
        # get an array
        lam = fields["lam"]
    return u, lam, dus


def _assemble_rate_segments(spec, solver, strikes_p, s0, kappa, eta,
                            sigma, rho, v0, option_type, nsteps_p,
                            rate_schedule):
    """One `_assemble` pass per rate segment. Returns (rate_segments,
    fields, vec_s, idx_s, idx_v, ops): rate_segments feeds
    _run_chunks(rate_segments=...); fields carries segment 0's arrays
    for the u/lam launch state (the payoff is rate-free) with rf_val =
    segment 0's boundary rate; ops is the LAST segment's operator set
    (valuation-time tau = T — the theta epilogue's convention, matching
    douglas.prepare_instance)."""
    if nsteps_p is not None:
        raise ValueError(
            "rate_schedule does not compose with per-lane step counts — "
            "price mixed-maturity curve books per maturity group")
    structure = operators.rate_segment_structure(
        solver.n_steps, solver.delta_t, solver.maturity, rate_schedule,
        option_type)
    rate_segments = []
    for (n_lo, n_hi, seg_rd, seg_rf, br, anchor) in structure:
        f_seg, vec_s, idx_s, idx_v, ops = _assemble(
            spec, solver, strikes_p, s0, kappa, eta, sigma, rho, v0,
            seg_rd, seg_rf, option_type, nsteps_p, anchor)
        rate_segments.append((n_lo, n_hi, br, f_seg))
    fields = dict(rate_segments[0][3])
    fields["rf_val"] = rate_segments[0][2]
    return tuple(rate_segments), fields, vec_s, idx_s, idx_v, ops


def _extract(u, idx_s, idx_v, b):
    """Price extraction U[idx_s, idx_v] per option (s-major layout) as a
    one-hot contraction — a vmapped scalar gather scalarizes into
    per-option loads on TPU."""
    ns, nv, bp = u.shape
    mask_s = (jnp.arange(ns, dtype=idx_s.dtype)[:, None]
              == idx_s[None, :bp]).astype(u.dtype)          # [ns, B]
    mask_v = (jnp.arange(nv, dtype=idx_v.dtype)[:, None]
              == idx_v[None, :bp]).astype(u.dtype)          # [nv, B]
    prices = jnp.sum(jnp.sum(u * mask_v[None, :, :], axis=1)
                     * mask_s, axis=0)                      # [B]
    return prices[:b]


def fused_price_batch(
    spec: GridSpec,
    solver: SolverConfig,
    strikes: jnp.ndarray,
    s0,
    kappa, eta, sigma, rho, v0, r_d, r_f,
    american: bool = False,
    dividends: Optional[DividendSchedule] = None,
    interpret: Optional[bool] = None,
    unroll: bool = False,
    option_type: str = "call",
    n_steps_per: Optional[jnp.ndarray] = None,
    rate_schedule=None,
) -> jnp.ndarray:
    """Drop-in replacement for models.douglas.price_batch running the time
    loop in the fused Pallas kernel. Jit-wrap the caller.

    interpret=None auto-selects interpret mode on CPU backends (the
    Mosaic kernel only exists on TPU) so engine="pallas" configs stay
    portable across tests / virtual-mesh runs.

    n_steps_per: optional per-option step counts for ONE-LAUNCH mixed-
    maturity books under the shared-dt convention T_i = n_i * delta_t
    (solver.n_steps must be max(n_steps_per)). Composes with dividend
    schedules: events keep their shared step index and lanes already
    past maturity get identity remap rows (see _build_remap_fields).
    Bitwise-equal to pricing each maturity group in its own launch.

    rate_schedule: optional config.RateSchedule — the scalar r_d / r_f
    are then IGNORED; the time loop runs as one launch per static rate
    segment, each with its own operator fields, boundary rate, and
    boundary anchor (the XLA path's exact running-integral convention —
    see operators.rate_segment_structure). Not composable with
    n_steps_per (a calendar curve maps to different step windows per
    maturity; mixed books price per group on the XLA path)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b = strikes.shape[0]
    strikes_p, tile, n_tiles, nsteps_p = _pad_strikes(
        spec, strikes, strict=not interpret, nsteps=n_steps_per,
        extra_fields=_scheme_extra_fields(solver.scheme))
    rate_segments = None
    if rate_schedule is not None:
        rate_segments, fields, vec_s, idx_s, idx_v, _ = (
            _assemble_rate_segments(
                spec, solver, strikes_p, s0, kappa, eta, sigma, rho, v0,
                option_type, nsteps_p, rate_schedule))
    else:
        fields, vec_s, idx_s, idx_v, _ = _assemble(
            spec, solver, strikes_p, s0, kappa, eta, sigma, rho, v0,
            r_d, r_f, option_type, nsteps_p)
        fields["rf_val"] = operators.boundary_rate(r_d, r_f, option_type)
    dtype = fields["u"].dtype
    u, _, _ = _run_chunks(spec, solver, american, dividends, dtype,
                          interpret, unroll, n_tiles, tile, fields, vec_s,
                          option_type=option_type,
                          rate_segments=rate_segments)
    return _extract(u, idx_s, idx_v, b)


def fused_surface_batch(
    spec: GridSpec,
    solver: SolverConfig,
    strikes: jnp.ndarray,
    s0,
    kappa, eta, sigma, rho, v0, r_d, r_f,
    american: bool = False,
    dividends: Optional[DividendSchedule] = None,
    interpret: Optional[bool] = None,
    unroll: bool = False,
    option_type: str = "call",
    n_steps_per: Optional[jnp.ndarray] = None,
    rate_schedule=None,
):
    """Like fused_price_batch but returns the full terminal surfaces
    (u [B, nv, ns]) and American lambda-multiplier surfaces (lam, same
    shape; zeros for European) plus the batched HestonOperators it
    assembled and per-option (vec_s [B, ns], idx_s, idx_v) — the input to book-level risk extraction
    (models.greeks.batch_greeks), which reads delta/gamma/theta off each
    surface with the discretization's own stencils at fused-kernel
    speed.

    n_steps_per: optional per-option step counts — a mixed-maturity
    book's surfaces (every maturity) come back from ONE launch, each
    lane frozen at its own terminal step (see fused_price_batch).

    rate_schedule: optional config.RateSchedule — per-segment launches
    as in fused_price_batch; the returned HestonOperators are the LAST
    segment's (the operator set at valuation time tau = T, what the
    theta epilogue differentiates — matching douglas.prepare_instance's
    convention)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b = strikes.shape[0]
    strikes_p, tile, n_tiles, nsteps_p = _pad_strikes(
        spec, strikes, strict=not interpret, nsteps=n_steps_per,
        extra_fields=_scheme_extra_fields(solver.scheme))
    rate_segments = None
    if rate_schedule is not None:
        rate_segments, fields, vec_s, idx_s, idx_v, ops = (
            _assemble_rate_segments(
                spec, solver, strikes_p, s0, kappa, eta, sigma, rho, v0,
                option_type, nsteps_p, rate_schedule))
    else:
        fields, vec_s, idx_s, idx_v, ops = _assemble(
            spec, solver, strikes_p, s0, kappa, eta, sigma, rho, v0,
            r_d, r_f, option_type, nsteps_p)
        fields["rf_val"] = operators.boundary_rate(r_d, r_f, option_type)
    dtype = fields["u"].dtype
    u, lam, _ = _run_chunks(spec, solver, american, dividends, dtype,
                            interpret, unroll, n_tiles, tile, fields,
                            vec_s, option_type=option_type,
                            rate_segments=rate_segments)
    to_bvs = lambda x: jnp.moveaxis(x, -1, 0)[:b].swapaxes(1, 2)
    ops_b = jax.tree_util.tree_map(lambda x: x[:b], ops)
    return to_bvs(u), to_bvs(lam), ops_b, vec_s[:b], idx_s[:b], idx_v[:b]


# tangent count of the fused Jacobian launch under the default
# v0_mode="stencil" (kappa, eta, sigma, rho ride the kernel; the v0
# column is read off the primal surface) — the number VMEM gates and
# use_fused callers must budget for
JAC_TANGENTS = 4


def _v0_stencil_col(spec, u, vfl, idx_s, idx_v, b, v0):
    """dPrice/dv0 [:b] as the discretization's own v-derivative stencil
    at the inserted v0 node, read off the primal surface u [ns, nv, Bp]
    (s-major). v0 enters the discrete price ONLY through the grid — the
    PDE coefficients are v0-free — so the continuum dP/dv0 is dU/dv at
    (s0, v0). Reading it off the surface replaces the grid-motion AD
    tangents, whose f32 carry error dominated the fused Jacobian
    (measured golden grid: normalized v0-column RMSE 3.7e-4 via
    grid-motion tangents vs ~1e-5 via this stencil; the two estimators
    agree to 2.5e-3 in f64 — pure O(h^2) discretization difference).

    Boundary clipping mirrors greeks._surface_risk: the 3-point parabola
    is centered on the clipped interior node j and EVALUATED at v0
    (the w_delta second-derivative term); a no-op when idx_v is interior
    (v0 == vec_v[idx_v] by insertion)."""
    nv = spec.m2 + 1
    j = jnp.clip(idx_v, 1, spec.m2 - 1)
    rows = jnp.arange(nv, dtype=j.dtype)[:, None]            # [nv, 1]
    bp_lanes = u.shape[-1]

    def v_at(jj):
        oh = (rows == jj[None, :bp_lanes]).astype(u.dtype)   # [nv, Bp]
        return jnp.sum(vfl * oh, axis=0)[:b]                 # [b]

    v_m, v_0, v_p = v_at(j - 1), v_at(j), v_at(j + 1)
    u_m = _extract(u, idx_s, j - 1, b)
    u_0 = _extract(u, idx_s, j, b)
    u_p = _extract(u, idx_s, j + 1, b)
    h0 = v_0 - v_m
    h1 = v_p - v_0
    bm, b0, bpw = coeff.w_beta(h0, h1)
    dm, d0, dpw = coeff.w_delta(h0, h1)
    first = bm * u_m + b0 * u_0 + bpw * u_p
    second = dm * u_m + d0 * u_0 + dpw * u_p
    return first + second * (jnp.asarray(v0, u.dtype) - v_0)


def fused_theta_jacobian(
    spec: GridSpec,
    solver: SolverConfig,
    strikes: jnp.ndarray,
    s0,
    theta_vec: jnp.ndarray,       # (5,) = (kappa, eta, sigma, rho, v0)
    r_d, r_f,
    american: bool = False,
    dividends: Optional[DividendSchedule] = None,
    interpret: Optional[bool] = None,
    unroll: bool = False,
    option_type: str = "call",
    n_steps_per: Optional[jnp.ndarray] = None,
    v0_mode: str = "stencil",
):
    """(base_prices [B], jacobian [B, 5]) via EXACT forward-mode AD
    through the fused kernel: XLA differentiates the field preparation
    (grid/operator assembly) for the parameter directions, and the
    forward-mode kernel variant carries the tangent surfaces through
    the time loop alongside the primal in ONE launch — the Pallas
    counterpart of calibrate_device's jacobian_mode='ad'
    (ref: src/jacobian_computation.cpp:204-364 runs 6 bumped solves
    instead).

    v0_mode: "stencil" (default) carries 4 tangents (kappa, eta, sigma,
    rho) and reads the v0 column off the primal surface with the
    discretization's own v-stencil (_v0_stencil_col — far better f32
    conditioning, smaller VMEM footprint); "ad" carries all 5 tangents
    including the grid-motion v0 direction (the r1/r2 formulation, kept
    for cross-checks).

    interpret=None auto-selects interpret mode on CPU backends.

    n_steps_per: optional per-option step counts — the WHOLE mixed-
    maturity calibration Jacobian (primal + tangents, every maturity)
    in one launch (see fused_price_batch)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if v0_mode not in ("stencil", "ad"):
        raise ValueError(f"unknown v0_mode: {v0_mode!r}")
    stencil = v0_mode == "stencil"
    n_tg = JAC_TANGENTS if stencil else 5
    b = strikes.shape[0]
    strikes_p, tile, n_tiles, nsteps_p = _pad_strikes(
        spec, strikes, n_tangents=n_tg, strict=not interpret,
        nsteps=n_steps_per,
        extra_fields=_scheme_tangent_extra_fields(solver.scheme, n_tg)
        + _exercise_tangent_extra_fields(n_tg, american, dividends,
                                         _live_dtype_bytes()))
    dtype = jnp.result_type(float)   # matches the grid/field build dtype
    theta_vec = theta_vec.astype(dtype)

    def prep_tangent_fields(tv):
        full = jnp.concatenate([tv, theta_vec[4:]]) if stencil else tv
        f, vec_s_, idx_s_, idx_v_, _ = _assemble(
            spec, solver, strikes_p, s0, full[0], full[1], full[2],
            full[3], full[4], r_d, r_f, option_type, nsteps_p)
        return (tuple(f[k] for k in _TANGENT_KEYS),
                (f, vec_s_, idx_s_, idx_v_))

    # one linearized assembly: the primal fields come out as aux of the
    # same trace that provides the tangent-field JVP (a separate
    # jax.jacfwd(prep) would re-emit the whole vmapped grid/operator
    # assembly graph a second time)
    _, jvp_fn, (fields, vec_s, idx_s, idx_v) = jax.linearize(
        prep_tangent_fields, theta_vec[:n_tg] if stencil else theta_vec,
        has_aux=True)
    fields["rf_val"] = operators.boundary_rate(r_d, r_f, option_type)
    basis = jnp.eye(n_tg, dtype=dtype)
    dfields = jax.vmap(jvp_fn)(basis)  # each leaf gains a leading (n_tg,)
    tangents = [
        {k: leaf[kk] for k, leaf in zip(_TANGENT_KEYS, dfields)}
        for kk in range(n_tg)
    ]
    u, _, dus = _run_chunks(spec, solver, american, dividends, dtype,
                            interpret, unroll, n_tiles, tile, fields,
                            vec_s, tangents, option_type)
    base = _extract(u, idx_s, idx_v, b)
    cols = [_extract(du, idx_s, idx_v, b) for du in dus]
    if stencil:
        cols.append(_v0_stencil_col(spec, u, fields["vfl"], idx_s, idx_v,
                                    b, theta_vec[4]))
    jac = jnp.stack(cols, axis=-1)
    return base, jac
