"""Single-option latency kernel: 2-D layout + in-kernel PCR.

Why a second kernel: the batched kernel (fused_do) is THROUGHPUT-optimal —
batch on the lane axis, sequential Thomas/penta sweeps whose ~2*(m1+m2)
dependent block-ops per step amortize over up to 1024 options. For ONE
option those same sweeps bound latency (measured 0.67 ms at the golden
grid, only 4.5x the A100's 3 ms single-instance time,
ref: README.md:14): every sweep iteration is a dependent [m2+1, 128]
vector op of which 127 lanes are padding.

This kernel is LATENCY-optimal for a single instance:

  * Layout [nv, ns]: v on sublanes, s on LANES — the whole surface is
    ~40 KB, every elementwise op touches ~10 vregs.
  * The A1 tridiagonal solve (the longest recurrence, along s = lanes)
    runs as log-depth PARALLEL CYCLIC REDUCTION: ceil(log2(ns)) levels
    of lane-shifted multiply-adds replace 2*ns dependent ops. The
    level-wise elimination factors depend only on the matrix, so they
    are computed ONCE per launch and reused by every step's solves
    (the XLA-side analog is ops/banded.py's `pcr` engine; here the
    whole cascade stays in VMEM).
  * The A2 pentadiagonal solve (along v = sublanes) stays sequential but
    STATICALLY UNROLLED over the m2+1 rows: each row op is one [ns]-lane
    vreg with scalar coefficients — the dependency chain is ~2*m2 *
    (few cycles), no longer the bottleneck.

The step itself is the same DELTA-FORM Douglas/Craig-Sneyd algebra as
fused_do._make_kernel (solve for the increment z; u enters once per
step), with the same boundary coefficients, American lambda projection
(ref: src/device_solver.hpp:358-372) and put conventions — pinned
against the XLA path by tests/test_pallas.py. Dividend schedules run
in-kernel as segmented fori_loops with re-maps between segments (the
batched kernel's plan machinery, transposed to the 2-D layout — see
`_make_kernel.remap`); price_batch auto-dispatches every batch==1
solve to this kernel.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from heston_tpu.ops import operators
from heston_tpu.pallas import fused_do


def use_single(spec, solver, batch: int, dividends=None,
               n_tangents: int = 0) -> bool:
    """Dispatch predicate for the latency kernel: one option, pallas
    engine, DO/CS/MCS/HV scheme, no tangent surfaces (Jacobian passes
    are batched by construction and belong on the throughput kernel).
    Dividend schedules run in-kernel as segment re-maps (same plan
    machinery as the batched kernel). The working set is tiny at
    reference grids (~30 [nv, ns] fields ~ 1 MiB at the golden grid)
    but the PCR cascade keeps 2*ceil(log2(ns)) factor fields live, so
    truly fine grids (m1 >= ~500 convergence studies) are gated against
    the same device-derived VMEM budget as the batched kernel."""
    if not (batch == 1
            and solver.solver_engine == "pallas"
            and solver.scheme in ("do", "cs", "mcs", "hv")
            and n_tangents == 0):
        return False
    nv_pad = -8 * (-(spec.m2 + 1) // 8)
    ns_pad = -128 * (-(spec.m1 + 1) // 128)
    field = nv_pad * ns_pad * fused_do._live_dtype_bytes()
    n_fields = 16 + 2 * _pcr_levels(spec.m1 + 1)
    # remap inputs are [1, ns] rows — 4 per event, a sub-1% correction
    n_events = 0 if dividends is None else len(dividends)
    extra = 4 * n_events * ns_pad * 8 * fused_do._live_dtype_bytes()
    return n_fields * field + extra <= fused_do._vmem_budget_bytes()


def _shift_lane(x, k, fill=0.0):
    """result[..., i] = x[..., i+k], `fill` outside (s = lane axis)."""
    if k == 0:
        return x
    n = x.shape[-1]
    if k > 0:
        pad = jnp.full_like(x[..., :k], fill)
        return jnp.concatenate([x[..., k:], pad], axis=-1)
    pad = jnp.full_like(x[..., : (-k)], fill)
    return jnp.concatenate([pad, x[..., : n + k]], axis=-1)


def _shift_sub(x, k):
    """result[j, :] = x[j+k, :], zero outside (v = sublane axis)."""
    if k == 0:
        return x
    n = x.shape[0]
    if k > 0:
        pad = jnp.zeros_like(x[:k])
        return jnp.concatenate([x[k:], pad], axis=0)
    pad = jnp.zeros_like(x[: (-k)])
    return jnp.concatenate([pad, x[: n + k]], axis=0)


def _pcr_levels(ns: int) -> int:
    lev = 0
    while (1 << lev) < ns:
        lev += 1
    return lev


def _make_kernel(m1: int, m2: int, theta: float, delta_t: float,
                 american: bool, put: bool, scheme: str = "do",
                 barrier_pos=None, div_plan=None, n_events: int = 0,
                 digital: bool = False):
    """Single-instance kernel body. Refs (all VMEM unless noted):
    n0/n1/rf SMEM scalars; u [nv, ns] (+ lam if american, aliased
    outputs); six A1 rank-2 band rows [1, ns]; vfl/vfac + A0 v-stencil +
    A2 bands [nv, 1]; sfac + A0 s-stencil + b2 row + vec_s [1, ns];
    b1 scalar + strike [1, 1]; remap i0/w0/i1/w1 rows [1, ns] (4 per
    event); scratch d/e [nv, ns] + penta factor columns [nv, 1].

    `div_plan`: optional static tuple of (seg_start, seg_end, k_events)
    — the time loop runs as fori_loop segments with dividend re-maps
    between them, same plan structure as fused_do._make_kernel
    (ref: src/solver.hpp:1120-1190's segmented dividend loop)."""
    nv, ns = m2 + 1, m1 + 1
    dt = delta_t
    td = theta * delta_t
    levels = _pcr_levels(ns)
    b1_rows = fused_do._b1_colrows(m1, m2)
    if scheme not in ("do", "cs", "mcs", "hv"):
        raise ValueError(f"single kernel implements 'do'/'cs'/'mcs'/'hv', "
                         f"got {scheme!r}")

    def kernel(*refs):
        (n0_ref, n1_ref, rf_ref, u_ref) = refs[:4]
        rest = list(refs[4:])
        lam_ref = rest.pop(0) if american else None
        (a1pl_ref, a1ql_ref, a1pd_ref, a1qd_ref, a1pu_ref, a1qu_ref,
         vfl_ref, sfac_ref, vfac_ref,
         bsm_ref, bs0_ref, bsp_ref, bvm_ref, bv0_ref, bvp_ref,
         al2_ref, al1_ref, ad_ref, au1_ref, au2_ref,
         b1v_ref, b2r_ref, vecs_ref, kk_ref) = rest[:24]
        rest = rest[24:]
        r_refs = rest[: 4 * n_events]
        rest = rest[4 * n_events:]
        uo_ref = rest.pop(0)
        lamo_ref = rest.pop(0) if american else None
        (d_ref, e_ref, pgm_ref, phm_ref, pm_ref, pc_ref, pc2_ref) = rest

        rf = rf_ref[0]
        n0 = n0_ref[0]
        n1 = n1_ref[0]

        vfl = vfl_ref[:]            # [nv, 1]
        sfac = sfac_ref[:]          # [1, ns]
        vfac = vfac_ref[:]          # [nv, 1]
        bsm, bs0, bsp = bsm_ref[:], bs0_ref[:], bsp_ref[:]   # [1, ns]
        bvm, bv0, bvp = bvm_ref[:], bv0_ref[:], bvp_ref[:]   # [nv, 1]
        l2b, l1b = al2_ref[:], al1_ref[:]                    # [nv, 1]
        db, u1b, u2b = ad_ref[:], au1_ref[:], au2_ref[:]
        b1v = b1v_ref[0, 0]
        b2r = b2r_ref[:]            # [1, ns]
        dtype = b2r.dtype

        # ---- static masks over (v, s)
        v_ids = lax.broadcasted_iota(jnp.int32, (nv, ns), 0)
        s_ids = lax.broadcasted_iota(jnp.int32, (nv, ns), 1)
        b1_mask = jnp.zeros((nv, ns), dtype)
        for col, rows in b1_rows.items():
            for r in rows:
                b1_mask = b1_mask + (
                    (v_ids == r) & (s_ids == col)).astype(dtype)
        bottom2d = ((v_ids == nv - 1) & (s_ids >= 1)).astype(dtype)
        smax_mask = (s_ids != ns - 1).astype(dtype)
        s_iota1 = lax.broadcasted_iota(jnp.int32, (1, ns), 1)
        if american:
            if digital:
                # cell-averaged digital indicator (operators.grid_payoff's
                # clipped affine form — keeps the one-touch floor equal
                # to the XLA path's); s is the lane axis here
                vs = vecs_ref[:]                        # [1, ns]
                kk = kk_ref[0, 0]
                sp = _shift_lane(vs, 1)
                sm = _shift_lane(vs, -1)
                hi = jnp.where(s_iota1 == ns - 1, vs, 0.5 * (vs + sp))
                lo = jnp.where(s_iota1 == 0, vs, 0.5 * (vs + sm))
                den = jnp.where(hi == lo, jnp.ones_like(hi), hi - lo)
                num = (kk - lo) if put else (hi - kk)
                u0row = jnp.clip(num / den, 0.0, 1.0)
            else:
                intrinsic = (kk_ref[0, 0] - vecs_ref[:] if put
                             else vecs_ref[:] - kk_ref[0, 0])
                u0row = jnp.maximum(intrinsic, 0.0)
            u0 = u0row * jnp.ones((nv, 1), dtype)
            if barrier_pos:
                # knocked column(s): the exercise floor must not
                # resurrect them (input u0 / boundary fields arrive
                # pre-masked from fused_do._prepare_batched)
                for _bp in barrier_pos:
                    u0 = jnp.where(s_ids == _bp,
                                   jnp.zeros_like(u0), u0)

        # ---- explicit A1 band rows as dense [nv, ns] rank-2 products
        a1l = vfl * a1pl_ref[:] + a1ql_ref[:]
        a1d = vfl * a1pd_ref[:] + a1qd_ref[:]
        a1u = vfl * a1pu_ref[:] + a1qu_ref[:]

        # explicit multiplies in DIFFERENCE FORM — same f32 rationale as
        # fused_do._make_kernel: stencil weights are zero-sum up to an
        # analytic reaction, so computing neighbor differences first
        # avoids the O(1/h^2)-weight cancellation that costs ~1e-4
        # absolute per step in f32. Reactions read off the band rows:
        # a1qd[0] (row-0; 0 calls / -r_d/2 puts), a1qd[m1] = -r_d/2
        # elsewhere; A2 rows 0..m2-2 (calls) / all (puts).
        react_s = jnp.where(s_iota1 == 0, a1qd_ref[0, 0],
                            a1qd_ref[0, ns - 1])           # [1, ns]
        v_iota1 = lax.broadcasted_iota(jnp.int32, (nv, 1), 0)
        # puts, digitals AND top-knocked barriers take the full reaction
        # (matches operators.build_a2_bands)
        _ktop = bool(barrier_pos) and (ns - 1) in barrier_pos
        n_react = nv if (put or digital or _ktop) else nv - 2
        react_v = jnp.where(v_iota1 < n_react, a1qd_ref[0, ns - 1],
                            jnp.zeros((), dtype))          # [nv, 1]

        def ds_of(x):
            return (bsm * (_shift_lane(x, -1) - x)
                    + bsp * (_shift_lane(x, 1) - x))

        def dv_of(x):
            return (bvm * (_shift_sub(x, -1) - x)
                    + bvp * (_shift_sub(x, 1) - x))

        def a1mul(x):
            return (a1l * (_shift_lane(x, -1) - x)
                    + a1u * (_shift_lane(x, 1) - x) + react_s * x)

        def a2mul(x):
            return (l2b * (_shift_sub(x, -2) - x)
                    + l1b * (_shift_sub(x, -1) - x)
                    + u1b * (_shift_sub(x, 1) - x)
                    + u2b * (_shift_sub(x, 2) - x) + react_v * x)

        # ---- PCR cascade of the A1 implicit system (loop-invariant):
        # level factors alpha/gamma eliminate the sub/super couplings at
        # stride 2^l; after `levels` levels the system is diagonal.
        # Off-grid neighbors are identity rows (b=1, a=c=0, d=0).
        a = -td * a1l
        b = 1.0 - td * a1d
        c = -td * a1u
        pcr_fac = []
        for lev in range(levels):
            s = 1 << lev
            alpha = -a / _shift_lane(b, -s, 1.0)
            gamma = -c / _shift_lane(b, s, 1.0)
            b = (b + alpha * _shift_lane(c, -s)
                 + gamma * _shift_lane(a, s))
            a = alpha * _shift_lane(a, -s)
            c = gamma * _shift_lane(c, s)
            pcr_fac.append((alpha, gamma))
        pcr_binv = 1.0 / b

        def tri_solve():
            """d_ref <- T1^-1 d_ref via the precomputed PCR cascade
            (log-depth: `levels` lane-shifted multiply-adds)."""
            d = d_ref[:]
            for lev in range(levels):
                s = 1 << lev
                alpha, gamma = pcr_fac[lev]
                d = (d + alpha * _shift_lane(d, -s)
                     + gamma * _shift_lane(d, s))
            d_ref[:] = d * pcr_binv

        # ---- penta factorization along v: bands are 1-D in v, so the
        # factor columns are [nv, 1] (vs the batch kernel's [nv, tile]).
        # Exactly banded.penta_factor's recurrence
        # (ref: src/hes_a2_shuffled_kernels.hpp:241-299), statically
        # unrolled.
        zcol = jnp.zeros_like(vfl[0])       # [1]
        c1p, c2p, cc1p, cc2p = zcol, zcol, zcol, zcol
        for j in range(nv):
            il2 = -td * al2_ref[j]
            il1 = -td * al1_ref[j]
            idd = 1.0 - td * ad_ref[j]
            iu1 = -td * au1_ref[j]
            iu2 = -td * au2_ref[j]
            big_l = il1 - il2 * c2p
            m = 1.0 / (idd - big_l * c1p - il2 * cc2p)
            cj = (iu1 - big_l * cc1p) * m
            c2j = iu2 * m
            pc_ref[j] = cj
            pc2_ref[j] = c2j
            pgm_ref[j] = big_l * m
            phm_ref[j] = il2 * m
            pm_ref[j] = m
            c1p, c2p, cc1p, cc2p = cj, c1p, c2j, cc1p

        def penta_solve():
            """e_ref <- T2^-1 e_ref: sequential over the nv sublane rows
            (statically unrolled; each row op is one [ns]-lane vector
            with scalar coefficients)."""
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

        c_a0 = sfac * vfac                  # [nv, ns] separable A0 coeff

        def two_sum(a, b):
            """Error-free sum (see fused_do._make_kernel.two_sum)."""
            s = a + b
            bb = s - a
            err = (a - (s - bb)) + (b - bb)
            return s, err

        def step(n, carry):
            u, lam_c, comp = carry
            nf = n.astype(u.dtype)
            e0 = jnp.exp(rf * dt * (nf - 1.0))
            e1 = jnp.exp(rf * dt * nf)
            kb1 = dt * e0 + td * (e1 - e0)
            kb2a = dt * e0
            kb2b = td * (e1 - e0)

            # delta form (see fused_do._make_kernel): T1 z1 = dt*Lu
            # [+ dt*lam] + bnd1; T2 z2 = z1 + kb2b*b2; u' = u + z2
            bnd1 = (kb1 * b1v) * b1_mask + kb2a * bottom2d * b2r
            lu = c_a0 * dv_of(ds_of(u)) + a1mul(u) + a2mul(u)
            if american:
                lu = lu + lam_c
            d_ref[:] = dt * lu + bnd1
            tri_solve()
            e_ref[:] = d_ref[:] + kb2b * bottom2d * b2r
            penta_solve()
            z2 = e_ref[:]

            if scheme == "cs":
                # Craig-Sneyd corrector in delta form: predictor rhs1
                # plus 0.5*dt*A0(z2), both stages re-solved
                # (ref: src/solver.hpp:678-778)
                a0z2 = c_a0 * dv_of(ds_of(z2))
                lu2 = c_a0 * dv_of(ds_of(u)) + a1mul(u) + a2mul(u)
                if american:
                    lu2 = lu2 + lam_c
                d_ref[:] = dt * lu2 + (0.5 * dt) * a0z2 + bnd1
                tri_solve()
                e_ref[:] = d_ref[:] + kb2b * bottom2d * b2r
                penta_solve()
                z2 = e_ref[:]
            elif scheme == "mcs":
                # modified Craig-Sneyd in delta form (see
                # fused_do._make_kernel): predictor rhs1 plus
                # td*A0(z2) + (1/2-theta)*dt*(L z2 + (e1-e0)*(b1+b2))
                a0z2 = c_a0 * dv_of(ds_of(z2))
                lz2 = a0z2 + a1mul(z2) + a2mul(z2)
                lu2 = c_a0 * dv_of(ds_of(u)) + a1mul(u) + a2mul(u)
                if american:
                    lu2 = lu2 + lam_c
                kmc = (0.5 - theta) * dt * (e1 - e0)
                d_ref[:] = (dt * lu2 + td * a0z2
                            + ((0.5 - theta) * dt) * lz2
                            + ((kb1 + kmc) * b1v) * b1_mask
                            + (kb2a + kmc) * bottom2d * b2r)
                tri_solve()
                e_ref[:] = d_ref[:] + kb2b * bottom2d * b2r
                penta_solve()
                z2 = e_ref[:]
            elif scheme == "hv":
                # Hundsdorfer-Verwer (framework extension; in 't Hout &
                # Foulon 2010) in delta form with the corrector increment
                # taken RELATIVE TO y2 = u + z2 (w = y~ - y2), so the
                # second-stage t_n boundary terms cancel:
                #   T1 w1 = dt*(L u [+lam]) + (dt*e0 + khv)*(b1 + b2)
                #           + 0.5*dt*L z2 - z2
                #   T2 w2 = w1;   u' = u + (z2 + w2)
                a0z2 = c_a0 * dv_of(ds_of(z2))
                lz2 = a0z2 + a1mul(z2) + a2mul(z2)
                lu2 = c_a0 * dv_of(ds_of(u)) + a1mul(u) + a2mul(u)
                if american:
                    lu2 = lu2 + lam_c
                khv = 0.5 * dt * (e1 - e0)
                d_ref[:] = (dt * lu2 + (0.5 * dt) * lz2 - z2
                            + ((dt * e0 + khv) * b1v) * b1_mask
                            + (dt * e0 + khv) * bottom2d * b2r)
                tri_solve()
                e_ref[:] = d_ref[:]
                penta_solve()
                z2 = z2 + e_ref[:]

            # compensated state update (see fused_do._make_kernel.step):
            # the single u-scale add per step is 2Sum-captured into a
            # carried compensation field
            if american and digital:
                # static-pin + box projection onto [payoff, 1] for the
                # 0/1 obstacle (see douglas._do_step); lam stays 0
                q, err = two_sum(u, z2 + comp)
                pin = u0 == 1.0
                qm = jnp.maximum(q, u0)
                u_new = jnp.where(pin, u0, jnp.minimum(qm, 1.0))
                interior = jnp.logical_and(
                    jnp.logical_and(q > u0, qm < 1.0),
                    jnp.logical_not(pin))
                comp_new = jnp.where(interior, err,
                                     jnp.zeros_like(err))
                return (u_new, lam_c, comp_new)
            if american:
                t_inc = (z2 - dt * lam_c) + comp
                q, err = two_sum(u, t_inc)
                u_new = jnp.maximum(q, u0)
                comp_new = jnp.where(q > u0, err, jnp.zeros_like(err))
                lam_new = (jnp.maximum(0.0, ((u0 - q) - err) / dt)
                           * smax_mask)
                return (u_new, lam_new, comp_new)
            q, err = two_sum(u, z2 + comp)
            return (q, lam_c, err)

        def remap(x, e_idx):
            """x <- contract(x, R_e) over the s (lane) axis, returning
            (value, err). Same rank-structured matrix and DIFFERENCE
            FORM as fused_do._make_kernel.remap (see there for the f32
            rationale), transposed to this kernel's [nv, ns] layout:
            source column c is a lane one-hot contraction -> [nv, 1],
            the per-target weight row rc is [1, ns], and the
            accumulation is a dense [nv, ns] block op per source
            column."""
            i0 = r_refs[4 * e_idx][:]
            w0 = r_refs[4 * e_idx + 1][:]
            i1 = r_refs[4 * e_idx + 2][:]
            w1 = r_refs[4 * e_idx + 3][:]
            wsum = jnp.where(w0 + w1 > 0.5, jnp.ones_like(w0),
                             jnp.zeros_like(w0))             # exact {0,1}

            def contract(c, acc):
                cf = c.astype(i0.dtype)
                rc = (w0 * (i0 == cf).astype(dtype)
                      + w1 * (i1 == cf).astype(dtype))       # [1, ns]
                oh = (s_iota1 == c).astype(dtype)            # [1, ns]
                xc = jnp.sum(x * oh, axis=1, keepdims=True)  # [nv, 1]
                return acc + rc * (xc - x)

            acc = lax.fori_loop(0, ns, contract, jnp.zeros_like(x))
            return two_sum(wsum * x, acc)

        carry = (u_ref[:],
                 lam_ref[:] if american else jnp.zeros((), dtype),
                 jnp.zeros_like(u_ref[:]))
        if div_plan is None:
            carry = lax.fori_loop(n0, n1, step, carry)
        else:
            e_idx = 0
            for (seg_a, seg_b, k_events) in div_plan:
                if seg_b > seg_a:
                    carry = lax.fori_loop(seg_a, seg_b, step, carry)
                for _ in range(k_events):
                    # linear + parameter-independent: applies identically
                    # to u and the compensation (which must ride the
                    # remap — see fused_do._make_kernel); the u remap's
                    # captured rounding e2 joins the remapped comp
                    u_c, lam_c, comp_c = carry
                    u_c, e2 = remap(u_c, e_idx)
                    comp_c = remap(comp_c, e_idx)[0] + e2
                    carry = (u_c, lam_c, comp_c)
                    e_idx += 1
        u_c, lam_c, comp_c = carry
        uo_ref[:] = u_c + comp_c
        if american:
            lamo_ref[:] = lam_c

    return kernel


@functools.lru_cache(maxsize=None)
def _single_call(m1: int, m2: int, theta: float, delta_t: float,
                 american: bool, put: bool, dtype_name: str,
                 interpret: bool, scheme: str = "do", barrier_pos=None,
                 div_plan=None, n_events: int = 0, digital: bool = False):
    nv, ns = m2 + 1, m1 + 1
    dtype = jnp.dtype(dtype_name)
    kernel = _make_kernel(m1, m2, theta, delta_t, american, put, scheme,
                          barrier_pos, div_plan, n_events, digital)

    full = lambda: pl.BlockSpec((nv, ns), lambda: (0, 0),
                                memory_space=pltpu.VMEM)
    srow = lambda: pl.BlockSpec((1, ns), lambda: (0, 0),
                                memory_space=pltpu.VMEM)
    vcol = lambda: pl.BlockSpec((nv, 1), lambda: (0, 0),
                                memory_space=pltpu.VMEM)
    one = lambda: pl.BlockSpec((1, 1), lambda: (0, 0),
                               memory_space=pltpu.VMEM)
    smem1 = lambda: pl.BlockSpec((1,), lambda: (0,),
                                 memory_space=pltpu.SMEM)

    n_state = 2 if american else 1
    in_specs = (
        [smem1(), smem1(), smem1()]
        + [full()] * n_state
        + [srow()] * 6                      # a1 P/Q rows
        + [vcol(), srow(), vcol()]          # vfl, sfac, vfac
        + [srow()] * 3 + [vcol()] * 3       # A0 stencils
        + [vcol()] * 5                      # A2 bands
        + [one(), srow(), srow(), one()]    # b1, b2 row, vec_s, strike
        + [srow()] * (4 * n_events)         # remap i0/w0/i1/w1 per event
    )
    out_specs = [full()] * n_state
    out_shapes = [jax.ShapeDtypeStruct((nv, ns), dtype)] * n_state
    scratch = ([pltpu.VMEM((nv, ns), dtype)] * 2
               + [pltpu.VMEM((nv, 1), dtype)] * 5)

    aliases = {3: 0}
    if american:
        aliases[4] = 1

    return pl.pallas_call(
        kernel,
        grid=(),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        input_output_aliases=aliases,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=fused_do._vmem_limit_bytes()),
    )


def fused_price_single(
    spec,
    solver,
    strike,
    s0,
    kappa,
    eta,
    sigma,
    rho,
    v0,
    r_d,
    r_f,
    american: bool = False,
    dividends=None,
    interpret: Optional[bool] = None,
    option_type: str = "call",
):
    """Price ONE option through the latency kernel; returns a scalar.
    Same field assembly as the batched kernel (shared
    fused_do._prepare_batched at batch 1), reshaped to the 2-D layout.
    Dividend schedules run in-kernel (segmented fori_loop + re-maps,
    shared fused_do._chunk_dividend_plan / _build_remap_fields).
    Jit-wrap the caller."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    put = operators.is_put(option_type)
    dig = operators.is_digital(option_type)
    ks = jnp.asarray(strike).reshape(1)
    (ops, u0, a1pq, vfull, scol, vrow, b1val, b2row, vec_s, idx_s, idx_v
     ) = fused_do._prepare_batched(spec, solver, ks, s0, kappa, eta,
                                   sigma, rho, v0, r_d, r_f, option_type)
    dtype = u0.dtype

    def srow(x):   # [1, ns] row field
        return x.reshape(1, -1).astype(dtype)

    def vcol(x):   # [nv, 1] column field
        return x.reshape(-1, 1).astype(dtype)

    u2 = u0[0]                                   # [nv, ns]
    lam2 = jnp.zeros_like(u2) if american else None
    rfa = jnp.asarray([operators.boundary_rate(r_d, r_f, option_type)],
                      dtype)
    inv = [srow(x[0]) for x in a1pq]
    inv += [vcol(vfull[0]), srow(scol[0]), vcol(vrow[0])]
    inv += [srow(ops.bs_wm[0]), srow(ops.bs_w0[0]), srow(ops.bs_wp[0])]
    inv += [vcol(ops.bv_wm[0]), vcol(ops.bv_w0[0]), vcol(ops.bv_wp[0])]
    inv += [vcol(ops.a2_l2[0]), vcol(ops.a2_l1[0]), vcol(ops.a2_d[0]),
            vcol(ops.a2_u1[0]), vcol(ops.a2_u2[0])]
    inv += [b1val.reshape(1, 1).astype(dtype), srow(b2row[0]),
            srow(vec_s[0]), ks.reshape(1, 1).astype(dtype)]

    # Rannacher start-up window as its own launch at static
    # (theta=1, delta_t/2) — same two-phase structure as the batched
    # engine (fused_do._run_chunks); the boundary fields stay the main
    # phase's so the damp sub-steps' e^{rate*(dt/2)*k} scaling lands on
    # the same absolute times. Dividend events of a phase turn its
    # launch into a plan kernel (static segment bounds + in-kernel
    # re-maps), chunked at MAX_EVENTS_PER_LAUNCH like the batched path.
    R = (min(solver.rannacher_steps, solver.n_steps)
         if solver.rannacher_steps else 0)
    phases = []
    if R:
        phases.append(dict(theta=1.0, delta_t=solver.delta_t / 2.0,
                           scheme="do", n_lo=1, n_hi=R,
                           to_local=lambda n: 2 * n - 1,
                           local_lo=1, local_end=2 * R + 1))
    if R < solver.n_steps:
        phases.append(dict(theta=solver.theta, delta_t=solver.delta_t,
                           scheme=solver.scheme, n_lo=R + 1,
                           n_hi=solver.n_steps,
                           to_local=lambda n: n,
                           local_lo=R + 1,
                           local_end=solver.n_steps + 1))
    bpos = fused_do._barrier_positions(spec)
    barrier = getattr(spec, "barrier", None)

    def launch(call, n_lo, n_end, extra):
        nonlocal u2, lam2
        args = [jnp.asarray([n_lo], jnp.int32),
                jnp.asarray([n_end], jnp.int32), rfa, u2]
        if american:
            args.append(lam2)
        outs = call(*args, *inv, *extra)
        u2 = outs[0]
        if american:
            lam2 = outs[1]

    for ph in phases:
        phase_events = (
            dividends is not None and len(dividends) > 0
            and any(dividends.events_for_step(n, solver.delta_t)
                    for n in range(ph["n_lo"], ph["n_hi"] + 1)))
        if phase_events:
            for plan, events in fused_do._chunk_dividend_plan(
                    solver, dividends, n_lo=ph["n_lo"], n_hi=ph["n_hi"],
                    to_local=ph["to_local"], local_end=ph["local_end"]):
                rmf = fused_do._build_remap_fields(
                    vec_s, events, dtype, option_type, barrier=barrier)
                r_args = [srow(f[0]) for ev in rmf for f in ev]
                call = _single_call(
                    spec.m1, spec.m2, ph["theta"], ph["delta_t"],
                    american, put, dtype.name, interpret, ph["scheme"],
                    barrier_pos=bpos, div_plan=plan,
                    n_events=len(events), digital=dig)
                launch(call, 0, 0, r_args)   # bounds unused: static plan
        else:
            call = _single_call(spec.m1, spec.m2, ph["theta"],
                                ph["delta_t"], american, put, dtype.name,
                                interpret, ph["scheme"], barrier_pos=bpos,
                                digital=dig)
            launch(call, ph["local_lo"], ph["local_end"], [])
    return u2[idx_v[0], idx_s[0]]
