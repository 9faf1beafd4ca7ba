"""shard_map-based option-book sharding and distributed LM reductions.

Design (SURVEY.md §2.5 / §5): the option batch is the only axis worth
sharding — each PDE is ~(m1+1)x(m2+1) ≈ 51x26…201x151 nodes, far too small
for intra-PDE decomposition. Each chip prices its shard of the book
independently (zero communication), and the Levenberg–Marquardt normal
equations reduce 5x5 + 5 values over ICI with `psum` — the distributed
equivalent of the reference's single-GPU KokkosBlas gemm/gemv
(ref: src/jacobian_computation.cpp:107-195).

All shard-mapped executables are built once per (mesh, spec, solver,
variant, batch-size) key and cached, so the LM loop reuses compiled code
across iterations exactly like the single-chip path.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from heston_tpu.config import DividendSchedule, GridSpec, SolverConfig
from heston_tpu.models import douglas
from heston_tpu.models import calibration
from heston_tpu.models.calibration import (
    N_PARAMS,
    _bumped_param_matrix,
    _kernel_dispatched,
)
from heston_tpu.models.greeks import RISK_KEYS

try:  # jax >= 0.4.35 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

AXIS = "options"


def _auto_jacobian_mode(mode):
    """None -> "ad" under float32 (an FD bump of 1e-6 is below one price
    ulp there), "fd" under x64 (reference parity)."""
    if mode is not None:
        return mode
    return "fd" if jax.config.read("jax_enable_x64") else "ad"


def ensure_distributed(**kwargs) -> None:
    """Multi-host entry: initialize `jax.distributed` from the standard
    coordinator environment (JAX_COORDINATOR_ADDRESS / PROCESS_ID /
    NUM_PROCESSES, or cloud auto-detection) exactly once; a no-op in a
    single-process world or when the caller already initialized it.

    Call this before `make_mesh()` in a multi-host deployment: afterwards
    `jax.devices()` returns ALL processes' devices and the mesh's psum
    reductions span hosts over DCN. The only cross-host traffic in this
    framework is the 5x5+5 LM normal-equation reduction once per
    iteration (SURVEY.md §5) — a few hundred bytes, so DCN latency is
    irrelevant; everything bandwidth-heavy stays chip-local."""
    # Detect prior initialization WITHOUT touching the XLA backend:
    # jax.process_count() would itself initialize the backend, after which
    # jax.distributed.initialize() unconditionally raises ("must be called
    # before any JAX calls ..."), killing the multi-process path this
    # function exists for.
    try:
        already = jax.distributed.is_initialized()
    except AttributeError:  # pragma: no cover - jax < 0.4.34
        from jax._src.distributed import global_state
        already = global_state.client is not None
    if already:
        return  # already initialized by us or the caller
    if not (kwargs or os.environ.get("JAX_COORDINATOR_ADDRESS")
            or os.environ.get("COORDINATOR_ADDRESS")):
        return  # single-process world: nothing to do
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as exc:  # pragma: no cover - double-init race
        if "already" not in str(exc).lower():
            raise


def host_major_devices(devices=None):
    """All devices ordered host-major (process_index, then device id) so a
    1-D batch shard decomposes into one contiguous block per host, and
    validated: every process must contribute the same device count (a
    ragged world would silently skew the per-shard batch split)."""
    devices = list(jax.devices() if devices is None else devices)
    devices.sort(key=lambda d: (d.process_index, getattr(d, "id", 0)))
    counts = {}
    for d in devices:
        counts[d.process_index] = counts.get(d.process_index, 0) + 1
    if len(set(counts.values())) > 1:
        raise ValueError(
            f"uneven devices per process: {counts} — the batch shard "
            "split assumes equal contributions")
    return devices


def make_mesh(devices=None, axis_name: str = AXIS) -> Mesh:
    """1-D mesh over all (or the given) devices — host-major, so in a
    multi-host world (after `ensure_distributed()`) each host owns one
    contiguous block of the option book; the single axis shards the
    book."""
    return Mesh(np.array(host_major_devices(devices)), (axis_name,))


# When True (or whenever jax.process_count() > 1), batch placement goes
# through make_array_from_callback — the API that assembles a global array
# from per-process addressable shards, required once no process addresses
# every device. Flipped on by tests/dryrun to exercise the multi-host data
# path on the virtual single-process mesh.
_FORCE_GLOBAL_BUILD = False


def set_multihost_data_path(flag: bool) -> None:
    global _FORCE_GLOBAL_BUILD
    _FORCE_GLOBAL_BUILD = bool(flag)


def shard_batch(x: jax.Array, mesh: Mesh) -> jax.Array:
    """Place a batch-axis array with one shard per device.

    Single-process: plain device_put. Multi-process: every host holds the
    (small) global book, and each process materializes only the shards it
    addresses via make_array_from_callback — device_put of a global array
    onto a partially-addressable sharding is not legal there."""
    sharding = NamedSharding(mesh, P(AXIS))
    if _FORCE_GLOBAL_BUILD or jax.process_count() > 1:
        arr = np.asarray(x)
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx])
    return jax.device_put(x, sharding)


def _pad_to(x: jnp.ndarray, mult: int) -> Tuple[jnp.ndarray, int]:
    n = x.shape[0]
    rem = (-n) % mult
    if rem:
        x = jnp.concatenate([x, jnp.broadcast_to(x[-1:], (rem,) + x.shape[1:])])
    return x, n


def _local_prices(spec, solver, american, dividends, option_type,
                  ks, tv, s0, r_d, r_f):
    # price_batch dispatches on solver.solver_engine, so a mesh of chips can
    # each run the fused Pallas kernel on its shard of the book
    return douglas.price_batch(
        spec, solver, ks, s0, tv[0], tv[1], tv[2], tv[3], tv[4],
        r_d, r_f, american=american, dividends=dividends,
        option_type=option_type,
    )


def _local_jac(spec, solver, american, dividends, eps, option_type,
               jacobian_mode, ks, tv, s0, r_d, r_f):
    # the fused forward-mode launch is the 'ad' implementation, not an
    # override: jacobian_mode='fd' must run FD bumps here too (reference
    # parity, and one cfg => one Jacobian method whether or not the book
    # carries group_steps)
    if jacobian_mode == "ad" and solver.solver_engine == "pallas":
        from heston_tpu.pallas import fused_do

        if fused_do.use_fused(spec, solver,
                              n_tangents=fused_do.JAC_TANGENTS,
                              american=american, dividends=dividends):
            # exact forward-mode AD through the fused kernel, one launch
            # per shard (the distributed analog of
            # calibrate_device(jacobian_mode='ad')); use_fused guards the
            # scheme (DO/CS/MCS/HV) and the tangent-inclusive VMEM working set
            base, jac = fused_do.fused_theta_jacobian(
                spec, solver, ks, s0, jnp.asarray(tv), r_d, r_f,
                american=american, dividends=dividends,
                option_type=option_type)
            return jac, base
    if jacobian_mode == "ad":
        # exact forward-mode Jacobian without the fused kernel —
        # MANDATORY in float32, where a 1e-6 FD bump is below one price
        # ulp and the LM stalls on a quantization-noise Jacobian (the
        # same defect fixed for the host/device loops this round).
        # The linearize must NOT trace through the fused kernel
        # (pallas_call's input_output_aliases has no JVP rule): in the
        # primal-fits-but-5-tangents-don't VMEM window price_batch would
        # still dispatch it — force the XLA engine here.
        lin_solver = solver
        if solver.solver_engine == "pallas":
            lin_solver = dataclasses.replace(solver, solver_engine="scan")
        # SAME formulation as the fused branch (4 AD columns + the
        # surface v-stencil v0 column) so the distributed LM trajectory
        # is engine-independent
        jac, base = calibration.jacobian_and_prices_ad(
            spec, lin_solver, ks, s0, jnp.asarray(tv), r_d, r_f,
            american=american, dividends=dividends,
            option_type=option_type)
        return jac, base
    pmat = _bumped_param_matrix(tv, eps)  # (6, 5)
    if _kernel_dispatched(spec, solver):
        # pallas_call has no batching rule for the bump vmap — run the
        # bumps as sequential in-graph launches (only when the fused
        # kernel actually runs; the XLA fallback vmaps as usual)
        prices = jnp.stack([
            _local_prices(spec, solver, american, dividends, option_type,
                          ks, pmat[i], s0, r_d, r_f)
            for i in range(N_PARAMS + 1)
        ])                                 # (6, B_local)
    else:
        prices = jax.vmap(
            lambda pv: _local_prices(spec, solver, american, dividends,
                                     option_type, ks, pv, s0, r_d, r_f)
        )(pmat)                            # (6, B_local)
    base = prices[0]
    jac = ((prices[1:] - base[None, :]) / eps).T
    return jac, base


@functools.lru_cache(maxsize=None)
def _price_exec(mesh: Mesh, spec: GridSpec, solver: SolverConfig,
                american: bool, dividends, option_type: str = "call"):
    fn = shard_map(
        functools.partial(_local_prices, spec, solver, american, dividends,
                          option_type),
        mesh=mesh,
        in_specs=(P(AXIS), P(), P(), P(), P()),
        out_specs=P(AXIS),
        # pallas_call outputs carry no varying-mesh-axes annotation
        check_vma=False,
    )
    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def _price_exec_mixed(mesh: Mesh, spec: GridSpec, solver: SolverConfig,
                      american: bool, dividends,
                      option_type: str = "call"):
    """Mixed-maturity sharded pricing: one fused per-lane launch per
    shard (fused engine only; the caller guards use_fused)."""
    from heston_tpu.pallas import fused_do

    def local(ks, nst, tv, s0, r_d, r_f):
        return fused_do.fused_price_batch(
            spec, solver, ks, s0, tv[0], tv[1], tv[2], tv[3], tv[4],
            r_d, r_f, american=american, dividends=dividends,
            option_type=option_type, n_steps_per=nst)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(), P(), P(), P()),
        out_specs=P(AXIS),
        check_vma=False,
    )
    return jax.jit(fn)


def _group_nsteps(group_steps, n: int, n_steps=None):
    """[n] int32 per-option step counts from static (start, end, n_steps)
    slices; validates the slices tile [0, n) contiguously in order
    (calibration.validate_group_steps) so positional concatenation and
    slice-indexed fallbacks always agree."""
    calibration.validate_group_steps(group_steps, n, n_steps=n_steps)
    return jnp.concatenate([
        jnp.full(e - a, g, jnp.int32) for a, e, g in group_steps])


@functools.lru_cache(maxsize=None)
def _jac_exec(mesh: Mesh, spec: GridSpec, solver: SolverConfig,
              american: bool, dividends, eps: float,
              option_type: str = "call", jacobian_mode: str = "fd"):
    fn = shard_map(
        functools.partial(_local_jac, spec, solver, american, dividends, eps,
                          option_type, jacobian_mode),
        mesh=mesh,
        in_specs=(P(AXIS), P(), P(), P(), P()),
        out_specs=(P(AXIS), P(AXIS)),
        check_vma=False,
    )
    return jax.jit(fn)


def _normal_eq_local(jac, base, mkt, w, lam_):
    """Shard-local damped normal equations: psum(JtJ/Jtr/SSE) over ICI,
    Marquardt damping, replicated 5x5 solve — THE single implementation
    behind both the uniform and mixed-maturity LM execs."""
    resid = (mkt - base) * w
    jac = jac * w[:, None]
    jtj = jax.lax.psum(jac.T @ jac, AXIS)
    jtr = jax.lax.psum(jac.T @ resid, AXIS)
    sse = jax.lax.psum(resid @ resid, AXIS)
    jtj = jtj * (1.0 + lam_ * jnp.eye(N_PARAMS, dtype=jtj.dtype))
    delta = jnp.linalg.solve(jtj, jtr)
    return delta, base, sse


@functools.lru_cache(maxsize=None)
def _normal_eq_exec(mesh: Mesh, spec: GridSpec, solver: SolverConfig,
                    american: bool, dividends, eps: float,
                    option_type: str = "call", jacobian_mode: str = "fd"):
    def local(ks, mkt, w, tv, lam_, s0, r_d, r_f):
        jac, base = _local_jac(spec, solver, american, dividends, eps,
                               option_type, jacobian_mode,
                               ks, tv, s0, r_d, r_f)
        return _normal_eq_local(jac, base, mkt, w, lam_)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS), P(), P(), P(), P(), P()),
        out_specs=(P(), P(AXIS), P()),
        check_vma=False,
    )
    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def _normal_eq_exec_mixed(mesh: Mesh, spec: GridSpec, solver: SolverConfig,
                          american: bool, dividends, eps: float,
                          option_type: str = "call",
                          jacobian_mode: str = "ad"):
    """Mixed-maturity distributed LM linear-algebra step: each shard runs
    its slice of the whole maturity ladder as per-lane one-launch fused
    pricing (the distributed form of calibrate_device's one-launch
    multi-maturity path), then the normal equations reduce over ICI as
    usual. jacobian_mode='ad' = ONE forward-mode launch per shard;
    'fd' = 6 sequential bumped launches (reference parity, matching
    calibrate_device's FD behavior on mixed ladders). Fused engine only
    (the caller guards use_fused with JAC_TANGENTS)."""
    from heston_tpu.pallas import fused_do

    def local(ks, nst, mkt, w, tv, lam_, s0, r_d, r_f):
        if jacobian_mode == "ad":
            base, jac = fused_do.fused_theta_jacobian(
                spec, solver, ks, s0, tv, r_d, r_f, american=american,
                dividends=dividends, option_type=option_type,
                n_steps_per=nst)
        else:
            # pallas_call has no batching rule for the bump vmap — run
            # the 6 bumps as sequential in-graph per-lane launches
            pmat = _bumped_param_matrix(tv, eps)       # (6, 5)
            prices = jnp.stack([
                fused_do.fused_price_batch(
                    spec, solver, ks, s0, pmat[i][0], pmat[i][1],
                    pmat[i][2], pmat[i][3], pmat[i][4], r_d, r_f,
                    american=american, dividends=dividends,
                    option_type=option_type, n_steps_per=nst)
                for i in range(N_PARAMS + 1)
            ])                                          # (6, B_local)
            base = prices[0]
            jac = ((prices[1:] - base[None, :]) / eps).T
        return _normal_eq_local(jac, base, mkt, w, lam_)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(), P(), P(),
                  P(), P()),
        out_specs=(P(), P(AXIS), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def price_batch_sharded(
    mesh: Mesh,
    spec: GridSpec,
    solver: SolverConfig,
    strikes: jax.Array,
    s0,
    theta_vec: jax.Array,
    r_d,
    r_f,
    american: bool = False,
    dividends: Optional[DividendSchedule] = None,
    option_type: str = "call",
    group_steps=(),
) -> jax.Array:
    """Price the book with the batch axis sharded across the mesh.

    Each device runs the plain vmapped pricer on its shard — embarrassingly
    parallel, no collectives (the TPU-native form of the reference's
    one-team-per-option kernel, ref: src/device_solver.hpp:53-185).

    group_steps: optional static (start, end, n_steps) maturity-ladder
    slices. With the fused engine each shard prices its slice of the
    WHOLE mixed book in one per-lane launch; XLA engines price per
    maturity group."""
    n_dev = mesh.devices.size
    padded, n = _pad_to(jnp.asarray(strikes), n_dev)
    dtype = padded.dtype
    tv = jnp.asarray(theta_vec, dtype)
    s0a, rda, rfa = (jnp.asarray(s0, dtype), jnp.asarray(r_d, dtype),
                     jnp.asarray(r_f, dtype))
    if group_steps:
        from heston_tpu.pallas import fused_do

        nst = _group_nsteps(group_steps, n, n_steps=solver.n_steps)
        if (solver.solver_engine == "pallas"
                and fused_do.use_fused(spec, solver)):
            nst_p, _ = _pad_to(nst, n_dev)
            fn = _price_exec_mixed(mesh, spec, solver, american,
                                   dividends, option_type)
            return fn(shard_batch(padded, mesh),
                      shard_batch(nst_p, mesh), tv, s0a, rda, rfa)[:n]
        return jnp.concatenate([
            price_batch_sharded(
                mesh, spec,
                dataclasses.replace(solver, n_steps=g,
                                    maturity=g * solver.delta_t),
                strikes[a:e], s0, theta_vec, r_d, r_f,
                american=american, dividends=dividends,
                option_type=option_type)
            for a, e, g in group_steps])
    fn = _price_exec(mesh, spec, solver, american, dividends, option_type)
    out = fn(shard_batch(padded, mesh), tv, s0a, rda, rfa)
    return out[:n]


def jacobian_normal_eq_sharded(
    mesh: Mesh,
    spec: GridSpec,
    solver: SolverConfig,
    strikes: jax.Array,
    market_prices: jax.Array,
    s0,
    theta_vec: jax.Array,
    r_d,
    r_f,
    lam,
    eps: float = 1e-6,
    american: bool = False,
    dividends: Optional[DividendSchedule] = None,
    option_type: str = "call",
    jacobian_mode: Optional[str] = None,
    group_steps=(),
    weights=None,
):
    """One fully-distributed LM linear-algebra step.

    Per shard: 6 x local PDE solves -> local J, residual; then
    JtJ = psum(J_loc^T J_loc), Jtr = psum(J_loc^T r_loc) over ICI, Marquardt
    damping JtJ_ii *= (1+lam), and a replicated 5x5 solve. Padded entries are
    zero-weighted so they don't pollute the reduction. Returns
    (delta [5] replicated, base_prices [n], sse replicated).

    group_steps: optional static (start, end, n_steps) maturity-ladder
    slices (see models.calibration.calibrate_device). With the fused
    engine each shard prices + differentiates its slice of the WHOLE
    ladder in ONE forward-mode launch (per-lane step counts).

    weights (optional [n]): least-squares weights — the psum'd normal
    equations and SSE become J^T diag(w) J, J^T diag(w) r, sum w_i r_i^2
    (they ride the same per-point channel that zero-weights the padded
    lanes; the channel carries sqrt(w) because _normal_eq_local applies
    it to BOTH J and r)."""
    n_dev = mesh.devices.size
    padded_k, n = _pad_to(jnp.asarray(strikes), n_dev)
    padded_m, _ = _pad_to(jnp.asarray(market_prices), n_dev)
    dtype = padded_k.dtype
    valid = (jnp.arange(padded_k.shape[0]) < n).astype(dtype)
    if weights is not None:
        wpad, _ = _pad_to(jnp.asarray(weights, dtype), n_dev)
        valid = valid * jnp.sqrt(wpad)
    if group_steps:
        from heston_tpu.pallas import fused_do

        nst = _group_nsteps(group_steps, n, n_steps=solver.n_steps)
        mode = _auto_jacobian_mode(jacobian_mode)
        # 'ad' holds JAC_TANGENTS tangent fields in VMEM; 'fd' runs 6
        # bumped primal launches and only needs the primal working set
        need = fused_do.JAC_TANGENTS if mode == "ad" else 0
        if not (solver.solver_engine == "pallas"
                and fused_do.use_fused(spec, solver, n_tangents=need,
                                       american=american,
                                       dividends=dividends)):
            raise ValueError(
                "group_steps needs the fused engine (per-lane step "
                "counts); price each maturity group separately via "
                "calibrate(pricing_fns=sharded_pricing_fns(mesh)) "
                "otherwise")
        nst_p, _ = _pad_to(nst, n_dev)
        fn = _normal_eq_exec_mixed(mesh, spec, solver, american,
                                   dividends, eps, option_type, mode)
        delta, base, sse = fn(
            shard_batch(padded_k, mesh), shard_batch(nst_p, mesh),
            shard_batch(padded_m, mesh), shard_batch(valid, mesh),
            jnp.asarray(theta_vec, dtype), jnp.asarray(lam, dtype),
            jnp.asarray(s0, dtype), jnp.asarray(r_d, dtype),
            jnp.asarray(r_f, dtype),
        )
        return delta, base[:n], sse
    fn = _normal_eq_exec(mesh, spec, solver, american, dividends, eps,
                         option_type, _auto_jacobian_mode(jacobian_mode))
    delta, base, sse = fn(
        shard_batch(padded_k, mesh), shard_batch(padded_m, mesh),
        shard_batch(valid, mesh), jnp.asarray(theta_vec, dtype),
        jnp.asarray(lam, dtype), jnp.asarray(s0, dtype),
        jnp.asarray(r_d, dtype), jnp.asarray(r_f, dtype),
    )
    return delta, base[:n], sse


@functools.lru_cache(maxsize=None)
def _risk_exec(mesh: Mesh, spec: GridSpec, solver: SolverConfig,
               american: bool, dividends, option_type: str):
    def local(ks, tv, s0, r_d, r_f):
        from heston_tpu.models import greeks

        out = greeks.batch_greeks(
            spec, solver, ks, s0, tv[0], tv[1], tv[2], tv[3], tv[4],
            r_d, r_f, american=american, dividends=dividends,
            option_type=option_type)
        return tuple(out[k] for k in RISK_KEYS)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(AXIS), P(), P(), P(), P()),
        out_specs=(P(AXIS),) * len(RISK_KEYS),
        check_vma=False,
    )
    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def _risk_exec_mixed(mesh: Mesh, spec: GridSpec, solver: SolverConfig,
                     american: bool, dividends, option_type: str):
    """Mixed-maturity whole-book risk: each shard runs ONE fused launch
    over its slice of the book with per-lane step counts (the sharded
    form of batch_greeks(group_steps=...); fused engine only — the
    caller guards use_fused). The epilogue IS batch_greeks' fused
    branch (greeks.fused_book_risk), so the sharded and single-device
    numbers cannot drift apart."""
    from heston_tpu.models import greeks

    def local(ks, nst, tv, s0, r_d, r_f):
        out = greeks.fused_book_risk(
            spec, solver, ks, s0, tv[0], tv[1], tv[2], tv[3], tv[4],
            r_d, r_f, american=american, dividends=dividends,
            option_type=option_type, nst=nst)
        return tuple(out[k] for k in RISK_KEYS)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(), P(), P(), P()),
        out_specs=(P(AXIS),) * len(RISK_KEYS),
        check_vma=False,
    )
    return jax.jit(fn)


def batch_greeks_sharded(
    mesh: Mesh,
    spec: GridSpec,
    solver: SolverConfig,
    strikes: jax.Array,
    s0,
    theta_vec: jax.Array,
    r_d,
    r_f,
    american: bool = False,
    dividends: Optional[DividendSchedule] = None,
    option_type: str = "call",
    group_steps=(),
):
    """Whole-book risk (price / delta / gamma / theta / vega_v0 /
    vanna / volga per option, models.greeks.batch_greeks) with the book
    sharded across the mesh —
    each chip runs the fused surface pass + stencil epilogues on its
    shard; no collectives. Returns a dict of [n] arrays.

    group_steps: optional static (start, end, n_steps) slices for a
    mixed-maturity book (see models.greeks.batch_greeks). With the
    fused engine each shard prices its slice of the WHOLE mixed book in
    one launch (per-lane step counts); otherwise each maturity group is
    sharded separately."""
    n_dev = mesh.devices.size
    padded, n = _pad_to(jnp.asarray(strikes), n_dev)
    dtype = padded.dtype
    tv = jnp.asarray(theta_vec, dtype)
    s0a, rda, rfa = (jnp.asarray(s0, dtype), jnp.asarray(r_d, dtype),
                     jnp.asarray(r_f, dtype))
    if group_steps:
        from heston_tpu.pallas import fused_do

        nst = _group_nsteps(group_steps, n, n_steps=solver.n_steps)
        if fused_do.use_fused(spec, solver):
            nst_p, _ = _pad_to(nst, n_dev)
            fn = _risk_exec_mixed(mesh, spec, solver, american, dividends,
                                  option_type)
            cols = fn(shard_batch(padded, mesh),
                      shard_batch(nst_p, mesh), tv, s0a, rda, rfa)
            return {k: c[:n] for k, c in zip(RISK_KEYS, cols)}
        # XLA engines: shard each maturity group separately
        parts = [
            batch_greeks_sharded(
                mesh, spec,
                dataclasses.replace(solver, n_steps=g,
                                    maturity=g * solver.delta_t),
                strikes[a:e], s0, theta_vec, r_d, r_f, american=american,
                dividends=dividends, option_type=option_type)
            for a, e, g in group_steps]
        return {k: jnp.concatenate([p[k] for p in parts])
                for k in parts[0]}
    fn = _risk_exec(mesh, spec, solver, american, dividends, option_type)
    cols = fn(shard_batch(padded, mesh), tv, s0a, rda, rfa)
    return {k: c[:n] for k, c in zip(RISK_KEYS, cols)}


def calibrate_sharded(
    mesh: Mesh,
    spec: GridSpec,
    solver: SolverConfig,
    strikes,
    market_prices,
    s0,
    init_vec,
    r_d,
    r_f,
    cfg=None,
    group_steps=(),
    american: bool = False,
    dividends: Optional[DividendSchedule] = None,
    option_type: str = "call",
    checkpoint_path: Optional[str] = None,
    weights=None,
):
    """Distributed Levenberg–Marquardt calibration: the whole (possibly
    mixed-maturity) chain stays sharded over the mesh for every pass —
    ONE per-lane fused launch per shard per Jacobian pass
    (jacobian_normal_eq_sharded) and one per trial pricing
    (price_batch_sharded) — with the host running only the scalar LM
    bookkeeping (accept/reject, Marquardt damping, clamps; the same
    logic as models.calibration.calibrate,
    ref: src/heston_calibration.cpp:26-512).

    checkpoint_path: persist the LM state after every iteration and
    resume a pre-existing file (same crash-recovery facility as the
    single-device host driver).

    weights (optional [n]): least-squares weights (sum w_i r_i^2
    objective end to end — psum'd normal equations, SSE, accept/reject;
    see models.calibration.vega_weights).

    Returns (theta_vec [5], info dict with iterations / final_error /
    converged / history)."""
    from heston_tpu.config import CalibrationConfig
    from heston_tpu.utils.checkpoint import LMState, problem_key

    cfg = cfg or CalibrationConfig()
    if not jax.config.read("jax_enable_x64") and cfg.jacobian_mode == "fd":
        # float32: a 1e-6 FD bump drowns in rounding noise and the LM
        # stalls — auto-upgrade to the exact AD Jacobian, the same
        # driver-level protection run_scenario applies for the host and
        # device loops (scenarios.py)
        import dataclasses as _dc

        cfg = _dc.replace(cfg, jacobian_mode="ad")
    # float coercion: integer strike/init input must not truncate the
    # parameter vector (host bookkeeping is f64; the device executables
    # cast to the live jnp float dtype themselves)
    ks = jnp.asarray(strikes, jnp.result_type(float))
    market = np.asarray(market_prices, np.float64)
    w_np = None if weights is None else np.asarray(weights, np.float64)
    if w_np is not None and (w_np.shape != market.shape
                             or np.any(w_np < 0)):
        raise ValueError(
            f"weights must be >= 0 with shape {market.shape}; got shape "
            f"{w_np.shape}")
    # fingerprints the PROBLEM, not the LM hyperparameters (resuming
    # with a larger max_iter is the normal continuation pattern)
    pkey = problem_key(ks, market, s0, r_d, r_f, american,
                       option_type, spec, solver, group_steps, w_np)
    state = LMState(np.asarray(init_vec, np.float64), cfg.lambda_init,
                    0, float("inf"), False, [], key=pkey
                    ).maybe_resume(checkpoint_path)

    def price(tv):
        return np.asarray(price_batch_sharded(
            mesh, spec, solver, ks, s0, jnp.asarray(tv), r_d, r_f,
            american=american, dividends=dividends,
            option_type=option_type, group_steps=group_steps))

    def eval_step(tv, lam_):
        delta, base, sse = jacobian_normal_eq_sharded(
            mesh, spec, solver, ks, jnp.asarray(market), s0,
            jnp.asarray(tv), r_d, r_f, lam=lam_, eps=cfg.eps,
            american=american, dividends=dividends,
            option_type=option_type, jacobian_mode=cfg.jacobian_mode,
            group_steps=group_steps,
            weights=None if w_np is None else jnp.asarray(w_np))
        return np.asarray(delta), np.asarray(base), float(sse)

    # the accept/reject loop, damping schedule, checkpointing and
    # resume-finished repricing are THE shared implementation —
    # calibration.lm_host_loop — so the two drivers cannot drift
    (theta_vec, lam, iters, final_error, converged, history, fitted
     ) = calibration.lm_host_loop(
        market, cfg, state, eval_step, price,
        checkpoint_path=checkpoint_path, pkey=pkey, weights=w_np)
    return jnp.asarray(theta_vec), dict(
        iterations=iters, final_error=final_error, converged=converged,
        fitted_prices=fitted, history=history)


def sharded_pricing_fns(mesh: Mesh):
    """(jac_fn, price_fn) drop-ins for calibration.calibrate(pricing_fns=...)
    that run the PDE fleet sharded over the mesh."""

    def jac_fn(spec, solver, strikes, s0, theta_vec, r_d, r_f, eps=1e-6,
               american=False, dividends=None, option_type="call",
               jacobian_mode=None):
        n_dev = mesh.devices.size
        padded, n = _pad_to(jnp.asarray(strikes), n_dev)
        dtype = padded.dtype
        fn = _jac_exec(mesh, spec, solver, american, dividends, eps,
                       option_type, _auto_jacobian_mode(jacobian_mode))
        jac, base = fn(shard_batch(padded, mesh),
                       jnp.asarray(theta_vec, dtype), jnp.asarray(s0, dtype),
                       jnp.asarray(r_d, dtype), jnp.asarray(r_f, dtype))
        return jac[:n], base[:n]

    def price_fn(spec, solver, strikes, s0, theta_vec, r_d, r_f,
                 american=False, dividends=None, option_type="call"):
        return price_batch_sharded(
            mesh, spec, solver, strikes, s0, theta_vec, r_d, r_f,
            american=american, dividends=dividends, option_type=option_type,
        )

    return jac_fn, price_fn
