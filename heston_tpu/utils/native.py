"""ctypes bindings to the native CPU oracle library (csrc/heston_cpu.cpp).

The library is built on demand with the repo's Makefile (g++). It provides
independent C++ implementations of the Thomas / pentadiagonal solves and the
full Douglas time loop, used as test oracles and as a no-accelerator
fallback pricer — mirroring the reference's CPU sanity kernels
(ref: src/BlackScholesMatrixTest.cpp, src/hes_A2_mat.cpp:686).
"""

from __future__ import annotations

import contextlib
import ctypes
import functools
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_LIB_PATH = Path(__file__).parent / "libheston_cpu.so"
_CSRC = Path(__file__).parents[2] / "csrc"
_lib: Optional[ctypes.CDLL] = None

_D = ctypes.POINTER(ctypes.c_double)
_I = ctypes.c_int64


def _build() -> None:
    subprocess.run(["make", "-C", str(_CSRC)], check=True,
                   capture_output=True)


def load() -> ctypes.CDLL:
    """Load (building or rebuilding if stale) the native library."""
    global _lib
    if _lib is not None:
        return _lib
    src = _CSRC / "heston_cpu.cpp"
    if (not _LIB_PATH.exists()
            or (src.exists()
                and src.stat().st_mtime > _LIB_PATH.stat().st_mtime)):
        _build()
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.ht_tridiag_solve.argtypes = [_D, _D, _D, _D, _D, _I]
    lib.ht_penta_solve.argtypes = [_D, _D, _D, _D, _D, _D, _D, _I]
    lib.ht_do_solve.argtypes = (
        [_I, _I, _I, ctypes.c_double, ctypes.c_double, _I, _I,
         ctypes.c_double]
        + [_D] * 17 + [_I, _D, _D, _D]
    )
    lib.ht_omp_threads.restype = ctypes.c_int64
    lib.ht_apply_dividend.argtypes = [
        _D, _D, ctypes.c_double, ctypes.c_double, _I, _I, _I, _I]
    lib.ht_do_solve_batch.argtypes = (
        [_I, _I, _I, _I, ctypes.c_double, ctypes.c_double, _I, _I,
         ctypes.c_double]
        + [_D] * 17 + [_I, _D]
        + [_I, ctypes.POINTER(ctypes.c_int64), _D, _D, _D, _I]
        + [_D, _D, ctypes.POINTER(ctypes.c_int64), _I]
    )
    _lib = lib
    return lib


# Scheme enum shared with csrc/heston_cpu.cpp (enum Scheme).
_SCHEME_IDS = {"do": 0, "cs": 1, "mcs": 2, "hv": 3}


def _scheme_id(scheme: str) -> int:
    try:
        return _SCHEME_IDS[scheme]
    except KeyError:
        raise ValueError(
            f"the native CPU engine does not implement scheme "
            f"{scheme!r} (supported: {sorted(_SCHEME_IDS)})") from None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(_D)


def _f64(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a), dtype=np.float64)


def tridiag_solve(ml, md, mu, rhs) -> np.ndarray:
    lib = load()
    ml, md, mu, rhs = map(_f64, (ml, md, mu, rhs))
    x = np.empty_like(rhs)
    lib.ht_tridiag_solve(_ptr(ml), _ptr(md), _ptr(mu), _ptr(rhs), _ptr(x),
                         rhs.shape[0])
    return x


def penta_solve(l2, l1, d, u1, u2, rhs) -> np.ndarray:
    lib = load()
    l2, l1, d, u1, u2, rhs = map(_f64, (l2, l1, d, u1, u2, rhs))
    x = np.empty_like(rhs)
    lib.ht_penta_solve(_ptr(l2), _ptr(l1), _ptr(d), _ptr(u1), _ptr(u2),
                       _ptr(rhs), _ptr(x), rhs.shape[0])
    return x


def omp_threads() -> int:
    """Actual OpenMP thread count of the batch engine (honors
    OMP_NUM_THREADS; 1 if built without OpenMP) — use for benchmark
    labels instead of os.cpu_count(), which mislabels pinned runs."""
    return int(load().ht_omp_threads())


def apply_dividend(u, vec_s, amount: float, pct: float,
                   put: bool = False,
                   knock_top: bool = False) -> np.ndarray:
    """Native dividend re-map (oracle for douglas.apply_dividend);
    knock_top re-knocks a top-knocked barrier's column ns-1."""
    lib = load()
    u = _f64(u).copy()
    vec_s = _f64(vec_s)
    nv, ns = u.shape
    lib.ht_apply_dividend(_ptr(u), _ptr(vec_s), amount, pct,
                          1 if put else 0, 1 if knock_top else 0, nv, ns)
    return u


@functools.lru_cache(maxsize=None)
def _prep_exec(spec, solver, option_type: str):
    """Cached jitted field-assembly executable (re-jitting per call costs
    ~1.5 s of tracing; the assembly itself is tiny)."""
    import jax

    from heston_tpu.models import douglas

    def one(k, s0, kappa, eta, sigma, rho, v0, r_d, r_f):
        inst = douglas.prepare_instance(
            spec, solver, k, s0, kappa, eta, sigma, rho, v0, r_d, r_f,
            option_type)
        return inst.ops, inst.u0, inst.grid.vec_s, inst.idx_s, inst.idx_v

    return jax.jit(jax.vmap(one, in_axes=(0,) + (None,) * 8))


def price_batch_cpu(spec, solver, strikes, s0, kappa, eta, sigma, rho, v0,
                    r_d, r_f, american: bool = False, dividends=None,
                    option_type: str = "call", group_steps=()) -> np.ndarray:
    """Batched pricing on the CPU via the native OpenMP ADI engine —
    the framework's analog of the reference's OpenMP performance-test
    build (ref: src/perfomance_test.cpp:507-534), whose CPU numbers back
    the README's GPU-vs-CPU 30x claim. Field assembly reuses the traced
    JAX operator build (tiny); the time loop runs one option per OpenMP
    thread in C++ (csrc/heston_cpu.cpp::ht_do_solve_batch). All four
    schemes (do/cs/mcs/hv) and Rannacher start-up damping run natively
    — the C++ loop is a full independent oracle for every JAX engine
    configuration (~1e-14 agreement in f64).

    group_steps: optional static (start, end, n_steps) maturity-ladder
    slices (shared-dt convention; solver.n_steps = max) — an
    INDEPENDENT native oracle for the mixed-maturity device paths."""
    import jax
    import jax.numpy as jnp

    from heston_tpu.ops import operators

    scheme_id = _scheme_id(solver.scheme)   # raises on unknown schemes
    lib = load()
    # pin the (tiny) traced field assembly to the host CPU backend (on the
    # TPU-tunnel machine every device->host fetch costs a fixed ~29 ms
    # RPC, which would dwarf the native solve being timed) and force f64
    # tracing: the solve is double, so f32-rounded bands would break the
    # advertised 1e-13 parity with the f64 XLA path
    try:
        cpu_dev = jax.devices("cpu")[0]
    except RuntimeError:  # pragma: no cover - no cpu backend registered
        cpu_dev = None
    ctx = (jax.default_device(cpu_dev) if cpu_dev is not None
           else contextlib.nullcontext())
    import dataclasses

    from heston_tpu.models.calibration import validate_group_steps

    b = int(np.asarray(strikes).shape[0])
    validate_group_steps(group_steps, b, n_steps=solver.n_steps)
    groups = group_steps or ((0, b, solver.n_steps),)
    with ctx, jax.enable_x64():
        strikes = jnp.asarray(np.asarray(strikes), jnp.float64)
        scalars = (jnp.float64(s0), jnp.float64(kappa), jnp.float64(eta),
                   jnp.float64(sigma), jnp.float64(rho), jnp.float64(v0),
                   jnp.float64(r_d), jnp.float64(r_f))
        # per-group assembly: each group's b1/b2 carry its OWN
        # e^{-rate dt (n_g - 1)} scaling (prepare_instance uses the
        # group solver), then the batch-major fields are stacked
        parts = [
            _prep_exec(spec, dataclasses.replace(
                solver, n_steps=g, maturity=g * solver.delta_t),
                option_type)(strikes[a:e], *scalars)
            for a, e, g in groups]
    parts = [jax.device_get(pt) for pt in parts]
    out = jax.tree_util.tree_map(
        lambda *xs: np.concatenate(xs), *parts)
    ops, u0, vec_s, idx_s, idx_v = out
    nv, ns = spec.m2 + 1, spec.m1 + 1

    f = {name: _f64(getattr(ops, name)) for name in (
        "a0_c", "bs_wm", "bs_w0", "bs_wp", "bv_wm", "bv_w0", "bv_wp",
        "a1_ml", "a1_md", "a1_mu", "a2_l2", "a2_l1", "a2_d", "a2_u1",
        "a2_u2", "b1", "b2")}
    u0 = _f64(u0)
    vec_s = _f64(vec_s)
    u = u0.copy()
    lam = np.zeros_like(u)

    ev = []
    if dividends is not None and len(dividends) > 0:
        for n in range(1, solver.n_steps + 1):
            for amt, pct in dividends.events_for_step(n, solver.delta_t):
                ev.append((n, amt, pct))
    ev_step = np.ascontiguousarray([e[0] for e in ev], dtype=np.int64)
    ev_amt = _f64([e[1] for e in ev])
    ev_pct = _f64([e[2] for e in ev])

    b_rate = float(operators.boundary_rate(r_d, r_f, option_type))
    nst = (np.ascontiguousarray(
        np.concatenate([np.full(e - a, g) for a, e, g in groups]),
        dtype=np.int64) if group_steps else None)
    lib.ht_do_solve_batch(
        b, nv, ns, solver.n_steps, solver.delta_t, solver.theta,
        scheme_id, int(solver.rannacher_steps), b_rate,
        _ptr(f["a0_c"]), _ptr(f["bs_wm"]), _ptr(f["bs_w0"]),
        _ptr(f["bs_wp"]), _ptr(f["bv_wm"]), _ptr(f["bv_w0"]),
        _ptr(f["bv_wp"]), _ptr(f["a1_ml"]), _ptr(f["a1_md"]),
        _ptr(f["a1_mu"]), _ptr(f["a2_l2"]), _ptr(f["a2_l1"]),
        _ptr(f["a2_d"]), _ptr(f["a2_u1"]), _ptr(f["a2_u2"]),
        _ptr(f["b1"]), _ptr(f["b2"]),
        # American mode: 2 = static-pin + box projection (discontinuous
        # digital obstacle — see douglas._do_step), 1 = Ikonen-Toivanen
        ((2 if operators.is_digital(option_type) else 1)
         if american else 0), _ptr(u0),
        len(ev), ev_step.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        _ptr(ev_amt), _ptr(ev_pct), _ptr(vec_s),
        1 if operators.is_put(option_type) else 0, _ptr(u), _ptr(lam),
        (nst.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
         if nst is not None else None),
        (1 if (spec.barrier is not None and spec.barrier.knock_top)
         else 0),
    )
    iv = np.asarray(idx_v, dtype=np.int64)
    is_ = np.asarray(idx_s, dtype=np.int64)
    return u[np.arange(b), iv, is_]


def do_solve(ops, u0, n_steps: int, delta_t: float, theta: float,
             r_f: float, american: bool = False, scheme: str = "do",
             rannacher_steps: int = 0) -> np.ndarray:
    """Run the full ADI loop natively given a HestonOperators pytree
    (from heston_tpu.ops.operators.build_operators) and the payoff surface.
    `scheme` selects the corrector (do/cs/mcs/hv); `rannacher_steps`
    runs the damped start-up window (theta=1 Douglas at delta_t/2).
    Returns the terminal surface [nv, ns]."""
    lib = load()
    u0 = _f64(u0)
    nv, ns = u0.shape
    a0c = _f64(ops.a0_c)
    fields3 = [a0c]
    bsm, bs0, bsp = map(_f64, (ops.bs_wm, ops.bs_w0, ops.bs_wp))
    bvm, bv0, bvp = map(_f64, (ops.bv_wm, ops.bv_w0, ops.bv_wp))
    ml, md, mu = map(_f64, (ops.a1_ml, ops.a1_md, ops.a1_mu))
    l2, l1, d, u1, u2 = map(
        _f64, (ops.a2_l2, ops.a2_l1, ops.a2_d, ops.a2_u1, ops.a2_u2))
    b1, b2 = map(_f64, (ops.b1, ops.b2))
    u = u0.copy()
    lam = np.zeros_like(u)
    lib.ht_do_solve(
        nv, ns, n_steps, delta_t, theta, _scheme_id(scheme),
        int(rannacher_steps), r_f,
        _ptr(a0c), _ptr(bsm), _ptr(bs0), _ptr(bsp),
        _ptr(bvm), _ptr(bv0), _ptr(bvp),
        _ptr(ml), _ptr(md), _ptr(mu),
        _ptr(l2), _ptr(l1), _ptr(d), _ptr(u1), _ptr(u2),
        _ptr(b1), _ptr(b2),
        1 if american else 0, _ptr(u0), _ptr(u), _ptr(lam),
    )
    return u
