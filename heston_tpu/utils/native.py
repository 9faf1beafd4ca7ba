"""ctypes bindings to the native CPU oracle library (csrc/heston_cpu.cpp).

The library is built on demand with the repo's Makefile (g++). It provides
independent C++ implementations of the Thomas / pentadiagonal solves and the
full Douglas time loop, used as test oracles and as a no-accelerator
fallback pricer — mirroring the reference's CPU sanity kernels
(ref: src/BlackScholesMatrixTest.cpp, src/hes_A2_mat.cpp:686).
"""

from __future__ import annotations

import ctypes
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
    """Load (building if necessary) the native library."""
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        _build()
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.ht_tridiag_solve.argtypes = [_D, _D, _D, _D, _D, _I]
    lib.ht_penta_solve.argtypes = [_D, _D, _D, _D, _D, _D, _D, _I]
    lib.ht_do_solve.argtypes = (
        [_I, _I, _I, ctypes.c_double, ctypes.c_double, ctypes.c_double]
        + [_D] * 17 + [_I, _D, _D, _D]
    )
    _lib = lib
    return lib


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


def do_solve(ops, u0, n_steps: int, delta_t: float, theta: float,
             r_f: float, american: bool = False) -> np.ndarray:
    """Run the full Douglas loop natively given a HestonOperators pytree
    (from heston_tpu.ops.operators.build_operators) and the payoff surface.
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
        nv, ns, n_steps, delta_t, theta, r_f,
        _ptr(a0c), _ptr(bsm), _ptr(bs0), _ptr(bsp),
        _ptr(bvm), _ptr(bv0), _ptr(bvp),
        _ptr(ml), _ptr(md), _ptr(mu),
        _ptr(l2), _ptr(l1), _ptr(d), _ptr(u1), _ptr(u2),
        _ptr(b1), _ptr(b2),
        1 if american else 0, _ptr(u0), _ptr(u), _ptr(lam),
    )
    return u
