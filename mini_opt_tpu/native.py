"""ctypes bindings for the native CPU runtime (native/mini_opt_native.cpp).

Builds the shared library on demand with g++ -O3 (no external deps) and
caches it next to the source. The native path is the single-threaded CPU
baseline for bench.py and a host-side solver for small problems.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "native", "mini_opt_native.cpp")
_SO = os.path.join(os.path.dirname(_SRC), "libmini_opt_native.so")

_lib: Optional[ctypes.CDLL] = None


def _build() -> str:
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        subprocess.run(
            [
                "g++", "-O3", "-march=native", "-std=c++17", "-fPIC", "-shared",
                _SRC, "-o", _SO,
            ],
            check=True,
            capture_output=True,
        )
    return _SO


def load() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(_build())
        dp = ctypes.POINTER(ctypes.c_double)
        ip = ctypes.POINTER(ctypes.c_int)
        lib.miniopt_native_ik_solve_batch.restype = ctypes.c_int
        lib.miniopt_native_ik_solve_batch.argtypes = [
            dp, dp, ctypes.c_int, ctypes.c_int, ctypes.c_double,
            ctypes.c_int, ctypes.c_int, dp, ip, ip,
        ]
        lib.miniopt_native_ldlt_us.restype = ctypes.c_double
        lib.miniopt_native_ldlt_us.argtypes = [ctypes.c_int, ctypes.c_int]
        lib.miniopt_native_planar_fk.restype = None
        lib.miniopt_native_planar_fk.argtypes = [
            ctypes.c_int, ctypes.c_double, dp, dp, dp,
        ]
        _lib = lib
    return _lib


def _dp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def ik_solve_batch(
    targets: np.ndarray,
    x0: np.ndarray,
    link_len: float = 0.4,
    max_iters: int = 50,
    max_qp_iters: int = 10,
) -> Tuple[np.ndarray, np.ndarray, int, int]:
    """Solve B planar IK instances natively. Returns (x, termination_codes,
    num_converged, total_inner_iterations)."""
    lib = load()
    targets = np.ascontiguousarray(targets, np.float64)
    x0 = np.ascontiguousarray(x0, np.float64)
    B, n = x0.shape
    x_out = np.empty_like(x0)
    term = np.empty(B, np.int32)
    inner = ctypes.c_int(0)
    ok = lib.miniopt_native_ik_solve_batch(
        _dp(targets), _dp(x0), B, n, link_len, max_iters, max_qp_iters,
        _dp(x_out), term.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ctypes.byref(inner),
    )
    return x_out, term, int(ok), int(inner.value)


def ldlt_us(n: int, reps: int = 20000) -> float:
    """Microseconds per condensed-KKT LDLT factor+solve on one CPU core."""
    return float(load().miniopt_native_ldlt_us(n, reps))


def planar_fk(theta: np.ndarray, link_len: float = 0.4):
    lib = load()
    theta = np.ascontiguousarray(theta, np.float64)
    n = theta.shape[0]
    xy = np.empty(2, np.float64)
    J = np.empty((2, n), np.float64)
    lib.miniopt_native_planar_fk(n, link_len, _dp(theta), _dp(xy), _dp(J))
    return xy, J
