"""Native (C++) equality-constrained QP solvers, exposed via ctypes.

The reference's only native dependency is its external QP solver (OSQP/SCS C
libraries behind `qpsolvers`, reference qp/qplinear.py:6). This package
builds the in-tree replacement (`admm_qp.cpp`) on first use with g++ and
binds it with ctypes — no pip dependencies. The native solvers serve as a
host-side robustness fallback and as an algorithmically independent oracle
for the device KKT path (an ADMM iteration with polish, OSQP-style).
"""

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "admm_qp.cpp")
_SO = os.path.join(_HERE, "_admm_qp.so")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_BUILD_ERROR: Optional[str] = None


def _build() -> Optional[str]:
    """Compile the shared library; returns an error string on failure."""
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        "-std=c++17",
        _SRC,
        "-o",
        _SO,
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=240)
    except (OSError, subprocess.TimeoutExpired) as e:  # g++ missing/hung
        return f"native build failed: {e}"
    if proc.returncode != 0:
        return f"native build failed: {proc.stderr[-2000:]}"
    return None


def load_native() -> Optional[ctypes.CDLL]:
    """Return the native library, building it on first use (None if impossible)."""
    global _LIB, _BUILD_ERROR
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if _BUILD_ERROR is not None:
            return None
        # rebuild when the binary is missing or NOT strictly newer than the
        # source: -march=native binaries are host-specific, and a checkout
        # gives equal mtimes — loading a foreign-host .so can SIGILL the
        # whole process
        if not os.path.exists(_SO) or os.path.getmtime(
            _SO
        ) <= os.path.getmtime(_SRC):
            err = _build()
            if err is not None:
                _BUILD_ERROR = err
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError as e:
            # corrupt or wrong-format binary: try one fresh build before
            # declaring the backend unavailable (never raise out of here —
            # native_available() must degrade gracefully)
            err = _build()
            if err is None:
                try:
                    lib = ctypes.CDLL(_SO)
                except OSError as e2:
                    _BUILD_ERROR = f"native load failed: {e2}"
                    return None
            else:
                _BUILD_ERROR = f"native load failed: {e}; rebuild: {err}"
                return None
        dp = np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS")
        lib.eqp_kkt_solve.restype = ctypes.c_int
        lib.eqp_kkt_solve.argtypes = [
            dp, dp, dp,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_int, dp,
        ]
        lib.eqp_admm_solve.restype = ctypes.c_int
        lib.eqp_admm_solve.argtypes = [
            dp, dp, dp,
            ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_int, ctypes.c_int, dp,
        ]
        _LIB = lib
        return _LIB


def native_available() -> bool:
    """True when the native solver library can be built/loaded."""
    return load_native() is not None


def native_build_error() -> Optional[str]:
    """Last build failure message, if any."""
    return _BUILD_ERROR


def eqp_solve_native(
    P: np.ndarray,
    A: np.ndarray,
    B: np.ndarray,
    delta: float = 1e-11,
    refine_iters: int = 4,
) -> np.ndarray:
    """Multi-RHS KKT solve in the C++ backend. B is (m, k); returns (n, k)."""
    lib = load_native()
    if lib is None:
        raise RuntimeError(f"native solver unavailable: {_BUILD_ERROR}")
    P = np.ascontiguousarray(P, dtype=np.float64)
    A = np.ascontiguousarray(A, dtype=np.float64)
    B = np.ascontiguousarray(B, dtype=np.float64)
    if B.ndim == 1:
        B = B[:, None]
    n, m, k = P.shape[0], A.shape[0], B.shape[1]
    # validate before handing raw buffers to C (mismatched strides would
    # read/write out of bounds instead of raising)
    if P.shape != (n, n) or A.shape != (m, n) or B.shape != (m, k):
        raise ValueError(
            f"inconsistent shapes: P {P.shape}, A {A.shape}, B {B.shape}"
        )
    out = np.zeros((n, k), dtype=np.float64)
    rc = lib.eqp_kkt_solve(P, A, B, n, m, k, delta, refine_iters, out)
    if rc != 0:
        raise RuntimeError(f"native KKT solve failed (rc={rc})")
    return out


def admm_solve_native(
    P: np.ndarray,
    A: np.ndarray,
    b: np.ndarray,
    rho: float = 0.1,
    sigma: float = 1e-6,
    alpha: float = 1.6,
    eps_abs: float = 1e-9,
    max_iter: int = 4000,
    polish: bool = True,
) -> np.ndarray:
    """Single-RHS OSQP-style ADMM solve in the C++ backend.

    ``polish=True`` refines the converged ADMM iterate against the KKT
    system (OSQP's polish contract); ``polish=False`` returns the raw
    ADMM iterate — use that when the point is an algorithmically
    independent cross-check of the direct KKT solvers.
    """
    lib = load_native()
    if lib is None:
        raise RuntimeError(f"native solver unavailable: {_BUILD_ERROR}")
    P = np.ascontiguousarray(P, dtype=np.float64)
    A = np.ascontiguousarray(A, dtype=np.float64)
    b = np.ascontiguousarray(np.ravel(b), dtype=np.float64)
    n, m = P.shape[0], A.shape[0]
    if P.shape != (n, n) or A.shape != (m, n) or b.shape != (m,):
        raise ValueError(
            f"inconsistent shapes: P {P.shape}, A {A.shape}, b {b.shape}"
        )
    out = np.zeros(n, dtype=np.float64)
    rc = lib.eqp_admm_solve(
        P, A, b, n, m, rho, sigma, alpha, eps_abs, max_iter, int(polish), out
    )
    if rc < 0:
        raise RuntimeError("native ADMM solve failed")
    return out
