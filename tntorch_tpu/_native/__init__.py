"""ctypes loader for the native (C++) kernels.

The shared library is built from csrc/maxvol.cpp by `make` (or lazily here,
on first import, if a C++ toolchain is available). Everything degrades
gracefully to the NumPy implementations in tntorch_tpu.maxvol.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libtntmaxvol.so")
_SRC_PATH = os.path.join(os.path.dirname(os.path.dirname(_HERE)), "csrc", "maxvol.cpp")

_lib = None


def _build() -> bool:
    if not os.path.exists(_SRC_PATH):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-std=c++17",
             "-o", _LIB_PATH, _SRC_PATH],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    c_dp = ctypes.POINTER(ctypes.c_double)
    c_lp = ctypes.POINTER(ctypes.c_long)
    lib.tnt_maxvol.restype = ctypes.c_int
    lib.tnt_maxvol.argtypes = [c_dp, ctypes.c_long, ctypes.c_long,
                               ctypes.c_double, ctypes.c_long, c_lp, c_dp]
    lib.tnt_rect_maxvol.restype = ctypes.c_int
    lib.tnt_rect_maxvol.argtypes = [c_dp, ctypes.c_long, ctypes.c_long,
                                    ctypes.c_double, ctypes.c_long, ctypes.c_long,
                                    ctypes.c_long, ctypes.c_long, c_lp, c_dp, c_lp]
    _lib = lib
    return _lib


def native_maxvol(A: np.ndarray, tol: float, max_iters: int):
    """C++ maxvol over ctypes (csrc/maxvol.cpp); returns (rows, coeff matrix)."""
    lib = get_lib()
    if lib is None:
        return None
    A = np.ascontiguousarray(A, dtype=np.float64)
    n, r = A.shape
    if n <= r:
        return np.arange(n, dtype=np.int64), np.eye(n)
    index = np.zeros(r, dtype=np.int64)
    C = np.zeros((n, r), dtype=np.float64)
    rc = lib.tnt_maxvol(
        A.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n, r,
        float(tol), int(max_iters),
        index.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        C.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if rc != 0:
        return None
    return index, C


def native_rect_maxvol(A: np.ndarray, tol: float, maxK, minK,
                       start_maxvol_iters: int, identity_submatrix: bool):
    """C++ rect_maxvol over ctypes (csrc/maxvol.cpp)."""
    lib = get_lib()
    if lib is None:
        return None
    A = np.ascontiguousarray(A, dtype=np.float64)
    n, r = A.shape
    if n <= r:
        return np.arange(n, dtype=np.int64), np.eye(n)
    maxK = n if maxK is None else int(maxK)
    minK = r if minK is None else int(minK)
    maxK = min(max(maxK, r), n)
    index = np.zeros(max(maxK, n), dtype=np.int64)
    C = np.zeros((n, maxK), dtype=np.float64)
    K_out = np.zeros(1, dtype=np.int64)
    rc = lib.tnt_rect_maxvol(
        A.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n, r,
        float(tol), maxK, minK, int(start_maxvol_iters),
        1 if identity_submatrix else 0,
        index.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        C.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        K_out.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
    )
    if rc != 0:
        return None
    K = int(K_out[0])
    return index[:K].copy(), C[:, :K].copy()
