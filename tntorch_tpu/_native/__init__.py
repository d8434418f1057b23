"""ctypes loader for the native (C++) kernels.

The shared library is built from csrc/maxvol.cpp by `make` (or lazily here,
on first import, if a C++ toolchain is available). Everything degrades
gracefully to the NumPy implementations in tntorch_tpu.maxvol.

float32 inputs stay float32 end-to-end (the ``*_f32`` entry points): the
host cross sweep pivots on f32 matrices, and upcasting to f64 would double
the memory traffic of the latency-bound swap loop for no pivot-quality gain
(the device maxvol also pivots in f32).
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


def _bind(lib):
    c_dp = ctypes.POINTER(ctypes.c_double)
    c_fp = ctypes.POINTER(ctypes.c_float)
    c_lp = ctypes.POINTER(ctypes.c_long)
    lib.tnt_maxvol.restype = ctypes.c_int
    lib.tnt_maxvol.argtypes = [c_dp, ctypes.c_long, ctypes.c_long,
                               ctypes.c_double, ctypes.c_long, c_lp, c_dp]
    lib.tnt_rect_maxvol.restype = ctypes.c_int
    lib.tnt_rect_maxvol.argtypes = [c_dp, ctypes.c_long, ctypes.c_long,
                                    ctypes.c_double, ctypes.c_long, ctypes.c_long,
                                    ctypes.c_long, ctypes.c_long, c_lp, c_dp, c_lp]
    lib.tnt_maxvol_f32.restype = ctypes.c_int
    lib.tnt_maxvol_f32.argtypes = [c_fp, ctypes.c_long, ctypes.c_long,
                                   ctypes.c_double, ctypes.c_long, c_lp, c_fp]
    lib.tnt_rect_maxvol_f32.restype = ctypes.c_int
    lib.tnt_rect_maxvol_f32.argtypes = [c_fp, ctypes.c_long, ctypes.c_long,
                                        ctypes.c_double, ctypes.c_long, ctypes.c_long,
                                        ctypes.c_long, ctypes.c_long, c_lp, c_fp, c_lp]
    lib.tnt_maxvol_iterate.restype = ctypes.c_int
    lib.tnt_maxvol_iterate.argtypes = [c_dp, ctypes.c_long, ctypes.c_long,
                                       ctypes.c_double, ctypes.c_long, c_lp]
    lib.tnt_maxvol_iterate_f32.restype = ctypes.c_int
    lib.tnt_maxvol_iterate_f32.argtypes = [c_fp, ctypes.c_long, ctypes.c_long,
                                           ctypes.c_double, ctypes.c_long, c_lp]


def get_lib():
    """Load (building if needed) the native library; None if unavailable.

    A library built from an older source revision (missing the f32 entry
    points) is rebuilt in place — the .so is a build artifact, csrc/ is the
    source of truth."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    for attempt in range(2):
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.tnt_maxvol_f32  # symbol check: stale build → rebuild once
        except (OSError, AttributeError):
            if attempt == 0 and _build():
                continue
            return None
        break
    _bind(lib)
    _lib = lib
    return _lib


def _as_native(A: np.ndarray):
    """(contiguous array, C scalar type, maxvol fn, rect fn) for A's dtype."""
    lib = get_lib()
    if lib is None:
        return None
    if A.dtype == np.float32:
        return (np.ascontiguousarray(A), ctypes.c_float,
                lib.tnt_maxvol_f32, lib.tnt_rect_maxvol_f32)
    return (np.ascontiguousarray(A, dtype=np.float64), ctypes.c_double,
            lib.tnt_maxvol, lib.tnt_rect_maxvol)


def native_maxvol(A: np.ndarray, tol: float, max_iters: int):
    """C++ maxvol over ctypes (csrc/maxvol.cpp); returns (rows, coeff matrix)."""
    nat = _as_native(A)
    if nat is None:
        return None
    A, cscalar, fn, _ = nat
    n, r = A.shape
    if n <= r:
        return np.arange(n, dtype=np.int64), np.eye(n, dtype=A.dtype)
    index = np.zeros(r, dtype=np.int64)
    C = np.zeros((n, r), dtype=A.dtype)
    rc = fn(
        A.ctypes.data_as(ctypes.POINTER(cscalar)), n, r,
        float(tol), int(max_iters),
        index.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        C.ctypes.data_as(ctypes.POINTER(cscalar)),
    )
    if rc != 0:
        return None
    return index, C


def native_maxvol_iterate(C: np.ndarray, index: np.ndarray, tol: float,
                          max_iters: int) -> bool:
    """Run the maxvol swap loop in place on a caller-initialized coefficient
    matrix C = A @ inv(A[index]) (C-contiguous f32/f64; index int64 of
    length r, updated in place). Returns False if the library is missing —
    C and index are then untouched."""
    lib = get_lib()
    if lib is None:
        return False
    assert C.flags.c_contiguous and index.dtype == np.int64
    n, r = C.shape
    if C.dtype == np.float32:
        fn, cscalar = lib.tnt_maxvol_iterate_f32, ctypes.c_float
    else:
        assert C.dtype == np.float64
        fn, cscalar = lib.tnt_maxvol_iterate, ctypes.c_double
    fn(
        C.ctypes.data_as(ctypes.POINTER(cscalar)), n, r,
        float(tol), int(max_iters),
        index.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
    )
    return True


def native_rect_maxvol(A: np.ndarray, tol: float, maxK, minK,
                       start_maxvol_iters: int, identity_submatrix: bool):
    """C++ rect_maxvol over ctypes (csrc/maxvol.cpp)."""
    nat = _as_native(A)
    if nat is None:
        return None
    A, cscalar, _, fn = nat
    n, r = A.shape
    if n <= r:
        return np.arange(n, dtype=np.int64), np.eye(n, dtype=A.dtype)
    maxK = n if maxK is None else int(maxK)
    minK = r if minK is None else int(minK)
    maxK = min(max(maxK, r), n)
    index = np.zeros(max(maxK, n), dtype=np.int64)
    C = np.zeros((n, maxK), dtype=A.dtype)
    K_out = np.zeros(1, dtype=np.int64)
    rc = fn(
        A.ctypes.data_as(ctypes.POINTER(cscalar)), n, r,
        float(tol), maxK, minK, int(start_maxvol_iters),
        1 if identity_submatrix else 0,
        index.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        C.ctypes.data_as(ctypes.POINTER(cscalar)),
        K_out.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
    )
    if rc != 0:
        return None
    K = int(K_out[0])
    return index[:K].copy(), C[:, :K].copy()
