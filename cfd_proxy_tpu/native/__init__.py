"""ctypes loader for the native preprocessing library (native/prep.cc).

Falls back gracefully: `lib()` returns None if the shared object has not been
built (`make -C native`), and callers keep using the NumPy path.
"""

from __future__ import annotations

import ctypes
import os
from functools import lru_cache

_SO = os.path.join(os.path.dirname(__file__), "libcfdprep.so")


@lru_cache(maxsize=1)
def lib():
    if os.environ.get("CFD_NATIVE", "1") == "0":
        return None
    if not os.path.exists(_SO):
        # best-effort build (the .so is not committed); fall back on failure
        import subprocess

        mk = os.path.join(os.path.dirname(__file__), "..", "..", "native")
        try:
            subprocess.run(["make", "-C", mk], capture_output=True, timeout=120)
        except Exception:
            pass
    if not os.path.exists(_SO):
        return None
    try:
        L = ctypes.CDLL(_SO)
    except OSError:
        return None
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    f64p = ctypes.POINTER(ctypes.c_double)
    L.cfd_plan_sizes.restype = ctypes.c_int
    L.cfd_plan_sizes.argtypes = [
        i32p, ctypes.c_int64, u8p, ctypes.c_int64, ctypes.c_int32,
        i32p, i32p, u8p,
    ]
    L.cfd_plan_fill.restype = ctypes.c_int
    L.cfd_plan_fill.argtypes = [
        i32p, ctypes.c_int64, f64p, u8p, ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, i32p, f32p, i32p, i32p,
    ]
    L.cfd_golden_gg.restype = ctypes.c_int
    L.cfd_golden_gg.argtypes = [
        f64p, ctypes.c_int64, ctypes.c_int32, i32p, ctypes.c_int64, f64p,
        f64p, ctypes.c_int32,
    ]
    return L


def golden_gg_c(var, faces, normals, nthreads: int = 1):
    """C golden sweep (native/golden.cc) or None if the library is absent.

    nthreads==1 is bit-identical to ops/golden.py::compute_gradients_gg;
    threaded mode is the multi-core CPU-baseline denominator (not bit-gated).
    """
    import numpy as np

    L = lib()
    if L is None:
        return None
    var_c = np.ascontiguousarray(var, np.float64)
    faces_c = np.ascontiguousarray(faces, np.int32)
    normals_c = np.ascontiguousarray(normals, np.float64)
    npoint, nvar = var_c.shape
    grad = np.zeros((npoint, nvar, 3), np.float64)
    rc = L.cfd_golden_gg(
        ptr(var_c, ctypes.c_double), npoint, nvar,
        ptr(faces_c, ctypes.c_int32), faces_c.shape[0],
        ptr(normals_c, ctypes.c_double), ptr(grad, ctypes.c_double),
        int(nthreads),
    )
    if rc != 0:
        return None
    return grad


def ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))
