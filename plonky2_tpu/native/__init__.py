"""Native (C++) witness kernels, compiled on demand, with Python fallback.

The reference's witness oracle layer is native Rust (SURVEY.md §2.2 L2);
the TPU framework's host-side equivalent is this small C++ library behind
ctypes — no pybind11 in this image (see repo build notes).  If `g++` is
unavailable or compilation fails, callers fall back to the pure-Python
paths transparently (`lib()` returns None).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "witness_kernels.cpp")
_LIB = None
_TRIED = False


def _build_path() -> str:
    with open(_SRC, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    cache = os.environ.get(
        "PLONKY2_TPU_NATIVE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "plonky2_tpu_native"))
    os.makedirs(cache, exist_ok=True)
    return os.path.join(cache, f"witness_kernels_{tag}.so")


def lib():
    """The loaded ctypes library, or None if native build is unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("PLONKY2_TPU_NO_NATIVE") == "1":
        return None
    try:
        so = _build_path()
        if not os.path.exists(so):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-o", so + ".tmp", _SRC],
                check=True, capture_output=True)
            os.replace(so + ".tmp", so)
        L = ctypes.CDLL(so)
        u64p = ctypes.POINTER(ctypes.c_uint64)
        L.poseidon_rows.argtypes = [u64p, u64p, u64p, ctypes.c_long,
                                    u64p, u64p, ctypes.c_int, ctypes.c_int]
        L.poseidon_rows.restype = None
        L.gl_mul_arr.argtypes = [u64p, u64p, u64p, ctypes.c_long]
        L.gl_mul_arr.restype = None
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        L.tape_run.argtypes = [u64p, u8p, i32p, i64p, u64p, i32p, i32p,
                               i32p, i32p, ctypes.c_long, ctypes.c_long,
                               u64p, u64p, ctypes.c_int, ctypes.c_int, i64p]
        L.tape_run.restype = ctypes.c_long
        _LIB = L
    except Exception:
        _LIB = None
    return _LIB


def poseidon_rows(inputs, swaps, rc, mds, n_full_half: int, n_partial: int):
    """inputs [R, 12] u64, swaps [R] u64 -> out [R, 4+36+n_partial+48+12]
    (PoseidonGate aux/output wire values in wire order), or None if no
    native library."""
    import numpy as np

    L = lib()
    if L is None:
        return None
    inputs = np.ascontiguousarray(inputs, dtype=np.uint64)
    swaps = np.ascontiguousarray(swaps, dtype=np.uint64)
    R = inputs.shape[0]
    width = 4 + 3 * 12 + n_partial + 4 * 12 + 12
    out = np.empty((R, width), dtype=np.uint64)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    L.poseidon_rows(inputs.ctypes.data_as(u64p), swaps.ctypes.data_as(u64p),
                    out.ctypes.data_as(u64p), R,
                    np.ascontiguousarray(rc, dtype=np.uint64).ctypes.data_as(u64p),
                    np.ascontiguousarray(mds, dtype=np.uint64).ctypes.data_as(u64p),
                    n_full_half, n_partial)
    return out
