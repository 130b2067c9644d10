"""ctypes bindings for the native marching-tetrahedra scan
(native/meshing.cpp).

Same on-demand build-and-cache policy as data/native_imageops.py; the
caller (ops/meshing.py) falls back to the vectorized numpy scan when the
toolchain is unavailable. The C++ scan is ~20x the numpy path at 256^3
on this class of host — the cell scan is the only Python-side hot loop
left in a mesh export."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO_PATH = os.path.join(_NATIVE_DIR, "libmeshing.so")

_I64P = ctypes.POINTER(ctypes.c_int64)
_F32P = ctypes.POINTER(ctypes.c_float)


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    try:
        if not os.path.exists(_SO_PATH):
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "libmeshing.so"],
                check=True, capture_output=True, timeout=120,
            )
        lib = ctypes.CDLL(_SO_PATH)
        lib.mt_count_slabs.argtypes = [
            _F32P, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, _I64P,
        ]
        lib.mt_fill.argtypes = [
            _F32P, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, _I64P, _I64P, _I64P,
        ]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def mt_scan(values: np.ndarray, iso: float):
    """Scan all cubes; returns (lo, hi) int64 arrays of length 3*T with the
    (min, max) lattice indices of the edge each triangle corner lies on,
    in triangle-corner order (winding preserved from the case tables)."""
    lib = _load()
    assert lib is not None
    v = np.ascontiguousarray(values, np.float32)
    X, Y, Z = v.shape
    counts = np.zeros(max(Z - 1, 1), np.int64)
    vp = v.ctypes.data_as(_F32P)
    lib.mt_count_slabs(vp, X, Y, Z, ctypes.c_float(iso),
                       counts.ctypes.data_as(_I64P))
    offsets = np.zeros_like(counts)
    np.cumsum(counts[:-1], out=offsets[1:])
    total = int(counts.sum())
    lo = np.empty(total * 3, np.int64)
    hi = np.empty(total * 3, np.int64)
    if total:
        lib.mt_fill(vp, X, Y, Z, ctypes.c_float(iso),
                    offsets.ctypes.data_as(_I64P),
                    lo.ctypes.data_as(_I64P), hi.ctypes.data_as(_I64P))
    return lo, hi
