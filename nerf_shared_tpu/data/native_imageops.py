"""ctypes bindings for the native C++ image-ops library (native/imageops.cpp).

The library is built on demand (`make -C native`) and cached; if the build
toolchain is unavailable the callers (data/images.py) fall back to cv2/numpy
transparently. This is the framework's native replacement for the
reference's ImageMagick subprocess pipeline (reference load_llff.py:8-57).
"""

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
_SO_PATH = os.path.join(_NATIVE_DIR, "libimageops.so")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    try:
        if not os.path.exists(_SO_PATH):
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True,
                capture_output=True,
                timeout=120,
            )
        lib = ctypes.CDLL(_SO_PATH)
        lib.resize_area_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ]
        lib.resize_area_u8_to_f32.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ]
        lib.composite_background_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float),
        ]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def resize_area(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Area-average resize via the native library. img: [H, W, C] or [H, W]."""
    lib = _load()
    assert lib is not None
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w, c = img.shape
    out = np.empty((out_h, out_w, c), np.float32)
    if img.dtype == np.uint8:
        src = np.ascontiguousarray(img)
        lib.resize_area_u8_to_f32(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out_h, out_w,
        )
    else:
        src = np.ascontiguousarray(img, np.float32)
        lib.resize_area_f32(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w, c,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out_h, out_w,
        )
    out = out.astype(img.dtype, copy=False) if img.dtype == np.float32 else out
    return out[..., 0] if squeeze else out


def composite_background(rgba: np.ndarray, bg: float = 1.0) -> np.ndarray:
    """RGBA float32 [.., 4] -> RGB float32 [.., 3] blended onto ``bg``."""
    lib = _load()
    assert lib is not None
    flat = np.ascontiguousarray(rgba.reshape(-1, 4), np.float32)
    out = np.empty((flat.shape[0], 3), np.float32)
    lib.composite_background_f32(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(flat.shape[0]),
        ctypes.c_float(bg),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out.reshape(*rgba.shape[:-1], 3)
