"""Host-side image IO and resampling.

Replaces the reference's external ImageMagick `mogrify` subprocess
(reference load_llff.py:8-57) with in-process area-average resampling: the
native C++ resizer (native/libimageops, loaded via ctypes) when built, else
cv2.INTER_AREA, else a pure-numpy box filter. Downsampled LLFF image sets
are cached in images_{factor}/ directories exactly like the reference so
datasets prepared by either implementation interoperate.
"""

from __future__ import annotations

import os

import numpy as np

try:  # optional: native C++ area resizer (see native/imageops.cpp)
    from nerf_shared_tpu.data import native_imageops as _native
except Exception:  # pragma: no cover
    _native = None

try:
    import cv2 as _cv2
except Exception:  # pragma: no cover
    _cv2 = None

try:
    import imageio.v2 as _imageio
except Exception:  # pragma: no cover
    import imageio as _imageio


def imread_float(path: str) -> np.ndarray:
    """Read an image as float32 in [0, 1], keeping the alpha channel."""
    img = np.asarray(_imageio.imread(path))
    return (img / 255.0).astype(np.float32)


def imwrite_u8(path: str, img_u8: np.ndarray) -> None:
    _imageio.imwrite(path, img_u8)


def resize_area(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Area-average resize (cv2.INTER_AREA semantics for downsampling)."""
    if _native is not None and _native.available():
        return _native.resize_area(img, out_h, out_w)
    if _cv2 is not None:
        out = _cv2.resize(img, (out_w, out_h), interpolation=_cv2.INTER_AREA)
        if out.ndim < img.ndim:  # cv2 drops singleton channel dims
            out = out[..., None]
        return out.astype(img.dtype, copy=False)
    return _box_resize(img, out_h, out_w)


def _box_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Pure-numpy fallback: exact box filter for integer factors, bilinear
    otherwise."""
    h, w = img.shape[:2]
    if h % out_h == 0 and w % out_w == 0:
        fh, fw = h // out_h, w // out_w
        return img.reshape(out_h, fh, out_w, fw, -1).mean(axis=(1, 3)).reshape(
            out_h, out_w, *img.shape[2:]
        ).astype(img.dtype, copy=False)
    ys = np.clip((np.arange(out_h) + 0.5) * h / out_h - 0.5, 0, h - 1)
    xs = np.clip((np.arange(out_w) + 0.5) * w / out_w - 0.5, 0, w - 1)
    y0, x0 = np.floor(ys).astype(int), np.floor(xs).astype(int)
    y1, x1 = np.minimum(y0 + 1, h - 1), np.minimum(x0 + 1, w - 1)
    wy, wx = (ys - y0)[:, None, None], (xs - x0)[None, :, None]
    img2 = img if img.ndim == 3 else img[..., None]
    out = (
        img2[y0][:, x0] * (1 - wy) * (1 - wx)
        + img2[y0][:, x1] * (1 - wy) * wx
        + img2[y1][:, x0] * wy * (1 - wx)
        + img2[y1][:, x1] * wy * wx
    )
    out = out if img.ndim == 3 else out[..., 0]
    return out.astype(img.dtype, copy=False)


def minify_images(basedir: str, factor: int) -> str:
    """Create (once) and return the images_{factor}/ cache directory with all
    images area-downsampled by ``factor`` as PNG — the in-process equivalent
    of the reference's mogrify pipeline (load_llff.py:8-57)."""
    srcdir = os.path.join(basedir, "images")
    outdir = os.path.join(basedir, f"images_{factor}")
    if os.path.exists(outdir):
        return outdir

    exts = (".jpg", ".jpeg", ".png")
    files = sorted(
        f for f in os.listdir(srcdir) if f.lower().endswith(exts)
    )
    os.makedirs(outdir, exist_ok=True)
    for f in files:
        img = imread_float(os.path.join(srcdir, f))
        h, w = img.shape[:2]
        small = resize_area(img, int(round(h / factor)), int(round(w / factor)))
        out_name = os.path.splitext(f)[0] + ".png"
        imwrite_u8(
            os.path.join(outdir, out_name),
            (np.clip(small, 0, 1) * 255).astype(np.uint8),
        )
    return outdir
