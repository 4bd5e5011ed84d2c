"""Lazy g++ build + ctypes bindings for the native host kernels.

No pybind11 in this environment; the kernels use plain C ABIs and
caller-allocated numpy buffers. The shared object is cached next to the
source and rebuilt when the source is newer.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "augment.cpp")
_SO = os.path.join(_HERE, "_augment.so")
_LOCK = threading.Lock()
_LIB = None


def _build() -> str:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO


def get_augment_lib():
    """Returns the ctypes lib, building it on first use; None if no g++."""
    global _LIB
    if _LIB is not None:
        return _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        try:
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
                _build()
            lib = ctypes.CDLL(_SO)
        except (OSError, subprocess.CalledProcessError):
            return None
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.paste_augment.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            f32p, f32p, ctypes.c_int,
        ]
        lib.paste_augment.restype = None
        lib.resize_crop_normalize.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            f32p,
        ]
        lib.resize_crop_normalize.restype = None
        _LIB = lib
        return _LIB


def paste_augment(img: np.ndarray, th: int, tw: int, oy: int, ox: int,
                  size: int, mask_size: int):
    """C++ fast path with a numpy fallback. img: HWC uint8.

    Returns (canvas [size,size,3] float32 in [-1,1], mask [mask_size]²)."""
    out = np.empty((size, size, 3), np.float32)
    mask = np.empty((mask_size, mask_size), np.float32)
    lib = get_augment_lib()
    if lib is not None:
        lib.paste_augment(
            np.ascontiguousarray(img), img.shape[0], img.shape[1],
            th, tw, oy, ox, size, out, mask, mask_size,
        )
        return out, mask
    return _paste_augment_np(img, th, tw, oy, ox, size, mask_size)


def _bilinear_np(img: np.ndarray, th: int, tw: int) -> np.ndarray:
    ih, iw = img.shape[:2]
    sy = (ih - 1) / max(th - 1, 1) if ih > 1 else 0.0
    sx = (iw - 1) / max(tw - 1, 1) if iw > 1 else 0.0
    fy = np.arange(th) * sy
    fx = np.arange(tw) * sx
    y0 = fy.astype(np.int32)
    x0 = fx.astype(np.int32)
    y1 = np.minimum(y0 + 1, ih - 1)
    x1 = np.minimum(x0 + 1, iw - 1)
    wy = (fy - y0)[:, None, None]
    wx = (fx - x0)[None, :, None]
    a = img[y0][:, x0].astype(np.float32)
    b = img[y0][:, x1].astype(np.float32)
    c = img[y1][:, x0].astype(np.float32)
    d = img[y1][:, x1].astype(np.float32)
    return (1 - wy) * ((1 - wx) * a + wx * b) + wy * ((1 - wx) * c + wx * d)


def _paste_augment_np(img, th, tw, oy, ox, size, mask_size):
    canvas = np.full((size, size, 3), -1.0, np.float32)
    resized = _bilinear_np(img, th, tw) / 127.5 - 1.0
    y0, y1 = max(0, oy), min(size, oy + th)
    x0, x1 = max(0, ox), min(size, ox + tw)
    canvas[y0:y1, x0:x1] = resized[y0 - oy : y1 - oy, x0 - ox : x1 - ox]
    mask = np.zeros((mask_size, mask_size), np.float32)
    factor = size // mask_size
    my0, my1 = oy // factor + 1, (oy + th) // factor - 1
    mx0, mx1 = ox // factor + 1, (ox + tw) // factor - 1
    mask[max(0, my0) : max(0, my1), max(0, mx0) : max(0, mx1)] = 1.0
    return canvas, mask


def resized_dims(ih: int, iw: int, size: int) -> tuple:
    """Shorter-side-= ``size`` resize dims (torchvision ``Resize(int)``).

    torchvision truncates the long side (``int(size * long / short)``,
    `_compute_resized_output_size`), so this must truncate too — ``round``
    would put every bilinear sample on a differently-scaled grid one pixel
    off the reference's for ~half of all aspect ratios."""
    if ih <= iw:
        return size, max(size, int(iw * size / max(ih, 1)))
    return max(size, int(ih * size / max(iw, 1))), size


def resize_crop_normalize(img: np.ndarray, size: int, cy: int, cx: int) -> np.ndarray:
    """Shorter-side resize to ``size``, crop a size² window at (cy, cx) in
    resized coordinates, normalize to [-1, 1]. The reference class-image
    transform (diffusers_data_pipeline_xl.py:120-128)."""
    th, tw = resized_dims(img.shape[0], img.shape[1], size)
    cy = int(np.clip(cy, 0, th - size))
    cx = int(np.clip(cx, 0, tw - size))
    out = np.empty((size, size, 3), np.float32)
    lib = get_augment_lib()
    if lib is not None:
        lib.resize_crop_normalize(
            np.ascontiguousarray(img), img.shape[0], img.shape[1],
            th, tw, cy, cx, size, out,
        )
        return out
    resized = _bilinear_np(img, th, tw)
    return (resized[cy:cy + size, cx:cx + size] / 127.5 - 1.0).astype(np.float32)
