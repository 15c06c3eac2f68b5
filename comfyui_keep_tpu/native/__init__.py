"""Native (C++) host runtime loader.

Mirrors the reference extensions' JIT-or-prebuilt loading scheme
(ops/dcn/deform_conv.py:10-30): compile with g++ on first import when
KEEP_TPU_JIT != '0', silently fall back to the numpy implementations in
utils/image.py otherwise. API: ctypes over a C ABI (pybind11 is not in this
image).
"""
import ctypes
import os
import subprocess
import threading

import numpy as np

_LIB = None
_LOCK = threading.Lock()
_SRC = os.path.join(os.path.dirname(__file__), "src", "pixel_ops.cpp")
_SO = os.path.join(os.path.dirname(__file__), "_pixel_ops.so")


def _build():
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if os.environ.get("KEEP_TPU_JIT", "1") == "0":
            return None
        try:
            if not os.path.exists(_SO) or \
                    os.path.getmtime(_SO) < os.path.getmtime(_SRC):
                _build()
            lib = ctypes.CDLL(_SO)
            lib.bgr_u8_to_rgb_pm1.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
            lib.rgb_pm1_to_bgr_u8.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
            lib.rgb01_to_bgr_u8.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
            lib.blend_tile.argtypes = [ctypes.c_void_p] * 4 + [ctypes.c_int64] * 7
            _LIB = lib
        except Exception:  # silent fallback, like the reference loaders
            _LIB = None
    return _LIB


def bgr_u8_to_rgb_pm1_native(img: np.ndarray):
    """uint8 BGR (..., 3) -> float32 RGB [-1,1]; None if lib unavailable."""
    lib = get_lib()
    if lib is None or img.dtype != np.uint8 or img.shape[-1] != 3:
        return None
    src = np.ascontiguousarray(img)
    dst = np.empty(src.shape, np.float32)
    lib.bgr_u8_to_rgb_pm1(src.ctypes.data, dst.ctypes.data, src.size // 3)
    return dst


def rgb_pm1_to_bgr_u8_native(x: np.ndarray):
    lib = get_lib()
    if lib is None or x.shape[-1] != 3:
        return None
    src = np.ascontiguousarray(x, np.float32)
    dst = np.empty(src.shape, np.uint8)
    lib.rgb_pm1_to_bgr_u8(src.ctypes.data, dst.ctypes.data, src.size // 3)
    return dst


def blend_tile_native(out: np.ndarray, div: np.ndarray, tile: np.ndarray,
                      mask: np.ndarray, y0: int, x0: int) -> bool:
    lib = get_lib()
    if lib is None:
        return False
    th, tw, c = tile.shape
    lib.blend_tile(out.ctypes.data, div.ctypes.data,
                   np.ascontiguousarray(tile, np.float32).ctypes.data,
                   np.ascontiguousarray(mask[..., 0] if mask.ndim == 3 else mask,
                                        np.float32).ctypes.data,
                   out.shape[0], out.shape[1], c, th, tw, y0, x0)
    return True
