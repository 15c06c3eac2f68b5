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
            lib.warp_affine_bilinear_f32.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
                ctypes.c_void_p]
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


_BORDER_MODES = {"constant": 0, "replicate": 1, "reflect101": 2}


def warp_affine_native(img: np.ndarray, m: np.ndarray, dsize,
                       border_mode: str = "constant", border_value=None):
    """cv2.warpAffine equivalent (bilinear, float path). img: (H, W[, C])
    uint8 or float; m: 2x3 FORWARD matrix (src->dst, cv2 convention);
    dsize: (width, height). Returns warped array in img.dtype, or None if
    the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    squeeze = img.ndim == 2
    src = img[..., None] if squeeze else img
    in_dtype = src.dtype
    srcf = np.ascontiguousarray(src, np.float32)
    h, w, c = srcf.shape
    dw, dh = int(dsize[0]), int(dsize[1])
    # invert the forward matrix: dst pixel -> src coords
    full = np.vstack([np.asarray(m, np.float64), [0.0, 0.0, 1.0]])
    minv = np.ascontiguousarray(np.linalg.inv(full)[:2])
    dst = np.empty((dh, dw, c), np.float32)
    bv = None
    if border_value is not None:
        bvals = np.resize(np.asarray(border_value, np.float32), c)
        bv = np.ascontiguousarray(bvals)
    lib.warp_affine_bilinear_f32(
        srcf.ctypes.data, h, w, c, minv.ctypes.data, dst.ctypes.data,
        dh, dw, _BORDER_MODES[border_mode],
        bv.ctypes.data if bv is not None else None)
    if np.issubdtype(in_dtype, np.integer):
        dst = np.clip(np.rint(dst), np.iinfo(in_dtype).min,
                      np.iinfo(in_dtype).max).astype(in_dtype)
    out = dst[..., 0] if squeeze else dst
    return out
