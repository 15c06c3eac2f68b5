"""Resize / pooling primitives matching torch F.interpolate semantics.

Reference call sites reproduced:
  - nearest x2 upsample (vqgan_arch.py:149 Upsample)
  - bilinear scale_factor=4, align_corners=False default (keep_arch.py:1022)
  - bilinear align_corners=True x2 (gmflow.py:122), resize_flow align_corners=False
All ops are channels-last and static-shape; bilinear resize is a separable
gather (two 1-D interps), which XLA fuses cleanly on TPU.
"""
from typing import Tuple

import jax
import jax.numpy as jnp


def upsample_nearest_2x(x):
    """Nearest-neighbour x2 upsample, (..., H, W, C)."""
    x = jnp.repeat(x, 2, axis=-3)
    x = jnp.repeat(x, 2, axis=-2)
    return x


def _linear_indices_weights(out_size: int, in_size: int, align_corners: bool):
    out_idx = jnp.arange(out_size, dtype=jnp.float32)
    if align_corners:
        if out_size == 1:
            src = jnp.zeros((1,), jnp.float32)
        else:
            src = out_idx * ((in_size - 1) / (out_size - 1))
    else:
        scale = in_size / out_size
        src = (out_idx + 0.5) * scale - 0.5
    src = jnp.clip(src, 0.0, in_size - 1)
    i0 = jnp.floor(src).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, in_size - 1)
    w1 = src - i0.astype(jnp.float32)
    return i0, i1, w1


def _resize_axis_linear(x, out_size: int, axis: int, align_corners: bool):
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    i0, i1, w1 = _linear_indices_weights(out_size, in_size, align_corners)
    x0 = jnp.take(x, i0, axis=axis)
    x1 = jnp.take(x, i1, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    w1 = w1.reshape(shape).astype(x.dtype)
    return x0 * (1 - w1) + x1 * w1


def resize_bilinear(x, out_hw: Tuple[int, int], align_corners: bool = False):
    """Bilinear resize of (..., H, W, C) to out_hw, matching torch F.interpolate
    (antialias=False) for both align_corners settings."""
    x = _resize_axis_linear(x, out_hw[0], x.ndim - 3, align_corners)
    x = _resize_axis_linear(x, out_hw[1], x.ndim - 2, align_corners)
    return x


def resize_nearest(x, out_hw: Tuple[int, int]):
    """Nearest resize matching torch mode='nearest' (floor(dst*in/out))."""
    h, w = x.shape[-3], x.shape[-2]
    iy = jnp.floor(jnp.arange(out_hw[0]) * (h / out_hw[0])).astype(jnp.int32)
    ix = jnp.floor(jnp.arange(out_hw[1]) * (w / out_hw[1])).astype(jnp.int32)
    x = jnp.take(x, iy, axis=x.ndim - 3)
    x = jnp.take(x, ix, axis=x.ndim - 2)
    return x


def avg_pool_2x(x):
    """2x2 stride-2 average pool, (..., H, W, C)."""
    lead = x.shape[:-3]
    x4 = x.reshape((-1,) + x.shape[-3:])
    out = jax.lax.reduce_window(
        x4, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") * 0.25
    return out.reshape(lead + out.shape[1:])


def max_pool(x, window: int, stride: int, padding: int = 0):
    """Max pool, (..., H, W, C), torch MaxPool2d semantics (pad with -inf)."""
    lead = x.shape[:-3]
    x4 = x.reshape((-1,) + x.shape[-3:])
    pad = [(0, 0), (padding, padding), (padding, padding), (0, 0)]
    out = jax.lax.reduce_window(
        x4, -jnp.inf, jax.lax.max, (1, window, window, 1), (1, stride, stride, 1), pad)
    return out.reshape(lead + out.shape[1:])
