"""Normalization layers (NHWC), numerically matching the torch ops used by the
reference archs: GroupNorm(32, eps=1e-6) in vqgan_arch.py:16-18, LayerNorm in
keep_arch.py transformer blocks, InstanceNorm2d in gmflow backbone,
BatchNorm2d (inference) in retinaface/parsenet.
"""
import contextlib
import os
import threading

import jax
import jax.numpy as jnp

# Trace-time guard for the B>=2 scan-body layout pathology (round-5
# bisection, tools/_prof_b2_body.py): inside a lax.scan body with batch>1,
# XLA fuses a GroupNorm's stats reduce into the producing conv and rewrites
# the conv to a height-major `0b1f` form that runs ~2x worse than linear
# (conv+GN body 1.94x vs 0.87x for conv alone; with an input barrier 0.88x).
# The barrier must NOT fire in straight-line batched stages (e.g. the
# B*T-frame LQ encoder), where the same fusion is a measured WIN — so it is
# scoped by this context, entered only while a batched scan body is traced.
_scan_ctx = threading.local()


@contextlib.contextmanager
def batched_scan_guard():
    """Trace-time context: GN ops traced inside place a layout barrier on
    their input when the leading dim is >1. Enter around scan-body code
    that may trace with batch > 1."""
    prev = getattr(_scan_ctx, "active", False)
    _scan_ctx.active = True
    try:
        yield
    finally:
        _scan_ctx.active = prev


def needs_scan_barrier(x) -> bool:
    return (getattr(_scan_ctx, "active", False)
            and x.ndim >= 4 and x.shape[0] > 1
            and os.environ.get("KEEP_TPU_NO_GN_BARRIER") != "1")


def group_norm(x, params, num_groups: int = 32, eps: float = 1e-6):
    """x: (..., H, W, C). params: {'scale': (C,), 'bias': (C,)} or None.

    TPU-shaped: per-channel f32 sums (XLA fuses the bf16->f32 convert into
    the reduction, one pass over x), per-group stats on tiny (..., G)
    tensors, then one fused elementwise normalize pass. Avoids the naive
    (..., HW, G, C/G) reshape, which materializes a re-laid-out f32 copy of
    the activation (134 MB per GN at 512x512x128) on TPU."""
    c = x.shape[-1]
    k = c // num_groups
    n = x.shape[-3] * x.shape[-2] * k
    # B>=2 scan-body layout guard (see batched_scan_guard above); identity,
    # and inert outside a guarded scan trace or at B=1
    if needs_scan_barrier(x):
        x = jax.lax.optimization_barrier(x)
    ct = jnp.promote_types(x.dtype, jnp.float32)  # f32 stats; exact in f64
    xf = x.astype(ct)
    s1 = jnp.sum(xf, axis=(-3, -2))                 # (..., C)
    s2 = jnp.sum(jnp.square(xf), axis=(-3, -2))     # (..., C)
    g1 = s1.reshape(s1.shape[:-1] + (num_groups, k)).sum(-1)
    g2 = s2.reshape(s2.shape[:-1] + (num_groups, k)).sum(-1)
    mean = g1 / n
    var = g2 / n - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    # fold the group stats (and affine) into per-channel scale/shift
    scale = jnp.repeat(inv, k, axis=-1)
    shift = jnp.repeat(-mean * inv, k, axis=-1)
    if params is not None:
        gamma = params["scale"].astype(ct)
        scale = scale * gamma
        shift = shift * gamma + params["bias"].astype(ct)
    scale = scale[..., None, None, :]
    shift = shift[..., None, None, :]
    return (xf * scale + shift).astype(x.dtype)


def layer_norm(x, params, eps: float = 1e-5):
    """Normalize over the last dim. params: {'scale','bias'} or None."""
    mean = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    x = (x - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    if params is not None:
        x = x * params["scale"] + params["bias"]
    return x


def instance_norm(x, params=None, eps: float = 1e-5):
    """Per-(N,C) spatial normalization, NHWC. torch InstanceNorm2d(affine=False)
    default. f32-accumulated stats + one fused normalize pass (same TPU
    shaping as group_norm above)."""
    ct = jnp.promote_types(x.dtype, jnp.float32)  # f32 stats; exact in f64
    xf = x.astype(ct)
    n = x.shape[-3] * x.shape[-2]
    s1 = jnp.sum(xf, axis=(-3, -2))              # (..., C)
    s2 = jnp.sum(jnp.square(xf), axis=(-3, -2))  # (..., C)
    mean = s1 / n
    var = s2 / n - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    scale, shift = inv, -mean * inv
    if params is not None:
        gamma = params["scale"].astype(ct)
        scale = scale * gamma
        shift = shift * gamma + params["bias"].astype(ct)
    return (xf * scale[..., None, None, :] +
            shift[..., None, None, :]).astype(x.dtype)


def batch_norm(x, params, eps: float = 1e-5):
    """Inference-mode batch norm with running statistics.

    params: {'scale','bias','mean','var'} each (C,).
    """
    inv = jnp.reciprocal(jnp.sqrt(params["var"] + eps))
    return (x - params["mean"]) * inv * params["scale"] + params["bias"]


def group_norm_init(c, dtype=jnp.float32):
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def layer_norm_init(c, dtype=jnp.float32):
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def batch_norm_init(c, dtype=jnp.float32):
    return {
        "scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype),
        "mean": jnp.zeros((c,), dtype), "var": jnp.ones((c,), dtype),
    }
