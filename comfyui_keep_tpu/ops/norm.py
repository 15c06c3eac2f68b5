"""Normalization layers (NHWC), numerically matching the torch ops used by the
reference archs: GroupNorm(32, eps=1e-6) in vqgan_arch.py:16-18, LayerNorm in
keep_arch.py transformer blocks, InstanceNorm2d in gmflow backbone,
BatchNorm2d (inference) in retinaface/parsenet.
"""
import jax.numpy as jnp


def group_norm(x, params, num_groups: int = 32, eps: float = 1e-6):
    """x: (..., H, W, C). params: {'scale': (C,), 'bias': (C,)} or None."""
    c = x.shape[-1]
    spatial = x.shape[-3:-1]
    lead = x.shape[:-3]
    xg = x.reshape(lead + (-1, num_groups, c // num_groups))
    mean = xg.mean(axis=(-3, -1), keepdims=True)
    var = xg.var(axis=(-3, -1), keepdims=True)
    xg = (xg - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    x = xg.reshape(lead + spatial + (c,))
    if params is not None:
        x = x * params["scale"] + params["bias"]
    return x


def layer_norm(x, params, eps: float = 1e-5):
    """Normalize over the last dim. params: {'scale','bias'} or None."""
    mean = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    x = (x - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    if params is not None:
        x = x * params["scale"] + params["bias"]
    return x


def instance_norm(x, params=None, eps: float = 1e-5):
    """Per-(N,C) spatial normalization, NHWC. torch InstanceNorm2d(affine=False) default."""
    mean = x.mean(axis=(-3, -2), keepdims=True)
    var = x.var(axis=(-3, -2), keepdims=True)
    x = (x - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    if params is not None:
        x = x * params["scale"] + params["bias"]
    return x


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
