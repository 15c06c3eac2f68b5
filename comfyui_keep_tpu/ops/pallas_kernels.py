"""Pallas TPU kernels for the hot fused ops.

These are the hand-scheduled tier sitting under ops/native.py: where the
reference ships CUDA kernels, the TPU build ships Pallas. Each kernel has an
XLA fallback (used on CPU and for the backward unless a custom VJP is
defined); `interpret=True` paths keep them testable off-TPU.

Kernels:
  vq_nearest_indices — fused distance + argmin codebook search
    (VectorQuantizer hot path, vqgan_arch.py:26-91): one MXU matmul per
    token tile with the codebook VMEM-resident, no (T, N) distance matrix
    ever hitting HBM.
  fused_bias_lrelu   — bias + LeakyReLU * scale (ops/fused_act equivalent).
"""
import functools
import math

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PALLAS = True
except ImportError:  # pragma: no cover
    _HAVE_PALLAS = False


def _on_tpu():
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


# ---------------------------------------------------------------------------
# fused VQ codebook search
# ---------------------------------------------------------------------------

def _vq_kernel(z_ref, e_ref, e2_ref, idx_ref):
    z = z_ref[:]
    e = e_ref[:]
    ze = jnp.dot(z, e.T, preferred_element_type=jnp.float32)
    d = e2_ref[:] - 2.0 * ze  # z^2 constant per row — argmin-invariant
    idx_ref[:] = jnp.argmin(d, axis=1, keepdims=True).astype(jnp.int32)


def vq_nearest_indices_pallas(z, codebook, tile: int = 512,
                              interpret: bool = False):
    """z: (T, C), codebook: (N, C) -> (T,) int32 nearest indices."""
    t, c = z.shape
    n = codebook.shape[0]
    pad = (-t) % tile
    zp = jnp.pad(z, ((0, pad), (0, 0)))
    e2 = jnp.sum(codebook.astype(jnp.float32) ** 2, axis=1)[None, :]
    grid = (zp.shape[0] // tile,)
    out = pl.pallas_call(
        _vq_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((zp.shape[0], 1), jnp.int32),
        interpret=interpret,
    )(zp, codebook, e2)
    return out[:t, 0]


def vq_nearest_indices(z, codebook, force_xla: bool = False):
    """Dispatcher: Pallas on TPU, XLA elsewhere. z: (..., C)."""
    c = z.shape[-1]
    flat = z.reshape(-1, c)
    if _HAVE_PALLAS and _on_tpu() and not force_xla:
        idx = vq_nearest_indices_pallas(flat, codebook)
    else:
        ze = flat @ codebook.T
        e2 = jnp.sum(codebook ** 2, axis=1)
        idx = jnp.argmin(e2 - 2.0 * ze, axis=-1).astype(jnp.int32)
    return idx.reshape(z.shape[:-1])


# ---------------------------------------------------------------------------
# fused bias + scaled LeakyReLU
# ---------------------------------------------------------------------------

def _flr_kernel(x_ref, b_ref, o_ref, *, negative_slope, scale):
    h = x_ref[:] + b_ref[:]
    o_ref[:] = jnp.where(h >= 0, h, h * negative_slope) * scale


def fused_bias_lrelu_pallas(x, bias, negative_slope: float = 0.2,
                            scale: float = 2 ** 0.5, interpret: bool = False):
    """x: (..., C); bias: (C,)."""
    shape = x.shape
    c = shape[-1]
    flat = x.reshape(-1, c)
    rows = flat.shape[0]
    tile = min(1024, rows)
    pad = (-rows) % tile
    fp = jnp.pad(flat, ((0, pad), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_flr_kernel, negative_slope=negative_slope,
                          scale=scale),
        grid=(fp.shape[0] // tile,),
        in_specs=[pl.BlockSpec((tile, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, c), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tile, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(fp.shape, x.dtype),
        interpret=interpret,
    )(fp, bias[None, :])
    return out[:rows].reshape(shape)
