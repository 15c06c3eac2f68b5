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
    import os
    if os.environ.get("KEEP_TPU_FORCE_XLA") == "1":  # kernel kill-switch
        return False
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


# ---------------------------------------------------------------------------
# fused global-correlation softmax expectation (GMFlow matching.py:7-36)
# ---------------------------------------------------------------------------

def _corr_flash_kernel(q_ref, k_ref, g_ref, o_ref, *, scale):
    # scores for one query block against the whole key image, VMEM-resident:
    # never materializes the (L, L) correlation in HBM
    q = q_ref[0]                                   # (bq, C)
    k = k_ref[0]                                   # (L, C)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)                             # (bq, L) f32
    denom = jnp.sum(p, axis=1, keepdims=True)
    acc = jnp.dot(p, g_ref[:], preferred_element_type=jnp.float32)
    o_ref[0] = acc / denom


def global_correlation_expectation_pallas(f0, f1, grid, block_q: int = 256,
                                          interpret: bool = False):
    """softmax(f0 f1^T / sqrt(C)) @ grid without the HBM (B, L, L) matrix.

    f0/f1: (B, L, C); grid: (L, 2) f32 pixel coords. Returns (B, L, 2) f32
    softmax-weighted correspondence. The f32 correlation block (bq, L) and
    the full key image stay in VMEM (~8 MB at L=4096, bq=256, C=128)."""
    b, l, c = f0.shape
    bq = min(block_q, l)
    assert l % bq == 0
    gpad = jnp.zeros((l, 128), jnp.float32).at[:, :2].set(grid)
    out = pl.pallas_call(
        functools.partial(_corr_flash_kernel, scale=1.0 / math.sqrt(c)),
        grid=(b, l // bq),
        in_specs=[
            pl.BlockSpec((1, bq, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((l, 128), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, 128), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, l, 128), jnp.float32),
        interpret=interpret,
    )(f0, f1, gpad)
    return out[:, :, :2]


# ---------------------------------------------------------------------------
# fused single-head attention (GMFlow transformer windows / global attention)
# ---------------------------------------------------------------------------

_LOG2E = math.log2(math.e)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    # softmax cost dominates this kernel (VPU transcendentals over the
    # (bq, L) f32 score block vs ~1.4us of MXU work): exp is issued as the
    # native exp2 with log2(e) folded into the matmul scale, and the
    # normalization divides the (bq, D) output instead of the (bq, L) probs
    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * (scale * _LOG2E)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp2(s - m)
    denom = jnp.sum(p, axis=1, keepdims=True)
    v = v_ref[0]
    acc = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = (acc / denom).astype(o_ref.dtype)


def _attn_bias_kernel(q_ref, k_ref, v_ref, b_ref, o_ref, *, scale):
    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * (scale * _LOG2E)
    s = s + b_ref[0].astype(jnp.float32) * _LOG2E
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp2(s - m)
    denom = jnp.sum(p, axis=1, keepdims=True)
    v = v_ref[0]
    acc = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = (acc / denom).astype(o_ref.dtype)


def attention_pallas(q, k, v, scale: float, bias=None, block_q: int = None,
                     interpret: bool = False):
    """Fused single-head softmax(q k^T * scale [+ bias]) v for (B, L, D)
    with K/V and the f32 score block VMEM-resident (one HBM pass; the
    (L, L) score matrix never hits HBM). bias: (Bm, L, L) additive mask with
    Bm dividing B (window masks repeat every Bm batch entries — the Swin
    shifted-window case, gmflow transformer.py:8-105)."""
    b, l, d = q.shape
    if block_q is None:
        # Largest q block whose f32 score block (bq, l) stays ~4 MB (2 MB
        # when a bias block rides along) — measured best on v5e at l=1024,
        # d=128: 1024 no-bias (no K/V refetch), 512 with bias. The double-
        # buffered K/V blocks ((l, d) × itemsize × 2 each) bill against the
        # same ~16 MB scoped-vmem pool, so f32 inputs at large l must shrink
        # the score budget or the kernel stack-OOMs (seen at f32 19×4096×128).
        budget = (4 << 20) if bias is None else (2 << 20)
        kv_bytes = 4 * l * d * q.dtype.itemsize  # 2 bufs × (K + V)
        budget = min(budget, max(1 << 20, ((14 << 20) - kv_bytes) // 2))
        cap = max(128, min(l, budget // (4 * l)))
        block_q = max((d for d in range(128, cap + 1, 128) if l % d == 0),
                      default=min(128, l))
    bq = min(block_q, l)
    assert l % bq == 0
    if bias is None:
        return pl.pallas_call(
            functools.partial(_attn_kernel, scale=scale),
            grid=(b, l // bq),
            in_specs=[
                pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, l, d), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, l, d), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(q.shape, v.dtype),
            interpret=interpret,
        )(q, k, v)
    nb = bias.shape[0]
    return pl.pallas_call(
        functools.partial(_attn_bias_kernel, scale=scale),
        grid=(b, l // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, l), lambda i, j: (i % nb, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, v.dtype),
        interpret=interpret,
    )(q, k, v, bias)


# ---------------------------------------------------------------------------
# fused transformer MLP (GMFlow cross-attn sublayer tail)
# ---------------------------------------------------------------------------

def _mlp_kernel(s_ref, m_ref, w1a_ref, w1b_ref, w2_ref, g_ref, b_ref, o_ref):
    """out = src + layer_norm(gelu_tanh(src@W1a + msg@W1b) @ W2) * g + b.
    The (bq, H) hidden never leaves VMEM (~640 MB HBM round-trip per GMFlow
    MLP otherwise)."""
    s = s_ref[:]
    m = m_ref[:]
    h = (jnp.dot(s, w1a_ref[:], preferred_element_type=jnp.float32)
         + jnp.dot(m, w1b_ref[:], preferred_element_type=jnp.float32))
    # tanh-form gelu (bf16-indistinguishable from erf; ops/act.py rationale)
    c = 0.7978845608028654  # sqrt(2/pi)
    h = 0.5 * h * (1.0 + jnp.tanh(c * (h + 0.044715 * h * h * h)))
    o = jnp.dot(h.astype(s.dtype), w2_ref[:],
                preferred_element_type=jnp.float32)
    mean = jnp.mean(o, axis=-1, keepdims=True)
    d = o - mean
    var = jnp.mean(d * d, axis=-1, keepdims=True)
    o = d * jax.lax.rsqrt(var + 1e-5)
    o = o * g_ref[:] + b_ref[:]
    o_ref[:] = s.astype(jnp.float32) + o


def mlp_fused_pallas(src, msg, w1a, w1b, w2, gamma, beta, block: int = 512,
                     interpret: bool = False):
    """src/msg: (B, L, C); w1a/w1b: (C, H); w2: (H, C); gamma/beta: (C,).
    Returns src + layer_norm(gelu(src@W1a + msg@W1b) @ W2) in src.dtype."""
    b, l, c = src.shape
    h = w1a.shape[1]
    rows = b * l
    s2 = src.reshape(rows, c)
    m2 = msg.reshape(rows, c)
    pad = (-rows) % block
    if pad:
        s2 = jnp.pad(s2, ((0, pad), (0, 0)))
        m2 = jnp.pad(m2, ((0, pad), (0, 0)))
    n = s2.shape[0]
    out = pl.pallas_call(
        _mlp_kernel,
        grid=(n // block,),
        in_specs=[
            pl.BlockSpec((block, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c), jnp.float32),
        interpret=interpret,
    )(s2, m2, w1a, w1b, w2, gamma[None, :], beta[None, :])
    return out[:rows].reshape(b, l, c).astype(src.dtype)
