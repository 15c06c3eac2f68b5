"""Attention primitives.

Matches the math of the reference's attention variants:
  - nn.MultiheadAttention used by TransformerSALayer (keep_arch.py:385-439)
  - diffusers-style CrossAttention (keep_arch.py:25-292): separate q/k/v
    projections, scale = head_dim**-0.5, softmax over keys
The reference's memory-saving variants (sliced attention keep_arch.py:243-284,
xformers hook :286-292) are unnecessary on TPU: XLA fuses the softmax(QK^T)V
chain and the token counts here are small (<=4096); a flash-style Pallas
kernel is provided in ops/pallas for the large spatial attentions.
"""
from typing import Optional

import jax
import jax.numpy as jnp


def scaled_dot_product_attention(q, k, v, scale: Optional[float] = None,
                                 mask=None, bias=None):
    """q: (..., Lq, D), k: (..., Lk, D), v: (..., Lk, Dv) -> (..., Lq, Dv).

    Softmax is computed in float32 regardless of input dtype (bf16-safe).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum(
        "...qd,...kd->...qk", q, k,
        preferred_element_type=jnp.promote_types(q.dtype, jnp.float32)) * scale
    if bias is not None:
        logits = logits + bias
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("...qk,...kd->...qd", probs, v)


def _split_heads(x, num_heads):
    b, l, e = x.shape
    return x.reshape(b, l, num_heads, e // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, h, l, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * d)


def multi_head_attention(params, query, key, value, num_heads: int, mask=None):
    """nn.MultiheadAttention-equivalent, batch-first (B, L, E).

    params: {'q_w','k_w','v_w','out_w': (E, E), 'q_b','k_b','v_b','out_b': (E,)}
    (the converter splits torch's packed in_proj_weight into q/k/v).
    """
    q = query @ params["q_w"] + params["q_b"]
    k = key @ params["k_w"] + params["k_b"]
    v = value @ params["v_w"] + params["v_b"]
    q = _split_heads(q, num_heads)
    k = _split_heads(k, num_heads)
    v = _split_heads(v, num_heads)
    out = scaled_dot_product_attention(q, k, v, mask=mask)
    out = _merge_heads(out)
    return out @ params["out_w"] + params["out_b"]


def mha_init(key, embed_dim: int, dtype=jnp.float32):
    """Xavier-uniform init like torch MultiheadAttention."""
    import math
    ks = jax.random.split(key, 4)
    bound = math.sqrt(6.0 / (2 * embed_dim))
    def w(k):
        return jax.random.uniform(k, (embed_dim, embed_dim), minval=-bound,
                                  maxval=bound, dtype=dtype)
    return {
        "q_w": w(ks[0]), "k_w": w(ks[1]), "v_w": w(ks[2]), "out_w": w(ks[3]),
        "q_b": jnp.zeros((embed_dim,), dtype), "k_b": jnp.zeros((embed_dim,), dtype),
        "v_b": jnp.zeros((embed_dim,), dtype), "out_b": jnp.zeros((embed_dim,), dtype),
    }
