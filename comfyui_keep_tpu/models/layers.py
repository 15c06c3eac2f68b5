"""Transformer building blocks for the KEEP arch (reference keep_arch.py).

All token tensors are batch-first (B, L, C); all feature maps NHWC. The
reference's memory-management variants (sliced attention keep_arch.py:243-284,
xformers) are dropped: XLA fuses softmax(QK^T)V and these token counts
(256-1024) are VMEM-resident on TPU.
"""
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from comfyui_keep_tpu.ops import (
    conv2d, conv2d_init, group_norm, layer_norm, layer_norm_init, linear,
    linear_init, gelu, leaky_relu, multi_head_attention,
)
from comfyui_keep_tpu.ops.attention import scaled_dot_product_attention, mha_init
from comfyui_keep_tpu.models.vqgan import res_block, _block_init, GN_EPS


# ---------------------------------------------------------------------------
# diffusers-0.11-style CrossAttention (keep_arch.py:25-292)
# ---------------------------------------------------------------------------

def cross_attention_init(key, query_dim: int, heads: int, dim_head: int,
                         cross_dim: Optional[int] = None, zero_out: bool = False):
    inner = heads * dim_head
    cross_dim = cross_dim or query_dim
    ks = jax.random.split(key, 4)
    p = {
        "to_q": {"w": linear_init(ks[0], query_dim, inner, bias=False)["w"]},
        "to_k": {"w": linear_init(ks[1], cross_dim, inner, bias=False)["w"]},
        "to_v": {"w": linear_init(ks[2], cross_dim, inner, bias=False)["w"]},
        "to_out": [linear_init(ks[3], inner, query_dim)],
    }
    if zero_out:
        p["to_out"][0]["w"] = jnp.zeros_like(p["to_out"][0]["w"])
    return p


def cross_attention(p, x, context=None, *, heads: int):
    """x: (B, Lq, Cq); context: (B, Lk, Ck) or None (self-attention)."""
    ctx = x if context is None else context
    q = x @ p["to_q"]["w"]
    k = ctx @ p["to_k"]["w"]
    v = ctx @ p["to_v"]["w"]
    b, lq, inner = q.shape
    dh = inner // heads
    q = q.reshape(b, lq, heads, dh).transpose(0, 2, 1, 3)
    k = k.reshape(b, -1, heads, dh).transpose(0, 2, 1, 3)
    v = v.reshape(b, -1, heads, dh).transpose(0, 2, 1, 3)
    out = scaled_dot_product_attention(q, k, v, scale=dh ** -0.5)
    out = out.transpose(0, 2, 1, 3).reshape(b, lq, inner)
    return linear(out, p["to_out"][0]["w"], p["to_out"][0]["b"])


# ---------------------------------------------------------------------------
# diffusers FeedForward(activation_fn="geglu"): GEGLU -> Linear
# ---------------------------------------------------------------------------

def feed_forward_init(key, dim: int, mult: int = 4):
    k1, k2 = jax.random.split(key)
    inner = dim * mult
    return {"net": [{"proj": linear_init(k1, dim, inner * 2)},
                    None,
                    linear_init(k2, inner, dim)]}


def feed_forward(p, x):
    h = linear(x, p["net"][0]["proj"]["w"], p["net"][0]["proj"]["b"])
    h, gate = jnp.split(h, 2, axis=-1)
    h = h * gelu(gate)
    return linear(h, p["net"][2]["w"], p["net"][2]["b"])


# ---------------------------------------------------------------------------
# TransformerSALayer (keep_arch.py:385-439): pre-LN MHA + GELU MLP
# ---------------------------------------------------------------------------

def transformer_sa_layer_init(key, embed_dim: int, dim_mlp: int):
    ks = jax.random.split(key, 3)
    return {
        "self_attn": mha_init(ks[0], embed_dim),
        "linear1": linear_init(ks[1], embed_dim, dim_mlp),
        "linear2": linear_init(ks[2], dim_mlp, embed_dim),
        "norm1": layer_norm_init(embed_dim),
        "norm2": layer_norm_init(embed_dim),
    }


def transformer_sa_layer(p, x, query_pos=None, num_heads: int = 8):
    """x: (B, L, E); query_pos: (L, E) or (B, L, E)."""
    h = layer_norm(x, p["norm1"])
    qk = h if query_pos is None else h + query_pos
    x = x + multi_head_attention(p["self_attn"], qk, qk, h, num_heads=num_heads)
    h = layer_norm(x, p["norm2"])
    h = linear(gelu(linear(h, p["linear1"]["w"], p["linear1"]["b"])),
               p["linear2"]["w"], p["linear2"]["b"])
    return x + h


# ---------------------------------------------------------------------------
# Fuse_sft_block / CFT (keep_arch.py:442-472)
# ---------------------------------------------------------------------------

def cft_init(key, in_ch: int, out_ch: int, zero: bool = True):
    ks = jax.random.split(key, 5)
    p = {
        "encode_enc": _block_init(ks[0], ("res", 2 * in_ch, out_ch)),
        "scale": [conv2d_init(ks[1], 3, 3, in_ch, out_ch), None,
                  conv2d_init(ks[2], 3, 3, out_ch, out_ch)],
        "shift": [conv2d_init(ks[3], 3, 3, in_ch, out_ch), None,
                  conv2d_init(ks[4], 3, 3, out_ch, out_ch)],
    }
    if zero:  # reference zero-inits every conv in the block (keep_arch.py:468-472)
        p = jax.tree.map(jnp.zeros_like, p)
    return p


def cft_block(p, enc_feat, dec_feat, w: float = 1.0):
    """Controllable feature transform: dec + w*(dec*scale + shift)."""
    h = res_block(p["encode_enc"], jnp.concatenate([enc_feat, dec_feat], axis=-1))
    def seq(sp, t):
        t = conv2d(t, sp[0]["w"], sp[0]["b"], padding=1)
        t = leaky_relu(t, 0.2)
        return conv2d(t, sp[2]["w"], sp[2]["b"], padding=1)
    scale = seq(p["scale"], h)
    shift = seq(p["shift"], h)
    return dec_feat + w * (dec_feat * scale + shift)


# ---------------------------------------------------------------------------
# CrossFrameFusionLayer / CFA (keep_arch.py:475-541)
# ---------------------------------------------------------------------------

def cfa_init(key, dim: int, heads: int, dim_head: int):
    ks = jax.random.split(key, 4)
    # reference zero-inits ALL linears in the layer (keep_arch.py:519-527),
    # then the whole module is residual — identity at init
    p = {
        "norm1": layer_norm_init(dim),
        "norm2": layer_norm_init(dim),
        "ff": feed_forward_init(ks[0], dim),
        "attn": cross_attention_init(ks[1], dim, heads, dim_head),
    }
    zeroed = jax.tree.map(jnp.zeros_like, {"ff": p["ff"], "attn": p["attn"]})
    p["ff"], p["attn"] = zeroed["ff"], zeroed["attn"]
    p["norm1"] = layer_norm_init(dim)
    p["norm2"] = layer_norm_init(dim)
    return p


def cfa_layer(p, curr, prev, *, heads: int, residual: bool = True):
    """curr/prev: (B, H, W, C) feature maps; attention over flattened tokens."""
    b, h, w, c = curr.shape
    x = curr.reshape(b, h * w, c)
    ctx = prev.reshape(b, h * w, c)
    res = x
    x = cross_attention(p["attn"], x, ctx, heads=heads)
    x = layer_norm(x, p["norm1"])
    if residual:
        x = x + res
        res = x
    x = feed_forward(p["ff"], x)
    x = layer_norm(x, p["norm2"])
    if residual:
        x = x + res
    return x.reshape(b, h, w, c)


# ---------------------------------------------------------------------------
# SparseCausalAttention + BasicTransformerBlock (keep_arch.py:544-748)
# ---------------------------------------------------------------------------

def sparse_causal_attention(p, x, video_length: int, *, heads: int):
    """x: (B*F, D, C). K/V context = concat(frame 0, frame i-1) per query frame
    (keep_arch.py:704-716)."""
    bf, d, c = x.shape
    b = bf // video_length
    q = x @ p["to_q"]["w"]
    k = x @ p["to_k"]["w"]
    v = x @ p["to_v"]["w"]
    inner = q.shape[-1]
    dh = inner // heads

    former = jnp.maximum(jnp.arange(video_length) - 1, 0)
    first = jnp.zeros((video_length,), jnp.int32)

    def gather_ctx(t):  # (B*F, D, inner) -> (B*F, 2D, inner)
        t = t.reshape(b, video_length, d, inner)
        t = jnp.concatenate([t[:, first], t[:, former]], axis=2)
        return t.reshape(bf, 2 * d, inner)

    k = gather_ctx(k)
    v = gather_ctx(v)
    q = q.reshape(bf, d, heads, dh).transpose(0, 2, 1, 3)
    k = k.reshape(bf, 2 * d, heads, dh).transpose(0, 2, 1, 3)
    v = v.reshape(bf, 2 * d, heads, dh).transpose(0, 2, 1, 3)
    out = scaled_dot_product_attention(q, k, v, scale=dh ** -0.5)
    out = out.transpose(0, 2, 1, 3).reshape(bf, d, inner)
    return linear(out, p["to_out"][0]["w"], p["to_out"][0]["b"])


def basic_transformer_block_init(key, dim: int, heads: int, dim_head: int):
    ks = jax.random.split(key, 3)
    return {
        "attn1": cross_attention_init(ks[0], dim, heads, dim_head),
        "norm1": layer_norm_init(dim),
        "ff": feed_forward_init(ks[1], dim),
        "norm3": layer_norm_init(dim),
        "attn_temp": cross_attention_init(ks[2], dim, heads, dim_head, zero_out=True),
        "norm_temp": layer_norm_init(dim),
    }


def basic_transformer_block(p, x, video_length: int, *, heads: int):
    """x: (B*F, D, C) -> same. SC-attn, FF, zero-init temporal attn
    (keep_arch.py:643-682)."""
    h = layer_norm(x, p["norm1"])
    x = sparse_causal_attention(p["attn1"], h, video_length, heads=heads) + x
    x = feed_forward(p["ff"], layer_norm(x, p["norm3"])) + x

    bf, d, c = x.shape
    b = bf // video_length
    xt = x.reshape(b, video_length, d, c).transpose(0, 2, 1, 3).reshape(b * d, video_length, c)
    h = layer_norm(xt, p["norm_temp"])
    xt = cross_attention(p["attn_temp"], h, heads=heads) + xt
    x = xt.reshape(b, d, video_length, c).transpose(0, 2, 1, 3).reshape(bf, d, c)
    return x


# ---------------------------------------------------------------------------
# PositionEmbeddingSine (keep_arch.py:329-371) — DETR-style 2D sine embedding
# ---------------------------------------------------------------------------

def position_embedding_sine(h: int, w: int, num_pos_feats: int = 64,
                            temperature: float = 10000.0, normalize: bool = False,
                            scale: Optional[float] = None):
    """Returns (h, w, 2*num_pos_feats) [y-part, x-part] like the reference's
    (B, C, H, W) output channel order."""
    import math
    if scale is None:
        scale = 2 * math.pi
    y = jnp.arange(1, h + 1, dtype=jnp.float32)[:, None] * jnp.ones((1, w))
    x = jnp.arange(1, w + 1, dtype=jnp.float32)[None, :] * jnp.ones((h, 1))
    if normalize:
        eps = 1e-6
        y = y / (y[-1:, :] + eps) * scale
        x = x / (x[:, -1:] + eps) * scale
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / num_pos_feats)
    px = x[:, :, None] / dim_t
    py = y[:, :, None] / dim_t
    px = jnp.stack([jnp.sin(px[:, :, 0::2]), jnp.cos(px[:, :, 1::2])], axis=3).reshape(h, w, -1)
    py = jnp.stack([jnp.sin(py[:, :, 0::2]), jnp.cos(py[:, :, 1::2])], axis=3).reshape(h, w, -1)
    return jnp.concatenate([py, px], axis=-1)


def adaptive_instance_normalization(content, style, eps: float = 1e-5):
    """AdaIN color transfer (keep_arch.py:294-326), NHWC."""
    def stats(f):
        m = f.mean(axis=(-3, -2), keepdims=True)
        v = f.var(axis=(-3, -2), keepdims=True) + eps
        return m, jnp.sqrt(v)
    cm, cs = stats(content)
    sm, ss = stats(style)
    return (content - cm) / cs * ss + sm
