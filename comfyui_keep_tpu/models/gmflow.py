"""GMFlow optical flow, TPU-native rebuild of reference
archs/gmflow_arch.py + archs/gmflow/gmflow/* (~1.2k LoC).

Structure (reference gmflow.py:12-170): InstanceNorm CNN backbone (stride 8)
-> sine position embedding -> 6x single-head transformer blocks with Swin-style
split-window attention (shifted on odd layers) over both images as one 2B
batch -> global correlation softmax (expectation flow) -> feature-guided flow
propagation attention -> 9-way convex upsampling x8.

TPU notes: everything is NHWC; the window partition is a reshape/transpose
(no data movement after XLA layout assignment); the shifted-window attention
mask is computed with numpy at trace time (static shapes); the (H*W)x(H*W)
global correlation is a single MXU matmul at 64x64 tokens for 512-inputs.
"""
import math
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from comfyui_keep_tpu.ops import (
    conv2d, conv2d_init, instance_norm, layer_norm, linear, linear_init,
    relu, gelu, resize_bilinear, grid_sample,
)
from comfyui_keep_tpu.ops.norm import layer_norm_init
from comfyui_keep_tpu.utils.registry import ARCH_REGISTRY

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


# ---------------------------------------------------------------------------
# Backbone (backbone.py:39-117)
# ---------------------------------------------------------------------------

def _rb_init(key, cin, cout, stride):
    ks = jax.random.split(key, 3)
    p = {"conv1": {"w": conv2d_init(ks[0], 3, 3, cin, cout, bias=False)["w"]},
         "conv2": {"w": conv2d_init(ks[1], 3, 3, cout, cout, bias=False)["w"]}}
    if stride != 1 or cin != cout:
        p["downsample"] = [conv2d_init(ks[2], 1, 1, cin, cout)]
    return p


def _rb_apply(p, x, stride):
    y = relu(instance_norm(conv2d(x, p["conv1"]["w"], stride=stride, padding=1)))
    y = relu(instance_norm(conv2d(y, p["conv2"]["w"], padding=1)))
    if "downsample" in p:
        x = instance_norm(conv2d(x, p["downsample"][0]["w"], p["downsample"][0]["b"],
                                 stride=stride))
    return relu(x + y)


def backbone_init(key, output_dim=128, num_output_scales=1):
    """CNNEncoder (backbone.py:39-117). With num_output_scales > 1, layer3
    keeps stride 1 (highest res 1/4) and a shared-weight trident conv
    (trident_conv.py:10-89) emits one output per stride (1, 2, ...)."""
    dims = (64, 96, 128)
    ks = jax.random.split(key, 9)
    s3 = 2 if num_output_scales == 1 else 1
    p = {
        "conv1": {"w": conv2d_init(ks[0], 7, 7, 3, dims[0], bias=False)["w"]},
        "layer1": [_rb_init(ks[1], dims[0], dims[0], 1), _rb_init(ks[2], dims[0], dims[0], 1)],
        "layer2": [_rb_init(ks[3], dims[0], dims[1], 2), _rb_init(ks[4], dims[1], dims[1], 1)],
        "layer3": [_rb_init(ks[5], dims[1], dims[2], s3), _rb_init(ks[6], dims[2], dims[2], 1)],
        "conv2": conv2d_init(ks[7], 1, 1, dims[2], output_dim),
    }
    if num_output_scales > 1:
        p["trident_conv"] = {"w": conv2d_init(
            ks[8], 3, 3, output_dim, output_dim, bias=False)["w"]}
    return p


def backbone_prepare_packed(p):
    """Serving-time weight prep: pack layer1's stride-1 3x3 convs (64 ch at
    1/2 res — half the MXU lanes idle unpacked, the same shape pathology as
    the VQGAN 512 level). Numerics-preserving up to float summation order."""
    from comfyui_keep_tpu.ops import phase_pack as pp
    layer1 = []
    for rb in p["layer1"]:
        w1, _ = pp.pack_conv3x3(np.asarray(rb["conv1"]["w"]), None)
        w2, _ = pp.pack_conv3x3(np.asarray(rb["conv2"]["w"]), None)
        layer1.append({**rb, "p512": {"conv1": jnp.asarray(w1),
                                      "conv2": jnp.asarray(w2)}})
    return {**p, "layer1": layer1}


def _rb_apply_packed(rb, x, true_hw):
    """Packed stride-1 same-channel residual block: conv-IN-relu x2 + add.
    Entry/exit parity 0 (conv1 flips to 1, conv2 back)."""
    from comfyui_keep_tpu.ops import phase_pack as pp
    y = pp.packed_conv(x, rb["p512"]["conv1"], None, parity=0)
    y = pp.packed_instance_norm(y, true_hw, parity=1, relu_after=True)
    y = pp.packed_conv(y, rb["p512"]["conv2"], None, parity=1)
    y = pp.packed_instance_norm(y, true_hw, parity=0, relu_after=True)
    return jnp.maximum(x + y, 0)


def backbone_apply(p, x, num_output_scales=1):
    """Returns a single (B, h, w, C) feature map (scales == 1, the KEEP
    path) or a high-to-low-res list of maps from the shared trident conv."""
    s3 = 2 if num_output_scales == 1 else 1
    x = relu(instance_norm(conv2d(x, p["conv1"]["w"], stride=2, padding=3)))
    if "p512" in p["layer1"][0]:
        from comfyui_keep_tpu.ops import phase_pack as pp
        true_hw = (x.shape[-3], x.shape[-2])
        xp = pp.space_to_depth(x)
        xp = _rb_apply_packed(p["layer1"][0], xp, true_hw)
        xp = _rb_apply_packed(p["layer1"][1], xp, true_hw)
        x = pp.depth_to_space(xp)
    else:
        x = _rb_apply(p["layer1"][0], x, 1)
        x = _rb_apply(p["layer1"][1], x, 1)
    x = _rb_apply(p["layer2"][0], x, 2)
    x = _rb_apply(p["layer2"][1], x, 1)
    x = _rb_apply(p["layer3"][0], x, s3)
    x = _rb_apply(p["layer3"][1], x, 1)
    x = conv2d(x, p["conv2"]["w"], p["conv2"]["b"])
    if num_output_scales == 1:
        return x
    strides = {2: (1, 2), 3: (1, 2, 4), 4: (1, 2, 4, 8)}[num_output_scales]
    return [conv2d(x, p["trident_conv"]["w"], stride=s, padding=1)
            for s in strides]


# ---------------------------------------------------------------------------
# Window partition + sine position embedding (utils.py:5-86, position.py:9-46)
# ---------------------------------------------------------------------------

def split_windows(x, k: int):
    """(B, H, W, C) -> (B*k*k, H/k, W/k, C), row-major windows."""
    b, h, w, c = x.shape
    x = x.reshape(b, k, h // k, k, w // k, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b * k * k, h // k, w // k, c)


def merge_windows(x, k: int):
    bk, hk, wk, c = x.shape
    b = bk // (k * k)
    x = x.reshape(b, k, k, hk, wk, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, k * hk, k * wk, c)


def sine_pos_embed(h: int, w: int, num_pos_feats: int):
    """DETR sine embedding, normalize=True (gmflow position.py:9-46).
    Returns (h, w, 2*num_pos_feats) ordered [y-part, x-part]."""
    scale = 2 * math.pi
    eps = 1e-6
    y = np.arange(1, h + 1, dtype=np.float32)[:, None] * np.ones((1, w), np.float32)
    x = np.arange(1, w + 1, dtype=np.float32)[None, :] * np.ones((h, 1), np.float32)
    y = y / (y[-1:, :] + eps) * scale
    x = x / (x[:, -1:] + eps) * scale
    dim_t = np.arange(num_pos_feats, dtype=np.float32)
    dim_t = 10000.0 ** (2 * np.floor(dim_t / 2) / num_pos_feats)
    px = x[:, :, None] / dim_t
    py = y[:, :, None] / dim_t
    px = np.stack([np.sin(px[:, :, 0::2]), np.cos(px[:, :, 1::2])], axis=3).reshape(h, w, -1)
    py = np.stack([np.sin(py[:, :, 0::2]), np.cos(py[:, :, 1::2])], axis=3).reshape(h, w, -1)
    return jnp.asarray(np.concatenate([py, px], axis=-1))


def add_position(f0, f1, attn_splits: int, channels: int):
    """feature_add_position (utils.py:66-86): pos computed per split window."""
    b, h, w, c = f0.shape
    if attn_splits > 1:
        f0s = split_windows(f0, attn_splits)
        f1s = split_windows(f1, attn_splits)
        pos = sine_pos_embed(h // attn_splits, w // attn_splits,
                             channels // 2).astype(f0.dtype)
        return merge_windows(f0s + pos, attn_splits), merge_windows(f1s + pos, attn_splits)
    pos = sine_pos_embed(h, w, channels // 2).astype(f0.dtype)
    return f0 + pos, f1 + pos


def shifted_window_mask(h: int, w: int, k: int) -> np.ndarray:
    """Swin SW-MSA mask (transformer.py:20-46), computed host-side (static).
    Returns (k*k, win, win) additive mask of {0, -100}."""
    wsh, wsw = h // k, w // k
    ssh, ssw = wsh // 2, wsw // 2
    img = np.zeros((h, w), np.float32)
    cnt = 0
    for hs in (slice(0, h - wsh), slice(h - wsh, h - ssh), slice(h - ssh, None)):
        for ws in (slice(0, w - wsw), slice(w - wsw, w - ssw), slice(w - ssw, None)):
            img[hs, ws] = cnt
            cnt += 1
    win = img.reshape(k, wsh, k, wsw).transpose(0, 2, 1, 3).reshape(k * k, wsh * wsw)
    mask = win[:, None, :] - win[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


# ---------------------------------------------------------------------------
# Feature transformer (transformer.py:8-322)
# ---------------------------------------------------------------------------

def _tlayer_init(key, d: int, ffn: bool, expansion: int = 4):
    ks = jax.random.split(key, 6)
    p = {
        "q_proj": {"w": linear_init(ks[0], d, d, bias=False)["w"]},
        "k_proj": {"w": linear_init(ks[1], d, d, bias=False)["w"]},
        "v_proj": {"w": linear_init(ks[2], d, d, bias=False)["w"]},
        "merge": {"w": linear_init(ks[3], d, d, bias=False)["w"]},
        "norm1": layer_norm_init(d),
    }
    if ffn:
        p["mlp"] = [{"w": linear_init(ks[4], 2 * d, 2 * d * expansion, bias=False)["w"]},
                    None,
                    {"w": linear_init(ks[5], 2 * d * expansion, d, bias=False)["w"]}]
        p["norm2"] = layer_norm_init(d)
    return p


def _sdpa(q, k, v, scale, bias=None):
    """softmax(q k^T * scale [+ bias]) v — Pallas-fused on TPU (K/V and the
    f32 scores VMEM-resident), XLA einsum elsewhere."""
    from comfyui_keep_tpu.ops.pallas_kernels import (_HAVE_PALLAS, _on_tpu,
                                                     attention_pallas)
    l, c = q.shape[-2], q.shape[-1]
    if (_HAVE_PALLAS and _on_tpu() and c % 128 == 0 and l % 128 == 0
            and (bias is None or q.shape[0] % bias.shape[0] == 0)):
        return attention_pallas(q, k, v, scale, bias=bias)
    scores = jnp.einsum(
        "blc,bmc->blm", q, k,
        preferred_element_type=jnp.promote_types(q.dtype, jnp.float32)) * scale
    if bias is not None:
        scores = scores + jnp.tile(bias, (q.shape[0] // bias.shape[0], 1, 1))
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("blm,bmc->blc", probs, v)


def _prep_tokens(x, b, h, w, c, splits, shift):
    """(B, H*W, C) tokens -> (B*splits², win, C) window layout. ONE layout
    pass (roll + partition) per tensor — projections are position-independent
    so they run inside window layout, cutting the per-sublayer layout traffic
    3x vs partitioning q/k/v separately."""
    t = x.reshape(b, h, w, c)
    if shift:
        t = jnp.roll(t, (-(h // splits // 2), -(w // splits // 2)),
                     axis=(1, 2))
    return split_windows(t, splits).reshape(
        b * splits * splits, (h // splits) * (w // splits), c)


def _unprep_tokens(x, b, h, w, c, splits, shift):
    t = merge_windows(x.reshape(b * splits * splits, h // splits,
                                w // splits, c), splits)
    if shift:
        t = jnp.roll(t, (h // splits // 2, w // splits // 2), axis=(1, 2))
    return t.reshape(b, h * w, c)


def _tlayer_apply(p, source, target, h, w, splits, shift, mask):
    """One transformer sublayer (transformer.py:8-105). q/k/v projections
    are fused into a single matmul (qkv for self-attention where
    target IS source, kv for cross) and run in window layout."""
    b, l, c = source.shape
    scale = 1.0 / math.sqrt(c)
    self_attn = target is source

    if splits > 1:
        sw = _prep_tokens(source, b, h, w, c, splits, shift)
        if self_attn:
            qkv = sw @ jnp.concatenate(
                [p["q_proj"]["w"], p["k_proj"]["w"], p["v_proj"]["w"]], axis=1)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            tw = _prep_tokens(target, b, h, w, c, splits, shift)
            q = sw @ p["q_proj"]["w"]
            kv = tw @ jnp.concatenate([p["k_proj"]["w"], p["v_proj"]["w"]],
                                      axis=1)
            k, v = jnp.split(kv, 2, axis=-1)
        bias = jnp.asarray(mask, jnp.float32) if shift else None
        out = _sdpa(q, k, v, scale, bias=bias)
        msg = _unprep_tokens(out, b, h, w, c, splits, shift)
    else:
        if self_attn:
            qkv = source @ jnp.concatenate(
                [p["q_proj"]["w"], p["k_proj"]["w"], p["v_proj"]["w"]], axis=1)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = source @ p["q_proj"]["w"]
            kv = target @ jnp.concatenate([p["k_proj"]["w"], p["v_proj"]["w"]],
                                          axis=1)
            k, v = jnp.split(kv, 2, axis=-1)
        msg = _sdpa(q, k, v, scale)

    msg = layer_norm(msg @ p["merge"]["w"], p["norm1"])
    if "mlp" in p:
        # concat([source, msg]) @ W1 == source @ W1[:c] + msg @ W1[c:] —
        # skips materializing the (B, L, 2C) concat
        w1 = p["mlp"][0]["w"]
        from comfyui_keep_tpu.ops.pallas_kernels import (_HAVE_PALLAS,
                                                         _on_tpu,
                                                         mlp_fused_pallas)
        if (_HAVE_PALLAS and _on_tpu() and source.dtype == jnp.bfloat16
                and c % 128 == 0 and w1.shape[1] % 128 == 0):
            # fused kernel keeps the (bq, hidden) activation in VMEM
            # (~640 MB HBM round-trip per MLP otherwise) and includes the
            # LN + residual epilogue
            return mlp_fused_pallas(source, msg, w1[:c], w1[c:],
                                    p["mlp"][2]["w"], p["norm2"]["scale"],
                                    p["norm2"]["bias"])
        hmid = gelu(source @ w1[:c] + msg @ w1[c:])
        msg = layer_norm(hmid @ p["mlp"][2]["w"], p["norm2"])
    return source + msg


def _sublayer_windowed(p, sw, tw, bias):
    """One transformer sublayer entirely in window layout (B·k², win, C).
    Every op except the windowed attention is per-token, so it commutes
    with the window permutation — results are identical to the flat-layout
    sublayer while the (B, H·W, C) <-> window relayout is hoisted out."""
    c = sw.shape[-1]
    scale = 1.0 / math.sqrt(c)
    if tw is sw:
        qkv = sw @ jnp.concatenate(
            [p["q_proj"]["w"], p["k_proj"]["w"], p["v_proj"]["w"]], axis=1)
        q, k, v = jnp.split(qkv, 3, axis=-1)
    else:
        q = sw @ p["q_proj"]["w"]
        kv = tw @ jnp.concatenate([p["k_proj"]["w"], p["v_proj"]["w"]],
                                  axis=1)
        k, v = jnp.split(kv, 2, axis=-1)
    out = _sdpa(q, k, v, scale, bias=bias)
    msg = layer_norm(out @ p["merge"]["w"], p["norm1"])
    if "mlp" in p:
        w1 = p["mlp"][0]["w"]
        from comfyui_keep_tpu.ops.pallas_kernels import (_HAVE_PALLAS,
                                                         _on_tpu,
                                                         mlp_fused_pallas)
        if (_HAVE_PALLAS and _on_tpu() and sw.dtype == jnp.bfloat16
                and c % 128 == 0 and w1.shape[1] % 128 == 0):
            return mlp_fused_pallas(sw, msg, w1[:c], w1[c:],
                                    p["mlp"][2]["w"], p["norm2"]["scale"],
                                    p["norm2"]["bias"])
        hmid = gelu(sw @ w1[:c] + msg @ w1[c:])
        msg = layer_norm(hmid @ p["mlp"][2]["w"], p["norm2"])
    return sw + msg


def transformer_init(key, d_model=128, num_layers=6):
    ks = jax.random.split(key, num_layers)
    return {"layers": [
        {"self_attn": _tlayer_init(jax.random.fold_in(k, 0), d_model, ffn=False),
         "cross_attn_ffn": _tlayer_init(jax.random.fold_in(k, 1), d_model, ffn=True)}
        for k in ks]}


def transformer_apply(p, f0, f1, attn_splits: int):
    """f0/f1: (B, H, W, C). Both images processed as one 2B batch, swapped
    each layer (transformer.py:301-316). With window attention the tokens
    stay in window layout across each layer's self+cross+FFN (self and
    cross share the layer's shift), and the image swap happens on the
    window batch — 3 relayout passes per layer instead of 6."""
    b, h, w, c = f0.shape
    c0 = jnp.concatenate([f0, f1], axis=0).reshape(2 * b, h * w, c)
    if attn_splits > 1:
        mask = shifted_window_mask(h, w, attn_splits)
        half = b * attn_splits * attn_splits  # f0-half of the window batch
        for i, layer in enumerate(p["layers"]):
            shift = (i % 2 == 1)
            bias = jnp.asarray(mask, jnp.float32) if shift else None
            sw = _prep_tokens(c0, 2 * b, h, w, c, attn_splits, shift)
            # prep commutes with the batch swap: target windows are the
            # swapped halves of the source windows
            tw = jnp.concatenate([sw[half:], sw[:half]], axis=0)
            sw = _sublayer_windowed(layer["self_attn"], sw, sw, bias)
            sw = _sublayer_windowed(layer["cross_attn_ffn"], sw, tw, bias)
            c0 = _unprep_tokens(sw, 2 * b, h, w, c, attn_splits, shift)
    else:
        c1 = jnp.concatenate([c0[b:], c0[:b]], axis=0)
        for i, layer in enumerate(p["layers"]):
            c0 = _tlayer_apply(layer["self_attn"], c0, c0, h, w, 1, False,
                               None)
            c0 = _tlayer_apply(layer["cross_attn_ffn"], c0, c1, h, w, 1,
                               False, None)
            c1 = jnp.concatenate([c0[b:], c0[:b]], axis=0)
    f0 = c0[:b].reshape(b, h, w, c)
    f1 = c0[b:].reshape(b, h, w, c)
    return f0, f1


# ---------------------------------------------------------------------------
# Matching (matching.py:7-83)
# ---------------------------------------------------------------------------

def coords_grid(h: int, w: int):
    """(h, w, 2) [x, y] pixel coordinates."""
    y, x = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                        jnp.arange(w, dtype=jnp.float32), indexing="ij")
    return jnp.stack([x, y], axis=-1)


def global_correlation_softmax(f0, f1):
    """(B, H, W, C) x2 -> flow (B, H, W, 2): softmax-weighted expectation of
    the grid over the full (H*W)^2 correlation (matching.py:7-36).

    On TPU the expectation runs as a fused Pallas kernel (the f32 (L, L)
    correlation never hits HBM — at 64x64 features it is 67 MB per image
    pair otherwise); elsewhere, plain XLA einsum+softmax."""
    from comfyui_keep_tpu.ops.pallas_kernels import (
        _HAVE_PALLAS, _on_tpu, global_correlation_expectation_pallas)
    b, h, w, c = f0.shape
    t0 = f0.reshape(b, h * w, c)
    t1 = f1.reshape(b, h * w, c)
    grid = coords_grid(h, w).reshape(h * w, 2)
    if _HAVE_PALLAS and _on_tpu() and (h * w) % 128 == 0 and c % 128 == 0:
        corresp = global_correlation_expectation_pallas(t0, t1, grid)
        corresp = corresp.reshape(b, h, w, 2)
        prob = None  # not materialized (unused by the serving path)
    else:
        corr = jnp.einsum(
            "blc,bmc->blm", t0, t1,
            preferred_element_type=jnp.promote_types(t0.dtype, jnp.float32),
        ) / math.sqrt(c)
        prob = jax.nn.softmax(corr, axis=-1)
        corresp = jnp.einsum("blm,mk->blk", prob, grid).reshape(b, h, w, 2)
    # softmax expectation runs in f32; return in the feature dtype so the
    # downstream convs stay bf16-consistent
    return (corresp - grid.reshape(h, w, 2)).astype(f0.dtype), prob


def local_correlation_softmax(f0, f1, radius: int):
    """Windowed variant (matching.py:39-83)."""
    b, h, w, c = f0.shape
    k = 2 * radius + 1
    coords = coords_grid(h, w)  # (h, w, 2)
    offs_x, offs_y = jnp.meshgrid(jnp.arange(-radius, radius + 1, dtype=jnp.float32),
                                  jnp.arange(-radius, radius + 1, dtype=jnp.float32),
                                  indexing="xy")
    window = jnp.stack([offs_x, offs_y], axis=-1).reshape(-1, 2)  # (k*k, 2)
    sample = coords[None, :, :, None, :] + window  # (1, h, w, k*k, 2)
    sample = jnp.broadcast_to(sample, (b, h, w, k * k, 2))
    valid = ((sample[..., 0] >= 0) & (sample[..., 0] < w) &
             (sample[..., 1] >= 0) & (sample[..., 1] < h))
    norm = jnp.stack([2 * sample[..., 0] / max(w - 1, 1) - 1,
                      2 * sample[..., 1] / max(h - 1, 1) - 1], axis=-1)
    feat_w = grid_sample(f1, norm.reshape(b, h * w, k * k, 2))  # (b, h*w, k*k, c)
    f0t = f0.reshape(b, h * w, 1, c)
    corr = jnp.sum(f0t * feat_w, axis=-1) / math.sqrt(c)  # (b, h*w, k*k)
    corr = jnp.where(valid.reshape(b, h * w, k * k), corr, -1e9)
    prob = jax.nn.softmax(corr, axis=-1)
    corresp = jnp.einsum("blk,blkc->blc", prob, sample.reshape(b, h * w, k * k, 2))
    flow = corresp.reshape(b, h, w, 2) - coords
    return flow.astype(f0.dtype), prob


# ---------------------------------------------------------------------------
# Flow propagation attention (transformer.py:325-409)
# ---------------------------------------------------------------------------

def flow_attn_init(key, c=128):
    k1, k2 = jax.random.split(key)
    return {"q_proj": linear_init(k1, c, c), "k_proj": linear_init(k2, c, c)}


def flow_attention(p, feature0, flow, local_window_radius: int = -1):
    """Global: softmax(q k^T / sqrt(c)) @ flow. NB reference quirk preserved:
    key = k_proj(q_proj(x)) (transformer.py:352-360)."""
    b, h, w, c = feature0.shape
    x = feature0.reshape(b, h * w, c)
    q = linear(x, p["q_proj"]["w"], p["q_proj"]["b"])
    if local_window_radius > 0:
        # NB: the local branch projects the key from feature0 directly
        # (transformer.py:383-390), unlike the global branch's k(q(x)) quirk.
        k = linear(x, p["k_proj"]["w"], p["k_proj"]["b"])
        r = local_window_radius
        ksz = 2 * r + 1
        kp = _unfold_nhwc(k.reshape(b, h, w, c), ksz, r)      # (b,h,w,k2,c)
        vp = _unfold_nhwc(flow, ksz, r)                        # (b,h,w,k2,2)
        scores = jnp.einsum("bhwc,bhwkc->bhwk", q.reshape(b, h, w, c), kp) / math.sqrt(c)
        prob = jax.nn.softmax(scores, axis=-1)
        return jnp.einsum("bhwk,bhwkc->bhwc", prob, vp)
    k = linear(q, p["k_proj"]["w"], p["k_proj"]["b"])
    v = flow.reshape(b, h * w, 2)
    from comfyui_keep_tpu.ops.pallas_kernels import (_HAVE_PALLAS, _on_tpu,
                                                     attention_pallas)
    if _HAVE_PALLAS and _on_tpu() and c % 128 == 0 and (h * w) % 128 == 0:
        # fused kernel: the (HW, HW) f32 probs never hit HBM (1.27 GB/clip
        # at 64x64x19 pairs) and the V matmul runs lane-padded 2->c instead
        # of N=2 (the padded columns are zeros; sliced off after)
        v_pad = jnp.concatenate(
            [v, jnp.zeros(v.shape[:-1] + (c - 2,), v.dtype)], axis=-1)
        out = attention_pallas(q, k, v_pad, 1.0 / math.sqrt(c))[..., :2]
        return out.reshape(b, h, w, 2)
    scores = jnp.einsum(
        "blc,bmc->blm", q, k,
        preferred_element_type=jnp.promote_types(q.dtype, jnp.float32),
    ) / math.sqrt(c)
    prob = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("blm,bmc->blc", prob, v).reshape(b, h, w, 2)


def _unfold_nhwc(x, ksize: int, pad: int):
    """(B, H, W, C) -> (B, H, W, ksize*ksize, C), zero-padded, row-major patch
    order (matches F.unfold)."""
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    patches = [xp[:, i:i + h, j:j + w] for i in range(ksize) for j in range(ksize)]
    return jnp.stack(patches, axis=3)


# ---------------------------------------------------------------------------
# Convex upsampling (gmflow.py:67-90)
# ---------------------------------------------------------------------------

def upsampler_init(key, feature_channels=128, factor=8):
    k1, k2 = jax.random.split(key)
    return [conv2d_init(k1, 3, 3, 2 + feature_channels, 256), None,
            conv2d_init(k2, 1, 1, 256, factor * factor * 9)]


def upsample_flow_convex(p, flow, feature, factor: int = 8,
                         planes: bool = False):
    """Convex ×factor flow upsampling (gmflow.py:67-90).

    planes=False: (B, H*f, W*f, 2) interleaved, matching the reference.
    planes=True: (fx, fy) each (B, H*f, W*f) — same values, no trailing
    lane-dim-2 tensor is ever materialized at full resolution (the
    interleaved layout is the same pathology class as the KEEP scan's
    per-step flow slices, docs/ROADMAP.md)."""
    b, h, w, _ = flow.shape
    concat = jnp.concatenate([flow, feature], axis=-1)
    mask = conv2d(concat, p[0]["w"], p[0]["b"], padding=1)
    mask = relu(mask)
    mask = conv2d(mask, p[2]["w"], p[2]["b"])  # (b, h, w, 9*factor^2)
    mask = mask.reshape(b, h, w, 9, factor * factor)
    mask = jax.nn.softmax(mask, axis=3)
    patches = _unfold_nhwc(flow * factor, 3, 1)  # (b, h, w, 9, 2)
    if planes:
        def shuffle(u):  # (b, h, w, f*f) -> (b, h*f, w*f) pixel shuffle
            u = u.reshape(b, h, w, factor, factor)
            return u.transpose(0, 1, 3, 2, 4).reshape(
                b, h * factor, w * factor)
        upx = jnp.einsum("bhwnk,bhwn->bhwk", mask, patches[..., 0])
        upy = jnp.einsum("bhwnk,bhwn->bhwk", mask, patches[..., 1])
        return shuffle(upx), shuffle(upy)
    up = jnp.einsum("bhwnk,bhwnc->bhwkc", mask, patches)  # (b,h,w,f*f,2)
    up = up.reshape(b, h, w, factor, factor, 2)
    up = up.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * factor, w * factor, 2)
    return up


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------

@ARCH_REGISTRY.register(name="GMFlow")
class GMFlow:
    FEATURE_CHANNELS = 128
    UPSAMPLE_FACTOR = 8

    @staticmethod
    def init(key, feature_channels=128, num_layers=6, num_scales=1):
        ks = jax.random.split(key, 4)
        return {
            "backbone": backbone_init(ks[0], feature_channels,
                                      num_output_scales=num_scales),
            "transformer": transformer_init(ks[1], feature_channels, num_layers),
            "feature_flow_attn": flow_attn_init(ks[2], feature_channels),
            "upsampler": upsampler_init(ks[3], feature_channels),
        }

    @staticmethod
    def extract_features(params, imgs):
        """ImageNet-normalize (B, H, W, 3) [0, 255] frames and run the
        per-image backbone (the only stage with no cross-pair interaction)."""
        mean = jnp.asarray(IMAGENET_MEAN, imgs.dtype)
        std = jnp.asarray(IMAGENET_STD, imgs.dtype)
        return backbone_apply(params["backbone"], (imgs / 255.0 - mean) / std)

    @staticmethod
    def flow_from_features(params, f0, f1, attn_splits: int = 2,
                           corr_radius: int = -1, prop_radius: int = -1,
                           planes: bool = False):
        """Pair stages: transformer + correlation softmax + flow attention +
        convex upsample on precomputed backbone features.

        optimization_barrier between stages: XLA otherwise fuses across the
        stage boundaries with pathological layouts (-3.5 ms/clip on v5e,
        same pathology class as the KEEP scan barriers — docs/ROADMAP.md)."""
        import os
        bar = (jax.lax.optimization_barrier
               if os.environ.get("KEEP_TPU_NO_BARRIERS") != "1"
               else (lambda v: v))
        f0, f1 = bar(f0), bar(f1)
        f0, f1 = add_position(f0, f1, attn_splits, GMFlow.FEATURE_CHANNELS)
        f0, f1 = transformer_apply(params["transformer"], f0, f1, attn_splits)
        f0, f1 = bar(f0), bar(f1)
        if corr_radius == -1:
            flow, _ = global_correlation_softmax(f0, f1)
        else:
            flow, _ = local_correlation_softmax(f0, f1, corr_radius)
        flow = flow_attention(params["feature_flow_attn"], bar(f0),
                              jax.lax.stop_gradient(bar(flow)),
                              local_window_radius=prop_radius)
        return upsample_flow_convex(params["upsampler"], bar(flow), f0,
                                    GMFlow.UPSAMPLE_FACTOR, planes=planes)


    @staticmethod
    def apply_refine(params, img0, img1, attn_splits_list=(2, 8),
                     corr_radius_list=(-1, 4), prop_radius_list=(-1, 1),
                     num_scales: int = 2, pred_bidir_flow: bool = False):
        """Multi-scale refinement forward (gmflow.py:92-170, the
        'gmflow_with_refine' variant): residual flow across scales, feature1
        warped by the upsampled coarse flow; optional bidirectional flow
        (forward batch followed by backward batch). Requires params built
        with backbone num_output_scales == num_scales."""
        from comfyui_keep_tpu.ops import flow_warp
        b = img0.shape[0]
        mean = jnp.asarray(IMAGENET_MEAN, img0.dtype)
        std = jnp.asarray(IMAGENET_STD, img0.dtype)
        imgs = (jnp.concatenate([img0, img1], axis=0) / 255.0 - mean) / std
        feats = backbone_apply(params["backbone"], imgs,
                               num_output_scales=num_scales)[::-1]  # low->high
        flow = None
        for si in range(num_scales):
            f0, f1 = feats[si][:b], feats[si][b:]
            if pred_bidir_flow:
                # fwd + bwd as one doubled batch; the reference instead
                # transposes the scale-0 correlation (matching.py bidir) —
                # same math, different accumulation order
                f0, f1 = (jnp.concatenate([f0, f1], axis=0),
                          jnp.concatenate([f1, f0], axis=0))
            if si > 0:
                hw = (flow.shape[1] * 2, flow.shape[2] * 2)
                flow = resize_bilinear(flow, hw, align_corners=True) * 2
            if flow is not None:
                flow = jax.lax.stop_gradient(flow)
                f1 = flow_warp(f1, flow)
            attn_splits = attn_splits_list[si]
            corr_radius = corr_radius_list[si]
            prop_radius = prop_radius_list[si]
            f0, f1 = add_position(f0, f1, attn_splits, GMFlow.FEATURE_CHANNELS)
            f0, f1 = transformer_apply(params["transformer"], f0, f1,
                                       attn_splits)
            if corr_radius == -1:
                flow_pred, _ = global_correlation_softmax(f0, f1)
            else:
                flow_pred, _ = local_correlation_softmax(f0, f1, corr_radius)
            flow = flow + flow_pred if flow is not None else flow_pred
            flow = flow_attention(params["feature_flow_attn"], f0,
                                  jax.lax.stop_gradient(flow),
                                  local_window_radius=prop_radius)
        return upsample_flow_convex(params["upsampler"], flow, f0,
                                    GMFlow.UPSAMPLE_FACTOR)

    @staticmethod
    def apply(params, img0, img1, attn_splits: int = 2, corr_radius: int = -1,
              prop_radius: int = -1):
        """img0/img1: (B, H, W, 3) in [0, 255]. Returns flow (B, H, W, 2) at
        full resolution (img0 -> img1 displacement)."""
        b = img0.shape[0]
        feats = GMFlow.extract_features(
            params, jnp.concatenate([img0, img1], axis=0))
        return GMFlow.flow_from_features(params, feats[:b], feats[b:],
                                         attn_splits, corr_radius,
                                         prop_radius)


def flow_from_clip(params, x, chunk: Optional[int] = None,
                   planes: bool = False):
    """FlowGenerator-equivalent (gmflow_arch.py:10-66) for KEEP:
    x (B, T, H, W, 3) in [-1, 1] -> flows (B, T-1, H, W, 2), where
    flows[:, i] = GMFlow(frame_{i+1} -> frame_i), matching
    keep_arch.py:976-986 (flownet(x_2, x_1)).

    planes=True returns (fx, fy) each (B, T-1, H, W) — the layout
    KEEP.apply's scan consumes directly (same values, no interleave /
    de-interleave round trip at 512x512)."""
    b, t, h, w, _ = x.shape
    x255 = (x + 1.0) * 0.5 * 255.0
    # backbone once per frame (t passes, not 2*(t-1)): consecutive pairs
    # share frames, and the backbone has no cross-pair interaction
    feats = GMFlow.extract_features(params, x255.reshape(b * t, h, w, 3))
    feats = feats.reshape((b, t) + feats.shape[1:])
    f0 = feats[:, 1:].reshape((b * (t - 1),) + feats.shape[2:])
    f1 = feats[:, :-1].reshape((b * (t - 1),) + feats.shape[2:])
    flow = GMFlow.flow_from_features(params, f0, f1, planes=planes)
    if planes:
        fx, fy = flow
        return (jax.lax.stop_gradient(fx.reshape(b, t - 1, h, w)),
                jax.lax.stop_gradient(fy.reshape(b, t - 1, h, w)))
    return jax.lax.stop_gradient(flow.reshape(b, t - 1, h, w, 2))


def convert_gmflow_checkpoint(sd):
    """Torch GMFlow state dict (numpy, keys relative to the GMFlow module,
    i.e. 'backbone.conv1.weight', ...) -> param tree."""
    from comfyui_keep_tpu.utils.checkpoint import convert_state_dict
    return convert_state_dict(sd)


def forward_backward_consistency_check(fwd_flow, bwd_flow, alpha: float = 0.01,
                                       beta: float = 0.5):
    """Occlusion masks from bidirectional flow (geometry.py:96-118, UnFlow
    thresholds). fwd/bwd flow: (B, H, W, 2) -> (fwd_occ, bwd_occ) (B, H, W)
    in {0, 1}."""
    from comfyui_keep_tpu.ops import flow_warp
    mag = (jnp.linalg.norm(fwd_flow, axis=-1) +
           jnp.linalg.norm(bwd_flow, axis=-1))
    warped_bwd = flow_warp(bwd_flow, fwd_flow)
    warped_fwd = flow_warp(fwd_flow, bwd_flow)
    diff_fwd = jnp.linalg.norm(fwd_flow + warped_bwd, axis=-1)
    diff_bwd = jnp.linalg.norm(bwd_flow + warped_fwd, axis=-1)
    thr = alpha * mag + beta
    return ((diff_fwd > thr).astype(fwd_flow.dtype),
            (diff_bwd > thr).astype(bwd_flow.dtype))
