"""SwinIR — rebuild of reference archs/swinir_arch.py (956 LoC): shallow conv
-> RSTB stacks (shifted-window attention with relative position bias) ->
reconstruction (pixelshuffle / pixelshuffledirect / nearest+conv / none).

NHWC; window partition is reshape/transpose; the SW-MSA mask is computed
host-side at trace time (static shapes). Param tree mirrors the torch state
dict so pretrained SwinIR checkpoints convert with the generic rules.
"""
import math
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from comfyui_keep_tpu.ops import (conv2d, conv2d_init, linear, linear_init,
                                  layer_norm, leaky_relu, gelu, relu)
from comfyui_keep_tpu.ops.norm import layer_norm_init
from comfyui_keep_tpu.models.sr_basic import (pixel_shuffle, _upsample_seq,
                                              _upsample_seq_init)
from comfyui_keep_tpu.ops.resample import resize_nearest
from comfyui_keep_tpu.utils.registry import ARCH_REGISTRY

RGB_MEAN = (0.4488, 0.4371, 0.4040)


def _rel_pos_index(wh: int, ww: int) -> np.ndarray:
    ch, cw = np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij")
    coords = np.stack([ch.reshape(-1), cw.reshape(-1)])  # (2, N)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1)  # (N, N)


def _attn_mask(h: int, w: int, ws: int, shift: int) -> Optional[np.ndarray]:
    if shift == 0:
        return None
    img = np.zeros((h, w))
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, wsl] = cnt
            cnt += 1
    win = img.reshape(h // ws, ws, w // ws, ws).transpose(0, 2, 1, 3)
    win = win.reshape(-1, ws * ws)
    mask = win[:, None, :] - win[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


def _window_partition(x, ws):
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def _window_merge(x, ws, h, w):
    b = x.shape[0] // ((h // ws) * (w // ws))
    x = x.reshape(b, h // ws, w // ws, ws, ws, -1).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, -1)


def _window_attention(p, x, num_heads, rel_index, mask=None):
    """x: (nW*B, N, C) windows."""
    nb, n, c = x.shape
    qkv = linear(x, p["qkv"]["w"], p["qkv"].get("b"))
    qkv = qkv.reshape(nb, n, 3, num_heads, c // num_heads)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    scale = (c // num_heads) ** -0.5
    attn = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k,
                      preferred_element_type=jnp.float32)
    bias = jnp.asarray(p["relative_position_bias_table"])[rel_index.reshape(-1)]
    bias = bias.reshape(n, n, num_heads).transpose(2, 0, 1)
    attn = attn + bias[None]
    if mask is not None:
        nw = mask.shape[0]
        attn = attn.reshape(nb // nw, nw, num_heads, n, n) + \
            jnp.asarray(mask)[None, :, None]
        attn = attn.reshape(nb, num_heads, n, n)
    attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(nb, n, c)
    return linear(out, p["proj"]["w"], p["proj"]["b"])


def _swin_block(p, x, x_size, num_heads, window_size, shift, mlp_ratio):
    h, w = x_size
    b, l, c = x.shape
    ws = min(window_size, min(h, w))
    sh = 0 if min(h, w) <= window_size else shift
    shortcut = x
    xn = layer_norm(x, p["norm1"]).reshape(b, h, w, c)
    if sh > 0:
        xn = jnp.roll(xn, (-sh, -sh), axis=(1, 2))
    windows = _window_partition(xn, ws)
    rel = _rel_pos_index(ws, ws)
    mask = _attn_mask(h, w, ws, sh)
    attn = _window_attention(p["attn"], windows, num_heads, rel, mask)
    xn = _window_merge(attn, ws, h, w)
    if sh > 0:
        xn = jnp.roll(xn, (sh, sh), axis=(1, 2))
    x = shortcut + xn.reshape(b, l, c)
    h2 = layer_norm(x, p["norm2"])
    h2 = linear(gelu(linear(h2, p["mlp"]["fc1"]["w"], p["mlp"]["fc1"]["b"])),
                p["mlp"]["fc2"]["w"], p["mlp"]["fc2"]["b"])
    return x + h2


def _swin_block_init(key, dim, num_heads, window_size, mlp_ratio):
    ks = jax.random.split(key, 4)
    hidden = int(dim * mlp_ratio)
    return {
        "norm1": layer_norm_init(dim),
        "attn": {
            "qkv": linear_init(ks[0], dim, dim * 3),
            "proj": linear_init(ks[1], dim, dim),
            "relative_position_bias_table": jax.random.normal(
                ks[2], ((2 * window_size - 1) ** 2, num_heads)) * 0.02,
        },
        "norm2": layer_norm_init(dim),
        "mlp": {"fc1": linear_init(ks[3], dim, hidden),
                "fc2": linear_init(jax.random.fold_in(ks[3], 1), hidden, dim)},
    }


@ARCH_REGISTRY.register(name="SwinIR")
class SwinIR:
    @staticmethod
    def init(key, img_size=64, in_chans=3, embed_dim=96, depths=(6, 6, 6, 6),
             num_heads=(6, 6, 6, 6), window_size=7, mlp_ratio=4.0,
             upscale=2, upsampler="", resi_connection="1conv",
             patch_norm=True, ape=False):
        num_feat = 64
        ks = jax.random.split(key, len(depths) + 8)
        p = {"conv_first": conv2d_init(ks[0], 3, 3, in_chans, embed_dim),
             "layers": [], "norm": layer_norm_init(embed_dim)}
        if patch_norm:
            p["patch_embed"] = {"norm": layer_norm_init(embed_dim)}
        for i, d in enumerate(depths):
            bks = jax.random.split(ks[i + 1], d + 1)
            layer = {"residual_group": {"blocks": [
                _swin_block_init(bks[j], embed_dim, num_heads[i], window_size,
                                 mlp_ratio) for j in range(d)]}}
            if resi_connection == "1conv":
                layer["conv"] = conv2d_init(bks[-1], 3, 3, embed_dim, embed_dim)
            p["layers"].append(layer)
        if resi_connection == "1conv":
            p["conv_after_body"] = conv2d_init(ks[-7], 3, 3, embed_dim, embed_dim)
        if upsampler == "pixelshuffle":
            p["conv_before_upsample"] = [conv2d_init(ks[-6], 3, 3, embed_dim, num_feat)]
            p["upsample"] = _upsample_seq_init(ks[-5], upscale, num_feat)
            p["conv_last"] = conv2d_init(ks[-4], 3, 3, num_feat, in_chans)
        elif upsampler == "pixelshuffledirect":
            p["upsample"] = [conv2d_init(ks[-5], 3, 3, embed_dim,
                                         in_chans * upscale ** 2)]
        elif upsampler == "nearest+conv":
            p["conv_before_upsample"] = [conv2d_init(ks[-6], 3, 3, embed_dim, num_feat)]
            p["conv_up1"] = conv2d_init(ks[-5], 3, 3, num_feat, num_feat)
            p["conv_up2"] = conv2d_init(ks[-4], 3, 3, num_feat, num_feat)
            p["conv_hr"] = conv2d_init(ks[-3], 3, 3, num_feat, num_feat)
            p["conv_last"] = conv2d_init(ks[-2], 3, 3, num_feat, in_chans)
        else:
            p["conv_last"] = conv2d_init(ks[-2], 3, 3, embed_dim, in_chans)
        return p

    @staticmethod
    def forward_features(params, x, depths, num_heads, window_size, mlp_ratio,
                         resi_connection="1conv", patch_norm=True):
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        if patch_norm and "patch_embed" in params:
            tokens = layer_norm(tokens, params["patch_embed"]["norm"])
        for li, layer in enumerate(params["layers"]):
            res = tokens
            t = tokens
            for j, bp in enumerate(layer["residual_group"]["blocks"]):
                shift = 0 if j % 2 == 0 else window_size // 2
                t = _swin_block(bp, t, (h, w), num_heads[li], window_size,
                                shift, mlp_ratio)
            img = t.reshape(b, h, w, c)
            img = conv2d(img, layer["conv"]["w"], layer["conv"]["b"], padding=1)
            tokens = img.reshape(b, h * w, c) + res
        tokens = layer_norm(tokens, params["norm"])
        return tokens.reshape(b, h, w, c)

    @staticmethod
    def apply(params, x, in_chans=3, embed_dim=96, depths=(6, 6, 6, 6),
              num_heads=(6, 6, 6, 6), window_size=7, mlp_ratio=4.0,
              upscale=2, img_range=1.0, upsampler="",
              resi_connection="1conv", patch_norm=True):
        """x: (B, H, W, C) in [0,1]; H, W must be multiples of window_size."""
        mean = jnp.asarray(RGB_MEAN, x.dtype) if in_chans == 3 else 0.0
        x = (x - mean) * img_range
        ff = lambda z: SwinIR.forward_features(
            params, z, depths, num_heads, window_size, mlp_ratio,
            resi_connection, patch_norm)
        c1 = lambda pp, z: conv2d(z, pp["w"], pp["b"], padding=1)

        if upsampler == "pixelshuffle":
            feat = c1(params["conv_first"], x)
            feat = c1(params["conv_after_body"], ff(feat)) + feat
            feat = leaky_relu(c1(params["conv_before_upsample"][0], feat), 0.01)
            out = c1(params["conv_last"],
                     _upsample_seq(params["upsample"], feat, upscale))
        elif upsampler == "pixelshuffledirect":
            feat = c1(params["conv_first"], x)
            feat = c1(params["conv_after_body"], ff(feat)) + feat
            out = pixel_shuffle(c1(params["upsample"][0], feat), upscale)
        elif upsampler == "nearest+conv":
            feat = c1(params["conv_first"], x)
            feat = c1(params["conv_after_body"], ff(feat)) + feat
            feat = leaky_relu(c1(params["conv_before_upsample"][0], feat), 0.01)
            feat = leaky_relu(c1(params["conv_up1"], resize_nearest(
                feat, (feat.shape[1] * 2, feat.shape[2] * 2))), 0.2)
            feat = leaky_relu(c1(params["conv_up2"], resize_nearest(
                feat, (feat.shape[1] * 2, feat.shape[2] * 2))), 0.2)
            out = c1(params["conv_last"], leaky_relu(c1(params["conv_hr"], feat), 0.2))
        else:
            feat = c1(params["conv_first"], x)
            res = c1(params["conv_after_body"], ff(feat)) + feat
            out = x + c1(params["conv_last"], res)
        return out / img_range + mean


def convert_swinir_checkpoint(sd):
    """Torch SwinIR state dict (numpy) -> param tree. Drops computed buffers
    (relative_position_index, attn_mask); keeps bias tables un-transposed."""
    from comfyui_keep_tpu.utils.checkpoint import convert_state_dict
    sd = {k: v for k, v in sd.items()
          if "relative_position_index" not in k and "attn_mask" not in k
          and k != "mean"}
    tree = convert_state_dict(sd)
    # conv_before_upsample Sequential -> list [conv]; upsample Sequential kept
    return tree
