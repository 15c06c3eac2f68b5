"""ParseNet face parser — rebuild of reference wm_facelib/parsing/parsenet.py
(140-195): reflection-pad conv encoder (512→32), 10-block residual body,
nearest-upsample decoder, 19-class mask + rgb heads. BN inference form;
LeakyReLU(0.2). NHWC.

Param tree mirrors the torch state dict (encoder.N.conv2d / .norm.norm /
residual conv1/conv2/shortcut_func) so the generic converter applies.
"""
from typing import Dict, List

import jax
import jax.numpy as jnp

from comfyui_keep_tpu.ops import (conv2d, conv2d_init, batch_norm,
                                  batch_norm_init, leaky_relu,
                                  upsample_nearest_2x)
from comfyui_keep_tpu.utils.registry import ARCH_REGISTRY


def _reflect_pad(x, p):
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")


def _conv_layer_init(key, cin, cout, k=3, norm=False, bias=None):
    if bias is None:
        bias = not norm
    p = {"conv2d": conv2d_init(key, k, k, cin, cout, bias=bias)}
    if norm:
        p["norm"] = {"norm": batch_norm_init(cout)}
    return p


def _conv_layer(p, x, k=3, scale="none", norm=False, relu=False):
    """ConvLayer (parsenet.py:75-111): [up] -> reflect-pad -> conv[stride] ->
    [bn] -> [leaky]."""
    if scale == "up":
        x = upsample_nearest_2x(x)
    x = _reflect_pad(x, -(-(k - 1) // 2))  # ceil((k-1)/2), parsenet.py:100
    stride = 2 if scale == "down" else 1
    x = conv2d(x, p["conv2d"]["w"], p["conv2d"].get("b"), stride=stride)
    if norm:
        x = batch_norm(x, p["norm"]["norm"])
    if relu:
        x = leaky_relu(x, 0.2)
    return x


def _resblock_init(key, cin, cout, scale="none"):
    ks = jax.random.split(key, 3)
    p = {"conv1": _conv_layer_init(ks[0], cin, cout, norm=True),
         "conv2": _conv_layer_init(ks[1], cout, cout, norm=True)}
    if not (scale == "none" and cin == cout):
        p["shortcut_func"] = _conv_layer_init(ks[2], cin, cout, norm=False)
    return p


def _resblock(p, x, cin, cout, scale="none"):
    scale_conf = {"down": ("none", "down"), "up": ("up", "none"),
                  "none": ("none", "none")}[scale]
    if "shortcut_func" in p:
        identity = _conv_layer(p["shortcut_func"], x, scale=scale)
    else:
        identity = x
    h = _conv_layer(p["conv1"], x, scale=scale_conf[0], norm=True, relu=True)
    h = _conv_layer(p["conv2"], h, scale=scale_conf[1], norm=True, relu=False)
    return identity + h


def _channels(in_size=512, out_size=512, min_feat_size=32, base_ch=64,
              ch_range=(32, 256)):
    lo, hi = ch_range
    clip = lambda c: max(lo, min(c, hi))
    import math
    down = int(math.log2(in_size // min(in_size, min_feat_size)))
    up = int(math.log2(out_size // min(in_size, min_feat_size)))
    enc, head = [], base_ch
    for _ in range(down):
        enc.append((clip(head), clip(head * 2)))
        head *= 2
    body_ch = clip(head)
    dec = []
    for _ in range(up):
        dec.append((clip(head), clip(head // 2)))
        head //= 2
    return enc, body_ch, dec, clip(head), clip, down, up


@ARCH_REGISTRY.register(name="ParseNet")
class ParseNet:
    @staticmethod
    def init(key, in_size=512, out_size=512, min_feat_size=32, base_ch=64,
             parsing_ch=19, res_depth=10):
        enc, body_ch, dec, out_ch, _, down, up = _channels(
            in_size, out_size, min_feat_size, base_ch)
        ks = jax.random.split(key, 4 + down + res_depth + up)
        ki = iter(ks)
        encoder: List = [_conv_layer_init(next(ki), 3, base_ch)]
        for cin, cout in enc:
            # scale matters: down/up blocks always carry a shortcut conv
            # (parsenet.py ResidualBlock), even when cin == cout
            encoder.append(_resblock_init(next(ki), cin, cout, scale="down"))
        body = [_resblock_init(next(ki), body_ch, body_ch) for _ in range(res_depth)]
        decoder = [_resblock_init(next(ki), cin, cout, scale="up")
                   for cin, cout in dec]
        return {
            "encoder": encoder, "body": body, "decoder": decoder,
            "out_img_conv": _conv_layer_init(next(ki), out_ch, 3),
            "out_mask_conv": _conv_layer_init(next(ki), out_ch, parsing_ch),
        }

    @staticmethod
    def apply(params, x, in_size=512, out_size=512, min_feat_size=32,
              base_ch=64, res_depth=10):
        """x: (B, H, W, 3) in [-1, 1] -> (mask logits (B,H,W,19), rgb)."""
        enc, body_ch, dec, out_ch, _, down, up = _channels(
            in_size, out_size, min_feat_size, base_ch)
        h = _conv_layer(params["encoder"][0], x)
        for p, (cin, cout) in zip(params["encoder"][1:], enc):
            h = _resblock(p, h, cin, cout, scale="down")
        feat = h
        for p in params["body"]:
            h = _resblock(p, h, body_ch, body_ch)
        h = feat + h
        for p, (cin, cout) in zip(params["decoder"], dec):
            h = _resblock(p, h, cin, cout, scale="up")
        out_img = _conv_layer(params["out_img_conv"], h)
        out_mask = _conv_layer(params["out_mask_conv"], h)
        return out_mask, out_img


def convert_parsenet_checkpoint(sd):
    from comfyui_keep_tpu.utils.checkpoint import convert_state_dict
    return convert_state_dict(sd)


def make_parser_fn(params, jit=True):
    """Returns parser(face_rgb_pm1 (1,512,512,3)) -> (1,512,512,19) logits —
    the FaceRestoreHelper plug-in interface."""
    import jax as _jax

    def fn(x):
        mask, _ = ParseNet.apply(params, x)
        return mask

    return _jax.jit(fn) if jit else fn
