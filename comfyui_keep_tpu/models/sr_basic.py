"""Single-image SR upscaler family, NHWC rebuilds of the reference archs:
RRDBNet/ESRGAN (rrdbnet_arch.py, 119 LoC), SRVGGNetCompact (srvgg_arch.py),
MSRResNet (srresnet_arch.py), EDSR (edsr_arch.py). These serve as the
bg/face upscalers of the pipeline (spandrel UPSCALE_MODEL equivalents) and
as registry-parity archs.
"""
import math
from typing import List

import jax
import jax.numpy as jnp

from comfyui_keep_tpu.ops import (conv2d, conv2d_init, leaky_relu, relu,
                                  resize_bilinear, upsample_nearest_2x)
from comfyui_keep_tpu.ops.resample import resize_nearest
from comfyui_keep_tpu.utils.registry import ARCH_REGISTRY


def pixel_shuffle(x, r: int):
    """torch nn.PixelShuffle semantics, NHWC: (B,H,W,C*r^2) -> (B,Hr,Wr,C)."""
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * r, w * r, c)


def pixel_unshuffle(x, r: int):
    """Inverse (arch_util.pixel_unshuffle): (B,Hr,Wr,C) -> (B,H,W,C*r^2)."""
    b, hr, wr, c = x.shape
    h, w = hr // r, wr // r
    x = x.reshape(b, h, r, w, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, h, w, c * r * r)


def _conv(p, x, act=None, slope=0.2):
    x = conv2d(x, p["w"], p["b"], padding=1)
    if act == "lrelu":
        x = leaky_relu(x, slope)
    elif act == "relu":
        x = relu(x)
    elif act == "prelu":
        x = jnp.where(x >= 0, x, x * p["prelu_w"])
    return x


def _res_block_nobn_init(key, nf):
    k1, k2 = jax.random.split(key)
    return {"conv1": conv2d_init(k1, 3, 3, nf, nf), "conv2": conv2d_init(k2, 3, 3, nf, nf)}


def _res_block_nobn(p, x, res_scale=1.0):
    out = _conv(p["conv2"], relu(_conv(p["conv1"], x)))
    return x + out * res_scale


# ---------------------------------------------------------------------------
# RRDBNet (ESRGAN / RealESRGAN generator)
# ---------------------------------------------------------------------------

def _rdb_init(key, nf, gc):
    ks = jax.random.split(key, 5)
    return {f"conv{i+1}": conv2d_init(ks[i], 3, 3, nf + i * gc,
                                      gc if i < 4 else nf) for i in range(5)}


def _rdb(p, x):
    x1 = leaky_relu(_conv(p["conv1"], x), 0.2)
    x2 = leaky_relu(conv2d(jnp.concatenate([x, x1], -1), p["conv2"]["w"], p["conv2"]["b"], padding=1), 0.2)
    x3 = leaky_relu(conv2d(jnp.concatenate([x, x1, x2], -1), p["conv3"]["w"], p["conv3"]["b"], padding=1), 0.2)
    x4 = leaky_relu(conv2d(jnp.concatenate([x, x1, x2, x3], -1), p["conv4"]["w"], p["conv4"]["b"], padding=1), 0.2)
    x5 = conv2d(jnp.concatenate([x, x1, x2, x3, x4], -1), p["conv5"]["w"], p["conv5"]["b"], padding=1)
    return x5 * 0.2 + x


@ARCH_REGISTRY.register(name="RRDBNet")
class RRDBNet:
    @staticmethod
    def init(key, num_in_ch=3, num_out_ch=3, scale=4, num_feat=64,
             num_block=23, num_grow_ch=32):
        cin = num_in_ch * {2: 4, 1: 16}.get(scale, 1)
        ks = jax.random.split(key, num_block + 6)
        return {
            "conv_first": conv2d_init(ks[0], 3, 3, cin, num_feat),
            "body": [{"rdb1": _rdb_init(jax.random.fold_in(k, 0), num_feat, num_grow_ch),
                      "rdb2": _rdb_init(jax.random.fold_in(k, 1), num_feat, num_grow_ch),
                      "rdb3": _rdb_init(jax.random.fold_in(k, 2), num_feat, num_grow_ch)}
                     for k in ks[1:num_block + 1]],
            "conv_body": conv2d_init(ks[-5], 3, 3, num_feat, num_feat),
            "conv_up1": conv2d_init(ks[-4], 3, 3, num_feat, num_feat),
            "conv_up2": conv2d_init(ks[-3], 3, 3, num_feat, num_feat),
            "conv_hr": conv2d_init(ks[-2], 3, 3, num_feat, num_feat),
            "conv_last": conv2d_init(ks[-1], 3, 3, num_feat, num_out_ch),
        }

    @staticmethod
    def apply(params, x, scale=4):
        """x: (B,H,W,C) in [0,1] -> (B, 4H', 4W', C) where H' accounts for
        pixel-unshuffle at scale 1/2 (rrdbnet_arch.py:107-122)."""
        if scale == 2:
            x = pixel_unshuffle(x, 2)
        elif scale == 1:
            x = pixel_unshuffle(x, 4)
        feat = _conv(params["conv_first"], x)
        h = feat
        for bp in params["body"]:
            h = _rdb(bp["rdb3"], _rdb(bp["rdb2"], _rdb(bp["rdb1"], h))) * 0.2 + h
        feat = feat + _conv(params["conv_body"], h)
        feat = leaky_relu(_conv(params["conv_up1"], upsample_nearest_2x(feat)), 0.2)
        feat = leaky_relu(_conv(params["conv_up2"], upsample_nearest_2x(feat)), 0.2)
        return _conv(params["conv_last"], leaky_relu(_conv(params["conv_hr"], feat), 0.2))


# ---------------------------------------------------------------------------
# SRVGGNetCompact (realesr-general / animevideo)
# ---------------------------------------------------------------------------

@ARCH_REGISTRY.register(name="SRVGGNetCompact")
class SRVGGNetCompact:
    @staticmethod
    def init(key, num_in_ch=3, num_out_ch=3, num_feat=64, num_conv=16,
             upscale=4, act_type="prelu"):
        ks = jax.random.split(key, num_conv + 2)
        body: List = []
        body.append(conv2d_init(ks[0], 3, 3, num_in_ch, num_feat))
        body.append({"prelu_w": jnp.full((num_feat,), 0.25)} if act_type == "prelu" else None)
        for i in range(num_conv):
            body.append(conv2d_init(ks[i + 1], 3, 3, num_feat, num_feat))
            body.append({"prelu_w": jnp.full((num_feat,), 0.25)} if act_type == "prelu" else None)
        body.append(conv2d_init(ks[-1], 3, 3, num_feat, num_out_ch * upscale ** 2))
        return {"body": body}

    @staticmethod
    def apply(params, x, upscale=4, act_type="prelu"):
        out = x
        body = params["body"]
        i = 0
        while i < len(body):
            out = _conv(body[i], out)
            if i + 1 < len(body) - 1:
                ap = body[i + 1]
                if act_type == "prelu":
                    out = jnp.where(out >= 0, out, out * ap["prelu_w"])
                elif act_type == "relu":
                    out = relu(out)
                else:
                    out = leaky_relu(out, 0.1)
            i += 2
        out = pixel_shuffle(out, upscale)
        base = resize_nearest(x, (x.shape[1] * upscale, x.shape[2] * upscale))
        return out + base


# ---------------------------------------------------------------------------
# MSRResNet
# ---------------------------------------------------------------------------

@ARCH_REGISTRY.register(name="MSRResNet")
class MSRResNet:
    @staticmethod
    def init(key, num_in_ch=3, num_out_ch=3, num_feat=64, num_block=16, upscale=4):
        ks = jax.random.split(key, num_block + 5)
        p = {"conv_first": conv2d_init(ks[0], 3, 3, num_in_ch, num_feat),
             "body": [_res_block_nobn_init(k, num_feat) for k in ks[1:num_block + 1]],
             "conv_hr": conv2d_init(ks[-2], 3, 3, num_feat, num_feat),
             "conv_last": conv2d_init(ks[-1], 3, 3, num_feat, num_out_ch)}
        if upscale == 4:
            p["upconv1"] = conv2d_init(ks[-4], 3, 3, num_feat, num_feat * 4)
            p["upconv2"] = conv2d_init(ks[-3], 3, 3, num_feat, num_feat * 4)
        else:
            p["upconv1"] = conv2d_init(ks[-4], 3, 3, num_feat, num_feat * upscale ** 2)
        return p

    @staticmethod
    def apply(params, x, upscale=4):
        feat = leaky_relu(_conv(params["conv_first"], x), 0.1)
        out = feat
        for bp in params["body"]:
            out = _res_block_nobn(bp, out)
        if upscale == 4:
            out = leaky_relu(pixel_shuffle(_conv(params["upconv1"], out), 2), 0.1)
            out = leaky_relu(pixel_shuffle(_conv(params["upconv2"], out), 2), 0.1)
        else:
            out = leaky_relu(pixel_shuffle(_conv(params["upconv1"], out), upscale), 0.1)
        out = _conv(params["conv_last"], leaky_relu(_conv(params["conv_hr"], out), 0.1))
        base = resize_bilinear(x, (x.shape[1] * upscale, x.shape[2] * upscale),
                               align_corners=False)
        return out + base


# ---------------------------------------------------------------------------
# EDSR
# ---------------------------------------------------------------------------

def _upsample_seq_init(key, scale, nf):
    convs = []
    if (scale & (scale - 1)) == 0:
        for i in range(int(math.log2(scale))):
            convs.append(conv2d_init(jax.random.fold_in(key, i), 3, 3, nf, 4 * nf))
            convs.append(None)
    elif scale == 3:
        convs = [conv2d_init(key, 3, 3, nf, 9 * nf), None]
    return convs


def _upsample_seq(convs, x, scale):
    if (scale & (scale - 1)) == 0:
        for i in range(int(math.log2(scale))):
            x = pixel_shuffle(_conv(convs[2 * i], x), 2)
    elif scale == 3:
        x = pixel_shuffle(_conv(convs[0], x), 3)
    return x


@ARCH_REGISTRY.register(name="EDSR")
class EDSR:
    RGB_MEAN = (0.4488, 0.4371, 0.4040)

    @staticmethod
    def init(key, num_in_ch=3, num_out_ch=3, num_feat=64, num_block=16, upscale=4):
        ks = jax.random.split(key, num_block + 4)
        return {"conv_first": conv2d_init(ks[0], 3, 3, num_in_ch, num_feat),
                "body": [_res_block_nobn_init(k, num_feat) for k in ks[1:num_block + 1]],
                "conv_after_body": conv2d_init(ks[-3], 3, 3, num_feat, num_feat),
                "upsample": _upsample_seq_init(ks[-2], upscale, num_feat),
                "conv_last": conv2d_init(ks[-1], 3, 3, num_feat, num_out_ch)}

    @staticmethod
    def apply(params, x, upscale=4, res_scale=1.0, img_range=255.0):
        mean = jnp.asarray(EDSR.RGB_MEAN, x.dtype)
        x = (x - mean) * img_range
        feat = _conv(params["conv_first"], x)
        out = feat
        for bp in params["body"]:
            out = _res_block_nobn(bp, out, res_scale)
        out = _conv(params["conv_after_body"], out) + feat
        out = _conv(params["conv_last"], _upsample_seq(params["upsample"], out, upscale))
        return out / img_range + mean
