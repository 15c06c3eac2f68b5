"""StyleGAN2 generator/discriminator — rebuild of reference
archs/stylegan2_arch.py (799 LoC), on the native op tier (ops/native.py
fused_leaky_relu + upfirdn2d, the reference's CUDA extensions).

NHWC. Per-sample modulated convolution uses the grouped-conv trick (batch in
the group dimension) so the whole batch is one conv on the MXU. Noise
injection uses the stored per-layer noise buffers (deterministic) or an
explicit rng.
"""
import math
from typing import List, Optional

import jax
import jax.numpy as jnp

from comfyui_keep_tpu.ops import conv2d, leaky_relu, linear
from comfyui_keep_tpu.ops.native import (fused_leaky_relu, upfirdn2d,
                                         make_resample_kernel)
from comfyui_keep_tpu.utils.registry import ARCH_REGISTRY

SQRT2 = math.sqrt(2.0)


def channels_table(channel_multiplier=2, narrow=1):
    return {
        "4": int(512 * narrow), "8": int(512 * narrow), "16": int(512 * narrow),
        "32": int(512 * narrow), "64": int(256 * channel_multiplier * narrow),
        "128": int(128 * channel_multiplier * narrow),
        "256": int(64 * channel_multiplier * narrow),
        "512": int(32 * channel_multiplier * narrow),
        "1024": int(16 * channel_multiplier * narrow),
    }


# -- upfirdn wrappers (stylegan2_arch.py:43-131) ----------------------------

def upfirdn_upsample(x, kernel2d, factor=2):
    k = kernel2d * (factor ** 2)
    pad = kernel2d.shape[0] - factor
    return upfirdn2d(x, k, up=factor, down=1,
                     pad=((pad + 1) // 2 + factor - 1, pad // 2))


def upfirdn_downsample(x, kernel2d, factor=2):
    pad = kernel2d.shape[0] - factor
    return upfirdn2d(x, kernel2d, up=1, down=factor,
                     pad=((pad + 1) // 2, pad // 2))


def upfirdn_smooth(x, kernel2d, upsample_factor=1, downsample_factor=1,
                   kernel_size=1):
    k = kernel2d
    if upsample_factor > 1:
        k = k * (upsample_factor ** 2)
        pad = (k.shape[0] - upsample_factor) - (kernel_size - 1)
        p = ((pad + 1) // 2 + upsample_factor - 1, pad // 2 + 1)
    elif downsample_factor > 1:
        pad = (k.shape[0] - downsample_factor) + (kernel_size - 1)
        p = ((pad + 1) // 2, pad // 2)
    else:
        raise NotImplementedError
    return upfirdn2d(x, k, up=1, down=1, pad=p)


# -- equalized layers --------------------------------------------------------

def equal_linear(p, x, lr_mul=1.0, activation=None):
    """p['w']: (in, out) raw (torch weight.T); scale=(1/sqrt(in))*lr_mul."""
    scale = (1.0 / math.sqrt(p["w"].shape[0])) * lr_mul
    bias = p.get("b")
    if activation == "fused_lrelu":
        out = x @ (p["w"] * scale)
        return fused_leaky_relu(out, bias * lr_mul)
    out = x @ (p["w"] * scale)
    if bias is not None:
        out = out + bias * lr_mul
    return out


def equal_conv2d(p, x, stride=1, padding=0):
    """p['w']: (kh, kw, cin, cout) raw normal; scale=1/sqrt(cin*k^2)."""
    kh, kw, cin, _ = p["w"].shape
    scale = 1.0 / math.sqrt(cin * kh * kw)
    return conv2d(x, p["w"] * scale, p.get("b"), stride=stride, padding=padding)


# -- modulated conv (stylegan2_arch.py:182-287) ------------------------------

def modulated_conv2d(p, x, style, demodulate=True, sample_mode=None,
                     kernel2d=None, eps=1e-8):
    """x: (B, H, W, Cin); style: (B, S). p: {'weight': (kh,kw,cin,cout) raw,
    'modulation': equal_linear params}."""
    b, h, w, cin = x.shape
    wgt = p["weight"]
    kh, kw, _, cout = wgt.shape
    scale = 1.0 / math.sqrt(cin * kh * kw)
    s = equal_linear(p["modulation"], style)  # (b, cin), bias_init 1
    weight = scale * wgt[None] * s[:, None, None, :, None]  # (b,kh,kw,cin,cout)
    if demodulate:
        demod = jax.lax.rsqrt(jnp.sum(weight ** 2, axis=(1, 2, 3)) + eps)
        weight = weight * demod[:, None, None, None, :]

    if sample_mode == "upsample":
        # grouped conv_transpose stride 2: dilate input, flipped kernel
        xg = x.transpose(1, 2, 0, 3).reshape(1, h, w, b * cin)
        k = jnp.flip(weight, (1, 2))  # (b,kh,kw,cin,cout)
        k = k.transpose(1, 2, 3, 0, 4).reshape(kh, kw, cin, b * cout)
        out = jax.lax.conv_general_dilated(
            xg, k, window_strides=(1, 1),
            padding=((kh - 1, kh - 1), (kw - 1, kw - 1)),
            lhs_dilation=(2, 2), feature_group_count=b,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        ho, wo = out.shape[1], out.shape[2]
        out = out.reshape(ho, wo, b, cout).transpose(2, 0, 1, 3)
        return upfirdn_smooth(out, kernel2d, upsample_factor=2, kernel_size=kh)
    if sample_mode == "downsample":
        x = upfirdn_smooth(x, kernel2d, downsample_factor=2, kernel_size=kh)
        h, w = x.shape[1], x.shape[2]
        xg = x.transpose(1, 2, 0, 3).reshape(1, h, w, b * cin)
        k = weight.transpose(1, 2, 3, 0, 4).reshape(kh, kw, cin, b * cout)
        out = jax.lax.conv_general_dilated(
            xg, k, window_strides=(2, 2), padding="VALID",
            feature_group_count=b, dimension_numbers=("NHWC", "HWIO", "NHWC"))
        ho, wo = out.shape[1], out.shape[2]
        return out.reshape(ho, wo, b, cout).transpose(2, 0, 1, 3)

    xg = x.transpose(1, 2, 0, 3).reshape(1, h, w, b * cin)
    k = weight.transpose(1, 2, 3, 0, 4).reshape(kh, kw, cin, b * cout)
    pad = kh // 2
    out = jax.lax.conv_general_dilated(
        xg, k, window_strides=(1, 1), padding=((pad, pad), (pad, pad)),
        feature_group_count=b, dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out.reshape(h, w, b, cout).transpose(2, 0, 1, 3)


def style_conv(p, x, style, noise=None, sample_mode=None, kernel2d=None,
               rng=None):
    out = modulated_conv2d(p["modulated_conv"], x, style, demodulate=True,
                           sample_mode=sample_mode, kernel2d=kernel2d)
    if noise is None:
        if rng is None:
            noise = jnp.zeros(out.shape[:3] + (1,), out.dtype)
        else:
            noise = jax.random.normal(rng, out.shape[:3] + (1,), out.dtype)
    out = out + p["weight"] * noise
    # FusedLeakyReLU with per-channel bias (ops/fused_act)
    return fused_leaky_relu(out, p["activate"]["bias"])


def to_rgb(p, x, style, skip=None, kernel2d=None):
    out = modulated_conv2d(p["modulated_conv"], x, style, demodulate=False)
    out = out + p["bias"]
    if skip is not None:
        skip = upfirdn_upsample(skip, kernel2d)
        out = out + skip
    return out


@ARCH_REGISTRY.register(name="StyleGAN2Generator")
class StyleGAN2Generator:
    @staticmethod
    def init(key, out_size, num_style_feat=512, num_mlp=8,
             channel_multiplier=2, narrow=1, lr_mlp=0.01):
        ch = channels_table(channel_multiplier, narrow)
        log_size = int(math.log2(out_size))
        num_layers = (log_size - 2) * 2 + 1
        ks = jax.random.split(key, 6)

        def el_init(k, din, dout, bias_val=0.0, lr_mul=1.0):
            return {"w": jax.random.normal(k, (din, dout)) / lr_mul,
                    "b": jnp.full((dout,), bias_val)}

        def mc_init(k, cin, cout, ksz, sfeat):
            k1, k2 = jax.random.split(k)
            return {"weight": jax.random.normal(k1, (ksz, ksz, cin, cout)),
                    "modulation": el_init(k2, sfeat, cin, bias_val=1.0)}

        def sc_init(k, cin, cout, sfeat):
            return {"modulated_conv": mc_init(k, cin, cout, 3, sfeat),
                    "weight": jnp.zeros(()),
                    "activate": {"bias": jnp.zeros((cout,))}}

        def rgb_init(k, cin, sfeat):
            return {"modulated_conv": mc_init(k, cin, 3, 1, sfeat),
                    "bias": jnp.zeros((1, 1, 1, 3))}

        p = {
            "style_mlp": [el_init(k, num_style_feat, num_style_feat,
                                  lr_mul=lr_mlp)
                          for k in jax.random.split(ks[0], num_mlp)],
            "constant_input": {"weight": jax.random.normal(
                ks[1], (1, 4, 4, ch["4"]))},
            "style_conv1": sc_init(ks[2], ch["4"], ch["4"], num_style_feat),
            "to_rgb1": rgb_init(ks[3], ch["4"], num_style_feat),
            "style_convs": [], "to_rgbs": [],
            "noises": {f"noise{i}": jax.random.normal(
                jax.random.fold_in(ks[4], i),
                (1, 2 ** ((i + 5) // 2), 2 ** ((i + 5) // 2), 1))
                for i in range(num_layers)},
        }
        cin = ch["4"]
        for i in range(3, log_size + 1):
            cout = ch[str(2 ** i)]
            kk = jax.random.fold_in(ks[5], i)
            p["style_convs"].append(sc_init(jax.random.fold_in(kk, 0),
                                            cin, cout, num_style_feat))
            p["style_convs"].append(sc_init(jax.random.fold_in(kk, 1),
                                            cout, cout, num_style_feat))
            p["to_rgbs"].append(rgb_init(jax.random.fold_in(kk, 2), cout,
                                         num_style_feat))
            cin = cout
        return p

    @staticmethod
    def style_mlp(params, x, lr_mlp=0.01):
        x = x * jax.lax.rsqrt(jnp.mean(x ** 2, axis=1, keepdims=True) + 1e-8)
        for lp in params["style_mlp"]:
            x = equal_linear(lp, x, lr_mul=lr_mlp, activation="fused_lrelu")
        return x

    @staticmethod
    def apply(params, styles, out_size, num_style_feat=512,
              input_is_latent=False, randomize_noise=False, rng=None,
              truncation=1.0, truncation_latent=None, lr_mlp=0.01,
              resample_kernel=(1, 3, 3, 1), return_latents=False):
        """styles: list of (B, S) codes -> (image (B,H,W,3), latent|None)."""
        k2d = jnp.asarray(make_resample_kernel(resample_kernel))
        log_size = int(math.log2(out_size))
        num_latent = log_size * 2 - 2
        num_layers = (log_size - 2) * 2 + 1

        if not input_is_latent:
            styles = [StyleGAN2Generator.style_mlp(params, s, lr_mlp)
                      for s in styles]
        if truncation < 1:
            styles = [truncation_latent + truncation * (s - truncation_latent)
                      for s in styles]
        if randomize_noise:
            assert rng is not None
            noise = [None] * num_layers
            rngs = jax.random.split(rng, num_layers)
        else:
            noise = [params["noises"][f"noise{i}"] for i in range(num_layers)]
            rngs = [None] * num_layers

        s0 = styles[0]
        latent = jnp.repeat(s0[:, None], num_latent, axis=1) if s0.ndim < 3 else s0

        b = latent.shape[0]
        out = jnp.tile(params["constant_input"]["weight"], (b, 1, 1, 1))
        out = style_conv(params["style_conv1"], out, latent[:, 0],
                         noise=noise[0], rng=rngs[0])
        skip = to_rgb(params["to_rgb1"], out, latent[:, 1])

        i = 1
        for li in range(len(params["to_rgbs"])):
            c1 = params["style_convs"][2 * li]
            c2 = params["style_convs"][2 * li + 1]
            out = style_conv(c1, out, latent[:, i], noise=noise[2 * li + 1],
                             sample_mode="upsample", kernel2d=k2d,
                             rng=rngs[2 * li + 1])
            out = style_conv(c2, out, latent[:, i + 1], noise=noise[2 * li + 2],
                             rng=rngs[2 * li + 2])
            skip = to_rgb(params["to_rgbs"][li], out, latent[:, i + 2], skip,
                          kernel2d=k2d)
            i += 2
        return (skip, latent) if return_latents else (skip, None)


def convert_stylegan2_generator(sd):
    """Torch StyleGAN2Generator state dict (numpy) -> param tree."""
    import numpy as np
    out = {"style_mlp": [], "style_convs": [], "to_rgbs": [], "noises": {}}

    def put(path, arr):
        node = out
        for p in path[:-1]:
            if isinstance(p, int):
                while len(node) <= p:
                    node.append({})
                node = node[p]
            else:
                node = node.setdefault(p, {} if not isinstance(
                    node.get(p), list) else node[p])
        node[path[-1]] = arr

    for k, v in sd.items():
        parts = k.split(".")
        if parts[0] == "style_mlp":
            idx = int(parts[1]) - 1  # index 0 is NormStyleCode (no params)
            while len(out["style_mlp"]) <= idx:
                out["style_mlp"].append({})
            out["style_mlp"][idx]["w" if parts[2] == "weight" else "b"] = \
                v.T if parts[2] == "weight" else v
        elif parts[0] == "constant_input":
            out["constant_input"] = {"weight": v.transpose(0, 2, 3, 1)}
        elif parts[0] == "noises":
            out["noises"][parts[1]] = v.transpose(0, 2, 3, 1)
        elif "modulated_conv" in parts:
            i = parts.index("modulated_conv")
            base = _g_path(out, parts[:i])
            mc = base.setdefault("modulated_conv", {})
            rest = parts[i + 1:]
            if rest == ["weight"]:
                mc["weight"] = v[0].transpose(2, 3, 1, 0)
            elif rest[0] == "modulation":
                mod = mc.setdefault("modulation", {})
                mod["w" if rest[1] == "weight" else "b"] = \
                    v.T if rest[1] == "weight" else v
        elif parts[-2:] == ["activate", "bias"]:
            _g_path(out, parts[:-2]).setdefault("activate", {})["bias"] = v
        elif parts[-1] == "weight" and v.ndim == 1 and v.shape[0] == 1:
            _g_path(out, parts[:-1])["weight"] = v.reshape(())
        elif parts[-1] == "bias" and v.ndim == 4:  # ToRGB bias (1,3,1,1)
            _g_path(out, parts[:-1])["bias"] = v.transpose(0, 2, 3, 1)
        else:  # pragma: no cover
            raise KeyError(f"unmapped stylegan2 key {k}")
    return out


def _g_path(out, parts):
    node = out
    for p in parts:
        if p.isdigit():
            p = int(p)
            while len(node) <= p:
                node.append({})
            node = node[p]
        else:
            if p not in node:
                node[p] = {}
            node = node[p]
    return node


def convert_stylegan2_discriminator(sd):
    """Torch StyleGAN2Discriminator state dict -> param tree."""
    out = {"conv_body": [], "final_linear": []}

    def body(i):
        while len(out["conv_body"]) <= i:
            out["conv_body"].append({})
        return out["conv_body"][i]

    for k, v in sd.items():
        parts = k.split(".")
        if parts[0] == "conv_body":
            i = int(parts[1])
            b = body(i)
            if i == 0:  # ConvLayer Sequential: 0=EqualConv2d, 1=FusedLeakyReLU
                if parts[2] == "0":
                    b.setdefault("conv", {})["w" if parts[3] == "weight" else "b"] = \
                        v.transpose(2, 3, 1, 0) if parts[3] == "weight" else v
                else:
                    b["act_bias"] = v
            else:  # ResBlock: conv1 (conv@0, act@1), conv2 (smooth@0, conv@1,
                   # act@2), skip (smooth@0, conv@1)
                sub = parts[2]
                d = b.setdefault(sub, {})
                layer_i = parts[3]
                if parts[4] == "weight":
                    d.setdefault("conv", {})["w"] = v.transpose(2, 3, 1, 0)
                elif (sub == "conv1" and layer_i == "1") or \
                        (sub == "conv2" and layer_i == "2"):
                    d["act_bias"] = v
                else:
                    d.setdefault("conv", {})["b"] = v
        elif parts[0] == "final_conv":
            fc = out.setdefault("final_conv", {})
            if parts[1] == "0":
                fc.setdefault("conv", {})["w" if parts[2] == "weight" else "b"] = \
                    v.transpose(2, 3, 1, 0) if parts[2] == "weight" else v
            else:
                fc["act_bias"] = v
        elif parts[0] == "final_linear":
            i = int(parts[1])
            while len(out["final_linear"]) <= i:
                out["final_linear"].append({})
            out["final_linear"][i]["w" if parts[2] == "weight" else "b"] = \
                v.T if parts[2] == "weight" else v
    return out


# -- discriminator -----------------------------------------------------------

def conv_layer(p, x, kernel_size, downsample=False, kernel2d=None,
               activate=True, bias=True):
    """ConvLayer (stylegan2_arch.py:654-703)."""
    if downsample:
        x = upfirdn_smooth(x, kernel2d, downsample_factor=2,
                           kernel_size=kernel_size)
        x = equal_conv2d(p["conv"], x, stride=2, padding=0)
    else:
        x = equal_conv2d(p["conv"], x, stride=1, padding=kernel_size // 2)
    if activate:
        if bias:
            x = fused_leaky_relu(x, p["act_bias"])
        else:
            x = leaky_relu(x, 0.2) * SQRT2
    return x


@ARCH_REGISTRY.register(name="StyleGAN2Discriminator")
class StyleGAN2Discriminator:
    @staticmethod
    def init(key, out_size, channel_multiplier=2, narrow=1):
        ch = channels_table(channel_multiplier, narrow)
        log_size = int(math.log2(out_size))

        def cl_init(k, cin, cout, ksz, bias_sep=True):
            p = {"conv": {"w": jax.random.normal(k, (ksz, ksz, cin, cout))}}
            if bias_sep:
                p["act_bias"] = jnp.zeros((cout,))
            return p

        ks = jax.random.split(key, log_size + 4)
        body = [cl_init(ks[0], 3, ch[str(out_size)], 1)]
        cin = ch[str(out_size)]
        for idx, i in enumerate(range(log_size, 2, -1)):
            cout = ch[str(2 ** (i - 1))]
            k = ks[idx + 1]
            body.append({
                "conv1": cl_init(jax.random.fold_in(k, 0), cin, cin, 3),
                "conv2": cl_init(jax.random.fold_in(k, 1), cin, cout, 3),
                "skip": {"conv": {"w": jax.random.normal(
                    jax.random.fold_in(k, 2), (1, 1, cin, cout))}},
            })
            cin = cout
        return {
            "conv_body": body,
            "final_conv": cl_init(ks[-3], cin + 1, ch["4"], 3),
            "final_linear": [
                {"w": jax.random.normal(ks[-2], (ch["4"] * 16, ch["4"])),
                 "b": jnp.zeros((ch["4"],))},
                {"w": jax.random.normal(ks[-1], (ch["4"], 1)),
                 "b": jnp.zeros((1,))},
            ],
        }

    @staticmethod
    def apply(params, x, out_size, stddev_group=4,
              resample_kernel=(1, 3, 3, 1)):
        k2d = jnp.asarray(make_resample_kernel(resample_kernel))
        out = conv_layer(params["conv_body"][0], x, 1)
        for blk in params["conv_body"][1:]:
            h = conv_layer(blk["conv1"], out, 3)
            h = conv_layer(blk["conv2"], h, 3, downsample=True, kernel2d=k2d)
            skip = conv_layer(blk["skip"], out, 1, downsample=True,
                              kernel2d=k2d, activate=False)
            out = (h + skip) / SQRT2

        b, h, w, c = out.shape
        group = min(b, stddev_group)
        std = out.reshape(group, b // group, h, w, 1, c)
        std = jnp.sqrt(std.var(axis=0) + 1e-8)
        std = std.mean(axis=(1, 2, 4), keepdims=True)[:, :, :, 0]
        std = jnp.tile(std.reshape(b // group, 1, 1, 1), (group, h, w, 1))
        out = jnp.concatenate([out, std], axis=-1)

        out = conv_layer(params["final_conv"], out, 3)
        # torch flattens NCHW order
        out = out.transpose(0, 3, 1, 2).reshape(b, -1)
        out = equal_linear(params["final_linear"][0], out,
                           activation="fused_lrelu")
        return equal_linear(params["final_linear"][1], out)
