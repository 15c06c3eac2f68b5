"""StyleGAN2 bilinear variant — rebuild of reference
archs/stylegan2_bilinear_arch.py (614 LoC): identical topology to stylegan2
but up/down-sampling via bilinear interpolation instead of upfirdn FIR
resampling (used by the GFPGAN-family face priors). Reuses the stylegan2
modulation machinery.
"""
import math

import jax
import jax.numpy as jnp

from comfyui_keep_tpu.ops import resize_bilinear
from comfyui_keep_tpu.ops.native import fused_leaky_relu
from comfyui_keep_tpu.models.stylegan2 import (
    StyleGAN2Generator, equal_linear, channels_table)
from comfyui_keep_tpu.utils.registry import ARCH_REGISTRY


def _resize(x, factor):
    h = int(x.shape[1] * factor)
    w = int(x.shape[2] * factor)
    return resize_bilinear(x, (h, w), align_corners=False)


def modulated_conv2d_bilinear(p, x, style, demodulate=True, sample_mode=None,
                              eps=1e-8):
    """Bilinear resample BEFORE a plain grouped conv
    (stylegan2_bilinear_arch.py:121-155)."""
    wgt = p["weight"]
    kh, kw, cin, cout = wgt.shape
    scale = 1.0 / math.sqrt(cin * kh * kw)
    s = equal_linear(p["modulation"], style)
    weight = scale * wgt[None] * s[:, None, None, :, None]
    if demodulate:
        demod = jax.lax.rsqrt(jnp.sum(weight ** 2, axis=(1, 2, 3)) + eps)
        weight = weight * demod[:, None, None, None, :]
    if sample_mode == "upsample":
        x = _resize(x, 2)
    elif sample_mode == "downsample":
        x = _resize(x, 0.5)
    b, h, w, _ = x.shape
    xg = x.transpose(1, 2, 0, 3).reshape(1, h, w, b * cin)
    k = weight.transpose(1, 2, 3, 0, 4).reshape(kh, kw, cin, b * cout)
    pad = kh // 2
    out = jax.lax.conv_general_dilated(
        xg, k, (1, 1), ((pad, pad), (pad, pad)), feature_group_count=b,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out.reshape(h, w, b, cout).transpose(2, 0, 1, 3)


def style_conv_bilinear(p, x, style, noise=None, sample_mode=None, rng=None):
    out = modulated_conv2d_bilinear(p["modulated_conv"], x, style,
                                    sample_mode=sample_mode)
    if noise is None:
        noise = (jax.random.normal(rng, out.shape[:3] + (1,), out.dtype)
                 if rng is not None else jnp.zeros(out.shape[:3] + (1,), out.dtype))
    out = out + p["weight"] * noise
    return fused_leaky_relu(out, p["activate"]["bias"])


def to_rgb_bilinear(p, x, style, skip=None):
    out = modulated_conv2d_bilinear(p["modulated_conv"], x, style,
                                    demodulate=False)
    out = out + p["bias"]
    if skip is not None:
        out = out + _resize(skip, 2)
    return out


@ARCH_REGISTRY.register(name="StyleGAN2GeneratorBilinear")
class StyleGAN2GeneratorBilinear:
    init = StyleGAN2Generator.init  # identical parameter structure

    @staticmethod
    def apply(params, styles, out_size, num_style_feat=512,
              input_is_latent=False, randomize_noise=False, rng=None,
              truncation=1.0, truncation_latent=None, lr_mlp=0.01,
              return_latents=False):
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
            noise = [None] * num_layers
            rngs = jax.random.split(rng, num_layers)
        else:
            noise = [params["noises"][f"noise{i}"] for i in range(num_layers)]
            rngs = [None] * num_layers
        s0 = styles[0]
        latent = jnp.repeat(s0[:, None], num_latent, axis=1) if s0.ndim < 3 else s0
        b = latent.shape[0]
        out = jnp.tile(params["constant_input"]["weight"], (b, 1, 1, 1))
        out = style_conv_bilinear(params["style_conv1"], out, latent[:, 0],
                                  noise=noise[0], rng=rngs[0])
        skip = to_rgb_bilinear(params["to_rgb1"], out, latent[:, 1])
        i = 1
        for li in range(len(params["to_rgbs"])):
            out = style_conv_bilinear(params["style_convs"][2 * li], out,
                                      latent[:, i], noise=noise[2 * li + 1],
                                      sample_mode="upsample", rng=rngs[2 * li + 1])
            out = style_conv_bilinear(params["style_convs"][2 * li + 1], out,
                                      latent[:, i + 1], noise=noise[2 * li + 2],
                                      rng=rngs[2 * li + 2])
            skip = to_rgb_bilinear(params["to_rgbs"][li], out, latent[:, i + 2],
                                   skip)
            i += 2
        return (skip, latent) if return_latents else (skip, None)
