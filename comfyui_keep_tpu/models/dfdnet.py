"""DFDNet — rebuild of reference archs/dfdnet_arch.py + dfdnet_util.py:
VGG-face features + facial-component dictionary swap with attention, SFT
upsampling decoder.

The dictionary-swap step slices variable-size part regions (data-dependent
shapes), so `apply` runs eagerly with concrete part locations (like the
reference, which only supports batch size 1); all tensor math is jnp.
"""
from typing import Dict, List, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from comfyui_keep_tpu.ops import (conv2d, conv2d_init, leaky_relu,
                                  resize_bilinear, upsample_nearest_2x)
from comfyui_keep_tpu.ops.resample import resize_nearest
from comfyui_keep_tpu.ops.spectral import spectral_norm_weight
from comfyui_keep_tpu.models.vgg import VGGFeatureExtractor
from comfyui_keep_tpu.models.layers import adaptive_instance_normalization
from comfyui_keep_tpu.utils.registry import ARCH_REGISTRY

PARTS = ("left_eye", "right_eye", "nose", "mouth")
FEATURE_SIZES = (256, 128, 64, 32)
CHANNEL_SIZES = (128, 256, 512, 512)
VGG_LAYERS = ("relu2_2", "relu3_4", "relu4_4", "conv5_4")

_BLUR_K = np.array([[1, 2, 1], [2, 4, 2], [1, 2, 1]], np.float32)
_BLUR_K = _BLUR_K / _BLUR_K.sum()


def _blur(x):
    c = x.shape[-1]
    k = jnp.asarray(_BLUR_K)[:, :, None, None]
    k = jnp.tile(k, (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)], feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _sn_conv_init(key, k, cin, cout, dilation=1):
    p = conv2d_init(key, k, k, cin, cout)
    u = jax.random.normal(jax.random.fold_in(key, 5), (cout,))
    p["u"] = u / jnp.linalg.norm(u)
    return p


def _sn_conv(p, x, k=3, dilation=1):
    w, _ = spectral_norm_weight(p["w"], p["u"])
    return conv2d(x, w, p.get("b"), padding=((k - 1) // 2) * dilation,
                  dilation=dilation)


def _attn_init(key, c):
    k1, k2 = jax.random.split(key)
    return [_sn_conv_init(k1, 3, c, c), None, _sn_conv_init(k2, 3, c, c)]


def _attn(p, x):
    return _sn_conv(p[2], leaky_relu(_sn_conv(p[0], x), 0.2))


def _msdilation_init(key, c, dilation=(4, 3, 2, 1)):
    ks = jax.random.split(key, 5)
    return {"conv_blocks": [
        [_sn_conv_init(jax.random.fold_in(k, 0), 3, c, c),
         None,
         _sn_conv_init(jax.random.fold_in(k, 1), 3, c, c)]
        for k in ks[:4]],
        "conv_fusion": _sn_conv_init(ks[4], 3, 4 * c, c),
        "dilation": dilation}


def _msdilation(p, x):
    outs = []
    for blk, d in zip(p["conv_blocks"], p["dilation"]):
        h = _sn_conv(blk[0], x, dilation=d)
        h = leaky_relu(h, 0.2)
        h = _sn_conv(blk[2], h, dilation=d)
        outs.append(h)
    out = jnp.concatenate(outs, -1)
    return _sn_conv(p["conv_fusion"], out) + x


def _upres_init(key, c):
    k1, k2 = jax.random.split(key)
    return {"body": [conv2d_init(k1, 3, 3, c, c), None,
                     conv2d_init(k2, 3, 3, c, c)]}


def _upres(p, x):
    h = conv2d(x, p["body"][0]["w"], p["body"][0]["b"], padding=1)
    h = leaky_relu(h, 0.2)
    h = conv2d(h, p["body"][2]["w"], p["body"][2]["b"], padding=1)
    return x + h


def _sft_up_init(key, cin, cout):
    ks = jax.random.split(key, 6)
    return {"conv1": [None, _sn_conv_init(ks[0], 3, cin, cout), None],
            "convup": [None, _sn_conv_init(ks[1], 3, cout, cout), None],
            "scale_block": [_sn_conv_init(ks[2], 3, cin, cout), None,
                            _sn_conv_init(ks[3], 3, cout, cout)],
            "shift_block": [_sn_conv_init(ks[4], 3, cin, cout), None,
                            _sn_conv_init(ks[5], 3, cout, cout), None]}


def _sft_up(p, x, updated_feat):
    out = _blur(x)
    out = leaky_relu(_sn_conv(p["conv1"][1], out), 0.04)
    scale = _sn_conv(p["scale_block"][2],
                     leaky_relu(_sn_conv(p["scale_block"][0], updated_feat), 0.2))
    shift = jax.nn.sigmoid(_sn_conv(
        p["shift_block"][2],
        leaky_relu(_sn_conv(p["shift_block"][0], updated_feat), 0.2)))
    out = out * scale + shift
    out = resize_bilinear(out, (out.shape[1] * 2, out.shape[2] * 2))
    return leaky_relu(_sn_conv(p["convup"][1], out), 0.2)


@ARCH_REGISTRY.register(name="DFDNet")
class DFDNet:
    @staticmethod
    def init(key, num_feat=64, dictionary=None, vgg_params=None):
        ks = jax.random.split(key, 12)
        params = {
            "vgg_extractor": vgg_params or VGGFeatureExtractor.init(ks[0]),
            "attn_blocks": {
                f"{name}_{fs}": _attn_init(
                    jax.random.fold_in(ks[1], hash((name, fs)) % 2 ** 31), c)
                for fs, c in zip(FEATURE_SIZES, CHANNEL_SIZES)
                for name in PARTS},
            "multi_scale_dilation": _msdilation_init(ks[2], num_feat * 8),
            "upsample0": _sft_up_init(ks[3], num_feat * 8, num_feat * 8),
            "upsample1": _sft_up_init(ks[4], num_feat * 8, num_feat * 4),
            "upsample2": _sft_up_init(ks[5], num_feat * 4, num_feat * 2),
            "upsample3": _sft_up_init(ks[6], num_feat * 2, num_feat),
            "upsample4": [_sn_conv_init(ks[7], 3, num_feat, num_feat), None,
                          _upres_init(ks[8], num_feat),
                          _upres_init(ks[9], num_feat),
                          conv2d_init(ks[10], 3, 3, num_feat, 3), None],
        }
        params["dict"] = dictionary or {}
        return params

    @staticmethod
    def _swap(params, vgg_feat, updated, dict_feats, loc, part, f_size):
        """Dictionary swap for one part (dfdnet_arch.py:108-132).
        dict_feats: (N, h, w, c) atoms; loc: concrete [x1, y1, x2, y2]."""
        x1, y1, x2, y2 = [int(v) for v in loc]
        part_feat = vgg_feat[:, y1:y2, x1:x2]
        dh, dw = dict_feats.shape[1], dict_feats.shape[2]
        part_resized = resize_bilinear(part_feat, (dh, dw))
        d = adaptive_instance_normalization(dict_feats, part_resized)
        sim = jnp.einsum("hwc,nhwc->n", part_resized[0], d)
        idx = jnp.argmax(jax.nn.softmax(sim))
        chosen = jax.lax.dynamic_index_in_dim(d, idx, axis=0)
        swap = resize_nearest(chosen, (y2 - y1, x2 - x1))
        attn = _attn(params["attn_blocks"][f"{part}_{f_size}"],
                     swap - part_feat)
        return updated.at[:, y1:y2, x1:x2].set(attn * swap + part_feat)

    @staticmethod
    def apply(params, x, part_locations, num_feat=64):
        """x: (1, 512, 512, 3) in [-1,1]; part_locations: list of 4 arrays
        (1, 4) [x1,y1,x2,y2] at 512 scale for eye_l/eye_r/nose/mouth."""
        feats = VGGFeatureExtractor.apply(params["vgg_extractor"], x,
                                          list(VGG_LAYERS), use_input_norm=True,
                                          range_norm=True)
        updated_feats = []
        for layer, f_size in zip(VGG_LAYERS, FEATURE_SIZES):
            vgg_feat = feats[layer]
            updated = vgg_feat
            for pi, part in enumerate(PARTS):
                loc = np.asarray(part_locations[pi][0]) // (512 // f_size)
                updated = DFDNet._swap(params, vgg_feat, updated,
                                       jnp.asarray(params["dict"][str(f_size)][part]),
                                       loc, part, f_size)
            updated_feats.append(updated)

        h = _msdilation(params["multi_scale_dilation"], feats["conv5_4"])
        h = _sft_up(params["upsample0"], h, updated_feats[3])
        h = _sft_up(params["upsample1"], h, updated_feats[2])
        h = _sft_up(params["upsample2"], h, updated_feats[1])
        h = _sft_up(params["upsample3"], h, updated_feats[0])
        u4 = params["upsample4"]
        h = leaky_relu(_sn_conv(u4[0], h), 0.2)
        h = _upres(u4[2], h)
        h = _upres(u4[3], h)
        h = conv2d(h, u4[4]["w"], u4[4]["b"], padding=1)
        return jnp.tanh(h)
