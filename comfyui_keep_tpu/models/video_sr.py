"""Video SR archs: BasicVSR / IconVSR pieces (basicvsr_arch.py), EDVR with
PCD deformable alignment + TSA fusion (edvr_arch.py), BasicVSR++ with
second-order flow-guided deformable alignment (basicvsrpp_arch.py).

NHWC; recurrent propagation uses lax.scan; deformable alignment runs on the
native DCN (ops/native.py) — the reference requires the CUDA dcn extension
here (SURVEY.md §2.9), our build runs it on any backend.
"""
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from comfyui_keep_tpu.ops import (conv2d, conv2d_init, leaky_relu, relu,
                                  resize_bilinear, flow_warp, max_pool,
                                  avg_pool_2x)
from comfyui_keep_tpu.ops.native import deform_conv2d
from comfyui_keep_tpu.models.sr_basic import (pixel_shuffle,
                                              _res_block_nobn,
                                              _res_block_nobn_init)


def _conv(p, x, act=None):
    """same-padding conv inferring pad from the kernel size."""
    pad = (p["w"].shape[0] - 1) // 2
    x = conv2d(x, p["w"], p.get("b"), padding=pad)
    if act == "lrelu":
        x = leaky_relu(x, 0.1)
    return x
from comfyui_keep_tpu.models.spynet import SpyNet
from comfyui_keep_tpu.utils.registry import ARCH_REGISTRY


def _avg_pool3s2(x):
    """AvgPool2d(3, stride=2, padding=1) with count_include_pad=True."""
    s = jax.lax.reduce_window(
        x.reshape((-1,) + x.shape[-3:]), 0.0, jax.lax.add,
        (1, 3, 3, 1), (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)]) / 9.0
    return s.reshape(x.shape[:-3] + s.shape[1:])


# ---------------------------------------------------------------------------
# shared blocks
# ---------------------------------------------------------------------------

def conv_res_blocks_init(key, cin, cout, num_block):
    ks = jax.random.split(key, num_block + 1)
    main = [conv2d_init(ks[0], 3, 3, cin, cout), None,
            [_res_block_nobn_init(k, cout) for k in ks[1:]]]
    return {"main": main}


def conv_res_blocks(p, x):
    x = leaky_relu(conv2d(x, p["main"][0]["w"], p["main"][0]["b"], padding=1), 0.1)
    for bp in p["main"][2]:
        x = _res_block_nobn(bp, x)
    return x


# ---------------------------------------------------------------------------
# BasicVSR (basicvsr_arch.py:12-101)
# ---------------------------------------------------------------------------

@ARCH_REGISTRY.register(name="BasicVSR")
class BasicVSR:
    @staticmethod
    def init(key, num_feat=64, num_block=15):
        ks = jax.random.split(key, 8)
        return {
            "spynet": SpyNet.init(ks[0]),
            "backward_trunk": conv_res_blocks_init(ks[1], num_feat + 3, num_feat, num_block),
            "forward_trunk": conv_res_blocks_init(ks[2], num_feat + 3, num_feat, num_block),
            "fusion": conv2d_init(ks[3], 1, 1, num_feat * 2, num_feat),
            "upconv1": conv2d_init(ks[4], 3, 3, num_feat, num_feat * 4),
            "upconv2": conv2d_init(ks[5], 3, 3, num_feat, 64 * 4),
            "conv_hr": conv2d_init(ks[6], 3, 3, 64, 64),
            "conv_last": conv2d_init(ks[7], 3, 3, 64, 3),
        }

    @staticmethod
    def get_flows(params, x):
        b, t, h, w, c = x.shape
        x1 = x[:, :-1].reshape(-1, h, w, c)
        x2 = x[:, 1:].reshape(-1, h, w, c)
        flows_backward = SpyNet.apply(params["spynet"], x1, x2).reshape(
            b, t - 1, h, w, 2)
        flows_forward = SpyNet.apply(params["spynet"], x2, x1).reshape(
            b, t - 1, h, w, 2)
        return flows_forward, flows_backward

    @staticmethod
    def apply(params, x, num_feat=64):
        """x: (B, T, H, W, 3) in [0,1] -> (B, T, 4H, 4W, 3)."""
        b, t, h, w, _ = x.shape
        flows_forward, flows_backward = BasicVSR.get_flows(params, x)

        def bwd_step(feat_prop, inp):
            x_i, flow, first = inp
            warped = flow_warp(feat_prop, flow)
            feat_prop = jnp.where(first, feat_prop, warped)
            feat_prop = conv_res_blocks(params["backward_trunk"],
                                        jnp.concatenate([x_i, feat_prop], -1))
            return feat_prop, feat_prop

        zeros = jnp.zeros((b, h, w, num_feat), x.dtype)
        flows_b_pad = jnp.concatenate(
            [flows_backward, jnp.zeros((b, 1, h, w, 2), x.dtype)], axis=1)
        first_flags = (jnp.arange(t)[::-1] == t - 1)
        _, out_b = jax.lax.scan(
            bwd_step, zeros,
            (jnp.moveaxis(x[:, ::-1], 1, 0),
             jnp.moveaxis(flows_b_pad[:, ::-1], 1, 0), first_flags))
        out_b = out_b[::-1]  # (t, b, h, w, c)

        def fwd_step(feat_prop, inp):
            x_i, flow, first, feat_b = inp
            warped = flow_warp(feat_prop, flow)
            feat_prop = jnp.where(first, feat_prop, warped)
            feat_prop = conv_res_blocks(params["forward_trunk"],
                                        jnp.concatenate([x_i, feat_prop], -1))
            out = jnp.concatenate([feat_b, feat_prop], -1)
            out = leaky_relu(conv2d(out, params["fusion"]["w"],
                                    params["fusion"]["b"]), 0.1)
            out = leaky_relu(pixel_shuffle(_conv(params["upconv1"], out), 2), 0.1)
            out = leaky_relu(pixel_shuffle(_conv(params["upconv2"], out), 2), 0.1)
            out = leaky_relu(_conv(params["conv_hr"], out), 0.1)
            out = _conv(params["conv_last"], out)
            base = resize_bilinear(x_i, (x_i.shape[1] * 4, x_i.shape[2] * 4))
            return feat_prop, out + base

        flows_f_pad = jnp.concatenate(
            [jnp.zeros((b, 1, h, w, 2), x.dtype), flows_forward], axis=1)
        first_flags_f = (jnp.arange(t) == 0)
        _, outs = jax.lax.scan(
            fwd_step, zeros,
            (jnp.moveaxis(x, 1, 0), jnp.moveaxis(flows_f_pad, 1, 0),
             first_flags_f, out_b))
        return jnp.moveaxis(outs, 0, 1)


# ---------------------------------------------------------------------------
# EDVR (edvr_arch.py)
# ---------------------------------------------------------------------------

def _dcn_pack_init(key, cin, cout, deformable_groups):
    k1, k2 = jax.random.split(key)
    p = conv2d_init(k1, 3, 3, cin, cout)
    p["conv_offset"] = conv2d_init(k2, 3, 3, cout, deformable_groups * 27)
    # reference zero-inits the offset conv (ModulatedDeformConvPack.init_weights)
    p["conv_offset"]["w"] = jnp.zeros_like(p["conv_offset"]["w"])
    p["conv_offset"]["b"] = jnp.zeros_like(p["conv_offset"]["b"])
    return p


def _dcn_pack(p, x, feat, deformable_groups=8):
    """DCNv2Pack (arch_util.py:205-231): offsets from a second feature map."""
    out = conv2d(feat, p["conv_offset"]["w"], p["conv_offset"]["b"], padding=1)
    o1, o2, m = jnp.split(out, 3, axis=-1)
    offset = jnp.concatenate([o1, o2], axis=-1)
    mask = jax.nn.sigmoid(m)
    return deform_conv2d(x, offset, p["w"], p.get("b"), stride=1, padding=1,
                         deformable_groups=deformable_groups, mask=mask)


def pcd_alignment_init(key, num_feat=64, deformable_groups=8):
    ks = jax.random.split(key, 16)
    ki = iter(ks)
    p = {"offset_conv1": {}, "offset_conv2": {}, "offset_conv3": {},
         "dcn_pack": {}, "feat_conv": {}}
    for i in range(3, 0, -1):
        lv = f"l{i}"
        p["offset_conv1"][lv] = conv2d_init(next(ki), 3, 3, num_feat * 2, num_feat)
        if i == 3:
            p["offset_conv2"][lv] = conv2d_init(next(ki), 3, 3, num_feat, num_feat)
        else:
            p["offset_conv2"][lv] = conv2d_init(next(ki), 3, 3, num_feat * 2, num_feat)
            p["offset_conv3"][lv] = conv2d_init(next(ki), 3, 3, num_feat, num_feat)
        p["dcn_pack"][lv] = _dcn_pack_init(next(ki), num_feat, num_feat,
                                           deformable_groups)
        if i < 3:
            p["feat_conv"][lv] = conv2d_init(next(ki), 3, 3, num_feat * 2, num_feat)
    p["cas_offset_conv1"] = conv2d_init(next(ki), 3, 3, num_feat * 2, num_feat)
    p["cas_offset_conv2"] = conv2d_init(next(ki), 3, 3, num_feat, num_feat)
    p["cas_dcnpack"] = _dcn_pack_init(next(ki), num_feat, num_feat,
                                      deformable_groups)
    return p


def pcd_alignment(p, nbr_feat_l, ref_feat_l, deformable_groups=8):
    """Pyramid-cascading deformable alignment (edvr_arch.py:9-99)."""
    up = lambda z: resize_bilinear(z, (z.shape[1] * 2, z.shape[2] * 2))
    upsampled_offset, upsampled_feat = None, None
    feat = None
    for i in range(3, 0, -1):
        lv = f"l{i}"
        offset = jnp.concatenate([nbr_feat_l[i - 1], ref_feat_l[i - 1]], -1)
        offset = leaky_relu(_conv(p["offset_conv1"][lv], offset), 0.1)
        if i == 3:
            offset = leaky_relu(_conv(p["offset_conv2"][lv], offset), 0.1)
        else:
            offset = leaky_relu(_conv(p["offset_conv2"][lv],
                                      jnp.concatenate([offset, upsampled_offset], -1)), 0.1)
            offset = leaky_relu(_conv(p["offset_conv3"][lv], offset), 0.1)
        feat = _dcn_pack(p["dcn_pack"][lv], nbr_feat_l[i - 1], offset,
                         deformable_groups)
        if i < 3:
            feat = _conv(p["feat_conv"][lv],
                         jnp.concatenate([feat, upsampled_feat], -1))
        if i > 1:
            feat = leaky_relu(feat, 0.1)
            upsampled_offset = up(offset) * 2
            upsampled_feat = up(feat)
    offset = jnp.concatenate([feat, ref_feat_l[0]], -1)
    offset = leaky_relu(_conv(p["cas_offset_conv2"],
                              leaky_relu(_conv(p["cas_offset_conv1"], offset), 0.1)), 0.1)
    return leaky_relu(_dcn_pack(p["cas_dcnpack"], feat, offset,
                                deformable_groups), 0.1)


def tsa_fusion_init(key, num_feat=64, num_frame=5):
    names = ["temporal_attn1", "temporal_attn2", "spatial_attn3",
             "spatial_attn5", "spatial_attn_l2", "spatial_attn_l3"]
    ones = ["feat_fusion", "spatial_attn1", "spatial_attn2", "spatial_attn4",
            "spatial_attn_l1", "spatial_attn_add1", "spatial_attn_add2"]
    ks = jax.random.split(key, len(names) + len(ones))
    p = {}
    dims = {
        "temporal_attn1": (3, num_feat, num_feat),
        "temporal_attn2": (3, num_feat, num_feat),
        "feat_fusion": (1, num_frame * num_feat, num_feat),
        "spatial_attn1": (1, num_frame * num_feat, num_feat),
        "spatial_attn2": (1, num_feat * 2, num_feat),
        "spatial_attn3": (3, num_feat, num_feat),
        "spatial_attn4": (1, num_feat, num_feat),
        "spatial_attn5": (3, num_feat, num_feat),
        "spatial_attn_l1": (1, num_feat, num_feat),
        "spatial_attn_l2": (3, num_feat * 2, num_feat),
        "spatial_attn_l3": (3, num_feat, num_feat),
        "spatial_attn_add1": (1, num_feat, num_feat),
        "spatial_attn_add2": (1, num_feat, num_feat),
    }
    for k, (name, (ksz, cin, cout)) in zip(jax.random.split(key, len(dims)),
                                           dims.items()):
        p[name] = conv2d_init(k, ksz, ksz, cin, cout)
    return p


def tsa_fusion(p, aligned, center_idx):
    """aligned: (B, T, H, W, C) -> (B, H, W, C) (edvr_arch.py:102-195)."""
    b, t, h, w, c = aligned.shape
    pad = lambda z, k: (k - 1) // 2
    emb_ref = conv2d(aligned[:, center_idx], p["temporal_attn1"]["w"],
                     p["temporal_attn1"]["b"], padding=1)
    emb = conv2d(aligned.reshape(-1, h, w, c), p["temporal_attn2"]["w"],
                 p["temporal_attn2"]["b"], padding=1).reshape(b, t, h, w, c)
    corr = jnp.sum(emb * emb_ref[:, None], axis=-1)  # (b, t, h, w)
    corr_prob = jax.nn.sigmoid(corr)[..., None]  # (b, t, h, w, 1)
    # torch interleaves (t, c) channel blocks: (b, t*c, h, w)
    feat = (aligned * corr_prob).transpose(0, 2, 3, 1, 4).reshape(b, h, w, t * c)

    fused = leaky_relu(_conv(p["feat_fusion"], feat), 0.1)

    attn = leaky_relu(_conv(p["spatial_attn1"], feat), 0.1)
    attn_max = max_pool(attn, 3, 2, 1)
    attn_avg = _avg_pool3s2(attn)
    attn = leaky_relu(_conv(p["spatial_attn2"],
                            jnp.concatenate([attn_max, attn_avg], -1)), 0.1)
    attn_level = leaky_relu(_conv(p["spatial_attn_l1"], attn), 0.1)
    attn_max = max_pool(attn_level, 3, 2, 1)
    attn_avg = _avg_pool3s2(attn_level)
    attn_level = leaky_relu(_conv(p["spatial_attn_l2"],
                                  jnp.concatenate([attn_max, attn_avg], -1)), 0.1)
    attn_level = leaky_relu(_conv(p["spatial_attn_l3"], attn_level), 0.1)
    attn_level = resize_bilinear(attn_level, (attn.shape[1], attn.shape[2]))
    attn = leaky_relu(_conv(p["spatial_attn3"], attn), 0.1) + attn_level
    attn = leaky_relu(_conv(p["spatial_attn4"], attn), 0.1)
    attn = resize_bilinear(attn, (h, w))
    attn = _conv(p["spatial_attn5"], attn)
    attn_add = _conv(p["spatial_attn_add2"],
                     leaky_relu(_conv(p["spatial_attn_add1"], attn), 0.1))
    attn = jax.nn.sigmoid(attn)
    return fused * attn * 2 + attn_add


@ARCH_REGISTRY.register(name="EDVR")
class EDVR:
    @staticmethod
    def init(key, num_in_ch=3, num_out_ch=3, num_feat=64, num_frame=5,
             deformable_groups=8, num_extract_block=5,
             num_reconstruct_block=10, with_tsa=True):
        ks = jax.random.split(key, 12)
        p = {
            "conv_first": conv2d_init(ks[0], 3, 3, num_in_ch, num_feat),
            "feature_extraction": [_res_block_nobn_init(k, num_feat)
                                   for k in jax.random.split(ks[1], num_extract_block)],
            "conv_l2_1": conv2d_init(ks[2], 3, 3, num_feat, num_feat),
            "conv_l2_2": conv2d_init(ks[3], 3, 3, num_feat, num_feat),
            "conv_l3_1": conv2d_init(ks[4], 3, 3, num_feat, num_feat),
            "conv_l3_2": conv2d_init(ks[5], 3, 3, num_feat, num_feat),
            "pcd_align": pcd_alignment_init(ks[6], num_feat, deformable_groups),
            "reconstruction": [_res_block_nobn_init(k, num_feat)
                               for k in jax.random.split(ks[7], num_reconstruct_block)],
            "upconv1": conv2d_init(ks[8], 3, 3, num_feat, num_feat * 4),
            "upconv2": conv2d_init(ks[9], 3, 3, num_feat, 64 * 4),
            "conv_hr": conv2d_init(ks[10], 3, 3, 64, 64),
            "conv_last": conv2d_init(ks[11], 3, 3, 64, 3),
        }
        if with_tsa:
            p["fusion"] = tsa_fusion_init(jax.random.fold_in(key, 99),
                                          num_feat, num_frame)
        else:
            p["fusion"] = conv2d_init(jax.random.fold_in(key, 99), 1, 1,
                                      num_frame * num_feat, num_feat)
        return p

    @staticmethod
    def apply(params, x, num_feat=64, deformable_groups=8, with_tsa=True,
              center_frame_idx=None):
        """x: (B, T, H, W, 3) [0,1] -> (B, 4H, 4W, 3) for the center frame."""
        b, t, h, w, c = x.shape
        center = t // 2 if center_frame_idx is None else center_frame_idx
        x_center = x[:, center]

        feat_l1 = leaky_relu(_conv(params["conv_first"],
                                   x.reshape(-1, h, w, c)), 0.1)
        for bp in params["feature_extraction"]:
            feat_l1 = _res_block_nobn(bp, feat_l1)
        feat_l2 = leaky_relu(conv2d(feat_l1, params["conv_l2_1"]["w"],
                                    params["conv_l2_1"]["b"], stride=2, padding=1), 0.1)
        feat_l2 = leaky_relu(_conv(params["conv_l2_2"], feat_l2), 0.1)
        feat_l3 = leaky_relu(conv2d(feat_l2, params["conv_l3_1"]["w"],
                                    params["conv_l3_1"]["b"], stride=2, padding=1), 0.1)
        feat_l3 = leaky_relu(_conv(params["conv_l3_2"], feat_l3), 0.1)

        fl1 = feat_l1.reshape(b, t, h, w, -1)
        fl2 = feat_l2.reshape(b, t, h // 2, w // 2, -1)
        fl3 = feat_l3.reshape(b, t, h // 4, w // 4, -1)
        ref_l = [fl1[:, center], fl2[:, center], fl3[:, center]]

        aligned = []
        for i in range(t):
            nbr_l = [fl1[:, i], fl2[:, i], fl3[:, i]]
            aligned.append(pcd_alignment(params["pcd_align"], nbr_l, ref_l,
                                         deformable_groups))
        aligned = jnp.stack(aligned, axis=1)  # (b, t, h, w, c)

        if with_tsa:
            feat = tsa_fusion(params["fusion"], aligned, center)
        else:
            flat = aligned.transpose(0, 2, 3, 1, 4).reshape(b, h, w, -1)
            feat = conv2d(flat, params["fusion"]["w"], params["fusion"]["b"])

        out = feat
        for bp in params["reconstruction"]:
            out = _res_block_nobn(bp, out)
        out = leaky_relu(pixel_shuffle(_conv(params["upconv1"], out), 2), 0.1)
        out = leaky_relu(pixel_shuffle(_conv(params["upconv2"], out), 2), 0.1)
        out = leaky_relu(_conv(params["conv_hr"], out), 0.1)
        out = _conv(params["conv_last"], out)
        base = resize_bilinear(x_center, (h * 4, w * 4))
        return out + base


# ---------------------------------------------------------------------------
# BasicVSR++ (basicvsrpp_arch.py)
# ---------------------------------------------------------------------------

def _soda_init(key, mid_channels, deformable_groups=16):
    """SecondOrderDeformableAlignment (basicvsrpp_arch.py:347-409)."""
    ks = jax.random.split(key, 6)
    p = conv2d_init(ks[0], 3, 3, 2 * mid_channels, mid_channels)
    p["conv_offset"] = [
        conv2d_init(ks[1], 3, 3, 3 * mid_channels + 4, mid_channels), None,
        conv2d_init(ks[2], 3, 3, mid_channels, mid_channels), None,
        conv2d_init(ks[3], 3, 3, mid_channels, mid_channels), None,
        conv2d_init(ks[4], 3, 3, mid_channels, deformable_groups * 27),
    ]
    p["conv_offset"][6]["w"] = jnp.zeros_like(p["conv_offset"][6]["w"])
    p["conv_offset"][6]["b"] = jnp.zeros_like(p["conv_offset"][6]["b"])
    return p


def _soda(p, x, extra_feat, flow_1, flow_2, deformable_groups=16,
          max_residue_magnitude=10.0):
    feat = jnp.concatenate([extra_feat, flow_1, flow_2], axis=-1)
    co = p["conv_offset"]
    feat = leaky_relu(_conv(co[0], feat), 0.1)
    feat = leaky_relu(_conv(co[2], feat), 0.1)
    feat = leaky_relu(_conv(co[4], feat), 0.1)
    out = _conv(co[6], feat)
    o1, o2, m = jnp.split(out, 3, axis=-1)
    offset = max_residue_magnitude * jnp.tanh(jnp.concatenate([o1, o2], -1))
    off1, off2 = jnp.split(offset, 2, axis=-1)
    # flow channels are (dx, dy); the kernel expects interleaved (dy, dx)
    f1 = jnp.flip(flow_1, axis=-1)
    f2 = jnp.flip(flow_2, axis=-1)
    off1 = off1 + jnp.tile(f1, (1, 1, 1, off1.shape[-1] // 2))
    off2 = off2 + jnp.tile(f2, (1, 1, 1, off2.shape[-1] // 2))
    offset = jnp.concatenate([off1, off2], axis=-1)
    mask = jax.nn.sigmoid(m)
    return deform_conv2d(x, offset, p["w"], p.get("b"), padding=1,
                         deformable_groups=deformable_groups, mask=mask)


@ARCH_REGISTRY.register(name="BasicVSRPlusPlus")
class BasicVSRPlusPlus:
    MODULES = ("backward_1", "forward_1", "backward_2", "forward_2")

    @staticmethod
    def init(key, mid_channels=64, num_blocks=7, deformable_groups=16):
        ks = jax.random.split(key, 12)
        p = {"spynet": SpyNet.init(ks[0]),
             "feat_extract": conv_res_blocks_init(ks[1], 3, mid_channels, 5),
             "deform_align": {}, "backbone": {}}
        for i, m in enumerate(BasicVSRPlusPlus.MODULES):
            p["deform_align"][m] = _soda_init(jax.random.fold_in(ks[2], i),
                                              mid_channels, deformable_groups)
            p["backbone"][m] = conv_res_blocks_init(
                jax.random.fold_in(ks[3], i), (2 + i) * mid_channels,
                mid_channels, num_blocks)
        p["reconstruction"] = conv_res_blocks_init(ks[4], 5 * mid_channels,
                                                   mid_channels, 5)
        p["upconv1"] = conv2d_init(ks[5], 3, 3, mid_channels, mid_channels * 4)
        p["upconv2"] = conv2d_init(ks[6], 3, 3, mid_channels, 64 * 4)
        p["conv_hr"] = conv2d_init(ks[7], 3, 3, 64, 64)
        p["conv_last"] = conv2d_init(ks[8], 3, 3, 64, 3)
        return p

    @staticmethod
    def apply(params, lqs, mid_channels=64, deformable_groups=16,
              max_residue_magnitude=10.0):
        """lqs: (B, T, H, W, 3) [0,1] -> (B, T, 4H, 4W, 3). Python-loop
        propagation (trace-time unrolled; T is static)."""
        b, t, h, w, c = lqs.shape
        feats_sp = conv_res_blocks(params["feat_extract"],
                                   lqs.reshape(-1, h, w, c))
        feats_sp = feats_sp.reshape(b, t, h, w, -1)
        feats: Dict[str, List] = {"spatial": [feats_sp[:, i] for i in range(t)]}

        x1 = lqs[:, :-1].reshape(-1, h, w, c)
        x2 = lqs[:, 1:].reshape(-1, h, w, c)
        flows_backward = SpyNet.apply(params["spynet"], x1, x2).reshape(
            b, t - 1, h, w, 2)
        flows_forward = SpyNet.apply(params["spynet"], x2, x1).reshape(
            b, t - 1, h, w, 2)

        for it in (1, 2):
            for direction in ("backward", "forward"):
                module = f"{direction}_{it}"
                feats[module] = []
                flows = flows_backward if direction == "backward" else flows_forward
                frame_idx = list(range(t))
                flow_idx = list(range(-1, t - 1))
                if direction == "backward":
                    frame_idx = frame_idx[::-1]
                    flow_idx = frame_idx
                feat_prop = jnp.zeros((b, h, w, mid_channels), lqs.dtype)
                for i, idx in enumerate(frame_idx):
                    feat_current = feats["spatial"][idx]
                    if i > 0:
                        flow_n1 = flows[:, flow_idx[i]]
                        cond_n1 = flow_warp(feat_prop, flow_n1)
                        feat_n2 = jnp.zeros_like(feat_prop)
                        flow_n2 = jnp.zeros_like(flow_n1)
                        cond_n2 = jnp.zeros_like(cond_n1)
                        if i > 1:
                            feat_n2 = feats[module][-2]
                            flow_n2 = flows[:, flow_idx[i - 1]]
                            flow_n2 = flow_n1 + flow_warp(flow_n2, flow_n1)
                            cond_n2 = flow_warp(feat_n2, flow_n2)
                        cond = jnp.concatenate([cond_n1, feat_current, cond_n2], -1)
                        stacked = jnp.concatenate([feat_prop, feat_n2], -1)
                        feat_prop = _soda(params["deform_align"][module],
                                          stacked, cond, flow_n1, flow_n2,
                                          deformable_groups,
                                          max_residue_magnitude)
                    cat = [feat_current] + \
                        [feats[k][idx] for k in feats
                         if k not in ("spatial", module)] + [feat_prop]
                    feat = jnp.concatenate(cat, -1)
                    feat_prop = feat_prop + conv_res_blocks(
                        params["backbone"][module], feat)
                    feats[module].append(feat_prop)
                if direction == "backward":
                    feats[module] = feats[module][::-1]

        outs = []
        for i in range(t):
            hr = [feats[k][i] for k in ("spatial", "backward_1", "forward_1",
                                        "backward_2", "forward_2")]
            hr = jnp.concatenate(hr, -1)
            hr = conv_res_blocks(params["reconstruction"], hr)
            hr = leaky_relu(pixel_shuffle(_conv(params["upconv1"], hr), 2), 0.1)
            hr = leaky_relu(pixel_shuffle(_conv(params["upconv2"], hr), 2), 0.1)
            hr = leaky_relu(_conv(params["conv_hr"], hr), 0.1)
            hr = _conv(params["conv_last"], hr)
            hr = hr + resize_bilinear(lqs[:, i], (h * 4, w * 4))
            outs.append(hr)
        return jnp.stack(outs, axis=1)


# ---------------------------------------------------------------------------
# IconVSR (basicvsr_arch.py:124-276): BasicVSR + EDVR keyframe refinement
# ---------------------------------------------------------------------------

def edvr_feature_extractor_init(key, num_input_frame, num_feat):
    """EDVRFeatureExtractor (basicvsr_arch.py:278-336)."""
    ks = jax.random.split(key, 8)
    return {
        "conv_first": conv2d_init(ks[0], 3, 3, 3, num_feat),
        "feature_extraction": [_res_block_nobn_init(k, num_feat)
                               for k in jax.random.split(ks[1], 5)],
        "conv_l2_1": conv2d_init(ks[2], 3, 3, num_feat, num_feat),
        "conv_l2_2": conv2d_init(ks[3], 3, 3, num_feat, num_feat),
        "conv_l3_1": conv2d_init(ks[4], 3, 3, num_feat, num_feat),
        "conv_l3_2": conv2d_init(ks[5], 3, 3, num_feat, num_feat),
        "pcd_align": pcd_alignment_init(ks[6], num_feat, 8),
        "fusion": tsa_fusion_init(ks[7], num_feat, num_input_frame),
    }


def edvr_feature_extractor(p, x, num_input_frame):
    """x: (B, N, H, W, 3) -> fused center-frame feature (B, H, W, C)."""
    b, n, h, w, c = x.shape
    center = num_input_frame // 2
    feat_l1 = leaky_relu(_conv(p["conv_first"], x.reshape(-1, h, w, c)), 0.1)
    for bp in p["feature_extraction"]:
        feat_l1 = _res_block_nobn(bp, feat_l1)
    feat_l2 = leaky_relu(conv2d(feat_l1, p["conv_l2_1"]["w"], p["conv_l2_1"]["b"],
                                stride=2, padding=1), 0.1)
    feat_l2 = leaky_relu(_conv(p["conv_l2_2"], feat_l2), 0.1)
    feat_l3 = leaky_relu(conv2d(feat_l2, p["conv_l3_1"]["w"], p["conv_l3_1"]["b"],
                                stride=2, padding=1), 0.1)
    feat_l3 = leaky_relu(_conv(p["conv_l3_2"], feat_l3), 0.1)
    fl1 = feat_l1.reshape(b, n, h, w, -1)
    fl2 = feat_l2.reshape(b, n, h // 2, w // 2, -1)
    fl3 = feat_l3.reshape(b, n, h // 4, w // 4, -1)
    ref_l = [fl1[:, center], fl2[:, center], fl3[:, center]]
    aligned = [pcd_alignment(p["pcd_align"], [fl1[:, i], fl2[:, i], fl3[:, i]],
                             ref_l, 8) for i in range(n)]
    return tsa_fusion(p["fusion"], jnp.stack(aligned, axis=1), center)


@ARCH_REGISTRY.register(name="IconVSR")
class IconVSR:
    @staticmethod
    def init(key, num_feat=64, num_block=15, temporal_padding=2):
        ks = jax.random.split(key, 10)
        nf = num_feat
        return {
            "edvr": edvr_feature_extractor_init(ks[0],
                                                temporal_padding * 2 + 1, nf),
            "spynet": SpyNet.init(ks[1]),
            "backward_fusion": conv2d_init(ks[2], 3, 3, 2 * nf, nf),
            "backward_trunk": conv_res_blocks_init(ks[3], nf + 3, nf, num_block),
            "forward_fusion": conv2d_init(ks[4], 3, 3, 2 * nf, nf),
            "forward_trunk": conv_res_blocks_init(ks[5], 2 * nf + 3, nf, num_block),
            "upconv1": conv2d_init(ks[6], 3, 3, nf, nf * 4),
            "upconv2": conv2d_init(ks[7], 3, 3, nf, 64 * 4),
            "conv_hr": conv2d_init(ks[8], 3, 3, 64, 64),
            "conv_last": conv2d_init(ks[9], 3, 3, 64, 3),
        }

    @staticmethod
    def apply(params, x, num_feat=64, keyframe_stride=5, temporal_padding=2):
        """x: (B, T, H, W, 3) [0,1] -> (B, T, 4H, 4W, 3). Python-loop
        propagation (static T)."""
        b, n, h_in, w_in, _ = x.shape
        pad_h = (4 - h_in % 4) % 4
        pad_w = (4 - w_in % 4) % 4
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                        mode="reflect")
        h, w = x.shape[2], x.shape[3]

        keyframe_idx = list(range(0, n, keyframe_stride))
        if keyframe_idx[-1] != n - 1:
            keyframe_idx.append(n - 1)

        flows_forward, flows_backward = BasicVSR.get_flows(params, x)

        # keyframe features: temporally pad with mirrored frames (:203-214)
        tp = temporal_padding
        if tp == 2:
            xp = jnp.concatenate([x[:, jnp.asarray([4, 3])], x,
                                  x[:, jnp.asarray([-4, -5])]], axis=1)
        else:
            xp = jnp.concatenate([x[:, jnp.asarray([6, 5, 4])], x,
                                  x[:, jnp.asarray([-5, -6, -7])]], axis=1)
        nf_frames = 2 * tp + 1
        feats_keyframe = {
            i: edvr_feature_extractor(params["edvr"], xp[:, i:i + nf_frames],
                                      nf_frames)
            for i in keyframe_idx}

        out_l = [None] * n
        feat_prop = jnp.zeros((b, h, w, num_feat), x.dtype)
        for i in range(n - 1, -1, -1):
            if i < n - 1:
                feat_prop = flow_warp(feat_prop, flows_backward[:, i])
            if i in keyframe_idx:
                feat_prop = _conv(params["backward_fusion"],
                                  jnp.concatenate([feat_prop,
                                                   feats_keyframe[i]], -1))
            feat_prop = conv_res_blocks(params["backward_trunk"],
                                        jnp.concatenate([x[:, i], feat_prop], -1))
            out_l[i] = feat_prop

        feat_prop = jnp.zeros_like(feat_prop)
        outs = []
        for i in range(n):
            if i > 0:
                feat_prop = flow_warp(feat_prop, flows_forward[:, i - 1])
            if i in keyframe_idx:
                feat_prop = _conv(params["forward_fusion"],
                                  jnp.concatenate([feat_prop,
                                                   feats_keyframe[i]], -1))
            feat_prop = conv_res_blocks(
                params["forward_trunk"],
                jnp.concatenate([x[:, i], out_l[i], feat_prop], -1))
            out = leaky_relu(pixel_shuffle(_conv(params["upconv1"], feat_prop), 2), 0.1)
            out = leaky_relu(pixel_shuffle(_conv(params["upconv2"], out), 2), 0.1)
            out = leaky_relu(_conv(params["conv_hr"], out), 0.1)
            out = _conv(params["conv_last"], out)
            out = out + resize_bilinear(x[:, i], (h * 4, w * 4))
            outs.append(out)
        return jnp.stack(outs, axis=1)[:, :, :4 * h_in, :4 * w_in]
