"""Remaining registry-parity archs: TOFlow (tof_arch.py), DUF (duf_arch.py),
ResNetArcFace identity net (arcface_arch.py)."""
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from comfyui_keep_tpu.ops import (conv2d, conv2d_init, conv3d, conv3d_init,
                                  batch_norm, batch_norm_init, relu, linear,
                                  linear_init, avg_pool_2x, resize_bilinear,
                                  flow_warp, max_pool)
from comfyui_keep_tpu.models.gmflow import _unfold_nhwc
from comfyui_keep_tpu.models.sr_basic import pixel_shuffle
from comfyui_keep_tpu.utils.registry import ARCH_REGISTRY

MEAN = (0.485, 0.456, 0.406)
STD = (0.229, 0.224, 0.225)


# ---------------------------------------------------------------------------
# TOFlow
# ---------------------------------------------------------------------------

_TOF_DIMS = [(8, 32), (32, 64), (64, 32), (32, 16), (16, 2)]


def _tof_basic_init(key):
    ks = jax.random.split(key, 5)
    seq = []
    for i, (cin, cout) in enumerate(_TOF_DIMS):
        seq.append({"w": conv2d_init(ks[i], 7, 7, cin, cout,
                                     bias=(i == 4))["w"],
                    **({"b": jnp.zeros((cout,))} if i == 4 else {})})
        if i < 4:
            seq.append(batch_norm_init(cout))
            seq.append(None)
    return {"basic_module": seq}


def _tof_basic(p, x):
    seq = p["basic_module"]
    for i in range(5):
        c = seq[3 * i] if i < 4 else seq[12]
        x = conv2d(x, c["w"], c.get("b"), padding=3)
        if i < 4:
            x = relu(batch_norm(x, seq[3 * i + 1]))
    return x


def _spynet_tof(params, ref, supp):
    refs, supps = [ref], [supp]
    for _ in range(3):
        refs.insert(0, avg_pool_2x(refs[0]))
        supps.insert(0, avg_pool_2x(supps[0]))
    b = ref.shape[0]
    flow = jnp.zeros((b, ref.shape[1] // 16, ref.shape[2] // 16, 2), ref.dtype)
    for i in range(4):
        up = resize_bilinear(flow, (flow.shape[1] * 2, flow.shape[2] * 2),
                             align_corners=True) * 2.0
        flow = up + _tof_basic(params["basic_module"][i], jnp.concatenate(
            [refs[i], flow_warp(supps[i], up), up], -1))
    return flow


@ARCH_REGISTRY.register(name="TOFlow")
class TOFlow:
    @staticmethod
    def init(key):
        ks = jax.random.split(key, 6)
        return {
            "spynet": {"basic_module": [_tof_basic_init(k) for k in ks[:4]]},
            "conv_1": conv2d_init(ks[4], 9, 9, 21, 64),
            "conv_2": conv2d_init(jax.random.fold_in(ks[4], 1), 9, 9, 64, 64),
            "conv_3": conv2d_init(jax.random.fold_in(ks[4], 2), 1, 1, 64, 64),
            "conv_4": conv2d_init(ks[5], 1, 1, 64, 3),
        }

    @staticmethod
    def apply(params, lrs, adapt_official_weights=False):
        """lrs: (B, 7, H, W, 3) [0,1] -> (B, H, W, 3) (tof_arch.py:137-172)."""
        if adapt_official_weights:
            lrs = lrs[:, jnp.asarray([3, 0, 1, 2, 4, 5, 6])]
        ref_idx = 0 if adapt_official_weights else 3
        mean = jnp.asarray(MEAN, lrs.dtype)
        std = jnp.asarray(STD, lrs.dtype)
        lrs = (lrs - mean) / std
        lr_ref = lrs[:, ref_idx]
        aligned = []
        for i in range(7):
            if i == ref_idx:
                aligned.append(lr_ref)
            else:
                flow = _spynet_tof(params["spynet"], lr_ref, lrs[:, i])
                aligned.append(flow_warp(lrs[:, i], flow))
        # torch stacks (b, 7, 3, h, w).view(b, 21, h, w): frame-major channels
        hr = jnp.concatenate(aligned, axis=-1)
        hr = relu(conv2d(hr, params["conv_1"]["w"], params["conv_1"]["b"], padding=4))
        hr = relu(conv2d(hr, params["conv_2"]["w"], params["conv_2"]["b"], padding=4))
        hr = relu(conv2d(hr, params["conv_3"]["w"], params["conv_3"]["b"]))
        hr = conv2d(hr, params["conv_4"]["w"], params["conv_4"]["b"]) + lr_ref
        return hr * std + mean


# ---------------------------------------------------------------------------
# DUF
# ---------------------------------------------------------------------------

def _bn_relu_conv3d_init(key, cin, cmid, cout, k2=(3, 3, 3)):
    k1, k2_ = jax.random.split(key)
    return [batch_norm_init(cin), None,
            conv3d_init(k1, 1, 1, 1, cin, cmid), batch_norm_init(cmid), None,
            conv3d_init(k2_, *k2, cmid, cout)]


def _bn_relu_conv3d(seq, x, pad2):
    x = relu(batch_norm(x, seq[0]))
    x = conv3d(x, seq[2]["w"], seq[2]["b"])
    x = relu(batch_norm(x, seq[3]))
    return conv3d(x, seq[5]["w"], seq[5]["b"], padding=pad2)


@ARCH_REGISTRY.register(name="DUF")
class DUF:
    @staticmethod
    def _cfg(num_layer):
        return {16: (3, 32), 28: (9, 16), 52: (21, 16)}[num_layer]

    @staticmethod
    def init(key, scale=4, num_layer=52):
        num_block, gc = DUF._cfg(num_layer)
        ks = jax.random.split(key, num_block + 12)
        p = {"conv3d1": conv3d_init(ks[0], 1, 3, 3, 3, 64)}
        p["dense_block1"] = {"dense_blocks": [
            _bn_relu_conv3d_init(ks[i + 1], 64 + i * gc, 64 + i * gc, gc)
            for i in range(num_block)]}
        nf = 64 + gc * num_block
        p["dense_block2"] = {
            "temporal_reduce1": _bn_relu_conv3d_init(ks[-9], nf, nf, gc),
            "temporal_reduce2": _bn_relu_conv3d_init(ks[-8], nf + gc, nf + gc, gc),
            "temporal_reduce3": _bn_relu_conv3d_init(ks[-7], nf + 2 * gc, nf + 2 * gc, gc),
        }
        ch = nf + 3 * gc
        p["bn3d2"] = batch_norm_init(ch)
        p["conv3d2"] = conv3d_init(ks[-6], 1, 3, 3, ch, 256)
        p["conv3d_r1"] = conv3d_init(ks[-5], 1, 1, 1, 256, 256)
        p["conv3d_r2"] = conv3d_init(ks[-4], 1, 1, 1, 256, 3 * scale ** 2)
        p["conv3d_f1"] = conv3d_init(ks[-3], 1, 1, 1, 256, 512)
        p["conv3d_f2"] = conv3d_init(ks[-2], 1, 1, 1, 512, 25 * scale ** 2)
        return p

    @staticmethod
    def apply(params, x, scale=4, num_layer=52):
        """x: (B, 7, H, W, 3) -> (B, H*scale, W*scale, 3) (duf_arch.py:245-280).
        Layout NDHWC with D = time."""
        b, t, h, w, _ = x.shape
        x_center = x[:, t // 2]
        z = conv3d(x, params["conv3d1"]["w"], params["conv3d1"]["b"],
                   padding=[(0, 0), (1, 1), (1, 1)])
        for seq in params["dense_block1"]["dense_blocks"]:
            y = _bn_relu_conv3d(seq, z, [(1, 1), (1, 1), (1, 1)])
            z = jnp.concatenate([z, y], axis=-1)
        for name in ("temporal_reduce1", "temporal_reduce2", "temporal_reduce3"):
            y = _bn_relu_conv3d(params["dense_block2"][name], z,
                                [(0, 0), (1, 1), (1, 1)])
            z = jnp.concatenate([z[:, 1:-1], y], axis=-1)
        z = relu(batch_norm(z, params["bn3d2"]))
        z = relu(conv3d(z, params["conv3d2"]["w"], params["conv3d2"]["b"],
                        padding=[(0, 0), (1, 1), (1, 1)]))
        res = conv3d(relu(conv3d(z, params["conv3d_r1"]["w"],
                                 params["conv3d_r1"]["b"])),
                     params["conv3d_r2"]["w"], params["conv3d_r2"]["b"])
        filt = conv3d(relu(conv3d(z, params["conv3d_f1"]["w"],
                                  params["conv3d_f1"]["b"])),
                      params["conv3d_f2"]["w"], params["conv3d_f2"]["b"])
        # (b, 1, h, w, 25*s2) -> softmax over the 25 taps
        filt = filt[:, 0].reshape(b, h, w, 25, scale ** 2)
        filt = jax.nn.softmax(filt, axis=3)
        patches = _unfold_nhwc(x_center, 5, 2)  # (b, h, w, 25, 3)
        out = jnp.einsum("bhwkc,bhwku->bhwcu", patches, filt)
        out = out.reshape(b, h, w, 3 * scale ** 2)
        out = out + res[:, 0]
        return pixel_shuffle(out, scale)


# ---------------------------------------------------------------------------
# ResNetArcFace (arcface_arch.py) — identity embedding network
# ---------------------------------------------------------------------------

def _prelu(x, p):
    # torch PReLU weight is 1-D named 'weight' -> converter renames to 'scale'
    w = p["w"] if "w" in p else p["scale"]
    return jnp.where(x >= 0, x, x * w)


def _ir_block_init(key, cin, cout, stride, use_se=True):
    ks = jax.random.split(key, 6)
    p = {"bn0": batch_norm_init(cin),
         "conv1": {"w": conv2d_init(ks[0], 3, 3, cin, cin, bias=False)["w"]},
         "bn1": batch_norm_init(cin),
         "prelu": {"w": jnp.full((1,), 0.25)},
         "conv2": {"w": conv2d_init(ks[1], 3, 3, cin, cout, bias=False)["w"]},
         "bn2": batch_norm_init(cout)}
    if stride != 1 or cin != cout:
        p["downsample"] = [{"w": conv2d_init(ks[2], 1, 1, cin, cout, bias=False)["w"]},
                           batch_norm_init(cout)]
    if use_se:
        p["se"] = {"fc": [linear_init(ks[3], cout, cout // 16),
                          {"w": jnp.full((1,), 0.25)},
                          linear_init(ks[4], cout // 16, cout), None]}
    return p


def _ir_block(p, x, stride, use_se=True):
    res = x
    out = batch_norm(x, p["bn0"])
    out = conv2d(out, p["conv1"]["w"], padding=1)
    out = batch_norm(out, p["bn1"])
    out = _prelu(out, p["prelu"])
    out = conv2d(out, p["conv2"]["w"], stride=stride, padding=1)
    out = batch_norm(out, p["bn2"])
    if use_se:
        fc = p["se"]["fc"]
        y = out.mean(axis=(1, 2))
        y = _prelu(linear(y, fc[0]["w"], fc[0]["b"]), fc[1])
        y = jax.nn.sigmoid(linear(y, fc[2]["w"], fc[2]["b"]))
        out = out * y[:, None, None, :]
    if "downsample" in p:
        res = batch_norm(conv2d(x, p["downsample"][0]["w"], stride=stride),
                         p["downsample"][1])
    return _prelu(out + res, p["prelu"])


@ARCH_REGISTRY.register(name="ResNetArcFace")
class ResNetArcFace:
    @staticmethod
    def init(key, layers=(2, 2, 2, 2), use_se=True):
        ks = jax.random.split(key, 8)
        p = {"conv1": {"w": conv2d_init(ks[0], 3, 3, 1, 64, bias=False)["w"]},
             "bn1": batch_norm_init(64),
             "prelu": {"w": jnp.full((1,), 0.25)}}
        cin = 64
        for li, (n, planes, stride) in enumerate(
                zip(layers, (64, 128, 256, 512), (1, 2, 2, 2)), start=1):
            blocks = []
            for bi in range(n):
                blocks.append(_ir_block_init(
                    jax.random.fold_in(ks[li], bi), cin,
                    planes, stride if bi == 0 else 1, use_se))
                cin = planes
            p[f"layer{li}"] = blocks
        p["bn4"] = batch_norm_init(512)
        p["fc5"] = linear_init(ks[5], 512 * 8 * 8, 512)
        p["bn5"] = batch_norm_init(512)
        return p

    @staticmethod
    def apply(params, x, layers=(2, 2, 2, 2), use_se=True):
        """x: (B, 128, 128, 1) gray -> (B, 512) embedding."""
        h = conv2d(x, params["conv1"]["w"], padding=1)
        h = _prelu(batch_norm(h, params["bn1"]), params["prelu"])
        h = max_pool(h, 2, 2)
        for li, stride in zip((1, 2, 3, 4), (1, 2, 2, 2)):
            for bi, bp in enumerate(params[f"layer{li}"]):
                h = _ir_block(bp, h, stride if bi == 0 else 1, use_se)
        h = batch_norm(h, params["bn4"])
        h = h.transpose(0, 3, 1, 2).reshape(h.shape[0], -1)  # NCHW flatten
        h = linear(h, params["fc5"]["w"], params["fc5"]["b"])
        return batch_norm(h, params["bn5"])
