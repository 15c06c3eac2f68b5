"""BiSeNet face parser — rebuild of reference wm_facelib/parsing/bisenet.py
(8-141) + its ResNet18 backbone (wm_facelib/parsing/resnet.py:10-69).

The alternate parser alongside ParseNet (init_parsing_model supports both,
reference parsing/__init__.py:22-51 wires only parsenet; this framework wires
both). NHWC, inference-form BatchNorm; the global-context path uses a true
global average pool (F.avg_pool2d(feat, feat.size()[2:]) == mean over H,W),
so the whole net is shape-polymorphic under jit per input resolution.

Param tree mirrors the torch state dict (cp.resnet.layerN.M.convK/bnK,
arm16.conv.conv/bn, ffm.convblk, conv_out.conv/conv_out, ...) so the generic
converter applies unchanged.
"""
from typing import Dict

import jax
import jax.numpy as jnp

from comfyui_keep_tpu.ops import (conv2d, conv2d_init, batch_norm,
                                  batch_norm_init, relu, sigmoid, max_pool)
from comfyui_keep_tpu.ops.resample import resize_bilinear, resize_nearest
from comfyui_keep_tpu.utils.registry import ARCH_REGISTRY


def _conv_bn_relu_init(key, cin, cout, ks=3):
    return {"conv": conv2d_init(key, ks, ks, cin, cout, bias=False),
            "bn": batch_norm_init(cout)}


def _conv_bn_relu(p, x, stride=1, padding=1):
    """ConvBNReLU (bisenet.py:8-18)."""
    x = conv2d(x, p["conv"]["w"], stride=stride, padding=padding)
    return relu(batch_norm(x, p["bn"]))


def _basic_block_init(key, cin, cout, stride=1):
    ks = jax.random.split(key, 4)
    p = {"conv1": conv2d_init(ks[0], 3, 3, cin, cout, bias=False),
         "bn1": batch_norm_init(cout),
         "conv2": conv2d_init(ks[1], 3, 3, cout, cout, bias=False),
         "bn2": batch_norm_init(cout)}
    if cin != cout or stride != 1:
        p["downsample"] = [conv2d_init(ks[2], 1, 1, cin, cout, bias=False),
                           batch_norm_init(cout)]
    return p


def _basic_block(p, x, stride=1):
    """BasicBlock (resnet.py:10-38)."""
    residual = relu(batch_norm(
        conv2d(x, p["conv1"]["w"], stride=stride, padding=1), p["bn1"]))
    residual = batch_norm(conv2d(residual, p["conv2"]["w"], padding=1),
                          p["bn2"])
    shortcut = x
    if "downsample" in p:
        shortcut = batch_norm(
            conv2d(x, p["downsample"][0]["w"], stride=stride), p["downsample"][1])
    return relu(shortcut + residual)


_LAYERS = (("layer1", 64, 64, 1), ("layer2", 64, 128, 2),
           ("layer3", 128, 256, 2), ("layer4", 256, 512, 2))


def _resnet18_init(key):
    ks = jax.random.split(key, 1 + len(_LAYERS))
    p = {"conv1": conv2d_init(ks[0], 7, 7, 3, 64, bias=False),
         "bn1": batch_norm_init(64)}
    for k, (name, cin, cout, stride) in zip(ks[1:], _LAYERS):
        k0, k1 = jax.random.split(k)
        p[name] = [_basic_block_init(k0, cin, cout, stride),
                   _basic_block_init(k1, cout, cout, 1)]
    return p


def _resnet18(p, x):
    """ResNet18 (resnet.py:48-69): returns 1/8, 1/16, 1/32 features."""
    x = relu(batch_norm(conv2d(x, p["conv1"]["w"], stride=2, padding=3),
                        p["bn1"]))
    x = max_pool(x, window=3, stride=2, padding=1)
    for name, _, _, stride in _LAYERS[:1]:
        x = _basic_block(p[name][0], x, stride)
        x = _basic_block(p[name][1], x)
    feats = []
    for name, _, _, stride in _LAYERS[1:]:
        x = _basic_block(p[name][0], x, stride)
        x = _basic_block(p[name][1], x)
        feats.append(x)
    return tuple(feats)  # feat8, feat16, feat32


def _arm_init(key, cin, cout):
    k0, k1 = jax.random.split(key)
    return {"conv": _conv_bn_relu_init(k0, cin, cout),
            "conv_atten": conv2d_init(k1, 1, 1, cout, cout, bias=False),
            "bn_atten": batch_norm_init(cout)}


def _arm(p, x):
    """AttentionRefinementModule (bisenet.py:34-50): channel attention from
    global average context."""
    feat = _conv_bn_relu(p["conv"], x)
    atten = feat.mean(axis=(-3, -2), keepdims=True)
    atten = conv2d(atten, p["conv_atten"]["w"])
    atten = sigmoid(batch_norm(atten, p["bn_atten"]))
    return feat * atten


def _ffm_init(key, cin, cout):
    ks = jax.random.split(key, 3)
    return {"convblk": _conv_bn_relu_init(ks[0], cin, cout, ks=1),
            "conv1": conv2d_init(ks[1], 1, 1, cout, cout // 4, bias=False),
            "conv2": conv2d_init(ks[2], 1, 1, cout // 4, cout, bias=False)}


def _ffm(p, fsp, fcp):
    """FeatureFusionModule (bisenet.py:87-107)."""
    feat = _conv_bn_relu(p["convblk"], jnp.concatenate([fsp, fcp], axis=-1),
                         padding=0)
    atten = feat.mean(axis=(-3, -2), keepdims=True)
    atten = relu(conv2d(atten, p["conv1"]["w"]))
    atten = sigmoid(conv2d(atten, p["conv2"]["w"]))
    return feat * atten + feat


def _out_init(key, cin, mid, num_class):
    k0, k1 = jax.random.split(key)
    return {"conv": _conv_bn_relu_init(k0, cin, mid),
            "conv_out": conv2d_init(k1, 1, 1, mid, num_class, bias=False)}


def _out(p, x):
    """BiSeNetOutput (bisenet.py:21-31)."""
    feat = _conv_bn_relu(p["conv"], x)
    return conv2d(feat, p["conv_out"]["w"]), feat


@ARCH_REGISTRY.register(name="BiSeNet")
class BiSeNet:
    @staticmethod
    def init(key, num_class=19):
        ks = jax.random.split(key, 9)
        return {
            "cp": {
                "resnet": _resnet18_init(ks[0]),
                "arm16": _arm_init(ks[1], 256, 128),
                "arm32": _arm_init(ks[2], 512, 128),
                "conv_head32": _conv_bn_relu_init(ks[3], 128, 128),
                "conv_head16": _conv_bn_relu_init(ks[4], 128, 128),
                "conv_avg": _conv_bn_relu_init(ks[5], 512, 128, ks=1),
            },
            "ffm": _ffm_init(ks[6], 256, 256),
            "conv_out": _out_init(ks[7], 256, 256, num_class),
            "conv_out16": _out_init(jax.random.split(ks[8])[0], 128, 64, num_class),
            "conv_out32": _out_init(jax.random.split(ks[8])[1], 128, 64, num_class),
        }

    @staticmethod
    def _context_path(p, x):
        """ContextPath (bisenet.py:53-84)."""
        feat8, feat16, feat32 = _resnet18(p["resnet"], x)
        avg = feat32.mean(axis=(-3, -2), keepdims=True)
        avg = _conv_bn_relu(p["conv_avg"], avg, padding=0)
        avg_up = resize_nearest(avg, feat32.shape[-3:-1])

        feat32_sum = _arm(p["arm32"], feat32) + avg_up
        feat32_up = resize_nearest(feat32_sum, feat16.shape[-3:-1])
        feat32_up = _conv_bn_relu(p["conv_head32"], feat32_up)

        feat16_sum = _arm(p["arm16"], feat16) + feat32_up
        feat16_up = resize_nearest(feat16_sum, feat8.shape[-3:-1])
        feat16_up = _conv_bn_relu(p["conv_head16"], feat16_up)
        return feat8, feat16_up, feat32_up

    @staticmethod
    def apply(params, x, return_feat=False):
        """x: (B, H, W, 3). Returns (out, out16, out32)[, feats] — per-pixel
        num_class logits upsampled to input resolution (bisenet.py:120-140).
        The spatial path is replaced by the res3b1 feature, as in the
        reference (bisenet.py:122-123)."""
        hw = x.shape[-3:-1]
        feat_res8, feat_cp8, feat_cp16 = BiSeNet._context_path(params["cp"], x)
        feat_fuse = _ffm(params["ffm"], feat_res8, feat_cp8)

        out, feat = _out(params["conv_out"], feat_fuse)
        out16, feat16 = _out(params["conv_out16"], feat_cp8)
        out32, feat32 = _out(params["conv_out32"], feat_cp16)

        up = lambda t: resize_bilinear(t, hw, align_corners=True)
        if return_feat:
            return (up(out), up(out16), up(out32),
                    up(feat), up(feat16), up(feat32))
        return up(out), up(out16), up(out32)


def convert_bisenet_checkpoint(sd: Dict) -> Dict:
    from comfyui_keep_tpu.utils.checkpoint import convert_state_dict
    return convert_state_dict(sd)


def make_parser_fn(params, jit=True):
    """parser(face_rgb_pm1 (1,512,512,3)) -> (1,512,512,19) logits — the
    FaceRestoreHelper plug-in interface (main head only)."""
    def fn(x):
        return BiSeNet.apply(params, x)[0]
    return jax.jit(fn) if jit else fn
