"""InceptionV3 feature extractor for FID — rebuild of reference
archs/inception.py (307 LoC; the pytorch-fid port of the TF inception with
FID-specific pooling: count_include_pad=False average pools and a max-pool
branch in the final InceptionE). Param names mirror torchvision
(`Mixed_5b.branch1x1.conv.weight`...) so pt_inception-2015-12-05 weights
convert with the generic rules.
"""
from typing import Dict, Sequence

import jax
import jax.numpy as jnp

from comfyui_keep_tpu.ops import (conv2d, conv2d_init, batch_norm,
                                  batch_norm_init, relu, max_pool,
                                  resize_bilinear)
from comfyui_keep_tpu.utils.registry import ARCH_REGISTRY

BN_EPS = 1e-3


def _avg_pool3_nocount(x):
    """AvgPool2d(3, 1, 1, count_include_pad=False)."""
    ones = jnp.ones_like(x[..., :1])
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
                              [(0, 0), (1, 1), (1, 1), (0, 0)])
    n = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, 3, 3, 1),
                              (1, 1, 1, 1), [(0, 0), (1, 1), (1, 1), (0, 0)])
    return s / n


def _bc_init(key, cin, cout, kh, kw):
    return {"conv": {"w": conv2d_init(key, kh, kw, cin, cout, bias=False)["w"]},
            "bn": batch_norm_init(cout)}


def _bc(p, x, stride=1, padding=0):
    x = conv2d(x, p["conv"]["w"], stride=stride, padding=padding)
    return relu(batch_norm(x, p["bn"], eps=BN_EPS))


def _seq_init(key, specs):
    ks = jax.random.split(key, len(specs))
    return {name: _bc_init(k, cin, cout, kh, kw)
            for k, (name, cin, cout, kh, kw) in zip(ks, specs)}


def _inception_a_init(key, cin, pool_features):
    return _seq_init(key, [
        ("branch1x1", cin, 64, 1, 1),
        ("branch5x5_1", cin, 48, 1, 1), ("branch5x5_2", 48, 64, 5, 5),
        ("branch3x3dbl_1", cin, 64, 1, 1), ("branch3x3dbl_2", 64, 96, 3, 3),
        ("branch3x3dbl_3", 96, 96, 3, 3),
        ("branch_pool", cin, pool_features, 1, 1)])


def _inception_a(p, x):
    b1 = _bc(p["branch1x1"], x)
    b5 = _bc(p["branch5x5_2"], _bc(p["branch5x5_1"], x), padding=2)
    b3 = _bc(p["branch3x3dbl_3"],
             _bc(p["branch3x3dbl_2"], _bc(p["branch3x3dbl_1"], x), padding=1),
             padding=1)
    bp = _bc(p["branch_pool"], _avg_pool3_nocount(x))
    return jnp.concatenate([b1, b5, b3, bp], -1)


def _inception_b_init(key, cin):
    return _seq_init(key, [
        ("branch3x3", cin, 384, 3, 3),
        ("branch3x3dbl_1", cin, 64, 1, 1), ("branch3x3dbl_2", 64, 96, 3, 3),
        ("branch3x3dbl_3", 96, 96, 3, 3)])


def _inception_b(p, x):
    b3 = _bc(p["branch3x3"], x, stride=2)
    bd = _bc(p["branch3x3dbl_3"],
             _bc(p["branch3x3dbl_2"], _bc(p["branch3x3dbl_1"], x), padding=1),
             stride=2)
    mp = max_pool(x, 3, 2)
    return jnp.concatenate([b3, bd, mp], -1)


def _inception_c_init(key, cin, c7):
    return _seq_init(key, [
        ("branch1x1", cin, 192, 1, 1),
        ("branch7x7_1", cin, c7, 1, 1), ("branch7x7_2", c7, c7, 1, 7),
        ("branch7x7_3", c7, 192, 7, 1),
        ("branch7x7dbl_1", cin, c7, 1, 1), ("branch7x7dbl_2", c7, c7, 7, 1),
        ("branch7x7dbl_3", c7, c7, 1, 7), ("branch7x7dbl_4", c7, c7, 7, 1),
        ("branch7x7dbl_5", c7, 192, 1, 7),
        ("branch_pool", cin, 192, 1, 1)])


def _inception_c(p, x):
    b1 = _bc(p["branch1x1"], x)
    b7 = _bc(p["branch7x7_1"], x)
    b7 = _bc(p["branch7x7_2"], b7, padding=[(0, 0), (3, 3)])
    b7 = _bc(p["branch7x7_3"], b7, padding=[(3, 3), (0, 0)])
    bd = _bc(p["branch7x7dbl_1"], x)
    bd = _bc(p["branch7x7dbl_2"], bd, padding=[(3, 3), (0, 0)])
    bd = _bc(p["branch7x7dbl_3"], bd, padding=[(0, 0), (3, 3)])
    bd = _bc(p["branch7x7dbl_4"], bd, padding=[(3, 3), (0, 0)])
    bd = _bc(p["branch7x7dbl_5"], bd, padding=[(0, 0), (3, 3)])
    bp = _bc(p["branch_pool"], _avg_pool3_nocount(x))
    return jnp.concatenate([b1, b7, bd, bp], -1)


def _inception_d_init(key, cin):
    return _seq_init(key, [
        ("branch3x3_1", cin, 192, 1, 1), ("branch3x3_2", 192, 320, 3, 3),
        ("branch7x7x3_1", cin, 192, 1, 1), ("branch7x7x3_2", 192, 192, 1, 7),
        ("branch7x7x3_3", 192, 192, 7, 1), ("branch7x7x3_4", 192, 192, 3, 3)])


def _inception_d(p, x):
    b3 = _bc(p["branch3x3_2"], _bc(p["branch3x3_1"], x), stride=2)
    b7 = _bc(p["branch7x7x3_1"], x)
    b7 = _bc(p["branch7x7x3_2"], b7, padding=[(0, 0), (3, 3)])
    b7 = _bc(p["branch7x7x3_3"], b7, padding=[(3, 3), (0, 0)])
    b7 = _bc(p["branch7x7x3_4"], b7, stride=2)
    mp = max_pool(x, 3, 2)
    return jnp.concatenate([b3, b7, mp], -1)


def _inception_e_init(key, cin):
    return _seq_init(key, [
        ("branch1x1", cin, 320, 1, 1),
        ("branch3x3_1", cin, 384, 1, 1), ("branch3x3_2a", 384, 384, 1, 3),
        ("branch3x3_2b", 384, 384, 3, 1),
        ("branch3x3dbl_1", cin, 448, 1, 1), ("branch3x3dbl_2", 448, 384, 3, 3),
        ("branch3x3dbl_3a", 384, 384, 1, 3), ("branch3x3dbl_3b", 384, 384, 3, 1),
        ("branch_pool", cin, 192, 1, 1)])


def _inception_e(p, x, pool="avg"):
    b1 = _bc(p["branch1x1"], x)
    b3 = _bc(p["branch3x3_1"], x)
    b3 = jnp.concatenate([
        _bc(p["branch3x3_2a"], b3, padding=[(0, 0), (1, 1)]),
        _bc(p["branch3x3_2b"], b3, padding=[(1, 1), (0, 0)])], -1)
    bd = _bc(p["branch3x3dbl_2"], _bc(p["branch3x3dbl_1"], x), padding=1)
    bd = jnp.concatenate([
        _bc(p["branch3x3dbl_3a"], bd, padding=[(0, 0), (1, 1)]),
        _bc(p["branch3x3dbl_3b"], bd, padding=[(1, 1), (0, 0)])], -1)
    if pool == "avg":  # FIDInceptionE_1 (inception.py:242-273)
        bp = _avg_pool3_nocount(x)
    else:  # FIDInceptionE_2 uses max pool (inception.py:275-306)
        bp = max_pool(x, 3, 1, 1)
    bp = _bc(p["branch_pool"], bp)
    return jnp.concatenate([b1, b3, bd, bp], -1)


@ARCH_REGISTRY.register(name="InceptionV3")
class InceptionV3:
    DEFAULT_BLOCK_INDEX = 3
    BLOCK_INDEX_BY_DIM = {64: 0, 192: 1, 768: 2, 2048: 3}

    @staticmethod
    def init(key):
        ks = jax.random.split(key, 20)
        i = iter(ks)
        return {
            "Conv2d_1a_3x3": _bc_init(next(i), 3, 32, 3, 3),
            "Conv2d_2a_3x3": _bc_init(next(i), 32, 32, 3, 3),
            "Conv2d_2b_3x3": _bc_init(next(i), 32, 64, 3, 3),
            "Conv2d_3b_1x1": _bc_init(next(i), 64, 80, 1, 1),
            "Conv2d_4a_3x3": _bc_init(next(i), 80, 192, 3, 3),
            "Mixed_5b": _inception_a_init(next(i), 192, 32),
            "Mixed_5c": _inception_a_init(next(i), 256, 64),
            "Mixed_5d": _inception_a_init(next(i), 288, 64),
            "Mixed_6a": _inception_b_init(next(i), 288),
            "Mixed_6b": _inception_c_init(next(i), 768, 128),
            "Mixed_6c": _inception_c_init(next(i), 768, 160),
            "Mixed_6d": _inception_c_init(next(i), 768, 160),
            "Mixed_6e": _inception_c_init(next(i), 768, 192),
            "Mixed_7a": _inception_d_init(next(i), 768),
            "Mixed_7b": _inception_e_init(next(i), 1280),
            "Mixed_7c": _inception_e_init(next(i), 2048),
        }

    @staticmethod
    def apply(params, x, output_blocks: Sequence[int] = (3,),
              resize_input=True, normalize_input=True):
        """x: (B, H, W, 3) in [0,1] -> list of block outputs
        (inception.py:124-160)."""
        outputs = []
        if resize_input:
            x = resize_bilinear(x, (299, 299))
        if normalize_input:
            x = 2 * x - 1
        x = _bc(params["Conv2d_1a_3x3"], x, stride=2)
        x = _bc(params["Conv2d_2a_3x3"], x)
        x = _bc(params["Conv2d_2b_3x3"], x, padding=1)
        x = max_pool(x, 3, 2)
        if 0 in output_blocks:
            outputs.append(x)
        x = _bc(params["Conv2d_3b_1x1"], x)
        x = _bc(params["Conv2d_4a_3x3"], x)
        x = max_pool(x, 3, 2)
        if 1 in output_blocks:
            outputs.append(x)
        x = _inception_a(params["Mixed_5b"], x)
        x = _inception_a(params["Mixed_5c"], x)
        x = _inception_a(params["Mixed_5d"], x)
        x = _inception_b(params["Mixed_6a"], x)
        x = _inception_c(params["Mixed_6b"], x)
        x = _inception_c(params["Mixed_6c"], x)
        x = _inception_c(params["Mixed_6d"], x)
        x = _inception_c(params["Mixed_6e"], x)
        if 2 in output_blocks:
            outputs.append(x)
        x = _inception_d(params["Mixed_7a"], x)
        x = _inception_e(params["Mixed_7b"], x, pool="avg")
        x = _inception_e(params["Mixed_7c"], x, pool="max")
        if 3 in output_blocks:
            outputs.append(x.mean(axis=(1, 2), keepdims=True))
        return outputs


def make_fid_feature_fn(params, jit=True):
    """(B, H, W, 3) [0,1] -> (B, 2048) pooled features for metrics/fid.py."""
    import jax as _jax

    def fn(x):
        out = InceptionV3.apply(params, x, output_blocks=(3,))[0]
        return out.reshape(out.shape[0], -1)

    return _jax.jit(fn) if jit else fn
