"""SpyNet optical flow (reference archs/spynet_arch.py, 96 LoC) — the
alternate flow network used by BasicVSR. NHWC coarse-to-fine pyramid."""
import math

import jax
import jax.numpy as jnp

from comfyui_keep_tpu.ops import (conv2d, conv2d_init, relu, avg_pool_2x,
                                  resize_bilinear, flow_warp)
from comfyui_keep_tpu.utils.registry import ARCH_REGISTRY

MEAN = (0.485, 0.456, 0.406)
STD = (0.229, 0.224, 0.225)
_DIMS = [(8, 32), (32, 64), (64, 32), (32, 16), (16, 2)]


def _basic_module_init(key):
    ks = jax.random.split(key, 5)
    # torch Sequential indices 0,2,4,6,8 (relu between)
    seq = []
    for i, (cin, cout) in enumerate(_DIMS):
        seq.append(conv2d_init(ks[i], 7, 7, cin, cout))
        if i < 4:
            seq.append(None)
    return {"basic_module": seq}


def _basic_module(p, x):
    seq = p["basic_module"]
    for i in range(5):
        x = conv2d(x, seq[2 * i]["w"], seq[2 * i]["b"], padding=3)
        if i < 4:
            x = relu(x)
    return x


@ARCH_REGISTRY.register(name="SpyNet")
class SpyNet:
    @staticmethod
    def init(key):
        return {"basic_module": [
            _basic_module_init(k) for k in jax.random.split(key, 6)]}

    @staticmethod
    def _process(params, ref, supp):
        mean = jnp.asarray(MEAN, ref.dtype)
        std = jnp.asarray(STD, ref.dtype)
        refs = [(ref - mean) / std]
        supps = [(supp - mean) / std]
        for _ in range(5):
            refs.insert(0, avg_pool_2x(refs[0]))
            supps.insert(0, avg_pool_2x(supps[0]))

        b = ref.shape[0]
        h0, w0 = refs[0].shape[1] // 2, refs[0].shape[2] // 2
        flow = jnp.zeros((b, h0, w0, 2), ref.dtype)
        for level in range(6):
            h, w = refs[level].shape[1], refs[level].shape[2]
            up = resize_bilinear(flow, (flow.shape[1] * 2, flow.shape[2] * 2),
                                 align_corners=True) * 2.0
            if up.shape[1] != h:
                up = jnp.pad(up, ((0, 0), (0, 1), (0, 0), (0, 0)), mode="edge")
            if up.shape[2] != w:
                up = jnp.pad(up, ((0, 0), (0, 0), (0, 1), (0, 0)), mode="edge")
            warped = flow_warp(supps[level], up, padding_mode="border")
            inp = jnp.concatenate([refs[level], warped, up], axis=-1)
            flow = _basic_module(params["basic_module"][level], inp) + up
        return flow

    @staticmethod
    def apply(params, ref, supp):
        """ref/supp: (B, H, W, 3) in [0,1] -> flow (B, H, W, 2)."""
        h, w = ref.shape[1], ref.shape[2]
        wf = math.floor(math.ceil(w / 32.0) * 32.0)
        hf = math.floor(math.ceil(h / 32.0) * 32.0)
        refr = resize_bilinear(ref, (hf, wf))
        suppr = resize_bilinear(supp, (hf, wf))
        flow = resize_bilinear(SpyNet._process(params, refr, suppr), (h, w))
        flow = flow * jnp.asarray([w / wf, h / hf], flow.dtype)
        return flow
