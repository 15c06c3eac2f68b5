"""torchvision-compatible ResNet (bottleneck v1.5) — the RetinaFace-ResNet50
backbone (reference retinaface.py:125-129 builds torchvision resnet50 and taps
layer2/3/4 via IntermediateLayerGetter). NHWC, BN inference form; param tree
mirrors torchvision state-dict names so detection_Resnet50_Final.pth converts
with the generic rules.
"""
from typing import List, Tuple

import jax
import jax.numpy as jnp

from comfyui_keep_tpu.ops import (conv2d, conv2d_init, batch_norm,
                                  batch_norm_init, relu, max_pool)

EXPANSION = 4


def _bottleneck_init(key, cin, width, stride):
    ks = jax.random.split(key, 4)
    cout = width * EXPANSION
    p = {
        "conv1": {"w": conv2d_init(ks[0], 1, 1, cin, width, bias=False)["w"]},
        "bn1": batch_norm_init(width),
        "conv2": {"w": conv2d_init(ks[1], 3, 3, width, width, bias=False)["w"]},
        "bn2": batch_norm_init(width),
        "conv3": {"w": conv2d_init(ks[2], 1, 1, width, cout, bias=False)["w"]},
        "bn3": batch_norm_init(cout),
    }
    if stride != 1 or cin != cout:
        p["downsample"] = [
            {"w": conv2d_init(ks[3], 1, 1, cin, cout, bias=False)["w"]},
            batch_norm_init(cout)]
    return p


def _bottleneck(p, x, stride):
    h = relu(batch_norm(conv2d(x, p["conv1"]["w"]), p["bn1"]))
    h = relu(batch_norm(conv2d(h, p["conv2"]["w"], stride=stride, padding=1), p["bn2"]))
    h = batch_norm(conv2d(h, p["conv3"]["w"]), p["bn3"])
    if "downsample" in p:
        x = batch_norm(conv2d(x, p["downsample"][0]["w"], stride=stride),
                       p["downsample"][1])
    return relu(x + h)


LAYERS_50 = (3, 4, 6, 3)


def resnet50_init(key):
    ks = jax.random.split(key, 6)
    p = {"conv1": {"w": conv2d_init(ks[0], 7, 7, 3, 64, bias=False)["w"]},
         "bn1": batch_norm_init(64)}
    cin = 64
    for li, (blocks, width, stride) in enumerate(
            zip(LAYERS_50, (64, 128, 256, 512), (1, 2, 2, 2)), start=1):
        layer = []
        bks = jax.random.split(ks[li], blocks)
        for bi in range(blocks):
            layer.append(_bottleneck_init(bks[bi], cin, width,
                                          stride if bi == 0 else 1))
            cin = width * EXPANSION
        p[f"layer{li}"] = layer
    return p


def resnet50_features(p, x) -> Tuple:
    """x: (B, H, W, 3) -> (layer2, layer3, layer4) features
    (512, 1024, 2048 channels at strides 8/16/32)."""
    h = relu(batch_norm(conv2d(x, p["conv1"]["w"], stride=2, padding=3), p["bn1"]))
    h = max_pool(h, 3, 2, 1)
    outs = []
    for li, stride in zip((1, 2, 3, 4), (1, 2, 2, 2)):
        for bi, bp in enumerate(p[f"layer{li}"]):
            h = _bottleneck(bp, h, stride if bi == 0 else 1)
        if li >= 2:
            outs.append(h)
    return tuple(outs)
