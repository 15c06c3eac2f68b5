"""VGG feature extractor for perceptual losses (reference archs/vgg_arch.py).

Standard torchvision VGG topology with named layers ('conv1_1'...'pool5');
extracts intermediate activations for the requested layer names. Weights
convert from torchvision vgg19/vgg16 state dicts ('features.N.weight').
"""
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp

from comfyui_keep_tpu.ops import conv2d, conv2d_init, relu, max_pool
from comfyui_keep_tpu.utils.registry import ARCH_REGISTRY

VGG19_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
             512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
             512, 512, 512, "M", 512, 512, 512, "M"]

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def layer_names(cfg) -> List[str]:
    names, block, conv_i = [], 1, 0
    for v in cfg:
        if v == "M":
            names.append(f"pool{block}")
            block += 1
            conv_i = 0
        else:
            conv_i += 1
            names.append(f"conv{block}_{conv_i}")
            names.append(f"relu{block}_{conv_i}")
    return names


def _features_index_map(cfg):
    """torchvision features.N index for each conv layer name."""
    idx, out = 0, {}
    block, conv_i = 1, 0
    for v in cfg:
        if v == "M":
            block += 1
            conv_i = 0
            idx += 1
        else:
            conv_i += 1
            out[f"conv{block}_{conv_i}"] = idx
            idx += 2  # conv + relu
    return out


@ARCH_REGISTRY.register(name="VGGFeatureExtractor")
class VGGFeatureExtractor:
    @staticmethod
    def init(key, vgg_type="vgg19"):
        cfg = VGG19_CFG if vgg_type == "vgg19" else VGG16_CFG
        params = {}
        cin = 3
        ks = jax.random.split(key, sum(1 for v in cfg if v != "M"))
        ki = 0
        block, conv_i = 1, 0
        for v in cfg:
            if v == "M":
                block += 1
                conv_i = 0
                continue
            conv_i += 1
            params[f"conv{block}_{conv_i}"] = conv2d_init(ks[ki], 3, 3, cin, v)
            cin = v
            ki += 1
        return params

    @staticmethod
    def apply(params, x, layer_list: Sequence[str], vgg_type="vgg19",
              use_input_norm=True, range_norm=False) -> Dict[str, jnp.ndarray]:
        """x: (B, H, W, 3) in [0,1] (or [-1,1] with range_norm)."""
        cfg = VGG19_CFG if vgg_type == "vgg19" else VGG16_CFG
        if range_norm:
            x = (x + 1) / 2
        if use_input_norm:
            x = (x - jnp.asarray(IMAGENET_MEAN, x.dtype)) / jnp.asarray(IMAGENET_STD, x.dtype)
        wanted = set(layer_list)
        out = {}
        block, conv_i = 1, 0
        # run until the deepest requested layer
        names = layer_names(cfg)
        deepest = max(names.index(l) for l in layer_list)
        i = -1
        for v in cfg:
            if v == "M":
                name = f"pool{block}"
                x = max_pool(x, 2, 2)
                block += 1
                conv_i = 0
                i = names.index(name)
                if name in wanted:
                    out[name] = x
            else:
                conv_i += 1
                cname = f"conv{block}_{conv_i}"
                p = params[cname]
                x = conv2d(x, p["w"], p["b"], padding=1)
                if cname in wanted:
                    out[cname] = x
                x = relu(x)
                rname = f"relu{block}_{conv_i}"
                if rname in wanted:
                    out[rname] = x
                i = names.index(rname)
            if i >= deepest:
                break
        return out


def convert_vgg_checkpoint(sd, vgg_type="vgg19"):
    """torchvision 'features.N.weight' dict -> named param tree."""
    cfg = VGG19_CFG if vgg_type == "vgg19" else VGG16_CFG
    imap = {v: k for k, v in _features_index_map(cfg).items()}
    out = {}
    for k, v in sd.items():
        parts = k.split(".")
        if parts[0] != "features":
            continue
        idx = int(parts[1])
        if idx not in imap:
            continue
        name = imap[idx]
        entry = out.setdefault(name, {})
        if parts[2] == "weight":
            entry["w"] = v.transpose(2, 3, 1, 0)
        else:
            entry["b"] = v
    return out
