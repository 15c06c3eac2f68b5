#!/usr/bin/env python
"""One-way .pth → native checkpoint converter (SURVEY §5.4): reproduces the
reference loader semantics (params_ema preference, cross_fuse→cfa remap,
module. strip) and writes a torch-free .npz param tree.

Usage:
  python tools/convert_checkpoint.py KEEP-b76feb75.pth out.npz --arch keep
  python tools/convert_checkpoint.py detection_Resnet50_Final.pth out.npz --arch retinaface
"""
import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--arch", default="generic",
                   choices=["generic", "keep", "gmflow", "vqgan", "swinir",
                            "stylegan2_g", "stylegan2_d", "retinaface",
                            "parsenet", "yolov5face", "vgg"])
    args = p.parse_args()

    from comfyui_keep_tpu.utils.checkpoint import (read_pth, convert_state_dict,
                                                   embedding_rule, save_npz)
    sd = read_pth(args.src)

    if args.arch == "keep":
        from comfyui_keep_tpu.models.keep import convert_checkpoint
        tree, flownet_sd = convert_checkpoint(sd)
        if flownet_sd:
            from comfyui_keep_tpu.models.gmflow import convert_gmflow_checkpoint
            tree["flownet"] = convert_gmflow_checkpoint(flownet_sd)
    elif args.arch == "gmflow":
        from comfyui_keep_tpu.models.gmflow import convert_gmflow_checkpoint
        tree = convert_gmflow_checkpoint(sd)
    elif args.arch == "vqgan":
        tree = convert_state_dict(sd, rules=[
            embedding_rule("quantize.embedding", ("quantize", "embedding"))])
    elif args.arch == "swinir":
        from comfyui_keep_tpu.models.swinir import convert_swinir_checkpoint
        tree = convert_swinir_checkpoint(sd)
    elif args.arch == "stylegan2_g":
        from comfyui_keep_tpu.models.stylegan2 import convert_stylegan2_generator
        tree = convert_stylegan2_generator(sd)
    elif args.arch == "stylegan2_d":
        from comfyui_keep_tpu.models.stylegan2 import convert_stylegan2_discriminator
        tree = convert_stylegan2_discriminator(sd)
    elif args.arch == "vgg":
        from comfyui_keep_tpu.models.vgg import convert_vgg_checkpoint
        tree = convert_vgg_checkpoint(sd)
    else:  # generic rank-based conversion (retinaface/parsenet/yolo/...)
        tree = convert_state_dict(sd)

    save_npz(args.dst, tree)
    n = 0

    def count(t):
        nonlocal n
        if isinstance(t, dict):
            for v in t.values():
                count(v)
        elif isinstance(t, (list, tuple)):
            for v in t:
                count(v)
        elif t is not None:
            n += np.asarray(t).size

    count(tree)
    print(f"wrote {args.dst}: {n / 1e6:.2f}M params")


if __name__ == "__main__":
    main()
