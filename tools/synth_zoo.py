#!/usr/bin/env python
"""Synthesize the COMPLETE KEEP model zoo as random-weight .pth checkpoints
in exact reference serialization and state-dict layout — the real-weights
readiness drill: the day the real checkpoints are reachable, certification is
`tools/parity_report.py --keep-ckpt ... --retinaface-ckpt ...` with zero code
changes; until then, this tool manufactures drop-in stand-ins that exercise
every loader path on both frameworks.

Files produced (layout mirrors the reference zoo,
modules/utils.py:41-97 + facelib loaders):

  KEEP-b76feb75.pth             params_ema dict, embedded flownet.model.*
                                (keep_model_loader.py:105-120 load semantics)
  detection_Resnet50_Final.pth  RetinaFace-ResNet50 state dict with the
                                DataParallel 'module.' prefix the reference
                                strips (detection/__init__.py:82-85)
  parsing_parsenet.pth          ParseNet state dict, LEGACY (non-zip) torch
                                serialization (parsing/__init__.py:41-46
                                torch.load handles both; so must read_pth)
  RealESRGAN_x2_bg.pth / RealESRGAN_x2_face.pth
                                RRDBNet x2 {'params_ema': ...} like the
                                published RealESRGAN releases (UPSCALE_MODEL
                                inputs of the KEEP nodes)

Every detector/parser net gets randomize_bn_stats: at plain random init,
eval-mode BatchNorms collapse features to constants and detector thresholds
become degenerate (tests/reference_oracle.py:randomize_bn_stats).

Usage:
  python tools/synth_zoo.py --out-dir /tmp/keep_zoo [--seed 0]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def synth_keep(path, variant="KEEP", cfg_overrides=None, seed=0):
    """Reference-layout KEEP checkpoint (shared-random; both frameworks load
    it). Same recipe as tools/parity_report.synth_shared_ckpt."""
    import torch
    from tests import reference_oracle as oracle
    from comfyui_keep_tpu.models.keep import KEEP
    cfg = dict(KEEP.config(variant))
    if cfg_overrides:
        cfg.update(cfg_overrides)
    ref = oracle.load_ref_keep(flow_stub=False)
    from tools.parity_report import ReferenceSide
    torch.manual_seed(seed)
    net = ref.KEEP(**ReferenceSide._ref_kwargs(cfg)).eval()
    torch.save({"params_ema": dict(net.state_dict())}, path)
    return path


def _calibrate_detectable_heads(net, cls_scale=8.0, face_bias=-0.6,
                                lm_scale=40.0, box_scale=4.0):
    """Make a random-init RetinaFace actually DETECT at the pipeline's fixed
    operating point (conf 0.97, eye_dist>=5; face_restoration_helper.py:221,
    233-235). Plain random heads fail it two ways: scores cluster at ~0.5
    (softmax of ~N(0, s) logits) so nothing passes 0.97, and decoded
    landmark scatter is ~1 px so eye_dist filters everything. Scaling the
    1x1 head convs spreads the outputs; the face-class bias shift places the
    upper tail of the score distribution just across 0.97. Measured on the
    parity probe image (resnet50, seed 0): 7-10 detections/frame, the score
    gap at the 0.97 boundary is 4.6e-4..2.4e-3 (~40x the ~1e-5
    cross-backend f32 noise, so the threshold never flips a candidate
    between frameworks), min eye_dist 7.9 px."""
    import torch
    with torch.no_grad():
        for ch in net.ClassHead:
            ch.conv1x1.weight.mul_(cls_scale)
            ch.conv1x1.bias.mul_(cls_scale)
            ch.conv1x1.bias.view(-1, 2)[:, 1].add_(face_bias)
        for lh in net.LandmarkHead:
            lh.conv1x1.weight.mul_(lm_scale)
            lh.conv1x1.bias.mul_(lm_scale)
        for bh in net.BboxHead:
            bh.conv1x1.weight.mul_(box_scale)
            bh.conv1x1.bias.mul_(box_scale)
    return net


def synth_retinaface(path, network="resnet50", seed=0, self_check=True):
    """RetinaFace state dict with 'module.' prefixes (the published
    detection_*_Final.pth files come from DataParallel training; the
    reference strips the prefix at load, detection/__init__.py:82-85).
    Heads are calibrated so the net produces stable detections at the
    pipeline's conf-0.97 / eye_dist-5 operating point."""
    import torch
    from tests import reference_oracle as oracle
    mod = oracle.install_ref_retinaface()
    torch.manual_seed(seed)
    net = mod.RetinaFace(network_name=network, half=False).eval()
    oracle.randomize_bn_stats(net, seed=seed + 11)
    _calibrate_detectable_heads(net)
    if self_check:
        from tools.parity_report import synth_image
        img = synth_image(np.random.default_rng(0), 640, 640)
        with torch.no_grad():
            rows = net.detect_faces(img.astype(np.float32),
                                    conf_threshold=0.97)
        eye = np.linalg.norm(rows[:, 5:7] - rows[:, 7:9], axis=1)
        n_ok = int((eye >= 5).sum())
        if not 1 <= n_ok <= 50:
            raise RuntimeError(
                f"synth detector degenerate: {len(rows)} rows at conf>=0.97, "
                f"{n_ok} with eye_dist>=5 (want 1..50)")
    sd = {f"module.{k}": v for k, v in net.state_dict().items()}
    torch.save(sd, path)
    return path


def synth_parsenet(path, seed=0):
    """ParseNet state dict in LEGACY torch serialization (covers the non-zip
    branch of utils/checkpoint.read_pth; real zoo files predate the zip
    format in some releases)."""
    import torch
    from tests.reference_oracle import (_module_from_file, FACELIB_ROOT,
                                        randomize_bn_stats)
    pn = _module_from_file("ref_synth_parsenet",
                           f"{FACELIB_ROOT}/parsing/parsenet.py")
    torch.manual_seed(seed)
    net = pn.ParseNet(in_size=512, out_size=512, parsing_ch=19).eval()
    randomize_bn_stats(net, seed=seed + 11)
    torch.save(dict(net.state_dict()), path,
               _use_new_zipfile_serialization=False)
    return path


def synth_rrdbnet(path, seed=0, num_block=2, num_feat=32, scale=2):
    """RRDBNet x2 in the published RealESRGAN release layout
    ({'params_ema': sd}; rrdbnet_arch.py). num_block defaults small — the
    drill certifies loaders and numerics, not ESRGAN quality."""
    import torch
    from tests import reference_oracle as oracle
    oracle.load_ref_arch_util()
    rr = oracle._module_from_file(
        "wm_basicsr.archs.rrdbnet_arch",
        f"{oracle.REF_ROOT}/archs/rrdbnet_arch.py")
    torch.manual_seed(seed)
    net = rr.RRDBNet(num_in_ch=3, num_out_ch=3, scale=scale,
                     num_feat=num_feat, num_block=num_block).eval()
    torch.save({"params_ema": dict(net.state_dict()),
                "params": dict(net.state_dict())}, path)
    return path


ZOO = {
    "KEEP-b76feb75.pth": ("keep_models/KEEP", "keep"),
    "detection_Resnet50_Final.pth": ("facedetection", "retinaface"),
    "parsing_parsenet.pth": ("facedetection", "parsenet"),
    "RealESRGAN_x2_bg.pth": ("upscale_models", "rrdbnet"),
    "RealESRGAN_x2_face.pth": ("upscale_models", "rrdbnet"),
}


def synth_all(out_dir, seed=0, cfg_overrides=None, variant="KEEP",
              skip_keep=False, rrdb_blocks=2):
    made = {}
    for fname, (sub, kind) in ZOO.items():
        d = os.path.join(out_dir, sub)
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, fname)
        if kind == "keep":
            if skip_keep:
                continue
            synth_keep(path, variant, cfg_overrides, seed)
        elif kind == "retinaface":
            synth_retinaface(path, "resnet50", seed)
        elif kind == "parsenet":
            synth_parsenet(path, seed)
        else:
            synth_rrdbnet(path, seed + (1 if "face" in fname else 0),
                          num_block=rrdb_blocks)
        made[fname] = path
        print(f"wrote {path} ({os.path.getsize(path) / 1e6:.1f} MB)")
    return made


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--variant", default="KEEP", choices=["KEEP", "Asian"])
    p.add_argument("--cfg-json", default=None,
                   help="JSON dict of KEEP cfg overrides (self-test sizes)")
    p.add_argument("--skip-keep", action="store_true",
                   help="aux checkpoints only (KEEP ckpt synthesized "
                        "separately by parity_report.py)")
    p.add_argument("--rrdb-blocks", type=int, default=2)
    args = p.parse_args(argv)
    import json
    cfg = json.loads(args.cfg_json) if args.cfg_json else None
    synth_all(args.out_dir, args.seed, cfg, args.variant, args.skip_keep,
              args.rrdb_blocks)


if __name__ == "__main__":
    main()
