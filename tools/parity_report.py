#!/usr/bin/env python
"""Real-checkpoint parity certification harness.

Given the reference checkpoints (``KEEP-b76feb75.pth``, optionally
``parsing_parsenet.pth`` / ``detection_Resnet50_Final.pth``), runs the five
BASELINE configs through this framework and — when torch is importable and
``/root/reference`` is mounted — through the actual PyTorch reference code
(keep_arch.py / face_restoration_helper.py / keep_processor.py loaded from
the reference tree), then emits a per-config PSNR/SSIM JSON report against
the >=40 dB acceptance bar (BASELINE.md).

The load path matches keep_model_loader.py:99-120: ``params_ema`` preference,
``cross_fuse->cfa`` / ``fuse_convs_dict->cft`` remap, embedded flownet
weights. Works equally with random-weight .pth files written in either torch
serialization format (self-test: tests/test_parity_report.py).

Usage:
  python tools/parity_report.py --keep-ckpt KEEP-b76feb75.pth \
      [--parsenet-ckpt parsing_parsenet.pth] \
      [--retinaface-ckpt detection_Resnet50_Final.pth] \
      [--input-image img.png] [--input-frames 'clip/*.png'] \
      [--configs 1,2,3,4,5] [--frames 20] [--out parity_report.json]

Without --input-image/--input-frames the harness uses seeded synthetic
frames and a synthetic-landmark detector (detection geometry is then
identical on both sides; detection itself is certified by its own golden
tests). PSNR/SSIM are computed between the two frameworks' final uint8
outputs per config; "pass" means PSNR >= the bar.
"""
import argparse
import glob as globmod
import json
import os
import sys
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REF_ROOT = "/root/reference"
PSNR_BAR_DB = 40.0


# ---------------------------------------------------------------------------
# synthetic inputs
# ---------------------------------------------------------------------------

def synth_image(rng, h, w):
    """Deterministic structured image: smooth gradients + texture."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = np.stack([
        0.5 + 0.4 * np.sin(xx / 37.0) * np.cos(yy / 29.0),
        0.5 + 0.4 * np.cos(xx / 23.0 + yy / 41.0),
        0.5 + 0.4 * np.sin((xx + yy) / 53.0),
    ], axis=-1)
    noise = rng.random((h, w, 3), dtype=np.float32) * 0.25
    return np.clip((base + noise) * 255.0 / 1.25, 0, 255).astype(np.uint8)


def synth_clip(rng, t, h, w, shift=3):
    """Clip of shifted crops of one larger image -> real inter-frame motion."""
    big = synth_image(rng, h + shift * t, w + shift * t)
    return [np.ascontiguousarray(big[i * shift:i * shift + h,
                                     i * shift:i * shift + w])
            for i in range(t)]


def face_landmarks_at(template, scale, angle_deg, cx, cy):
    t = template - template.mean(0)
    th = np.deg2rad(angle_deg)
    rot = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    return (t @ rot.T) * scale + np.array([cx, cy])


def detection_row(landmarks, score=0.999):
    lm = np.asarray(landmarks, np.float32)
    x1, y1 = lm.min(0) - 10
    x2, y2 = lm.max(0) + 10
    return np.concatenate([[x1, y1, x2, y2, score],
                           lm.reshape(-1)]).astype(np.float32)


def make_list_detector(rows_per_call):
    """Detector returning precomputed (N, 15) rows, one call per frame."""
    calls = [np.asarray(r, np.float32).reshape(-1, 15) for r in rows_per_call]
    state = {"i": 0}

    def detector(img_bgr, conf_threshold):
        i = state["i"]
        state["i"] = min(i + 1, len(calls) - 1)
        return calls[i].copy()

    return detector


# ---------------------------------------------------------------------------
# metrics
# ---------------------------------------------------------------------------

def psnr_ssim(a_u8, b_u8):
    from comfyui_keep_tpu.metrics.psnr_ssim import calculate_psnr, calculate_ssim
    a = np.asarray(a_u8, np.float64)
    b = np.asarray(b_u8, np.float64)
    return (float(calculate_psnr(a, b, crop_border=0)),
            float(calculate_ssim(a, b, crop_border=0)))


def seq_psnr_ssim(frames_a, frames_b):
    vals = [psnr_ssim(a, b) for a, b in zip(frames_a, frames_b)]
    return (float(np.mean([v[0] for v in vals])),
            float(np.mean([v[1] for v in vals])))


# ---------------------------------------------------------------------------
# OUR side
# ---------------------------------------------------------------------------

def build_ours(args, cfg_overrides):
    from comfyui_keep_tpu import api
    pack = api.load_models(args.variant, keep_ckpt=args.keep_ckpt,
                           use_cache=False, seed=args.seed,
                           cfg_overrides=cfg_overrides)
    if args.np_dtype == "float64":
        # f64 certification mode: weights are f32-valued (exact in f64);
        # casting makes every op run in f64 arithmetic on both sides
        import jax
        cast = lambda a: np.asarray(a, np.float64)
        pack.keep_params = jax.tree.map(cast, pack.keep_params)
        if pack.gmflow_params is not None:
            pack.gmflow_params = jax.tree.map(cast, pack.gmflow_params)
    return pack


def our_parser(args, face_size):
    if args.parsenet_ckpt:
        import jax.numpy as jnp
        from comfyui_keep_tpu.models.parsenet import (ParseNet,
                                                      convert_parsenet_checkpoint)
        from comfyui_keep_tpu.utils.checkpoint import read_pth
        tree = convert_parsenet_checkpoint(read_pth(args.parsenet_ckpt))

        def parser(x):  # (1, S, S, 3) rgb [-1, 1] -> (1, S, S, 19)
            mask, _ = ParseNet.apply(tree, jnp.asarray(x))
            return np.asarray(mask)

        return parser

    def stub(x):
        return synth_parse_logits(face_size, face_size)

    return stub


def synth_parse_logits(h, w):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    inside = (((xx - w / 2) / (w * 0.33)) ** 2 +
              ((yy - h / 2) / (h * 0.38)) ** 2) < 1.0
    logits = np.zeros((1, h, w, 19), np.float32)
    logits[0, :, :, 0] = 5.0
    logits[0, inside, 1] = 10.0
    return logits


# ---------------------------------------------------------------------------
# REFERENCE side (torch; loaded from /root/reference)
# ---------------------------------------------------------------------------

class ReferenceSide:
    """The reference's own code (keep_arch, face_restoration_helper,
    keep_processor) running under torch with minimal environment stubs
    (comfy progress bar, tiled_scale adapter, image conversions)."""

    def __init__(self, args, cfg, has_flownet):
        import torch
        self.torch = torch
        self.cfg = cfg
        self.use_double = args.np_dtype == "float64"
        from tests import reference_oracle as oracle
        self.oracle = oracle
        self._install_env_stubs()
        keep_mod = oracle.load_ref_keep(flow_stub=not has_flownet)
        self.net = keep_mod.KEEP(**self._ref_kwargs(cfg)).eval()
        if args.keep_ckpt:
            self._load_ckpt(args.keep_ckpt, strict=has_flownet)
        if self.use_double:
            self.net = self.net.double()
        self.helper_mod = oracle._module_from_file(
            "ref_parity_frh",
            f"{REF_ROOT}/modules/deps/wm_facelib/utils/face_restoration_helper.py")
        self.kp = self._load_keep_processor()
        self.ref_parsenet = self._load_parsenet(args)
        self.ref_detector = self._load_retinaface(args)

    @staticmethod
    def _ref_kwargs(cfg):
        kw = {k: cfg[k] for k in (
            "img_size", "nf", "res_blocks", "codebook_size", "emb_dim",
            "beta", "dim_embd", "n_head", "n_layers", "latent_size",
            "cfa_nhead", "cfa_dim", "kalman_attn_head_dim",
            "num_uncertainty_layers", "cond", "cross_residual", "mask_ratio")}
        kw["ch_mult"] = list(cfg["ch_mult"])
        kw["attn_resolutions"] = list(cfg["attn_resolutions"])
        kw["cft_list"] = list(cfg["cft_list"])
        kw["cfa_list"] = list(cfg["cfa_list"])
        kw["temp_reg_list"] = list(cfg["temp_reg_list"])
        return kw

    def _load_ckpt(self, path, strict):
        """keep_model_loader.py:105-120 semantics."""
        torch = self.torch
        from comfyui_keep_tpu.utils.checkpoint import read_pth
        sd_np = read_pth(path)
        sd = {}
        for k, v in sd_np.items():
            k = k.replace("cross_fuse", "cfa").replace("fuse_convs_dict", "cft")
            sd[k] = torch.tensor(np.asarray(v))
        missing, unexpected = self.net.load_state_dict(sd, strict=False)
        dropped = [k for k in unexpected]
        lost = [k for k in missing if not k.startswith("flownet.")]
        if strict and (dropped or lost):
            raise RuntimeError(f"ref load mismatch: missing={lost[:5]} "
                               f"unexpected={dropped[:5]}")

    def _install_env_stubs(self):
        torch = self.torch
        import cv2

        def _tv_normalize(t, mean, std, inplace=False):
            mean = torch.tensor(mean).view(-1, 1, 1)
            std = torch.tensor(std).view(-1, 1, 1)
            if inplace:
                t.sub_(mean).div_(std)
                return t
            return (t - mean) / std

        for name in ("torchvision", "torchvision.transforms",
                     "torchvision.transforms.functional"):
            if name not in sys.modules:
                sys.modules[name] = types.ModuleType(name)
        sys.modules["torchvision.transforms.functional"].normalize = _tv_normalize

        # comfy: ProgressBar noop + tiled_scale adapter over our bit-faithful
        # reimplementation (pipeline/tiled.py), same comfy semantics
        from comfyui_keep_tpu.pipeline.tiled import tiled_scale as np_tiled

        def comfy_tiled_scale(img_bchw, fn, tile_x=512, tile_y=512,
                              overlap=64, upscale_amount=1):
            assert tile_x == tile_y, "parity harness uses square tiles"
            x = img_bchw.detach().cpu().numpy()[0].transpose(1, 2, 0)

            def model_fn(tiles_nhwc):
                t = torch.tensor(tiles_nhwc.transpose(0, 3, 1, 2))
                with torch.no_grad():
                    out = fn(t)
                return out.detach().cpu().numpy().transpose(0, 2, 3, 1)

            out = np_tiled(x, model_fn, upscale_amount, tile=tile_x,
                           overlap=overlap)
            return torch.tensor(out.transpose(2, 0, 1)[None])

        for name in ("comfy", "comfy.model_management", "comfy.utils"):
            if name not in sys.modules:
                sys.modules[name] = types.ModuleType(name)
        cu = sys.modules["comfy.utils"]
        cu.ProgressBar = lambda *a, **k: types.SimpleNamespace(
            update=lambda *a: None)
        cu.tiled_scale = comfy_tiled_scale
        sys.modules["comfy.model_management"].get_torch_device = lambda: "cpu"

        # wm_basicsr.utils.img_util / video_util used by keep_processor
        def img2tensor(img, bgr2rgb=True, float32=True):
            img = img.astype(np.float32) if float32 else img
            if bgr2rgb:
                img = cv2.cvtColor(img.astype(np.float32), cv2.COLOR_BGR2RGB)
            return torch.from_numpy(img.transpose(2, 0, 1))

        def tensor2img(tensor, rgb2bgr=True, min_max=(0, 1)):
            t = tensor.squeeze(0).float().detach().cpu().clamp_(*min_max)
            t = (t - min_max[0]) / (min_max[1] - min_max[0])
            img = t.numpy().transpose(1, 2, 0)
            if rgb2bgr:
                img = cv2.cvtColor(img, cv2.COLOR_RGB2BGR)
            return (img * 255.0).round().astype(np.uint8)

        wu = types.ModuleType("wm_basicsr.utils.img_util")
        wu.img2tensor = img2tensor
        wu.tensor2img = tensor2img
        sys.modules["wm_basicsr.utils.img_util"] = wu
        vu = types.ModuleType("wm_basicsr.utils.video_util")
        vu.VideoReader = vu.VideoWriter = object
        sys.modules["wm_basicsr.utils.video_util"] = vu

        # wm_facelib package plumbing for the helper module
        for name in ("wm_facelib", "wm_facelib.detection", "wm_facelib.parsing",
                     "wm_facelib.utils"):
            if name not in sys.modules:
                m = types.ModuleType(name)
                m.__path__ = []
                sys.modules[name] = m
        from tests.reference_oracle import _module_from_file
        misc = _module_from_file(
            "wm_facelib.utils.misc",
            f"{REF_ROOT}/modules/deps/wm_facelib/utils/misc.py")
        sys.modules["wm_facelib.utils.misc"] = misc
        sys.modules["wm_facelib.detection"].init_detection_model = \
            lambda *a, **k: None
        sys.modules["wm_facelib.parsing"].init_parsing_model = \
            lambda *a, **k: None
        self._img2tensor, self._tensor2img = img2tensor, tensor2img
        self._is_gray = misc.is_gray

    def _load_keep_processor(self):
        torch = self.torch
        import cv2
        import importlib.util
        pkg = types.ModuleType("ref_parity_kp_pkg")
        pkg.__path__ = []
        utils = types.ModuleType("ref_parity_kp_pkg.utils")

        def comfy_image_to_cv2(t):
            if t.ndim == 3:
                t = t.unsqueeze(0)
            img = (t.cpu().numpy().squeeze(0) * 255).astype(np.uint8)
            return cv2.cvtColor(img, cv2.COLOR_RGB2BGR)

        def cv2_to_comfy_image(img):
            rgb = cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
            return torch.from_numpy(rgb).unsqueeze(0)

        utils.comfy_image_to_cv2 = comfy_image_to_cv2
        utils.cv2_to_comfy_image = cv2_to_comfy_image
        sys.modules["ref_parity_kp_pkg"] = pkg
        sys.modules["ref_parity_kp_pkg.utils"] = utils
        spec = importlib.util.spec_from_file_location(
            "ref_parity_kp_pkg.keep_processor",
            f"{REF_ROOT}/modules/keep_processor.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules["ref_parity_kp_pkg.keep_processor"] = mod
        spec.loader.exec_module(mod)
        self._cv2_to_comfy = cv2_to_comfy_image
        self._comfy_to_cv2 = comfy_image_to_cv2
        return mod

    def _load_parsenet(self, args):
        if not args.parsenet_ckpt:
            return None
        torch = self.torch
        from tests.reference_oracle import _module_from_file
        pn = _module_from_file(
            "ref_parity_parsenet",
            f"{REF_ROOT}/modules/deps/wm_facelib/parsing/parsenet.py")
        net = pn.ParseNet(in_size=512, out_size=512, parsing_ch=19).eval()
        from comfyui_keep_tpu.utils.checkpoint import read_pth
        sd = {k: torch.tensor(np.asarray(v))
              for k, v in read_pth(args.parsenet_ckpt).items()}
        net.load_state_dict(sd, strict=True)
        return net

    def _load_retinaface(self, args):
        """The reference's OWN RetinaFace (retinaface.py:208-252) via the
        oracle's mini-torchvision, loaded from the checkpoint with the
        'module.' prefix strip of detection/__init__.py:82-85."""
        if not args.retinaface_ckpt:
            return None
        torch = self.torch
        mod = self.oracle.install_ref_retinaface()
        net = mod.RetinaFace(network_name="resnet50", half=False).eval()
        from comfyui_keep_tpu.utils.checkpoint import read_pth
        sd = {}
        for k, v in read_pth(args.retinaface_ckpt).items():
            if k.startswith("module."):
                k = k[len("module."):]
            sd[k] = torch.tensor(np.asarray(v))
        net.load_state_dict(sd, strict=True)
        return net

    # -- runners ------------------------------------------------------------

    def make_helper(self, face_size, upscale_factor, detector_rows, use_parse,
                    parser_stub_size=None):
        h = self.helper_mod.FaceRestoreHelper(
            upscale_factor=upscale_factor, face_size=face_size,
            use_parse=use_parse, device="cpu", model_rootpath="/tmp")
        if detector_rows is not None:
            det_fn = make_list_detector(detector_rows)
            # numpy rows: get_face_landmarks_5 does numpy math on the result
            # (face_restoration_helper.py:221-240)
            h.face_detector = types.SimpleNamespace(detect_faces=det_fn)
        elif self.ref_detector is not None:
            # real reference detector forward on the torch side
            h.face_detector = self.ref_detector
        if use_parse:
            if self.ref_parsenet is not None:
                h.face_parse = self.ref_parsenet
            else:
                torch = self.torch
                size = parser_stub_size or face_size

                class _Stub(torch.nn.Module):
                    def forward(self, x):
                        lg = synth_parse_logits(size, size)[0].transpose(2, 0, 1)
                        return torch.tensor(lg)[None], None

                h.face_parse = _Stub()
        return h

    def _net_callable(self):
        """The net as the keep_processor calls it; in f64 mode the f32
        pipeline tensors are cast at the net boundary (weights are f32-valued
        so both frameworks run identical f64 programs)."""
        if not self.use_double:
            return self.net
        net = self.net
        torch = self.torch

        def fwd(x, **kw):
            # the reference pins a few internal constants to f32 via
            # `.float()` (vqgan_arch.py:86 codebook one-hots, gmflow
            # geometry.py:14 coordinate grids), which breaks double matmuls;
            # inside the forward, `.float()` means "computation dtype"
            orig_float = torch.Tensor.float
            torch.Tensor.float = lambda t: t.to(torch.float64)
            try:
                return net(x.double(), **kw)
            finally:
                torch.Tensor.float = orig_float

        return fwd

    def make_processor(self, helper, bg_model=None, face_model=None):
        pack = types.SimpleNamespace(
            keep_net=self._net_callable(), face_helper=helper,
            bg_upscale_model=bg_model, face_upscale_model=face_model,
            device="cpu", model_type_str="KEEP")
        return self.kp.KEEPFaceProcessor(pack)

    def run_image(self, img_bgr, final_upscale, has_aligned, detector_rows,
                  use_parse, bg_model=None, face_model=None,
                  only_center_face=True):
        helper = self.make_helper(self.cfg["img_size"], final_upscale,
                                  detector_rows, use_parse)
        proc = self.make_processor(helper, bg_model, face_model)
        with self.torch.no_grad():
            return proc.process_image(img_bgr, final_upscale, has_aligned,
                                      only_center_face, False)

    def run_net_chunked(self, faces_bgr, max_clip_length,
                        record_indices=False):
        """The reference's stage-3 restore loop on an aligned face stream
        (keep_processor.py:256-275: max_clip_length chunks, per-chunk state
        reset, 1-frame chunks duplicated and frame 0 taken). This is the
        right oracle for BASELINE config 3 — the reference's aligned
        *sequence pipeline* discards restored faces and returns background
        only (keep_processor.py:289-290), so run_sequence cannot certify the
        restore math.

        record_indices=True additionally returns the per-frame top-1
        codebook indices the reference picked (intercepted at
        quantize.get_codebook_feat, keep_arch.py:1088), in net-call order —
        one (1, L) array per frame incl. the duplicate of 1-frame chunks."""
        torch = self.torch
        from comfyui_keep_tpu.utils.image import bgr_u8_to_rgb_pm1
        # identical f32 input prep on both sides, cast at the net boundary
        x = np.stack([bgr_u8_to_rgb_pm1(f) for f in faces_bgr])
        xt = torch.tensor(x.transpose(0, 3, 1, 2)).unsqueeze(0)
        net = self._net_callable()
        rec = []
        orig_gcf = self.net.quantize.get_codebook_feat

        def recording_gcf(indices, shape):
            rec.append(np.asarray(indices.detach().cpu()).reshape(
                shape[0], -1).astype(np.int32))
            return orig_gcf(indices, shape)

        outs = []
        n = xt.shape[1]
        try:
            if record_indices:
                self.net.quantize.get_codebook_feat = recording_gcf
            with torch.no_grad():
                for s in range(0, n, max_clip_length):
                    clip = xt[:, s:min(s + max_clip_length, n)]
                    if clip.shape[1] == 1:
                        clip = torch.cat([clip, clip], dim=1)
                        outs.append(net(clip, need_upscale=False)[:, 0:1])
                    else:
                        outs.append(net(clip, need_upscale=False))
        finally:
            self.net.quantize.get_codebook_feat = orig_gcf
        allr = torch.cat(outs, dim=1).squeeze(0)
        frames = [self._tensor2img(t, rgb2bgr=True, min_max=(-1, 1))
                  for t in allr]
        return (frames, rec) if record_indices else frames

    def run_sequence(self, frames_bgr, final_upscale, has_aligned,
                     detector_rows, use_parse, max_clip_length,
                     only_center_face=True, bg_model=None, face_model=None):
        torch = self.torch
        helper = self.make_helper(self.cfg["img_size"], final_upscale,
                                  detector_rows, use_parse)
        proc = self.make_processor(helper, bg_model, face_model)
        seq = torch.cat([self._cv2_to_comfy(f) for f in frames_bgr], dim=0)
        with torch.no_grad():
            out = proc.process_image_sequence(
                seq, final_upscale, has_aligned, only_center_face, False,
                max_clip_length)
        return [self._comfy_to_cv2(out[i]) for i in range(out.shape[0])]


# ---------------------------------------------------------------------------
# teacher-forced certification (separates discrete code agreement from
# continuous numeric fidelity)
# ---------------------------------------------------------------------------

def forced_net_compare(args, pack, ref, frames_bgr, clip_len):
    """Run the reference net (chunked, recording its top-1 codebook picks),
    then run OUR net on the same stream with those indices teacher-forced.

    Rationale: end-to-end f32 PSNR between ANY two float implementations of
    this net is bounded by the fp32 chaos floor with random weights — the
    argmax over 1024 codebook logits (keep_arch.py:1086-1088) flips on
    ~1e-6 logit noise and each flip swaps a whole 16x16 decoded patch
    (measured: ours-CPU-f32 vs torch-f32 is ~10 dB on config 1, the same as
    ours-TPU-f32-highest — the backend adds nothing). Teacher-forcing splits
    the certification into (a) per-step discrete agreement given the
    reference's state trajectory and (b) PSNR of the continuous path given
    identical code selection, which IS backend-sensitive and must meet the
    bar."""
    import jax
    import jax.numpy as jnp
    from comfyui_keep_tpu.models.keep import KEEP
    from comfyui_keep_tpu.models.gmflow import flow_from_clip
    from comfyui_keep_tpu.utils.image import bgr_u8_to_rgb_pm1

    theirs, rec = ref.run_net_chunked(frames_bgr, clip_len,
                                      record_indices=True)

    cfg = pack.keep_cfg
    gm = pack.gmflow_params
    dtype = jnp.float64 if args.np_dtype == "float64" else jnp.float32
    x_all = np.stack([bgr_u8_to_rgb_pm1(f) for f in frames_bgr])
    fns = {}

    def get_fn(t):
        if t not in fns:
            def fn(kp, gp, xc, fi):
                flows = (flow_from_clip(gp, xc, planes=True)
                         if gm is not None else None)
                return KEEP.apply(kp, xc, flows=flows, remat=False,
                                  scan_unroll=2, force_indices=fi,
                                  return_aux=True, **cfg)
            fns[t] = jax.jit(fn)
        return fns[t]

    outs, agree, total = [], 0, 0
    k = 0  # cursor into rec (net-call order)
    n = len(x_all)
    for s in range(0, n, clip_len):
        clip = x_all[s:s + clip_len]
        dup = clip.shape[0] == 1
        if dup:
            clip = np.concatenate([clip, clip], axis=0)
        t = clip.shape[0]
        fi = np.stack(rec[k:k + t], axis=1)  # (1, t, L)
        k += t
        out, aux = get_fn(t)(pack.keep_params, gm,
                             jnp.asarray(clip[None], dtype),
                             jnp.asarray(fi, jnp.int32))
        # per-step discrete agreement: OUR argmax pick given the
        # reference's trajectory vs the reference's pick
        our_idx = np.asarray(jnp.argmax(aux["logits"], axis=-1))  # (t, L)
        agree += int((our_idx == fi[0]).sum())
        total += our_idx.size
        out = np.asarray(out[0], np.float32)
        if dup:
            out = out[:1]
        outs.extend(out)
    from comfyui_keep_tpu.utils.image import rgb_pm1_to_bgr_u8
    ours = [rgb_pm1_to_bgr_u8(o) for o in outs]
    p, ss = seq_psnr_ssim(ours, theirs)
    return dict(psnr_db_forced=p, ssim_forced=ss,
                index_agreement=agree / max(total, 1),
                pass_forced=p >= args.bar)


# ---------------------------------------------------------------------------
# shared deterministic 2x upscaler (config 5)
# ---------------------------------------------------------------------------

_BLUR_K = np.float32([[1, 2, 1], [2, 4, 2], [1, 2, 1]]) / 16.0


def np_sr2x(tiles_nhwc):
    """(N, h, w, C) [0,1] -> (N, 2h, 2w, C): nearest 2x + fixed 3x3 blur."""
    x = tiles_nhwc.repeat(2, axis=1).repeat(2, axis=2)
    xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    out = np.zeros_like(x)
    for dy in range(3):
        for dx in range(3):
            out += _BLUR_K[dy, dx] * xp[:, dy:dy + x.shape[1],
                                        dx:dx + x.shape[2]]
    return out


def make_our_upscaler(tile=512, overlap=64):
    """u8 BGR -> u8 BGR, through OUR comfy-faithful tiled_scale (the
    reference side runs the same net through ITS tiled path)."""
    from comfyui_keep_tpu.pipeline.tiled import tiled_scale

    def up(img_bgr_u8):
        x = img_bgr_u8[..., ::-1].astype(np.float32) / 255.0
        out = tiled_scale(x, np_sr2x, 2, tile=tile, overlap=overlap)
        out = np.clip(out, 0.0, 1.0)
        return (out[..., ::-1] * 255.0).astype(np.uint8)

    return up


def make_ref_upscaler_model():
    import torch

    def model(bchw):
        x = bchw.detach().cpu().numpy().transpose(0, 2, 3, 1)
        return torch.tensor(np_sr2x(x).transpose(0, 3, 1, 2))

    return types.SimpleNamespace(model=model, scale=2)


def _rrdb_scale_from_tree(tree):
    """Overall net scale from conv_first input channels (the scale-1/2
    variants pixel-unshuffle the input: rrdbnet_arch.py:107-122)."""
    cin = int(np.asarray(tree["conv_first"]["w"]).shape[2])
    return {3: 4, 12: 2, 48: 1}[cin]


def make_our_real_upscaler(ckpt, tile=512, overlap=64):
    """Real RRDBNet from a RealESRGAN-layout .pth, applied through OUR
    comfy-faithful tiled path — u8 BGR -> u8 BGR, the pack.bg_upscaler /
    face_upscaler plug-in interface (keep_processor.py:126-132 semantics:
    [0,1] clamp then u8)."""
    import jax
    import jax.numpy as jnp
    from comfyui_keep_tpu.models.sr_basic import RRDBNet
    from comfyui_keep_tpu.pipeline.tiled import tiled_scale
    from comfyui_keep_tpu.utils.checkpoint import read_pth, convert_state_dict
    tree = convert_state_dict(read_pth(ckpt))
    scale = _rrdb_scale_from_tree(tree)
    fwd = jax.jit(lambda x: RRDBNet.apply(tree, x, scale=scale))

    def model_fn(tiles_nhwc):
        return np.asarray(fwd(jnp.asarray(tiles_nhwc)), np.float32)

    def up(img_bgr_u8):
        x = img_bgr_u8[..., ::-1].astype(np.float32) / 255.0
        out = tiled_scale(x, model_fn, scale, tile=tile, overlap=overlap)
        out = np.clip(out, 0.0, 1.0)
        return (out[..., ::-1] * 255.0).astype(np.uint8)

    up.scale = scale
    return up


def make_ref_real_upscaler_model(ckpt):
    """The same checkpoint as a reference-side spandrel-like descriptor:
    the reference rrdbnet_arch.py net under torch, driven by the
    reference's own tiled path (keep_processor.py:126-132)."""
    import torch
    from tests import reference_oracle as oracle
    from comfyui_keep_tpu.utils.checkpoint import read_pth
    oracle.load_ref_arch_util()
    rr = oracle._module_from_file(
        "wm_basicsr.archs.rrdbnet_arch",
        f"{oracle.REF_ROOT}/archs/rrdbnet_arch.py")
    sd_np = read_pth(ckpt)
    body_idx = [int(k.split(".")[1]) for k in sd_np if k.startswith("body.")]
    num_feat = int(sd_np["conv_first.weight"].shape[0])
    cin = int(sd_np["conv_first.weight"].shape[1])
    scale = {3: 4, 12: 2, 48: 1}[cin]
    net = rr.RRDBNet(num_in_ch=3, num_out_ch=3, scale=scale,
                     num_feat=num_feat, num_block=max(body_idx) + 1).eval()
    net.load_state_dict({k: torch.tensor(np.asarray(v))
                         for k, v in sd_np.items()}, strict=True)

    def model(bchw):
        with torch.no_grad():
            return net(bchw)

    return types.SimpleNamespace(model=model, scale=scale)


# ---------------------------------------------------------------------------
# configs
# ---------------------------------------------------------------------------

def _load_input_image(args, rng, size):
    import cv2
    if args.input_image:
        img = cv2.imread(args.input_image, cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(args.input_image)
        return img
    # --input-size decouples the probe image's pixel size from the model's
    # face size: small-config drills still need 512-scale detection-space
    # content for the calibrated real detector to fire
    size = args.input_size or size
    return synth_image(rng, int(size * 1.2), int(size * 1.2))


def _load_input_frames(args, rng, t, size):
    import cv2
    if args.input_frames:
        paths = sorted(globmod.glob(args.input_frames))[:t]
        if not paths:
            raise FileNotFoundError(args.input_frames)
        return [cv2.imread(p, cv2.IMREAD_COLOR) for p in paths]
    size = args.input_size or size
    return synth_clip(rng, t, size, size)


def run_config1(args, pack, ref, rng):
    """Pre-aligned single 512 face (keep_processor.py:161-175)."""
    import cv2
    size = pack.keep_cfg["img_size"]
    img = cv2.resize(_load_input_image(args, rng, size), (size, size),
                     interpolation=cv2.INTER_LINEAR)
    ours = pack.processor(args.np_dtype).process_image(
        img, final_upscale_factor=1.0, has_aligned=True)
    if ref is None:
        return dict(psnr_db=None, ssim=None,
                    notes="reference unavailable; ours-only run OK",
                    out_shape=list(ours.shape))
    theirs = ref.run_image(img, 1.0, True, None, use_parse=False)
    p, s = psnr_ssim(ours, theirs)
    res = dict(psnr_db=p, ssim=s)
    if args.forced:
        # net-level teacher-forced pass: 1-frame stream = the aligned
        # single-image math (T=2 duplication, frame 0)
        res.update(forced_net_compare(args, pack, ref, [img], 2))
    return res


def _detection_space(img_hw):
    """Detection runs on read_image's output: min-side-512 upscale
    (face_restoration_helper.py:172-184)."""
    h, w = img_hw
    f = max(1.0, 512.0 / min(h, w))
    return h * f, w * f


def _single_face_rows(template, img_hw, n_calls):
    h, w = _detection_space(img_hw)
    lm = face_landmarks_at(template, scale=0.82 * min(h, w) / 512.0,
                           angle_deg=6.0, cx=w * 0.52, cy=h * 0.48)
    return [detection_row(lm)[None] for _ in range(n_calls)]


def run_config2(args, pack, ref, rng):
    """Unaligned single image: detect -> align -> restore -> parse-mask
    paste-back (keep_processor.py:134-194)."""
    from comfyui_keep_tpu.facelib.helper import (FaceRestoreHelper,
                                                 FFHQ_TEMPLATE_512)
    size = pack.keep_cfg["img_size"]
    img = _load_input_image(args, rng, size)
    det_report = None
    if args.retinaface_ckpt and ref is not None:
        # real-detector certification: both frameworks' forwards compared
        # directly, then the agreed detections replayed into both
        # pipelines (see _detection_parity for why replay)
        rows, det_report = _detection_parity(
            args, ref, [_read_for_detection(ref, img)])
        detector = make_list_detector([r.copy() for r in rows])
    elif args.retinaface_ckpt:
        rows, detector = None, _real_detector(args)
    else:
        rows = _single_face_rows(FFHQ_TEMPLATE_512, img.shape[:2], 1)
        detector = make_list_detector(rows)
    parser = our_parser(args, size)
    pack.face_helper = FaceRestoreHelper(face_size=size, detector=detector,
                                         parser=parser, use_parse=True)
    ours = pack.processor(args.np_dtype).process_image(
        img, final_upscale_factor=1.0, has_aligned=False)
    if ref is None:
        return dict(psnr_db=None, ssim=None,
                    notes="reference unavailable; ours-only run OK",
                    out_shape=list(ours.shape))
    theirs = ref.run_image(img, 1.0, False, [r.copy() for r in rows],
                           use_parse=True)
    p, s = psnr_ssim(ours, theirs)
    res = dict(psnr_db=p, ssim=s)
    if det_report is not None:
        res["det"] = det_report
        crops = _aligned_crops(pack, img, rows[0])
        if crops and args.forced:
            res.update(forced_net_compare(args, pack, ref, crops[:1], 2))
    return res


def _real_detector(args):
    from comfyui_keep_tpu.facelib.factory import init_detection_model
    root = os.path.dirname(os.path.abspath(args.retinaface_ckpt))
    return init_detection_model("retinaface_resnet50", model_rootpath=root)


def _read_for_detection(ref, img):
    """The detection-space image (min-side-512 upscale) exactly as both
    helpers produce it (face_restoration_helper.py:172-184)."""
    helper = ref.make_helper(ref.cfg["img_size"], 1.0, None, False)
    helper.read_image(img)
    return helper.input_img


def _detection_parity(args, ref, det_imgs):
    """Real RetinaFace-ResNet50 forwards on BOTH frameworks over the same
    detection-space frames (ours on the target backend; reference's own
    retinaface.py:208-252 under torch). Returns (rows_ours, det_report).

    The restore leg then REPLAYS rows_ours into both pipelines: running
    each side on its own detections would feed the KEEP codebook argmax
    crops differing by float noise, and the restore PSNR would collapse to
    the ~12 dB chaos floor that docs/PARITY.md isolates for configs 1/3 by
    teacher-forcing — a property of the model's discreteness, not an
    implementation divergence. Detector agreement is certified HERE,
    numerically, on the forward outputs themselves."""
    det = _real_detector(args)
    rows_ours = [np.asarray(det(im, 0.97), np.float32).reshape(-1, 15)
                 for im in det_imgs]
    counts = [int(a.shape[0]) for a in rows_ours]
    if ref is None or ref.ref_detector is None:
        return rows_ours, {"frames": len(det_imgs),
                           "detections_per_frame": counts,
                           "note": "reference detector unavailable"}
    import torch
    rows_ref = []
    with torch.no_grad():
        for im in det_imgs:
            r = ref.ref_detector.detect_faces(im, 0.97)
            rows_ref.append(np.asarray(r, np.float32).reshape(-1, 15))
    counts_agree = all(a.shape[0] == b.shape[0]
                      for a, b in zip(rows_ours, rows_ref))
    rep = {"frames": len(det_imgs), "detections_per_frame": counts,
           "counts_agree": bool(counts_agree)}
    if counts_agree and sum(counts):
        pairs = [(a, b) for a, b in zip(rows_ours, rows_ref) if a.shape[0]]
        rep["max_landmark_px"] = max(
            float(np.abs(a[:, 5:15] - b[:, 5:15]).max()) for a, b in pairs)
        rep["max_box_px"] = max(
            float(np.abs(a[:, :4] - b[:, :4]).max()) for a, b in pairs)
        rep["max_score_delta"] = max(
            float(np.abs(a[:, 4] - b[:, 4]).max()) for a, b in pairs)
        # 0.5 px in detection space is far inside the pipeline's own
        # granularity (5 px eye-dist filter, integer paste grid) yet ~50x
        # the observed cross-backend float noise
        rep["landmarks_agree"] = bool(rep["max_landmark_px"] <= 0.5)
    # A run where neither detector found any face would make counts_agree
    # trivially true and skip the landmark comparison entirely — that must
    # not certify. Flag it and fail agreement.
    rep["vacuous"] = not sum(counts)
    rep["agree"] = bool(counts_agree and sum(counts)
                        and rep.get("landmarks_agree", True))
    return rows_ours, rep


def _trackable_rows(rows, threshold: float = 60.0):
    """Filter per-frame detection rows to temporally trackable chains:
    keep only detections that continue a centroid chain from frame 0
    within `threshold` px in EVERY frame (chains that break are dropped
    from all frames). Needed for the config-4 replay because random-weight
    detections flicker between frames, and the REFERENCE tracker
    (keep_processor.py:42-115) calls scipy linear_sum_assignment on a
    cost matrix with raw np.inf for >75 px pairs — a frame where some
    active track has no nearby detection makes that matrix infeasible and
    the reference CRASHES ('cost matrix is infeasible'; our tracker
    pre-masks infeasible pairs, a documented robustness delta). The
    detection-parity leg certifies the UNFILTERED forwards; the filter
    only shapes what both pipelines replay."""
    cents = [r[:, 5:15].reshape(-1, 5, 2).mean(1) if r.shape[0]
             else np.zeros((0, 2), np.float32) for r in rows]
    chains = [[j] for j in range(len(cents[0]))]
    for i in range(1, len(rows)):
        nxt, used = [], set()
        for ch in chains:
            if not len(cents[i]):
                continue
            d = np.linalg.norm(cents[i] - cents[i - 1][ch[-1]], axis=1)
            for u in used:
                d[u] = np.inf
            j = int(np.argmin(d))
            if np.isfinite(d[j]) and d[j] < threshold:
                ch.append(j)
                nxt.append(ch)
                used.add(j)
        chains = nxt
        if not chains:
            break
    if not chains:
        if rows[0].shape[0] == 0:
            # no frame-0 detections at all: nothing to replay — return
            # empty rows so the caller reports a clean zero-detection
            # outcome instead of crashing on an empty argmax
            return [np.zeros((0, rows[0].shape[1]), rows[0].dtype)
                    for _ in rows]
        # nothing trackable: replay ONE synthetic stationary chain (the
        # top-score frame-0 detection repeated), still identical on both
        # sides
        top = rows[0][int(np.argmax(rows[0][:, 4]))][None].copy()
        return [top.copy() for _ in rows]
    return [rows[i][[ch[i] for ch in chains]] for i in range(len(rows))]


def _aligned_crops(pack, img, rows0):
    """Aligned face crops via OUR helper from the agreed detections of one
    frame — the exact crops both pipelines feed the net. Input to the
    forced net leg: raw restore PSNR over real-detected crops is bounded
    by the argmax chaos floor even with identical crops on both sides
    (cross-FRAMEWORK float noise flips the codebook pick; measured
    11.6 dB on config 2 with dets agreeing to 6e-5 px), so configs 2/4/5
    certify the net the same way configs 1/3 do — teacher-forced — while
    the raw end-to-end PSNR stays in the report as an informational
    floor-bounded number."""
    from comfyui_keep_tpu.facelib.helper import FaceRestoreHelper
    h = FaceRestoreHelper(face_size=pack.keep_cfg["img_size"],
                          detector=make_list_detector([rows0.copy()]),
                          parser=None, use_parse=False)
    h.read_image(img)
    h.get_face_landmarks_5(only_center_face=False, eye_dist_threshold=5)
    h.align_warp_face()
    return list(h.cropped_faces)


def run_config3(args, pack, ref, rng):
    """Aligned T-frame clip: Kalman cross-frame propagation with
    max_clip_length chunking (keep_processor.py:263-270)."""
    import cv2
    size = pack.keep_cfg["img_size"]
    t = args.frames
    frames = [cv2.resize(f, (size, size), interpolation=cv2.INTER_LINEAR)
              for f in _load_input_frames(args, rng, t, size)]
    proc = pack.processor(args.np_dtype)
    ours = proc.restore_face_stream(frames, max_clip_length=args.clip)
    ours = [f.astype(np.uint8) for f in ours]
    if ref is None:
        return dict(psnr_db=None, ssim=None,
                    notes="reference unavailable; ours-only run OK",
                    frames=len(ours))
    theirs = ref.run_net_chunked(frames, max_clip_length=args.clip)
    p, s = seq_psnr_ssim(ours, theirs)
    res = dict(psnr_db=p, ssim=s, frames=len(ours))
    if args.forced:
        res.update(forced_net_compare(args, pack, ref, frames, args.clip))
    return res


def run_config4(args, pack, ref, rng):
    """Multiface tracked sequence, interleaved batched restore
    (keep_processor.py:196-307)."""
    from comfyui_keep_tpu.facelib.helper import (FaceRestoreHelper,
                                                 FFHQ_TEMPLATE_512)
    size = pack.keep_cfg["img_size"]
    t = min(args.frames, 5)
    frames = _load_input_frames(args, rng, t, int(size * 1.3))
    h, w = _detection_space(frames[0].shape[:2])
    sc = min(h, w) / 512.0
    det_report = None
    if args.retinaface_ckpt and ref is not None:
        # real multiface detection: the calibrated synth detector yields
        # ~7-10 stable detections/frame; forwards compared directly per
        # frame, agreed rows replayed into both tracked pipelines
        rows, det_report = _detection_parity(
            args, ref, [_read_for_detection(ref, f) for f in frames])
        rows = _trackable_rows(rows)
        det_report["replayed_per_frame"] = [int(r.shape[0]) for r in rows]
        if sum(r.shape[0] for r in rows) == 0:
            # nothing replayable (e.g. zero frame-0 detections): both
            # pipelines would restore nothing and the PSNR would compare
            # identical unprocessed frames — that must not certify
            det_report["vacuous_replay"] = True
            det_report["agree"] = False
        detector = make_list_detector([r.copy() for r in rows])
    elif args.retinaface_ckpt:
        rows, detector = None, _real_detector(args)
    else:
        rows = []
        for i in range(t):
            lm_a = face_landmarks_at(FFHQ_TEMPLATE_512, 0.35 * sc, 0.0,
                                     w * 0.3 + 2 * i, h * 0.35)
            lm_b = face_landmarks_at(FFHQ_TEMPLATE_512, 0.3 * sc, -5.0,
                                     w * 0.7, h * 0.65 + 2 * i)
            rows.append(np.stack([detection_row(lm_a), detection_row(lm_b)]))
        detector = make_list_detector(rows)
    parser = our_parser(args, size)
    pack.face_helper = FaceRestoreHelper(
        face_size=size, detector=detector, parser=parser, use_parse=True)
    ours = pack.processor(args.np_dtype).process_image_sequence(
        frames, final_upscale_factor=1.0, only_center_face=False,
        max_clip_length=args.clip)
    if ref is None:
        return dict(psnr_db=None, ssim=None,
                    notes="reference unavailable; ours-only run OK",
                    frames=len(ours))
    theirs = ref.run_sequence(frames, 1.0, False, [r.copy() for r in rows],
                              use_parse=True, max_clip_length=args.clip,
                              only_center_face=False)
    p, s = seq_psnr_ssim(ours, theirs)
    res = dict(psnr_db=p, ssim=s, frames=len(ours))
    if det_report is not None:
        res["det"] = det_report
        crops = _aligned_crops(pack, frames[0], rows[0])
        if crops and args.forced:
            res.update(forced_net_compare(args, pack, ref, crops[:1], 2))
    return res


def run_config5(args, pack, ref, rng):
    """bg + face upscalers + final_upscale_factor compositing
    (keep_processor.py:126-132, 279-304)."""
    from comfyui_keep_tpu.facelib.helper import (FaceRestoreHelper,
                                                 FFHQ_TEMPLATE_512)
    size = pack.keep_cfg["img_size"]
    img = _load_input_image(args, rng, size)
    det_report = None
    if args.retinaface_ckpt and ref is not None:
        rows, det_report = _detection_parity(
            args, ref, [_read_for_detection(ref, img)])
        detector = make_list_detector([r.copy() for r in rows])
    elif args.retinaface_ckpt:
        rows, detector = None, _real_detector(args)
    else:
        rows = _single_face_rows(FFHQ_TEMPLATE_512, img.shape[:2], 1)
        detector = make_list_detector(rows)
    parser = our_parser(args, size)
    pack.face_helper = FaceRestoreHelper(
        face_size=size, detector=detector, parser=parser, use_parse=True)
    if args.bg_ckpt:
        pack.bg_upscaler = make_our_real_upscaler(args.bg_ckpt)
        bg_model = make_ref_real_upscaler_model(args.bg_ckpt)
    else:
        pack.bg_upscaler = make_our_upscaler()
        bg_model = make_ref_upscaler_model()
    if args.face_ckpt:
        pack.face_upscaler = make_our_real_upscaler(args.face_ckpt)
        face_model = make_ref_real_upscaler_model(args.face_ckpt)
    else:
        pack.face_upscaler = make_our_upscaler()
        face_model = make_ref_upscaler_model()
    try:
        ours = pack.processor(args.np_dtype).process_image(
            img, final_upscale_factor=2.0, has_aligned=False)
    finally:
        pack.bg_upscaler = None
        pack.face_upscaler = None
    if ref is None:
        return dict(psnr_db=None, ssim=None,
                    notes="reference unavailable; ours-only run OK",
                    out_shape=list(ours.shape))
    theirs = ref.run_image(img, 2.0, False, [r.copy() for r in rows],
                           use_parse=True, bg_model=bg_model,
                           face_model=face_model)
    p, s = psnr_ssim(ours, theirs)
    res = dict(psnr_db=p, ssim=s, out_shape=list(ours.shape))
    if det_report is not None:
        res["det"] = det_report
        crops = _aligned_crops(pack, img, rows[0])
        if crops and args.forced:
            res.update(forced_net_compare(args, pack, ref, crops[:1], 2))
    return res


CONFIG_FNS = {1: run_config1, 2: run_config2, 3: run_config3,
              4: run_config4, 5: run_config5}
CONFIG_NAMES = {
    1: "aligned single face",
    2: "unaligned image: detect+align+restore+parse-paste",
    3: "aligned sequence clip (Kalman propagation)",
    4: "multiface tracked sequence",
    5: "bg+face upscalers + final_upscale_factor compositing",
}


# ---------------------------------------------------------------------------
# main
# ---------------------------------------------------------------------------

def torch_available():
    try:
        import torch  # noqa
        return True
    except Exception:
        return False


def synth_shared_ckpt(path, variant, cfg_overrides):
    """Write a SHARED random-weight .pth both sides load. Without this, a
    reference comparison with no --keep-ckpt silently compares two
    DIFFERENT random networks (ours: seeded JAX init; theirs: torch's own
    init) — every PSNR is then meaningless (symptom: index_agreement == 0).
    Mirrors tests/test_parity_report._write_ckpt at full size: reference
    KEEP state dict + embedded GMFlow under flownet.model.* , params_ema
    key (keep_model_loader.py:105-120 load semantics)."""
    import torch
    from tests import reference_oracle as oracle
    from comfyui_keep_tpu.models.keep import KEEP
    cfg = dict(KEEP.config(variant))
    if cfg_overrides:
        cfg.update(cfg_overrides)
    # flow_stub=False up front: ReferenceSide needs the real FlowGenerator
    # in this process anyway (the zero-flow stub is process-global), and the
    # state dict then embeds flownet.model.* like the real composite ckpt
    ref = oracle.load_ref_keep(flow_stub=False)
    torch.manual_seed(0)
    net = ref.KEEP(**ReferenceSide._ref_kwargs(cfg)).eval()
    torch.save({"params_ema": dict(net.state_dict())}, path)
    return path


# Sources whose behavior the certification artifact attests to. The artifact
# records their sha256 (plus the git rev it was captured at); a fast CI test
# (tests/test_parity_report.py::test_cert_artifact_not_stale) recomputes the
# hashes and fails with "re-certify" when any has changed since capture —
# staleness is mechanically detectable (VERDICT r4 weakness 7).
CERT_SOURCE_GLOBS = [
    "tools/parity_report.py",
    "tools/synth_zoo.py",
    "comfyui_keep_tpu/api.py",
    "comfyui_keep_tpu/models/*.py",
    "comfyui_keep_tpu/facelib/*.py",
    "comfyui_keep_tpu/pipeline/*.py",
    "comfyui_keep_tpu/ops/*.py",
    "comfyui_keep_tpu/utils/checkpoint.py",
    "comfyui_keep_tpu/utils/image.py",
    "comfyui_keep_tpu/metrics/psnr_ssim.py",
    "tests/reference_oracle.py",
]


def cert_provenance(repo_root=None):
    """{'git_rev': ..., 'cert_sources': {relpath: sha256}} for the current
    working tree (hashes bind to CONTENT, so a dirty tree is still bound)."""
    import hashlib
    import subprocess
    root = repo_root or os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))
    try:
        rev = subprocess.run(["git", "rev-parse", "HEAD"], cwd=root,
                             capture_output=True, text=True,
                             timeout=10).stdout.strip() or None
    except Exception:
        rev = None
    hashes = {}
    for pat in CERT_SOURCE_GLOBS:
        for p in sorted(globmod.glob(os.path.join(root, pat))):
            rel = os.path.relpath(p, root)
            with open(p, "rb") as f:
                hashes[rel] = hashlib.sha256(f.read()).hexdigest()
    return {"git_rev": rev, "cert_sources": hashes}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--keep-ckpt", default=None,
                   help=".pth KEEP checkpoint (random init if omitted)")
    p.add_argument("--parsenet-ckpt", default=None)
    p.add_argument("--retinaface-ckpt", default=None)
    p.add_argument("--bg-ckpt", default=None,
                   help="RealESRGAN-layout RRDBNet .pth for the background "
                        "upscaler (config 5); real net on BOTH sides")
    p.add_argument("--face-ckpt", default=None,
                   help="RealESRGAN-layout RRDBNet .pth for the face "
                        "upscaler (config 5)")
    p.add_argument("--zoo-dir", default=None,
                   help="a tools/synth_zoo.py --out-dir (or a real model "
                        "zoo in the same layout): fills --keep-ckpt, "
                        "--retinaface-ckpt, --parsenet-ckpt, --bg-ckpt, "
                        "--face-ckpt from the standard filenames")
    p.add_argument("--input-size", type=int, default=None,
                   help="synth probe image scale override (default: the "
                        "model's img_size). Small-config drills pass 512 "
                        "so the calibrated real detector fires.")
    p.add_argument("--variant", default="KEEP", choices=["KEEP", "Asian"])
    p.add_argument("--configs", default="1,2,3,4,5")
    p.add_argument("--frames", type=int, default=20)
    p.add_argument("--clip", type=int, default=20, help="max_clip_length")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bar", type=float, default=PSNR_BAR_DB)
    p.add_argument("--out", default="parity_report.json")
    p.add_argument("--input-image", default=None)
    p.add_argument("--input-frames", default=None, help="glob of clip frames")
    p.add_argument("--cfg-json", default=None,
                   help="JSON dict of KEEP cfg overrides (self-test)")
    p.add_argument("--no-reference", action="store_true")
    p.add_argument("--no-forced", dest="forced", action="store_false",
                   help="skip the teacher-forced net certification on "
                        "configs 1/3 (index agreement + PSNR given the "
                        "reference's code picks)")
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16", "float64"],
                   help="float64 = certification mode: both frameworks run "
                        "the net in f64 so PSNR reflects structural parity, "
                        "not fp32 noise amplified through deep random nets")
    p.add_argument("--backend", default="cpu", choices=["cpu", "tpu"],
                   help="backend OUR side runs on (the torch reference is "
                        "always CPU). tpu = certify the real serving "
                        "backend; combine with --matmul-precision highest "
                        "to disable the default bf16-ish TPU matmuls")
    p.add_argument("--matmul-precision", default=None,
                   choices=["default", "high", "highest"],
                   help="jax default_matmul_precision (TPU: 'highest' "
                        "forces f32-accurate matmuls/convs; required to "
                        "meet the 40 dB bar on the tpu backend)")
    args = p.parse_args(argv)
    args.np_dtype = None if args.dtype == "float32" else args.dtype
    if args.zoo_dir:
        from tools.synth_zoo import ZOO
        attr = {"keep": "keep_ckpt", "retinaface": "retinaface_ckpt",
                "parsenet": "parsenet_ckpt"}
        for fname, (sub, kind) in ZOO.items():
            path = os.path.join(args.zoo_dir, sub, fname)
            if not os.path.exists(path):
                continue
            name = attr.get(kind) or ("face_ckpt" if "face" in fname
                                      else "bg_ckpt")
            if getattr(args, name) is None:
                setattr(args, name, path)
    # The image's sitecustomize imports jax at interpreter startup with the
    # axon/TPU platform, so JAX_PLATFORMS/JAX_ENABLE_X64 env vars are TOO
    # LATE here; jax.config works until the first backend touch. Parity vs
    # the torch reference needs either the CPU backend or --backend tpu
    # with --matmul-precision highest — TPU matmuls/convs run bf16-ish by
    # default, a deterministic ~1e-2 deviation that no dtype flag removes
    # (tests/conftest.py documents the same trap).
    import jax
    from comfyui_keep_tpu.utils.compile_cache import \
        enable_persistent_compile_cache
    enable_persistent_compile_cache()
    if args.backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
    if args.matmul_precision and args.matmul_precision != "default":
        jax.config.update("jax_default_matmul_precision",
                          args.matmul_precision)
    if args.np_dtype == "float64":
        jax.config.update("jax_enable_x64", True)

    cfg_overrides = json.loads(args.cfg_json) if args.cfg_json else None
    rng = np.random.default_rng(args.seed)

    synthesized = False
    if (args.keep_ckpt is None and not args.no_reference
            and torch_available() and os.path.isdir(REF_ROOT)):
        import tempfile
        path = os.path.join(tempfile.mkdtemp(prefix="keep_parity_"),
                            "shared_random.pth")
        print("no --keep-ckpt: synthesizing a SHARED random checkpoint "
              f"({path}) so both frameworks run the same weights")
        args.keep_ckpt = synth_shared_ckpt(path, args.variant, cfg_overrides)
        synthesized = True

    pack = build_ours(args, cfg_overrides)
    has_flownet = pack.gmflow_params is not None

    ref = None
    ref_reason = None
    if args.no_reference:
        ref_reason = "disabled by --no-reference"
    elif not torch_available():
        ref_reason = "torch not importable"
    elif not os.path.isdir(REF_ROOT):
        ref_reason = f"{REF_ROOT} not mounted"
    else:
        ref = ReferenceSide(args, pack.keep_cfg, has_flownet)

    report = {
        "keep_ckpt": ("synthesized-shared-random(seed0)" if synthesized
                      else args.keep_ckpt),
        "variant": args.variant,
        "backend": args.backend,
        "matmul_precision": args.matmul_precision or "default",
        "dtype": args.dtype,
        "reference_run": ref is not None,
        "reference_skip_reason": ref_reason,
        "bar_psnr_db": args.bar,
        "detector": ("RetinaFace-ResNet50 (real forwards on BOTH sides; "
                     "per-config det leg compares them numerically, "
                     "restore leg replays the agreed detections)"
                     if args.retinaface_ckpt
                     else "synthetic-landmark stub (both sides)"),
        "parser": ("ParseNet (real forwards on BOTH sides)"
                   if args.parsenet_ckpt
                   else "synthetic-mask stub (both sides)"),
        "upscalers": ("RRDBNet (real nets on BOTH sides)"
                      if args.bg_ckpt or args.face_ckpt
                      else "shared deterministic np 2x"),
        "configs": {},
    }
    report.update(cert_provenance())
    # the tunnel compile helper is flaky (round-4 cert lost config 4 to a
    # transient HTTP 500); retry a config whose failure smells environmental
    # (remote-compile HTTP error / RPC deadline), never a real numeric fail
    retries = max(0, int(os.environ.get("KEEP_TPU_CERT_RETRIES", "2")))
    for c in [int(x) for x in args.configs.split(",") if x.strip()]:
        t0 = time.time()
        for attempt in range(retries + 1):
            try:
                # fresh generator per (seed, config, attempt): a transient-
                # failure retry must not consume draws from a shared stream
                # and shift the inputs of this or any later config — same
                # seed must mean same artifact numbers, retries or not
                res = CONFIG_FNS[c](args, pack, ref,
                                    np.random.default_rng(
                                        (args.seed, c, attempt)))
                break
            except Exception as e:  # keep going; report the failure
                res = dict(psnr_db=None, ssim=None,
                           error=f"{type(e).__name__}: {e}")
                transient = any(s in str(e) for s in (
                    "remote_compile", "HTTP 5", "DEADLINE_EXCEEDED",
                    "UNAVAILABLE", "Connection re"))
                if not transient or attempt == retries:
                    break
                print(f"config {c}: transient backend failure "
                      f"(attempt {attempt + 1}/{retries + 1}), retrying: "
                      f"{str(e)[:200]}", file=sys.stderr)
                time.sleep(10)
        res["name"] = CONFIG_NAMES[c]
        res["seconds"] = round(time.time() - t0, 2)
        if ref is not None:
            # the bar-meeting number is the teacher-forced PSNR when a
            # forced leg ran (raw PSNR over a real net is bounded by the
            # argmax chaos floor and stays informational); detection
            # agreement is a hard further requirement where certified
            base_ok = (res["pass_forced"] if "pass_forced" in res
                       else (res.get("psnr_db") is not None
                             and res["psnr_db"] >= args.bar))
            res["pass"] = bool(base_ok) and res.get("det", {}).get(
                "agree", True)
        report["configs"][str(c)] = res
        if args.out:
            # write incrementally: a timeout mid-certification must not
            # lose the configs that already finished
            with open(args.out, "w") as f:
                json.dump(report, f, indent=2)
        line = {k: res.get(k) for k in ("name", "psnr_db", "ssim", "pass",
                                        "psnr_db_forced", "index_agreement",
                                        "pass_forced", "error", "seconds")
                if k in res}
        if "det" in res:
            line["det"] = {k: v for k, v in res["det"].items()
                           if k in ("counts_agree", "max_landmark_px",
                                    "landmarks_agree", "agree",
                                    "detections_per_frame")}
        print(f"config {c}: {json.dumps(line)}")

    if ref is not None:
        judged = [r for r in report["configs"].values() if "pass" in r]
        report["all_pass"] = bool(judged) and all(r["pass"] for r in judged)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {args.out}")
    return report


if __name__ == "__main__":
    main()
