"""Datasets (reference wm_basicsr/data/*_dataset.py). All return numpy NHWC
float32 dicts; batching/collation happens in the loader (data/loader.py).

The KEEP training pipeline is VFHQRealDegradationDataset
(vfhq_real_degradation2_dataset.py:22-410): meta-info keyed clips, temporal
window sampling with interval list + random reverse, and the online
degradation chain blur → noise → downsample → noise → CRF video compression
→ ±0.5 normalization.
"""
import os
import random
from typing import Dict, List, Optional

import numpy as np

from comfyui_keep_tpu.data.degradations import (
    random_mixed_kernels, random_add_gaussian_noise, add_video_compression)
from comfyui_keep_tpu.data.transforms import augment, paired_random_crop, mod_crop
from comfyui_keep_tpu.utils.file_client import FileClient, imfrombytes
from comfyui_keep_tpu.utils.registry import DATASET_REGISTRY


def scandir(path, suffix=None, recursive=False):
    out = []
    for root, _, files in os.walk(path):
        for f in sorted(files):
            if suffix is None or f.endswith(suffix):
                rel = os.path.relpath(os.path.join(root, f), path)
                out.append(rel)
        if not recursive:
            break
    return sorted(out)


def _read_img(path, float32=True):
    import cv2
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    return img.astype(np.float32) / 255.0 if float32 else img


def _normalize_pm1(x):
    return (x - 0.5) / 0.5


@DATASET_REGISTRY.register(name="PairedImageDataset")
class PairedImageDataset:
    """GT/LQ folder pairs (reference paired_image_dataset.py)."""

    def __init__(self, opt: Dict):
        self.opt = opt
        self.gt_folder = opt["dataroot_gt"]
        self.lq_folder = opt["dataroot_lq"]
        self.paths = [
            {"gt_path": os.path.join(self.gt_folder, p),
             "lq_path": os.path.join(self.lq_folder, p)}
            for p in scandir(self.gt_folder)]
        self.scale = opt.get("scale", 1)

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, index):
        d = self.paths[index]
        img_gt = _read_img(d["gt_path"])
        img_lq = _read_img(d["lq_path"])
        if self.opt.get("phase") == "train":
            gt_size = self.opt["gt_size"]
            img_gt, img_lq = paired_random_crop(img_gt, img_lq, gt_size, self.scale)
            img_gt, img_lq = augment([img_gt, img_lq], self.opt.get("use_hflip", True),
                                     self.opt.get("use_rot", True))
        # BGR -> RGB
        return {"lq": img_lq[..., ::-1].copy(), "gt": img_gt[..., ::-1].copy(),
                "lq_path": d["lq_path"], "gt_path": d["gt_path"]}


@DATASET_REGISTRY.register(name="SingleImageDataset")
class SingleImageDataset:
    def __init__(self, opt: Dict):
        self.opt = opt
        self.lq_folder = opt["dataroot_lq"]
        self.paths = [os.path.join(self.lq_folder, p)
                      for p in scandir(self.lq_folder)]

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, index):
        img_lq = _read_img(self.paths[index])
        return {"lq": img_lq[..., ::-1].copy(), "lq_path": self.paths[index]}


@DATASET_REGISTRY.register(name="FFHQDataset")
class FFHQDataset:
    """Flat face-image folder (reference ffhq_dataset.py); ±0.5 normalized."""

    def __init__(self, opt: Dict):
        self.opt = opt
        self.gt_folder = opt["dataroot_gt"]
        self.paths = [os.path.join(self.gt_folder, p)
                      for p in scandir(self.gt_folder)]
        self.mean = opt.get("mean", (0.5, 0.5, 0.5))
        self.std = opt.get("std", (0.5, 0.5, 0.5))

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, index):
        img = _read_img(self.paths[index])
        img = augment(img, self.opt.get("use_hflip", True), False)
        img = img[..., ::-1].copy()
        img = (img - np.asarray(self.mean)) / np.asarray(self.std)
        return {"gt": img.astype(np.float32), "gt_path": self.paths[index]}


@DATASET_REGISTRY.register(name="VFHQRealDegradationDataset")
class VFHQRealDegradationDataset:
    """KEEP training data (vfhq_real_degradation2_dataset.py:22-410).

    meta_info file lines: `<clip_rel_path>/<clip_length>/<frame_idx>`;
    frames live in `dataroot_gt/<clip_name>/*.png`.
    """

    def __init__(self, opt: Dict):
        import cv2
        self.opt = opt
        self.cv2 = cv2
        self.gt_root = opt["dataroot_gt"]
        self.num_frame = opt.get("num_frame", 8)
        self.interval_list = opt.get("interval_list", [1])
        self.random_reverse = opt.get("random_reverse", False)
        self.scale = opt.get("scale", 4)
        self.kernel_list = opt.get("kernel_list",
                                   ["iso", "aniso", "generalized_iso",
                                    "generalized_aniso", "plateau_iso",
                                    "plateau_aniso"])
        self.kernel_prob = opt.get("kernel_prob",
                                   [0.405, 0.225, 0.108, 0.027, 0.108, 0.027])
        self.blur_kernel_size = opt.get("blur_kernel_size", 21)
        self.blur_x_sigma = opt.get("blur_x_sigma", [0.2, 3])
        self.blur_y_sigma = opt.get("blur_y_sigma", [0.2, 3])
        self.noise_range = opt.get("noise_range", [0, 10])
        self.crf_range = opt.get("crf_range", [18, 35])
        self.vcodec = opt.get("vcodec", ["libx264"])
        self.vcodec_prob = opt.get("vcodec_prob", [1.0])
        self.resize_prob = opt.get("resize_prob", [0.3, 0.4, 0.3])
        self.normalize = opt.get("normalize", True)
        with open(opt["meta_info_file"]) as f:
            self.keys = [line.strip() for line in f if line.strip()]

    def __len__(self):
        return len(self.keys)

    def __getitem__(self, index):
        cv2 = self.cv2
        key = self.keys[index]
        clip_length = int(key.split("/")[-2])
        frame_idx = int(key.split("/")[-1])
        clip_name = "/".join(key.split("/")[:-2]).split("/")[-1]
        paths = scandir(os.path.join(self.gt_root, clip_name))

        interval = random.choice(self.interval_list)
        while (clip_length - self.num_frame * interval) < 0:
            interval = random.choice(self.interval_list)
        start = frame_idx - self.num_frame // 2 * interval
        end = frame_idx + self.num_frame // 2 * interval
        while start < 0 or end > clip_length:
            frame_idx = random.randint(self.num_frame // 2 * interval,
                                       clip_length - self.num_frame // 2 * interval)
            start = frame_idx - self.num_frame // 2 * interval
            end = frame_idx + self.num_frame // 2 * interval
        neighbors = list(range(start, end, interval))
        if self.random_reverse and random.random() < 0.5:
            neighbors.reverse()
        assert len(neighbors) == self.num_frame

        img_gts = [_read_img(os.path.join(self.gt_root, clip_name, paths[n]))
                   for n in neighbors]
        img_gts = augment(img_gts, self.opt.get("use_flip", True),
                          self.opt.get("use_rot", True))

        # degradation chain (reference :325-376)
        kernel = random_mixed_kernels(self.kernel_list, self.kernel_prob,
                                      self.blur_kernel_size, self.blur_x_sigma,
                                      self.blur_y_sigma)
        img_lqs = [cv2.filter2D(v, -1, kernel) for v in img_gts]
        img_lqs = [random_add_gaussian_noise(v, self.noise_range, gray_prob=0.5)
                   for v in img_lqs]
        oh, ow = img_gts[0].shape[:2]
        resize_type = random.choices(
            [cv2.INTER_AREA, cv2.INTER_LINEAR, cv2.INTER_CUBIC],
            self.resize_prob)[0]
        rh, rw = int(oh // self.scale), int(ow // self.scale)
        img_lqs = [cv2.resize(v, (rw, rh), interpolation=resize_type)
                   for v in img_lqs]
        img_lqs = [random_add_gaussian_noise(v, self.noise_range, gray_prob=0.5)
                   for v in img_lqs]
        crf = np.random.randint(self.crf_range[0], self.crf_range[1])
        codec = random.choices(self.vcodec, self.vcodec_prob)[0]
        img_lqs = add_video_compression(img_lqs, codec=codec, crf=crf)

        gt = np.stack([v[..., ::-1] for v in img_gts]).astype(np.float32)
        lq = np.stack([v[..., ::-1] for v in img_lqs]).astype(np.float32)
        if self.normalize:
            gt = _normalize_pm1(gt)
            lq = _normalize_pm1(lq)
        return {"lq": lq, "gt": gt, "key": key}


@DATASET_REGISTRY.register(name="VideoTestDataset")
class VideoTestDataset:
    """Per-clip validation dataset (reference video_test_dataset.py):
    iterates folders of frames, yields whole clips."""

    def __init__(self, opt: Dict):
        self.opt = opt
        self.gt_root = opt.get("dataroot_gt")
        self.lq_root = opt["dataroot_lq"]
        self.folders = sorted(
            d for d in os.listdir(self.lq_root)
            if os.path.isdir(os.path.join(self.lq_root, d)))

    def __len__(self):
        return len(self.folders)

    def __getitem__(self, index):
        folder = self.folders[index]
        lq_paths = scandir(os.path.join(self.lq_root, folder))
        lq = np.stack([_read_img(os.path.join(self.lq_root, folder, p))[..., ::-1]
                       for p in lq_paths]).astype(np.float32)
        out = {"lq": lq, "folder": folder}
        if self.gt_root:
            gt_paths = scandir(os.path.join(self.gt_root, folder))
            out["gt"] = np.stack(
                [_read_img(os.path.join(self.gt_root, folder, p))[..., ::-1]
                 for p in gt_paths]).astype(np.float32)
        return out


@DATASET_REGISTRY.register(name="REDSDataset")
class REDSDataset:
    """REDS sliding-window clips (reference reds_dataset.py): keys
    `clip/frame_idx`, num_frame neighbors with interval, paired GT/LQ."""

    def __init__(self, opt: Dict):
        self.opt = opt
        self.gt_root = opt["dataroot_gt"]
        self.lq_root = opt["dataroot_lq"]
        self.num_frame = opt.get("num_frame", 5)
        self.num_half = self.num_frame // 2
        self.interval_list = opt.get("interval_list", [1])
        self.random_reverse = opt.get("random_reverse", False)
        self.scale = opt.get("scale", 4)
        with open(opt["meta_info_file"]) as f:
            self.keys = []
            for line in f:
                if not line.strip():
                    continue
                clip, n_frames = line.split()[:2]
                self.keys.extend(f"{clip}/{i:08d}" for i in range(int(n_frames)))

    def __len__(self):
        return len(self.keys)

    def __getitem__(self, index):
        import cv2
        clip, frame = self.keys[index].rsplit("/", 1)
        center = int(frame)
        interval = random.choice(self.interval_list)
        start = center - self.num_half * interval
        end = center + self.num_half * interval
        total = len(scandir(os.path.join(self.gt_root, clip)))
        while start < 0 or end >= total:
            center = random.randint(self.num_half * interval,
                                    total - 1 - self.num_half * interval)
            start = center - self.num_half * interval
            end = center + self.num_half * interval
        neighbors = list(range(start, end + 1, interval))
        if self.random_reverse and random.random() < 0.5:
            neighbors.reverse()
        lqs = [_read_img(os.path.join(self.lq_root, clip, f"{i:08d}.png"))
               for i in neighbors]
        gt = _read_img(os.path.join(self.gt_root, clip, f"{center:08d}.png"))
        if self.opt.get("phase") == "train":
            gt_size = self.opt.get("gt_size", 256)
            gt, lqs = paired_random_crop(gt, lqs, gt_size, self.scale)
            out = augment([gt] + lqs, self.opt.get("use_hflip", True),
                          self.opt.get("use_rot", True))
            gt, lqs = out[0], out[1:]
        return {"lq": np.stack([v[..., ::-1] for v in lqs]).astype(np.float32),
                "gt": gt[..., ::-1].astype(np.float32).copy(),
                "key": self.keys[index]}


@DATASET_REGISTRY.register(name="Vimeo90KDataset")
class Vimeo90KDataset:
    """Vimeo90K septuplets (reference vimeo90k_dataset.py): meta lines
    `clip/seq`, frames im1..im7, GT = center frame."""

    def __init__(self, opt: Dict):
        self.opt = opt
        self.gt_root = opt["dataroot_gt"]
        self.lq_root = opt["dataroot_lq"]
        self.num_frame = opt.get("num_frame", 7)
        self.scale = opt.get("scale", 4)
        with open(opt["meta_info_file"]) as f:
            self.keys = [line.split()[0] for line in f if line.strip()]
        self.neighbor_list = [i + (9 - self.num_frame) // 2
                              for i in range(self.num_frame)]

    def __len__(self):
        return len(self.keys)

    def __getitem__(self, index):
        key = self.keys[index]
        lqs = [_read_img(os.path.join(self.lq_root, key, f"im{i}.png"))
               for i in self.neighbor_list]
        gt = _read_img(os.path.join(self.gt_root, key, "im4.png"))
        if self.opt.get("phase") == "train":
            gt_size = self.opt.get("gt_size", 256)
            gt, lqs = paired_random_crop(gt, lqs, gt_size, self.scale)
            out = augment([gt] + lqs, self.opt.get("use_hflip", True),
                          self.opt.get("use_rot", True))
            gt, lqs = out[0], out[1:]
        return {"lq": np.stack([v[..., ::-1] for v in lqs]).astype(np.float32),
                "gt": gt[..., ::-1].astype(np.float32).copy(), "key": key}


@DATASET_REGISTRY.register(name="RealESRGANDataset")
class RealESRGANDataset:
    """RealESRGAN on-the-fly degradation inputs (reference
    realesrgan_dataset.py): GT + two random blur kernels + sinc kernel; the
    degradation chain itself runs in the trainer on device."""

    def __init__(self, opt: Dict):
        from comfyui_keep_tpu.data.degradations import (
            random_mixed_kernels, circular_lowpass_kernel)
        self.opt = opt
        self._rmk = random_mixed_kernels
        self._sinc = circular_lowpass_kernel
        self.gt_folder = opt["dataroot_gt"]
        self.paths = [os.path.join(self.gt_folder, p)
                      for p in scandir(self.gt_folder)]
        self.kernel_range = [2 * v + 1 for v in range(3, 11)]

    def __len__(self):
        return len(self.paths)

    def _kernel(self, opt_prefix):
        o = self.opt
        ks = random.choice(self.kernel_range)
        if np.random.uniform() < o.get(f"sinc_prob{opt_prefix}", 0.1):
            omega_c = np.random.uniform(np.pi / 3 if ks < 13 else np.pi / 5,
                                        np.pi)
            k = self._sinc(omega_c, ks)
        else:
            k = self._rmk(
                o.get(f"kernel_list{opt_prefix}",
                      ["iso", "aniso", "generalized_iso", "generalized_aniso",
                       "plateau_iso", "plateau_aniso"]),
                o.get(f"kernel_prob{opt_prefix}",
                      [0.45, 0.25, 0.12, 0.03, 0.12, 0.03]),
                ks, o.get(f"blur_sigma{opt_prefix}", [0.2, 3]),
                o.get(f"blur_sigma{opt_prefix}", [0.2, 3]))
        pad = (21 - ks) // 2
        return np.pad(k, ((pad, pad), (pad, pad))).astype(np.float32)

    def __getitem__(self, index):
        gt = _read_img(self.paths[index])
        gt = augment(gt, self.opt.get("use_hflip", True),
                     self.opt.get("use_rot", True))
        kernel1 = self._kernel("")
        kernel2 = self._kernel("2")
        if np.random.uniform() < self.opt.get("final_sinc_prob", 0.8):
            ks = random.choice(self.kernel_range)
            sinc = self._sinc(np.random.uniform(np.pi / 3, np.pi), ks,
                              pad_to=21).astype(np.float32)
        else:
            sinc = np.zeros((21, 21), np.float32)
            sinc[10, 10] = 1
        return {"gt": gt[..., ::-1].astype(np.float32).copy(),
                "kernel1": kernel1, "kernel2": kernel2, "sinc_kernel": sinc,
                "gt_path": self.paths[index]}


@DATASET_REGISTRY.register(name="RealESRGANPairedDataset")
class RealESRGANPairedDataset(PairedImageDataset):
    """Paired variant (reference realesrgan_paired_dataset.py) — same IO as
    PairedImageDataset with meta-info/lmdb support inherited later."""


# reference registry name is the class name (vfhq_real_degradation2_dataset.py
# :22/:149 register 'SingleVFHQDataset'/'VFHQDataset') — keep both spellings
DATASET_REGISTRY.register(VFHQRealDegradationDataset, name="VFHQDataset")


@DATASET_REGISTRY.register(name="SingleVFHQDataset")
class SingleVFHQDataset:
    """Single-frame VFHQ GT loader (vfhq_real_degradation2_dataset.py:23-147):
    keys expanded from the global meta-info file, optional landmark-based
    FFHQ alignment via FaceAligner, hflip/rot augment, optional +-0.5
    normalize. Returns NHWC float arrays {'in', 'gt', 'key'} ('in' == 'gt';
    degradation happens in the model/pipeline for this blind setting)."""

    def __init__(self, opt: Dict):
        self.opt = opt
        self.gt_root = opt["dataroot_gt"]
        self.normalize = opt.get("normalize", False)
        self.need_align = opt.get("need_align", False)
        self.keys: List[str] = []
        with open(opt["global_meta_info_file"]) as fin:
            for line in fin:
                line = line.strip()
                if not line:
                    continue
                clip_path = "/".join(line.split("/")[:-1])
                clip_length = int(line.split("/")[-1])
                self.keys.extend(
                    f"{clip_path}/{clip_length:08d}/{i:08d}"
                    for i in range(clip_length))
        self.io_backend_opt = dict(opt.get("io_backend", {"type": "disk"}))
        self.file_client = None
        if self.need_align:
            from comfyui_keep_tpu.facelib.helper import FaceAligner
            self.dataroot_meta_info = opt["dataroot_meta_info"]
            self.face_aligner = FaceAligner(upscale_factor=1, face_size=512,
                                            crop_ratio=(1, 1))

    def __len__(self):
        return len(self.keys)

    def __getitem__(self, index):
        if self.file_client is None:
            opt = dict(self.io_backend_opt)
            self.file_client = FileClient(opt.pop("type"), **opt)
        key = self.keys[index]
        clip_name = key.split("/")[-3]
        frame_idx = int(key.split("/")[-1])
        frame_dir = os.path.join(self.gt_root, clip_name)
        paths = sorted(os.listdir(frame_dir))
        img_gt = imfrombytes(
            self.file_client.get(os.path.join(frame_dir, paths[frame_idx]),
                                 "gt"), float32=True)
        if self.need_align:
            info_path = os.path.join(self.dataroot_meta_info,
                                     f"{clip_name}.txt")
            clip_info = [ln.strip() for ln in open(info_path, encoding="utf-8")
                         if ln.strip().startswith("0")]
            lm = np.array([float(v) for v in
                           clip_info[frame_idx].split(" ")[1:]]).reshape(5, 2)
            img_gt = self.face_aligner.align_single_face(img_gt, lm)
        img_gt = augment(img_gt, self.opt.get("use_flip", True),
                         self.opt.get("use_rot", True))
        img_in = img_gt
        if self.normalize:
            img_in = (img_in - 0.5) / 0.5
            img_gt = (img_gt - 0.5) / 0.5
        return {"in": np.ascontiguousarray(img_in, np.float32),
                "gt": np.ascontiguousarray(img_gt, np.float32), "key": key}
