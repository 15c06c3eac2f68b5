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
    """Sliding-window test dataset (reference video_test_dataset.py:14-131):
    one item PER FRAME — a num_frame window of LQ neighbors selected by
    generate_frame_indices with the configured padding mode, plus the
    center-frame GT. Fields folder / idx "i/max" / border match the
    reference's data_info bookkeeping."""

    def __init__(self, opt: Dict):
        self.opt = opt
        self.gt_root = opt.get("dataroot_gt")
        self.lq_root = opt["dataroot_lq"]
        self.num_frame = opt.get("num_frame", 5)
        self.padding = opt.get("padding", "reflection_circle")
        folders = opt.get("meta_info_file")
        if folders:
            with open(folders) as f:
                self.folders = [line.split()[0].split("/")[0]
                                for line in f if line.strip()]
            self.folders = sorted(set(self.folders))
        else:
            self.folders = sorted(
                d for d in os.listdir(self.lq_root)
                if os.path.isdir(os.path.join(self.lq_root, d)))
        self.items: List = []  # (folder, frame_idx, max_idx, border)
        self.frame_paths = {}
        for folder in self.folders:
            paths = scandir(os.path.join(self.lq_root, folder))
            self.frame_paths[folder] = paths
            n = len(paths)
            for i in range(n):
                border = 1 if (i < self.num_frame // 2
                               or i >= n - self.num_frame // 2) else 0
                self.items.append((folder, i, n, border))

    def __len__(self):
        return len(self.items)

    def _read_lq_window(self, folder, select_idx):
        paths = self.frame_paths[folder]
        return np.stack(
            [_read_img(os.path.join(self.lq_root, folder, paths[i]))[..., ::-1]
             for i in select_idx]).astype(np.float32)

    def __getitem__(self, index):
        from comfyui_keep_tpu.data.util import generate_frame_indices
        folder, idx, max_idx, border = self.items[index]
        select_idx = generate_frame_indices(idx, max_idx, self.num_frame,
                                            padding=self.padding)
        out = {"lq": self._read_lq_window(folder, select_idx),
               "folder": folder, "idx": f"{idx}/{max_idx}", "border": border}
        if self.gt_root:
            gt_paths = scandir(os.path.join(self.gt_root, folder))
            out["gt"] = _read_img(os.path.join(
                self.gt_root, folder, gt_paths[idx]))[..., ::-1].astype(
                    np.float32).copy()
        return out


@DATASET_REGISTRY.register(name="VideoTestDUFDataset")
class VideoTestDUFDataset(VideoTestDataset):
    """VideoTestDataset variant (reference video_test_dataset.py:202-249):
    with use_duf_downsampling the LQ window is generated from the GT frames
    via the DUF Gaussian downsample."""

    def __getitem__(self, index):
        from comfyui_keep_tpu.data.util import (duf_downsample,
                                                generate_frame_indices)
        if not self.opt.get("use_duf_downsampling"):
            return super().__getitem__(index)
        folder, idx, max_idx, border = self.items[index]
        select_idx = generate_frame_indices(idx, max_idx, self.num_frame,
                                            padding=self.padding)
        gt_paths = scandir(os.path.join(self.gt_root, folder))
        gts = np.stack(
            [_read_img(os.path.join(self.gt_root, folder, gt_paths[i]))[..., ::-1]
             for i in select_idx]).astype(np.float32)
        lq = np.asarray(duf_downsample(gts, kernel_size=13,
                                       scale=self.opt.get("scale", 4)))
        return {"lq": lq.astype(np.float32), "folder": folder,
                "idx": f"{idx}/{max_idx}", "border": border,
                "gt": gts[len(select_idx) // 2]}


@DATASET_REGISTRY.register(name="VideoRecurrentTestDataset")
class VideoRecurrentTestDataset:
    """Whole-clip test dataset for recurrent nets (reference
    video_test_dataset.py:252-284): one item per folder, full LQ/GT clips."""

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


@DATASET_REGISTRY.register(name="VideoTestVimeo90KDataset")
class VideoTestVimeo90KDataset:
    """Vimeo90K-Test (reference video_test_dataset.py:134-199): one item per
    meta key, num_frame LQ window (im1..im7 centered) + center GT im4."""

    def __init__(self, opt: Dict):
        self.opt = opt
        self.gt_root = opt["dataroot_gt"]
        self.lq_root = opt["dataroot_lq"]
        self.num_frame = opt.get("num_frame", 7)
        with open(opt["meta_info_file"]) as f:
            self.keys = [line.split()[0] for line in f if line.strip()]
        self.neighbor_list = [i + (9 - self.num_frame) // 2
                              for i in range(self.num_frame)]

    def __len__(self):
        return len(self.keys)

    def __getitem__(self, index):
        key = self.keys[index]
        lq = np.stack(
            [_read_img(os.path.join(self.lq_root, key, f"im{i}.png"))[..., ::-1]
             for i in self.neighbor_list]).astype(np.float32)
        gt = _read_img(os.path.join(self.gt_root, key, "im4.png"))[..., ::-1]
        return {"lq": lq, "gt": gt.astype(np.float32).copy(),
                "folder": key, "idx": f"{index}/{len(self.keys)}", "border": 0}


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


@DATASET_REGISTRY.register(name="REDSRecurrentDataset")
class REDSRecurrentDataset:
    """REDS for recurrent nets (reference reds_dataset.py:209-345): per-frame
    keys filtered by val_partition (REDS4/official) and test_mode; each item
    is a num_frame*interval window of PAIRED LQ/GT sequences starting at the
    key frame (re-randomized when it would cross the clip end), with random
    reverse, paired crop and flip/rot augmentation."""

    def __init__(self, opt: Dict):
        self.opt = opt
        self.gt_root = opt["dataroot_gt"]
        self.lq_root = opt["dataroot_lq"]
        self.num_frame = opt.get("num_frame", 15)
        self.interval_list = opt.get("interval_list", [1])
        self.random_reverse = opt.get("random_reverse", False)
        self.scale = opt.get("scale", 4)
        self.keys = []
        self.clip_len = {}
        with open(opt["meta_info_file"]) as f:
            for line in f:
                if not line.strip():
                    continue
                clip, n_frames = line.split()[:2]
                self.clip_len[clip] = int(n_frames)
                self.keys.extend(f"{clip}/{i:08d}" for i in range(int(n_frames)))
        part = opt.get("val_partition", "REDS4")
        if part == "REDS4":
            val = {"000", "011", "015", "020"}
        elif part == "official":
            val = {f"{v:03d}" for v in range(240, 270)}
        else:
            raise ValueError(
                f"Wrong validation partition {part}. "
                "Supported ones are ['official', 'REDS4'].")
        if opt.get("test_mode"):
            self.keys = [k for k in self.keys if k.split("/")[0] in val]
        else:
            self.keys = [k for k in self.keys if k.split("/")[0] not in val]

    def __len__(self):
        return len(self.keys)

    def __getitem__(self, index):
        clip, frame = self.keys[index].rsplit("/", 1)
        interval = random.choice(self.interval_list)
        total = self.clip_len[clip]
        start = int(frame)
        if start > total - self.num_frame * interval:
            start = random.randint(0, total - self.num_frame * interval)
        neighbors = list(range(start, start + self.num_frame * interval,
                               interval))
        if self.random_reverse and random.random() < 0.5:
            neighbors.reverse()
        lqs = [_read_img(os.path.join(self.lq_root, clip, f"{i:08d}.png"))
               for i in neighbors]
        gts = [_read_img(os.path.join(self.gt_root, clip, f"{i:08d}.png"))
               for i in neighbors]
        if self.opt.get("phase", "train") == "train":
            gt_size = self.opt.get("gt_size", 256)
            gts, lqs = paired_random_crop(gts, lqs, gt_size, self.scale)
            out = augment(gts + lqs, self.opt.get("use_hflip", True),
                          self.opt.get("use_rot", True))
            gts, lqs = out[:self.num_frame], out[self.num_frame:]
        return {"lq": np.stack([v[..., ::-1] for v in lqs]).astype(np.float32),
                "gt": np.stack([v[..., ::-1] for v in gts]).astype(np.float32),
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


@DATASET_REGISTRY.register(name="Vimeo90KRecurrentDataset")
class Vimeo90KRecurrentDataset(Vimeo90KDataset):
    """Vimeo90K for recurrent nets (reference vimeo90k_dataset.py:120-198):
    paired 7-frame LQ/GT sequences, random reverse, optional flip_sequence
    (7 -> 14 frames by mirroring)."""

    def __init__(self, opt: Dict):
        super().__init__(opt)
        self.flip_sequence = opt.get("flip_sequence", False)
        self.random_reverse = opt.get("random_reverse", False)

    def __getitem__(self, index):
        key = self.keys[index]
        neighbors = list(self.neighbor_list)
        if self.random_reverse and random.random() < 0.5:
            neighbors.reverse()
        lqs = [_read_img(os.path.join(self.lq_root, key, f"im{i}.png"))
               for i in neighbors]
        gts = [_read_img(os.path.join(self.gt_root, key, f"im{i}.png"))
               for i in neighbors]
        if self.opt.get("phase", "train") == "train":
            gt_size = self.opt.get("gt_size", 256)
            gts, lqs = paired_random_crop(gts, lqs, gt_size, self.scale)
            out = augment(gts + lqs, self.opt.get("use_hflip", True),
                          self.opt.get("use_rot", True))
            n = len(neighbors)
            gts, lqs = out[:n], out[n:]
        lq = np.stack([v[..., ::-1] for v in lqs]).astype(np.float32)
        gt = np.stack([v[..., ::-1] for v in gts]).astype(np.float32)
        if self.flip_sequence:
            lq = np.concatenate([lq, lq[::-1]], axis=0)
            gt = np.concatenate([gt, gt[::-1]], axis=0)
        return {"lq": lq, "gt": gt, "key": key}


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
