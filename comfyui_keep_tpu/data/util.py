"""Dataset path/indexing helpers (reference wm_basicsr/data/data_util.py).

NHWC numpy/JAX variants of the torch originals; lmdb variants read the
meta_info.txt written by utils.flow.make_lmdb_from_imgs.
"""
import os
import os.path as osp
from typing import List, Sequence

import numpy as np

from comfyui_keep_tpu.data.datasets import scandir


def read_img_seq(path, require_mod_crop: bool = False, scale: int = 1,
                 return_imgname: bool = False):
    """Read a frame directory (or explicit path list) into a float32
    (T, H, W, 3) RGB [0, 1] array (data_util.py:11-40; torch (t,c,h,w)
    becomes THWC)."""
    import cv2
    from comfyui_keep_tpu.data.transforms import mod_crop
    paths = sorted(path) if isinstance(path, (list, tuple)) \
        else [osp.join(path, p) for p in scandir(path)]
    imgs = [cv2.imread(p).astype(np.float32) / 255.0 for p in paths]
    if require_mod_crop:
        imgs = [mod_crop(img, scale) for img in imgs]
    out = np.stack([img[..., ::-1] for img in imgs], axis=0)
    if return_imgname:
        names = [osp.splitext(osp.basename(p))[0] for p in paths]
        return out, names
    return out


def generate_frame_indices(crt_idx: int, max_frame_num: int, num_frames: int,
                           padding: str = "reflection") -> List[int]:
    """Sliding-window indices with border padding (data_util.py:43-93):
    'replicate' | 'reflection' | 'reflection_circle' | 'circle'."""
    assert num_frames % 2 == 1, "num_frames should be an odd number."
    assert padding in ("replicate", "reflection", "reflection_circle",
                       "circle"), f"Wrong padding mode: {padding}."
    max_frame_num = max_frame_num - 1
    num_pad = num_frames // 2
    indices = []
    for i in range(crt_idx - num_pad, crt_idx + num_pad + 1):
        if i < 0:
            if padding == "replicate":
                pad_idx = 0
            elif padding == "reflection":
                pad_idx = -i
            elif padding == "reflection_circle":
                pad_idx = crt_idx + num_pad - i
            else:
                pad_idx = num_frames + i
        elif i > max_frame_num:
            if padding == "replicate":
                pad_idx = max_frame_num
            elif padding == "reflection":
                pad_idx = max_frame_num * 2 - i
            elif padding == "reflection_circle":
                pad_idx = (crt_idx - num_pad) - (i - max_frame_num)
            else:
                pad_idx = i - num_frames
        else:
            pad_idx = i
        indices.append(pad_idx)
    return indices


def paired_paths_from_folder(folders: Sequence[str], keys: Sequence[str],
                             filename_tmpl: str):
    """(data_util.py:200-233)."""
    assert len(folders) == 2 and len(keys) == 2
    input_folder, gt_folder = folders
    input_key, gt_key = keys
    input_paths = list(scandir(input_folder))
    gt_paths = list(scandir(gt_folder))
    assert len(input_paths) == len(gt_paths), (
        f"{input_key} and {gt_key} datasets have different number of images: "
        f"{len(input_paths)}, {len(gt_paths)}.")
    paths = []
    for gt_path in gt_paths:
        basename, ext = osp.splitext(osp.basename(gt_path))
        input_name = f"{filename_tmpl.format(basename)}{ext}"
        assert input_name in input_paths, \
            f"{input_name} is not in {input_key}_paths."
        paths.append({f"{input_key}_path": osp.join(input_folder, input_name),
                      f"{gt_key}_path": osp.join(gt_folder, gt_path)})
    return paths


def paired_paths_from_meta_info_file(folders, keys, meta_info_file,
                                     filename_tmpl):
    """(data_util.py:156-197)."""
    assert len(folders) == 2 and len(keys) == 2
    input_folder, gt_folder = folders
    input_key, gt_key = keys
    with open(meta_info_file) as fin:
        gt_names = [line.strip().split(" ")[0] for line in fin if line.strip()]
    paths = []
    for gt_name in gt_names:
        basename, ext = osp.splitext(osp.basename(gt_name))
        input_name = f"{filename_tmpl.format(basename)}{ext}"
        paths.append({f"{input_key}_path": osp.join(input_folder, input_name),
                      f"{gt_key}_path": osp.join(gt_folder, gt_name)})
    return paths


def _lmdb_keys(folder):
    with open(osp.join(folder, "meta_info.txt")) as fin:
        return [line.split(".")[0] for line in fin if line.strip()]


def paired_paths_from_lmdb(folders, keys):
    """(data_util.py:95-153): both folders must be .lmdb; keys must match."""
    assert len(folders) == 2 and len(keys) == 2
    input_folder, gt_folder = folders
    input_key, gt_key = keys
    if not (input_folder.endswith(".lmdb") and gt_folder.endswith(".lmdb")):
        raise ValueError(f"{input_key} folder and {gt_key} folder should both "
                         "be in lmdb format.")
    input_keys = set(_lmdb_keys(input_folder))
    gt_keys = _lmdb_keys(gt_folder)
    if input_keys != set(gt_keys):
        raise ValueError(f"Keys in {input_key}_folder and {gt_key}_folder "
                         "are different.")
    return [{f"{input_key}_path": k, f"{gt_key}_path": k} for k in gt_keys]


def paths_from_folder(folder):
    """(data_util.py:236-248)."""
    return [osp.join(folder, p) for p in scandir(folder)]


def paths_from_lmdb(folder):
    """(data_util.py:251-264)."""
    if not folder.endswith(".lmdb"):
        raise ValueError(f"Folder {folder} should be in lmdb format.")
    return _lmdb_keys(folder)


def generate_gaussian_kernel(kernel_size: int = 13, sigma: float = 1.6):
    """Dirac smoothed by scipy gaussian_filter (data_util.py:267-282)."""
    from scipy.ndimage import gaussian_filter
    kernel = np.zeros((kernel_size, kernel_size))
    kernel[kernel_size // 2, kernel_size // 2] = 1
    return gaussian_filter(kernel, sigma)


def duf_downsample(x, kernel_size: int = 13, scale: int = 4):
    """DUF official Gaussian downsampling (data_util.py:285-317).
    x: (B, T, H, W, C) or (T, H, W, C) float array -> same layout at H/scale.
    """
    import jax.numpy as jnp
    from comfyui_keep_tpu.ops import conv2d
    assert scale in (2, 3, 4), f"Only support scale (2, 3, 4), but got {scale}."
    squeeze = x.ndim == 4
    if squeeze:
        x = x[None]
    b, t, h, w, c = x.shape
    # per-channel depthwise filtering: fold channels into batch
    xf = jnp.moveaxis(x.reshape(b * t, h, w, c), -1, 1)
    xf = xf.reshape(b * t * c, h, w, 1)
    pad = kernel_size // 2 + scale * 2
    xf = jnp.pad(xf, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    k = jnp.asarray(generate_gaussian_kernel(kernel_size, 0.4 * scale),
                    xf.dtype)[..., None, None]
    y = conv2d(xf, k, stride=scale, padding=0)
    y = y[:, 2:-2, 2:-2, :]
    hh, ww = y.shape[1], y.shape[2]
    y = y.reshape(b * t, c, hh, ww)
    y = jnp.moveaxis(y, 1, -1).reshape(b, t, hh, ww, c)
    return y[0] if squeeze else y
