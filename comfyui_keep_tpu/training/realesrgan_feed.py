"""RealESRGAN on-device training-pair synthesis (models/realesrgan_model.py
:69-186 feed_data + realesrnet_model.py equivalent).

Two-order degradation on batched JAX arrays: USM-sharpened GT -> blur
(per-sample kernels from RealESRGANDataset) -> random resize -> gaussian |
poisson noise -> DiffJPEG -> second-order blur/resize/noise -> [resize-back +
sinc] x JPEG in random order -> clamp/round -> paired random crop -> training
pair pool.

Runs EAGERLY (not under jit): the random resize scales change tensor shapes
every call, exactly like the torch original. Deltas from the reference,
documented: JPEG quality is sampled per batch (not per sample), and torch's
'area'/'bicubic' interpolations are reproduced with adaptive-bin averaging /
a=-0.75 Keys cubic (same definitions torch uses).
"""
import random as _random
from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp

from comfyui_keep_tpu.ops.resample import resize_bilinear
from comfyui_keep_tpu.utils.diffjpeg import diff_jpeg
from comfyui_keep_tpu.utils.img_process import usm_sharp_jax


def filter2d(img, kernel):
    """Per-sample 2D filtering (img_process_util.py filter2D): img
    (B, H, W, C), kernel (B, k, k) or (k, k); reflect padding."""
    if kernel.ndim == 2:
        kernel = jnp.broadcast_to(kernel[None],
                                  (img.shape[0],) + kernel.shape)
    k = kernel.shape[-1]
    pad = k // 2
    imgp = jnp.pad(img, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                   mode="reflect")

    def one(im, ker):
        w = jnp.tile(ker[:, :, None, None], (1, 1, 1, im.shape[-1]))
        return jax.lax.conv_general_dilated(
            im[None], w.astype(im.dtype), (1, 1), "VALID",
            feature_group_count=im.shape[-1],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]

    return jax.vmap(one)(imgp, kernel)


def _cubic_weight(t, a=-0.75):
    at = jnp.abs(t)
    w1 = (a + 2) * at ** 3 - (a + 3) * at ** 2 + 1
    w2 = a * at ** 3 - 5 * a * at ** 2 + 8 * a * at - 4 * a
    return jnp.where(at <= 1, w1, jnp.where(at < 2, w2, 0.0))


def _resize_axis_cubic(x, out_size, axis):
    in_size = x.shape[axis]
    # torch bicubic, align_corners=False: half-pixel source centers
    pos = (jnp.arange(out_size) + 0.5) * in_size / out_size - 0.5
    base = jnp.floor(pos).astype(jnp.int32)
    mat = jnp.zeros((out_size, in_size))
    for d in (-1, 0, 1, 2):
        idx = jnp.clip(base + d, 0, in_size - 1)
        w = _cubic_weight(pos - (base + d))
        mat = mat.at[jnp.arange(out_size), idx].add(w)
    mat = mat / jnp.sum(mat, axis=1, keepdims=True)
    return jnp.moveaxis(jnp.tensordot(mat.astype(x.dtype),
                                      jnp.moveaxis(x, axis, 0), axes=1),
                        0, axis)


def _resize_axis_area(x, out_size, axis):
    in_size = x.shape[axis]
    # adaptive_avg_pool bins: [floor(i*I/O), ceil((i+1)*I/O))
    mat = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        lo = int(np.floor(i * in_size / out_size))
        hi = int(np.ceil((i + 1) * in_size / out_size))
        mat[i, lo:hi] = 1.0 / (hi - lo)
    return jnp.moveaxis(jnp.tensordot(jnp.asarray(mat, x.dtype),
                                      jnp.moveaxis(x, axis, 0), axes=1),
                        0, axis)


def resize_torch(x, out_hw, mode: str):
    """F.interpolate equivalents for NHWC batches:
    'bilinear' (align_corners=False, exact), 'bicubic' (a=-0.75), 'area'."""
    if mode == "bilinear":
        return resize_bilinear(x, out_hw, align_corners=False)
    if mode == "bicubic":
        return _resize_axis_cubic(_resize_axis_cubic(x, out_hw[0], 1),
                                  out_hw[1], 2)
    if mode == "area":
        return _resize_axis_area(_resize_axis_area(x, out_hw[0], 1),
                                 out_hw[1], 2)
    raise ValueError(mode)


def random_add_gaussian_noise_jax(img, key, sigma_range=(0, 10),
                                  gray_prob=0.0):
    """Batched per-sample gaussian noise (degradations.py *_pt twins):
    sigma ~ U(range)/255 per sample; per-sample gray (single-channel)
    noise with prob gray_prob."""
    b = img.shape[0]
    k1, k2, k3, k4 = jax.random.split(key, 4)
    sigma = jax.random.uniform(k1, (b, 1, 1, 1), minval=sigma_range[0],
                               maxval=sigma_range[1]) / 255.0
    noise = jax.random.normal(k2, img.shape) * sigma
    gray = jax.random.normal(k3, img.shape[:-1] + (1,)) * sigma
    is_gray = (jax.random.uniform(k4, (b, 1, 1, 1)) < gray_prob)
    noise = jnp.where(is_gray, gray, noise)
    return jnp.clip(img + noise.astype(img.dtype), 0, 1)


def random_add_poisson_noise_jax(img, key, scale_range=(0, 1.0),
                                 gray_prob=0.0):
    """Batched poisson (shot) noise (degradations.py random_add_poisson
    _noise_pt): unique-value-count vals heuristic per sample."""
    b = img.shape[0]
    k1, k2, k3 = jax.random.split(key, 3)
    scale = jax.random.uniform(k1, (b, 1, 1, 1), minval=scale_range[0],
                               maxval=scale_range[1])
    is_gray = (jax.random.uniform(k2, (b, 1, 1, 1)) < gray_prob)
    gray_img = jnp.mean(img, axis=-1, keepdims=True)
    base = jnp.where(is_gray, jnp.broadcast_to(gray_img, img.shape), img)
    # vals = 2^ceil(log2(#unique levels of the rounded image)); the torch
    # version computes it per sample on uint8 levels
    rounded = jnp.round(jnp.clip(base, 0, 1) * 255.0) / 255.0
    levels = jnp.asarray(
        [2.0 ** np.ceil(np.log2(max(len(np.unique(
            np.asarray(jnp.round(rounded[i] * 255), np.uint8))), 2)))
         for i in range(b)], img.dtype).reshape(b, 1, 1, 1)
    noisy = jax.random.poisson(k3, rounded * levels) / levels
    noise = (noisy - rounded).astype(img.dtype)
    return jnp.clip(img + noise * scale.astype(img.dtype), 0, 1)


class TrainingPairPool:
    """FIFO pool decorrelating per-batch degradation params
    (realesrgan_model.py:32-67 _dequeue_and_enqueue), host-side."""

    def __init__(self, queue_size=180):
        self.queue_size = queue_size
        self.lq = None
        self.gt = None
        self.ptr = 0

    def exchange(self, lq, gt):
        lq, gt = np.asarray(lq), np.asarray(gt)
        b = lq.shape[0]
        if self.lq is None:
            assert self.queue_size % b == 0, \
                "queue size should be divisible by batch size"
            self.lq = np.zeros((self.queue_size,) + lq.shape[1:], lq.dtype)
            self.gt = np.zeros((self.queue_size,) + gt.shape[1:], gt.dtype)
        if self.ptr == self.queue_size:  # full: shuffle, swap first b
            idx = np.random.permutation(self.queue_size)
            self.lq, self.gt = self.lq[idx], self.gt[idx]
            out_lq, out_gt = self.lq[:b].copy(), self.gt[:b].copy()
            self.lq[:b], self.gt[:b] = lq, gt
            return out_lq, out_gt
        self.lq[self.ptr:self.ptr + b] = lq
        self.gt[self.ptr:self.ptr + b] = gt
        self.ptr += b
        return lq, gt


def realesrgan_synthesize(batch: Dict, opt: Dict, key, pool=None):
    """Full two-order synthesis. batch: {'gt' (B,H,W,3) [0,1] float,
    'kernel1'/'kernel2' (B,21,21), 'sinc_kernel' (B,21,21)}.
    Returns {'lq', 'gt', 'gt_usm'} cropped to opt['gt_size']."""
    gt = jnp.asarray(batch["gt"])
    gt_usm = usm_sharp_jax(gt)
    k1 = jnp.asarray(batch["kernel1"])
    k2 = jnp.asarray(batch["kernel2"])
    sinc = jnp.asarray(batch["sinc_kernel"])
    ori_h, ori_w = gt.shape[1:3]
    scale_f = opt.get("scale", 4)
    keys = list(jax.random.split(key, 8))

    def rand_resize(out, prob_key, range_key, size=None):
        t = _random.choices(["up", "down", "keep"], opt[prob_key])[0]
        if t == "up":
            s = np.random.uniform(1, opt[range_key][1])
        elif t == "down":
            s = np.random.uniform(opt[range_key][0], 1)
        else:
            s = 1
        mode = _random.choice(["area", "bilinear", "bicubic"])
        h, w = size if size is not None else (out.shape[1], out.shape[2])
        return resize_torch(out, (int(h * s), int(w * s)), mode)

    # ---- first order --------------------------------------------------------
    out = filter2d(gt_usm, k1)
    out = rand_resize(out, "resize_prob", "resize_range")
    if np.random.uniform() < opt["gaussian_noise_prob"]:
        out = random_add_gaussian_noise_jax(
            out, keys[0], opt["noise_range"], opt["gray_noise_prob"])
    else:
        out = random_add_poisson_noise_jax(
            out, keys[1], opt["poisson_scale_range"], opt["gray_noise_prob"])
    q = np.random.uniform(*opt["jpeg_range"])
    out = diff_jpeg(jnp.clip(out, 0, 1), q, differentiable=False)

    # ---- second order -------------------------------------------------------
    if np.random.uniform() < opt["second_blur_prob"]:
        out = filter2d(out, k2)
    out = rand_resize(out, "resize_prob2", "resize_range2",
                      size=(ori_h / scale_f, ori_w / scale_f))
    if np.random.uniform() < opt["gaussian_noise_prob2"]:
        out = random_add_gaussian_noise_jax(
            out, keys[2], opt["noise_range2"], opt["gray_noise_prob2"])
    else:
        out = random_add_poisson_noise_jax(
            out, keys[3], opt["poisson_scale_range2"],
            opt["gray_noise_prob2"])

    final_hw = (ori_h // scale_f, ori_w // scale_f)
    if np.random.uniform() < 0.5:
        mode = _random.choice(["area", "bilinear", "bicubic"])
        out = resize_torch(out, final_hw, mode)
        out = filter2d(out, sinc)
        out = diff_jpeg(jnp.clip(out, 0, 1),
                        np.random.uniform(*opt["jpeg_range2"]),
                        differentiable=False)
    else:
        out = diff_jpeg(jnp.clip(out, 0, 1),
                        np.random.uniform(*opt["jpeg_range2"]),
                        differentiable=False)
        mode = _random.choice(["area", "bilinear", "bicubic"])
        out = resize_torch(out, final_hw, mode)
        out = filter2d(out, sinc)

    lq = jnp.clip(jnp.round(out * 255.0), 0, 255) / 255.0

    # paired random crop (same window for the whole batch, like the batched
    # torch version)
    gt_size = opt["gt_size"]
    lq_size = gt_size // scale_f
    top = np.random.randint(0, lq.shape[1] - lq_size + 1)
    left = np.random.randint(0, lq.shape[2] - lq_size + 1)
    lq = lq[:, top:top + lq_size, left:left + lq_size]
    gt_c = gt[:, top * scale_f:top * scale_f + gt_size,
              left * scale_f:left * scale_f + gt_size]

    if pool is not None:
        lq_np, gt_np = pool.exchange(lq, gt_c)
        lq, gt_c = jnp.asarray(lq_np), jnp.asarray(gt_np)
    gt_usm_c = usm_sharp_jax(gt_c)
    return {"lq": lq, "gt": gt_c, "gt_usm": gt_usm_c}
