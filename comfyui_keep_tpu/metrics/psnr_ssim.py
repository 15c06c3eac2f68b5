"""PSNR / SSIM — numpy reference implementations matching
wm_basicsr/metrics/psnr_ssim.py:12-230 semantics bit-for-bit, plus batched
JAX twins (the reference's *_pt torch twins) for on-device validation loops.
"""
import numpy as np

from comfyui_keep_tpu.utils.color import to_y_channel, rgb2ycbcr_jax
from comfyui_keep_tpu.utils.registry import METRIC_REGISTRY


def reorder_image(img, input_order="HWC"):
    if input_order == "CHW":
        img = img.transpose(1, 2, 0)
    if img.ndim == 2:
        img = img[..., None]
    return img


def _prep(img, img2, crop_border, input_order, test_y_channel):
    assert img.shape == img2.shape, f"shapes differ: {img.shape} vs {img2.shape}"
    img = reorder_image(img, input_order)
    img2 = reorder_image(img2, input_order)
    if crop_border != 0:
        img = img[crop_border:-crop_border, crop_border:-crop_border, ...]
        img2 = img2[crop_border:-crop_border, crop_border:-crop_border, ...]
    if test_y_channel:
        img = to_y_channel(img)
        img2 = to_y_channel(img2)
    return img.astype(np.float64), img2.astype(np.float64)


@METRIC_REGISTRY.register(name="calculate_psnr")
def calculate_psnr(img, img2, crop_border, input_order="HWC",
                   test_y_channel=False, **kwargs):
    """Images in [0, 255]."""
    img, img2 = _prep(img, img2, crop_border, input_order, test_y_channel)
    mse = np.mean((img - img2) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def _ssim_channel(img, img2):
    """Single-channel SSIM, MATLAB convention: 11x11 gaussian sigma 1.5,
    C1/C2 from k1=0.01/k2=0.03 at L=255, valid-region mean."""
    import cv2
    c1 = (0.01 * 255) ** 2
    c2 = (0.03 * 255) ** 2
    kernel = cv2.getGaussianKernel(11, 1.5)
    window = np.outer(kernel, kernel.transpose())

    mu1 = cv2.filter2D(img, -1, window)[5:-5, 5:-5]
    mu2 = cv2.filter2D(img2, -1, window)[5:-5, 5:-5]
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    sigma1_sq = cv2.filter2D(img ** 2, -1, window)[5:-5, 5:-5] - mu1_sq
    sigma2_sq = cv2.filter2D(img2 ** 2, -1, window)[5:-5, 5:-5] - mu2_sq
    sigma12 = cv2.filter2D(img * img2, -1, window)[5:-5, 5:-5] - mu1_mu2

    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / \
        ((mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    return ssim_map.mean()


@METRIC_REGISTRY.register(name="calculate_ssim")
def calculate_ssim(img, img2, crop_border, input_order="HWC",
                   test_y_channel=False, **kwargs):
    """Images in [0, 255]; per-channel SSIM averaged."""
    img, img2 = _prep(img, img2, crop_border, input_order, test_y_channel)
    ssims = [_ssim_channel(img[..., i], img2[..., i])
             for i in range(img.shape[2])]
    return float(np.array(ssims).mean())


# ---------------------------------------------------------------------------
# Batched JAX twins (reference calculate_psnr_pt / calculate_ssim_pt):
# inputs (N, H, W, C) in [0, 1].
# ---------------------------------------------------------------------------

def calculate_psnr_jax(img, img2, crop_border, test_y_channel=False):
    import jax.numpy as jnp
    if crop_border != 0:
        img = img[:, crop_border:-crop_border, crop_border:-crop_border]
        img2 = img2[:, crop_border:-crop_border, crop_border:-crop_border]
    if test_y_channel:
        img = rgb2ycbcr_jax(img, y_only=True)
        img2 = rgb2ycbcr_jax(img2, y_only=True)
    mse = jnp.mean((img.astype(jnp.float64 if False else jnp.float32) -
                    img2.astype(jnp.float32)) ** 2, axis=(1, 2, 3))
    return 10.0 * jnp.log10(1.0 / (mse + 1e-8))


def calculate_ssim_jax(img, img2, crop_border, test_y_channel=False):
    """Matches calculate_ssim_pt: reflect-free valid gaussian filtering after
    a 5px crop happens implicitly via VALID conv."""
    import jax
    import jax.numpy as jnp
    import cv2
    if crop_border != 0:
        img = img[:, crop_border:-crop_border, crop_border:-crop_border]
        img2 = img2[:, crop_border:-crop_border, crop_border:-crop_border]
    if test_y_channel:
        img = rgb2ycbcr_jax(img, y_only=True)
        img2 = rgb2ycbcr_jax(img2, y_only=True)
    img = img * 255.0
    img2 = img2 * 255.0
    c1 = (0.01 * 255) ** 2
    c2 = (0.03 * 255) ** 2
    kernel = cv2.getGaussianKernel(11, 1.5)
    window = jnp.asarray(np.outer(kernel, kernel.T), img.dtype)
    cdim = img.shape[-1]
    w = jnp.tile(window[:, :, None, None], (1, 1, 1, 1))

    def filt(x):
        # depthwise valid conv per channel
        return jax.lax.conv_general_dilated(
            x, jnp.tile(w, (1, 1, 1, cdim)), (1, 1), "VALID",
            feature_group_count=cdim,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    mu1, mu2 = filt(img), filt(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    s1 = filt(img ** 2) - mu1_sq
    s2 = filt(img2 ** 2) - mu2_sq
    s12 = filt(img * img2) - mu1_mu2
    cs = (2 * s12 + c2) / (s1 + s2 + c2)
    ssim_map = ((2 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)) * cs
    return ssim_map.mean(axis=(1, 2, 3))
