"""Image processing utilities (reference wm_basicsr/utils/img_process_util.py):
USM sharpening (numpy/cv2 host version + batched JAX twin)."""
import numpy as np


def usm_sharp(img, weight=0.5, radius=50, threshold=10):
    """img: HWC BGR float32 [0,1] (img_process_util.py:34-62)."""
    import cv2
    if radius % 2 == 0:
        radius += 1
    blur = cv2.GaussianBlur(img, (radius, radius), 0)
    residual = img - blur
    mask = (np.abs(residual) * 255 > threshold).astype("float32")
    soft_mask = cv2.GaussianBlur(mask, (radius, radius), 0)
    sharp = np.clip(img + weight * residual, 0, 1)
    return soft_mask * sharp + (1 - soft_mask) * img


def usm_sharp_jax(img, weight=0.5, radius=50, threshold=10):
    """Batched JAX twin (the reference's USMSharp torch module): img
    (B, H, W, C) [0,1]."""
    import cv2
    import jax
    import jax.numpy as jnp
    if radius % 2 == 0:
        radius += 1
    k1d = cv2.getGaussianKernel(radius, 0)
    kernel = jnp.asarray(np.outer(k1d, k1d), img.dtype)
    c = img.shape[-1]
    w = jnp.tile(kernel[:, :, None, None], (1, 1, 1, c))
    pad = radius // 2

    def blur_fn(x):
        xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
        return jax.lax.conv_general_dilated(
            xp, w, (1, 1), "VALID", feature_group_count=c,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    blur = blur_fn(img)
    residual = img - blur
    mask = (jnp.abs(residual) * 255 > threshold).astype(img.dtype)
    soft_mask = blur_fn(mask)
    sharp = jnp.clip(img + weight * residual, 0, 1)
    return soft_mask * sharp + (1 - soft_mask) * img
