"""Differentiable JPEG (reference wm_basicsr/utils/diffjpeg.py, 515 LoC).

JAX implementation of the standard JPEG pipeline with a differentiable
rounding surrogate round(x) + (x - round(x))^3: RGB→YCbCr, 2x2 chroma
subsampling, 8x8 block DCT, quantization by the standard luma/chroma tables
scaled by the quality factor, then the inverse chain. Batched over NHWC.
"""
import itertools
from typing import Union

import numpy as np
import jax
import jax.numpy as jnp

Y_TABLE = np.array(
    [[16, 11, 10, 16, 24, 40, 51, 61], [12, 12, 14, 19, 26, 58, 60, 55],
     [14, 13, 16, 24, 40, 57, 69, 56], [14, 17, 22, 29, 51, 87, 80, 62],
     [18, 22, 37, 56, 68, 109, 103, 77], [24, 35, 55, 64, 81, 104, 113, 92],
     [49, 64, 78, 87, 103, 121, 120, 101], [72, 92, 95, 98, 112, 100, 103, 99]],
    np.float32).T  # reference stores the table transposed (diffjpeg.py:14-22)
C_TABLE = np.full((8, 8), 99, np.float32)
C_TABLE[:4, :4] = np.array([[17, 18, 24, 47], [18, 21, 26, 66],
                            [24, 26, 56, 99], [47, 66, 99, 99]], np.float32)

_RGB2YCBCR = np.array([[0.299, 0.587, 0.114],
                       [-0.168736, -0.331264, 0.5],
                       [0.5, -0.418688, -0.081312]], np.float32)
_YCBCR2RGB = np.array([[1.0, 0.0, 1.402], [1.0, -0.344136, -0.714136],
                       [1.0, 1.772, 0.0]], np.float32)

# 8x8 type-II DCT basis with JPEG normalization
_DCT = np.zeros((8, 8, 8, 8), np.float32)
for x, y, u, v in itertools.product(range(8), repeat=4):
    _DCT[x, y, u, v] = np.cos((2 * x + 1) * u * np.pi / 16) * \
        np.cos((2 * y + 1) * v * np.pi / 16)
_ALPHA = np.array([1.0 / np.sqrt(2)] + [1.0] * 7, np.float32)
_SCALE = np.outer(_ALPHA, _ALPHA) * 0.25


def diff_round(x):
    r = jnp.round(x)
    return r + (x - r) ** 3


def quality_to_factor(quality: float) -> float:
    if quality < 50:
        quality = 5000.0 / quality
    else:
        quality = 200.0 - quality * 2
    return quality / 100.0


def _blocks(x):
    """(B, H, W) -> (B, n, 8, 8)."""
    b, h, w = x.shape
    x = x.reshape(b, h // 8, 8, w // 8, 8).transpose(0, 1, 3, 2, 4)
    return x.reshape(b, -1, 8, 8)


def _unblocks(x, h, w):
    b = x.shape[0]
    x = x.reshape(b, h // 8, w // 8, 8, 8).transpose(0, 1, 3, 2, 4)
    return x.reshape(b, h, w)


def _dct8(blocks):
    x = blocks - 128.0
    out = jnp.tensordot(x, jnp.asarray(_DCT), axes=([-2, -1], [0, 1]))
    return out * jnp.asarray(_SCALE)


def _idct8(coeffs):
    c = coeffs * jnp.asarray(_SCALE * 4.0)  # alpha applied on (u, v)
    # idct: x[xy] = 1/4 sum_uv alpha(u)alpha(v) C[u,v] cos... == tensordot over uv
    out = 0.25 * jnp.tensordot(c, jnp.asarray(_DCT), axes=([-2, -1], [2, 3]))
    return out + 128.0


def diff_jpeg(x, quality: Union[float, jnp.ndarray], differentiable=True):
    """x: (B, H, W, 3) RGB [0,1] -> compressed-decompressed image, same shape.

    quality: scalar quality in (0, 100]."""
    rounding = diff_round if differentiable else jnp.round
    factor = quality_to_factor(quality) if isinstance(quality, (int, float)) \
        else quality
    b, h, w, _ = x.shape
    hp = (16 - h % 16) % 16
    wp = (16 - w % 16) % 16
    x = jnp.pad(x, ((0, 0), (0, hp), (0, wp), (0, 0)))
    H, W = h + hp, w + wp

    ycc = x * 255.0 @ jnp.asarray(_RGB2YCBCR.T) + jnp.asarray([0.0, 128.0, 128.0])
    y = ycc[..., 0]
    cb = ycc[..., 1].reshape(b, H // 2, 2, W // 2, 2).mean(axis=(2, 4))
    cr = ycc[..., 2].reshape(b, H // 2, 2, W // 2, 2).mean(axis=(2, 4))

    yt = jnp.asarray(Y_TABLE) * factor
    ct = jnp.asarray(C_TABLE) * factor

    def channel(c, table):
        q = rounding(_dct8(_blocks(c)) / table)
        return q * table

    yq = _unblocks(_idct8(channel(y, yt) / 1.0), H, W)
    cbq = _unblocks(_idct8(channel(cb, ct) / 1.0), H // 2, W // 2)
    crq = _unblocks(_idct8(channel(cr, ct) / 1.0), H // 2, W // 2)

    cbq = jnp.repeat(jnp.repeat(cbq, 2, axis=1), 2, axis=2)
    crq = jnp.repeat(jnp.repeat(crq, 2, axis=1), 2, axis=2)
    ycc = jnp.stack([yq, cbq - 128.0, crq - 128.0], axis=-1)
    rgb = ycc @ jnp.asarray(_YCBCR2RGB.T)
    rgb = jnp.clip(rgb, 0.0, 255.0) / 255.0
    return rgb[:, :h, :w]
