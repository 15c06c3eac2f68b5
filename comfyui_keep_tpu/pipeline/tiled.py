"""Tiled upscaler inference with overlap feathering.

Equivalent of comfy.utils.tiled_scale as used by the reference
(keep_processor.py:126-132: tile 512, overlap 64) and of RealESRGANer's tile
loop (realesrgan_utils.py:118-176): the image is cut into overlapping tiles,
each runs through the SR net, and outputs are blended with linear ramps over
the overlap so seams vanish.

TPU notes: every tile has the same static shape (edge tiles are padded then
cropped), so one compiled program serves the whole grid; tiles are batched
together when memory allows.
"""
from typing import Callable

import numpy as np


def _feather_mask(th: int, tw: int, overlap: int) -> np.ndarray:
    mask = np.ones((th, tw, 1), np.float32)
    if overlap <= 0:
        return mask
    ramp = (np.arange(overlap, dtype=np.float32) + 1) / (overlap + 1)
    mask[:overlap, :, 0] *= ramp[:, None]
    mask[-overlap:, :, 0] *= ramp[::-1][:, None]
    mask[:, :overlap, 0] *= ramp[None, :]
    mask[:, -overlap:, 0] *= ramp[::-1][None, :]
    return mask


def tiled_scale(img01: np.ndarray, model_fn: Callable, scale: int,
                tile: int = 512, overlap: int = 64,
                batch_tiles: int = 4) -> np.ndarray:
    """img01: (H, W, C) float32 [0,1]; model_fn: (N, tile, tile, C) -> scaled.
    Returns (H*scale, W*scale, C) float32 [0,1]-ish (unclamped)."""
    h, w, c = img01.shape
    if h <= tile and w <= tile:
        # single padded tile fast path
        ph, pw = tile - h if h < tile else 0, tile - w if w < tile else 0
        if h <= tile and w <= tile and (h, w) != (tile, tile):
            x = np.pad(img01, ((0, tile - h), (0, tile - w), (0, 0)), mode="reflect") \
                if min(h, w) > 1 else np.pad(img01, ((0, tile - h), (0, tile - w), (0, 0)), mode="edge")
            out = np.asarray(model_fn(x[None]))[0]
            return out[: h * scale, : w * scale]
        return np.asarray(model_fn(img01[None]))[0]

    stride = tile - overlap
    ys = list(range(0, max(h - tile, 0) + 1, stride))
    xs = list(range(0, max(w - tile, 0) + 1, stride))
    if ys[-1] + tile < h:
        ys.append(h - tile)
    if xs[-1] + tile < w:
        xs.append(w - tile)

    out = np.zeros((h * scale, w * scale, c), np.float32)
    div = np.zeros((h * scale, w * scale, 1), np.float32)
    mask = _feather_mask(tile * scale, tile * scale, overlap * scale)

    coords = [(y, x) for y in ys for x in xs]
    for i in range(0, len(coords), batch_tiles):
        batch = coords[i:i + batch_tiles]
        tiles = np.stack([img01[y:y + tile, x:x + tile] for y, x in batch])
        outs = np.asarray(model_fn(tiles), np.float32)
        for (y, x), o in zip(batch, outs):
            ys_, xs_ = y * scale, x * scale
            out[ys_:ys_ + tile * scale, xs_:xs_ + tile * scale] += o * mask
            div[ys_:ys_ + tile * scale, xs_:xs_ + tile * scale] += mask
    return out / np.maximum(div, 1e-8)


def make_upscaler_fn(apply_fn, params, scale: int, tile: int = 512,
                     overlap: int = 64, jit: bool = True) -> Callable:
    """Wrap an SR arch into the pipeline's upscaler interface
    (bgr_u8 -> bgr_u8), running tiled on device with clamping — equivalent of
    KEEPFaceProcessor._run_upscaler (keep_processor.py:126-132)."""
    import jax
    import jax.numpy as jnp

    def model(x_np):
        return net(jnp.asarray(x_np))

    net = (jax.jit(lambda x: apply_fn(params, x)) if jit
           else (lambda x: apply_fn(params, x)))

    def upscaler(img_bgr_u8: np.ndarray) -> np.ndarray:
        x = img_bgr_u8[..., ::-1].astype(np.float32) / 255.0
        out = tiled_scale(x, model, scale, tile, overlap)
        out = np.clip(out, 0.0, 1.0)
        return (out[..., ::-1] * 255.0).round().astype(np.uint8)

    return upscaler
