"""Tiled upscaler inference with overlap feathering.

Semantics-exact reimplementation of comfy.utils.tiled_scale as used by the
reference (keep_processor.py:126-132: tile 512, overlap 64; also
face_restoration_helper.py:97-125 _run_upscaler) and of RealESRGANer's tile
loop (realesrgan_utils.py:118-176).

ComfyUI's exact semantics (comfy/utils.py tiled_scale_multidim, public
source), reproduced here:
  - tile origin grid: ``range(0, size, tile - overlap)`` per dim, each
    origin clamped to ``min(size - overlap, origin)`` — edge tiles are
    RAGGED (length ``min(tile, size - pos)``), not shifted to keep a full
    tile; the model runs on the ragged crop.
  - feather = ``round(overlap * scale)`` in output space; the first/last
    ``feather`` rows+cols of EVERY tile's mask are multiplied by
    ``(t+1)/feather`` (so image-boundary edges are feathered too).
  - accumulate ``out += model(tile) * mask`` and ``div += mask``; final
    output is ``out / div`` (boundary feathering self-normalizes).

TPU notes: interior tiles share one static shape and are batched through a
single compiled program; ragged edge tiles introduce at most 3 extra shapes
(right edge, bottom edge, corner) each compiled once.
"""
from typing import Callable, Dict, List, Tuple

import numpy as np


def _comfy_feather_mask(th: int, tw: int, feather: int) -> np.ndarray:
    """ComfyUI's mask: ones, then both edges of each dim get (t+1)/feather
    multiplied in, t = 0..feather-1 (comfy/utils.py tiled_scale_multidim).
    Multiplications compound when the tile is smaller than 2*feather."""
    mask = np.ones((th, tw, 1), np.float32)
    for t in range(feather):
        w = (t + 1) / feather
        if t < th:
            mask[t, :, 0] *= w
        if th - 1 - t >= 0:
            mask[th - 1 - t, :, 0] *= w
        if t < tw:
            mask[:, t, 0] *= w
        if tw - 1 - t >= 0:
            mask[:, tw - 1 - t, 0] *= w
    return mask


def tiled_scale(img01: np.ndarray, model_fn: Callable, scale: int,
                tile: int = 512, overlap: int = 64,
                batch_tiles: int = 4) -> np.ndarray:
    """img01: (H, W, C) float32 [0,1]; model_fn: (N, th, tw, C) -> (N, th*scale,
    tw*scale, C). Returns (round(H*scale), round(W*scale), C) float32
    (unclamped), matching comfy.utils.tiled_scale's semantics exactly (the
    shape-grouped accumulation can reorder float additions vs comfy's
    row-major tile order where ragged and full tiles interleave; f32-equal
    for the production 512/64 grid, golden-tested in test_tiled_comfy.py)."""
    h, w, _ = img01.shape
    if tile - overlap <= 0:
        raise ValueError(f"tile ({tile}) must exceed overlap ({overlap})")

    # tile origins, comfy-style: range over the full size with clamping.
    # Clamped DUPLICATE origins are kept — comfy accumulates the same tile
    # repeatedly when tile < 2*overlap, which weights it more in the blend.
    def origins(size: int) -> List[int]:
        return [max(0, min(size - overlap, it))
                for it in range(0, size, tile - overlap)]

    ys, xs = origins(h), origins(w)
    feather = round(overlap * scale)

    out_h, out_w = round(h * scale), round(w * scale)
    c_out = None
    acc = None
    div = None
    masks: Dict[Tuple[int, int], np.ndarray] = {}

    # group tiles by (lh, lw) so same-shape tiles batch through one compile
    groups: Dict[Tuple[int, int], List[Tuple[int, int]]] = {}
    for y in ys:
        for x in xs:
            lh, lw = min(tile, h - y), min(tile, w - x)
            groups.setdefault((lh, lw), []).append((y, x))

    for (lh, lw), coords in groups.items():
        for i in range(0, len(coords), batch_tiles):
            batch = coords[i:i + batch_tiles]
            tiles = np.stack([img01[y:y + lh, x:x + lw] for y, x in batch])
            outs = np.asarray(model_fn(tiles), np.float32)
            if acc is None:
                c_out = outs.shape[-1]
                acc = np.zeros((out_h, out_w, c_out), np.float32)
                div = np.zeros((out_h, out_w, 1), np.float32)
            th, tw = outs.shape[1], outs.shape[2]
            if (th, tw) not in masks:
                masks[(th, tw)] = _comfy_feather_mask(th, tw, feather)
            mask = masks[(th, tw)]
            for (y, x), o in zip(batch, outs):
                oy, ox = round(y * scale), round(x * scale)
                acc[oy:oy + th, ox:ox + tw] += o * mask
                div[oy:oy + th, ox:ox + tw] += mask
    return acc / div


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
        return (out[..., ::-1] * 255.0).astype(np.uint8)

    return upscaler
