"""Golden parity: pipeline/tiled.py vs ComfyUI's tiled_scale semantics.

The reference applies spandrel upscalers through comfy.utils.tiled_scale
(keep_processor.py:126-132, tile 512 / overlap 64;
face_restoration_helper.py:97-125). ComfyUI is not importable in this image,
so the oracle below is a literal torch transliteration of the public
comfy/utils.py tiled_scale_multidim algorithm (ragged clamped tile origins,
(t+1)/feather edge ramps on every tile, out/out_div normalization); our
production numpy/JAX implementation must match it bit-for-bit in float32.
"""
import itertools

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from comfyui_keep_tpu.pipeline.tiled import tiled_scale


def comfy_tiled_scale_oracle(samples, function, tile_x, tile_y, overlap,
                             upscale_amount, out_channels=3):
    """Transliteration of comfy.utils.tiled_scale_multidim (public source)
    for the 2D case. samples: torch (B, C, H, W)."""
    tile = (tile_y, tile_x)
    dims = len(tile)
    output = torch.empty(
        [samples.shape[0], out_channels] +
        [round(a * upscale_amount) for a in samples.shape[2:]])
    for b in range(samples.shape[0]):
        s = samples[b:b + 1]
        out = torch.zeros(
            [s.shape[0], out_channels] +
            [round(a * upscale_amount) for a in s.shape[2:]])
        out_div = torch.zeros_like(out)
        positions = [range(0, s.shape[d + 2], tile[d] - overlap)
                     for d in range(dims)]
        for it in itertools.product(*positions):
            s_in = s
            upscaled = []
            for d in range(dims):
                pos = max(0, min(s.shape[d + 2] - overlap, it[d]))
                ln = min(tile[d], s.shape[d + 2] - pos)
                s_in = s_in.narrow(d + 2, pos, ln)
                upscaled.append(round(pos * upscale_amount))
            ps = function(s_in)
            mask = torch.ones_like(ps)
            feather = round(overlap * upscale_amount)
            for t in range(feather):
                for d in range(2, dims + 2):
                    m = mask.narrow(d, t, 1)
                    m *= ((1.0 / feather) * (t + 1))
                    m = mask.narrow(d, mask.shape[d] - 1 - t, 1)
                    m *= ((1.0 / feather) * (t + 1))
            o = out
            o_d = out_div
            for d in range(dims):
                o = o.narrow(d + 2, upscaled[d], mask.shape[d + 2])
                o_d = o_d.narrow(d + 2, upscaled[d], mask.shape[d + 2])
            o += ps * mask
            o_d += mask
        output[b:b + 1] = out / out_div
    return output


def _blur3_np(x):
    """Non-identity shape-preserving model: 3x3 box blur with zero pad,
    (N, H, W, C) numpy."""
    pad = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = np.zeros_like(x)
    for dy in range(3):
        for dx in range(3):
            out += pad[:, dy:dy + x.shape[1], dx:dx + x.shape[2], :]
    return out / 9.0


def _blur3_torch(x):
    # same model in torch NCHW for the oracle
    k = torch.ones(x.shape[1], 1, 3, 3) / 9.0
    return torch.nn.functional.conv2d(x, k, padding=1, groups=x.shape[1])


def _up2_np(x):
    """Non-identity 2x upscaler: nearest 2x then 3x3 blur."""
    up = x.repeat(2, axis=1).repeat(2, axis=2)
    return _blur3_np(up)


def _up2_torch(x):
    up = torch.nn.functional.interpolate(x, scale_factor=2, mode="nearest")
    return _blur3_torch(up)


@pytest.mark.parametrize("hw", [(40, 56), (37, 61), (100, 30), (16, 16),
                                (70, 70)])
def test_stitch_parity_scale1(hw, rng):
    """Blur model, scale 1, sizes chosen to produce ragged edge tiles
    (including a tiny trailing overlap-sized tile at 70: origins 0,12,24,...,
    clamped to 66)."""
    h, w = hw
    img = rng.random((h, w, 3), dtype=np.float32)
    ours = tiled_scale(img, _blur3_np, scale=1, tile=16, overlap=4)
    ref = comfy_tiled_scale_oracle(
        torch.tensor(img.transpose(2, 0, 1)[None]), _blur3_torch,
        tile_x=16, tile_y=16, overlap=4, upscale_amount=1)
    np.testing.assert_allclose(ours, ref[0].numpy().transpose(1, 2, 0),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("hw", [(40, 56), (37, 29), (24, 70)])
def test_stitch_parity_scale2(hw, rng):
    h, w = hw
    img = rng.random((h, w, 3), dtype=np.float32)
    ours = tiled_scale(img, _up2_np, scale=2, tile=16, overlap=4)
    ref = comfy_tiled_scale_oracle(
        torch.tensor(img.transpose(2, 0, 1)[None]), _up2_torch,
        tile_x=16, tile_y=16, overlap=4, upscale_amount=2)
    np.testing.assert_allclose(ours, ref[0].numpy().transpose(1, 2, 0),
                               rtol=1e-6, atol=1e-6)


def test_single_tile_runs_whole_image(rng):
    """When the image fits one tile comfy narrows to the ragged size — the
    model sees the raw image, no padding. (At w=14 > tile-overlap comfy also
    emits a redundant 4-wide edge tile at pos 10 — reproduced exactly.)"""
    img = rng.random((12, 14, 3), dtype=np.float32)
    seen = []
    def model(x):
        seen.append(x.shape)
        return x
    out = tiled_scale(img, model, scale=1, tile=16, overlap=4)
    assert (1, 12, 14, 3) in seen and (1, 12, 4, 3) in seen
    np.testing.assert_allclose(out, img, rtol=1e-6)


def test_truly_single_tile(rng):
    """Image no larger than tile-overlap in every dim -> exactly one tile."""
    img = rng.random((10, 12, 3), dtype=np.float32)
    seen = []
    def model(x):
        seen.append(x.shape)
        return x
    out = tiled_scale(img, model, scale=1, tile=16, overlap=4)
    assert seen == [(1, 10, 12, 3)]
    np.testing.assert_allclose(out, img, rtol=1e-6)


def test_reference_tile_geometry(rng):
    """512/64 (the reference's production setting, keep_processor.py:126-132)
    on a 700x900 image."""
    img = rng.random((175, 225, 3), dtype=np.float32)  # 1/4-scale geometry
    ours = tiled_scale(img, _blur3_np, scale=1, tile=128, overlap=16)
    ref = comfy_tiled_scale_oracle(
        torch.tensor(img.transpose(2, 0, 1)[None]), _blur3_torch,
        tile_x=128, tile_y=128, overlap=16, upscale_amount=1)
    np.testing.assert_allclose(ours, ref[0].numpy().transpose(1, 2, 0),
                               rtol=1e-6, atol=1e-6)
