"""VQGAN stack, TPU-native rebuild of reference vqgan_arch.py (597 LoC).

Design: the encoder/decoder are *block plans* — static lists of typed block
descriptors built from config — executed by a pure function over a params
list aligned 1:1 with the plan. The flat indexing deliberately matches the
reference's nn.ModuleList ordering (vqgan_arch.py:246-343) because the KEEP
arch taps encoder/generator features by flat block index
(keep_arch.py:950-954), and checkpoint keys are `blocks.{i}.*`.

All arrays are NHWC; quantization uses matmul distances + gather (the
reference's one-hot scatter+matmul, vqgan_arch.py:26-91, is a GPU-ism —
a gather compiles to a single dynamic-slice stream on TPU).
"""
import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from comfyui_keep_tpu.ops import (
    conv2d, conv2d_init, conv3d, conv3d_init, group_norm, group_norm_init,
    batch_norm, batch_norm_init, swish, leaky_relu, upsample_nearest_2x,
)
from comfyui_keep_tpu.ops.attention import scaled_dot_product_attention
from comfyui_keep_tpu.ops.spectral import spectral_norm_weight
from comfyui_keep_tpu.utils.registry import ARCH_REGISTRY

GN_EPS = 1e-6  # vqgan_arch.py:16-18: GroupNorm(32, eps=1e-6)


def _int8_acts() -> bool:
    """KEEP_TPU_INT8_ACTS=1: serving-time experiment — activations crossing
    conv-block boundaries are stored int8 (dynamic per-tensor scale), compute
    stays bf16/f32. Rationale: on v5e the i8-store/bf16-compute conv is ~21%
    faster than bf16-in on the hot shapes (tools/_prof_int8.py,
    docs/ROADMAP.md), the win being HBM bytes. Default OFF pending an
    in-model speed + fidelity measurement."""
    import os
    return os.environ.get("KEEP_TPU_INT8_ACTS") == "1"


def _quant_boundary(x):
    """Round-trip x through an int8 HBM materialization: quantize with a
    dynamic per-tensor scale, force the int8 buffer with an
    optimization_barrier (otherwise XLA fuses quant+dequant into one fusion
    whose bf16 root is what materializes), dequantize into the consumer."""
    s = jnp.maximum(jnp.max(jnp.abs(x)).astype(jnp.float32) / 127.0, 1e-8)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127)
    xq, s = jax.lax.optimization_barrier((xq.astype(jnp.int8), s))
    return xq.astype(x.dtype) * s.astype(x.dtype)


# ---------------------------------------------------------------------------
# Block plans
# ---------------------------------------------------------------------------

def encoder_plan(in_channels: int, nf: int, emb_dim: int, ch_mult: Sequence[int],
                 num_res_blocks: int, resolution: int, attn_resolutions: Sequence[int]):
    """Flat block list mirroring reference Encoder (vqgan_arch.py:246-292)."""
    blocks: List[Tuple] = [("conv", in_channels, nf)]
    curr_res = resolution
    in_ch_mult = (1,) + tuple(ch_mult)
    c = nf
    for i in range(len(ch_mult)):
        c = nf * in_ch_mult[i]
        c_out = nf * ch_mult[i]
        for _ in range(num_res_blocks):
            blocks.append(("res", c, c_out))
            c = c_out
            if curr_res in attn_resolutions:
                blocks.append(("attn", c))
        if i != len(ch_mult) - 1:
            blocks.append(("down", c))
            curr_res //= 2
    blocks += [("res", c, c), ("attn", c), ("res", c, c),
               ("norm", c), ("conv", c, emb_dim)]
    return blocks


def generator_plan(nf: int, emb_dim: int, ch_mult: Sequence[int],
                   num_res_blocks: int, resolution: int, attn_resolutions: Sequence[int],
                   out_channels: int = 3):
    """Flat block list mirroring reference Generator (vqgan_arch.py:295-343)."""
    c = nf * ch_mult[-1]
    curr_res = resolution // 2 ** (len(ch_mult) - 1)
    blocks: List[Tuple] = [("conv", emb_dim, c),
                           ("res", c, c), ("attn", c), ("res", c, c)]
    for i in reversed(range(len(ch_mult))):
        c_out = nf * ch_mult[i]
        for _ in range(num_res_blocks):
            blocks.append(("res", c, c_out))
            c = c_out
            if curr_res in attn_resolutions:
                blocks.append(("attn", c))
        if i != 0:
            blocks.append(("up", c))
            curr_res *= 2
    blocks += [("norm", c), ("conv", c, out_channels)]
    return blocks


# ---------------------------------------------------------------------------
# Block init / apply
# ---------------------------------------------------------------------------

def _block_init(key, spec):
    kind = spec[0]
    ks = jax.random.split(key, 6)
    if kind == "conv":
        _, cin, cout = spec
        return conv2d_init(ks[0], 3, 3, cin, cout)
    if kind == "res":
        _, cin, cout = spec
        p = {
            "norm1": group_norm_init(cin),
            "conv1": conv2d_init(ks[0], 3, 3, cin, cout),
            "norm2": group_norm_init(cout),
            "conv2": conv2d_init(ks[1], 3, 3, cout, cout),
        }
        if cin != cout:
            p["conv_out"] = conv2d_init(ks[2], 1, 1, cin, cout)
        return p
    if kind == "attn":
        c = spec[1]
        return {
            "norm": group_norm_init(c),
            "q": conv2d_init(ks[0], 1, 1, c, c),
            "k": conv2d_init(ks[1], 1, 1, c, c),
            "v": conv2d_init(ks[2], 1, 1, c, c),
            "proj_out": conv2d_init(ks[3], 1, 1, c, c),
        }
    if kind == "down":
        c = spec[1]
        return {"conv": conv2d_init(ks[0], 3, 3, c, c)}
    if kind == "up":
        c = spec[1]
        return {"conv": conv2d_init(ks[0], 3, 3, c, c)}
    if kind == "norm":
        return group_norm_init(spec[1])
    raise ValueError(kind)


def res_block(p, x):
    h = swish(group_norm(x, p["norm1"], eps=GN_EPS))
    h = conv2d(h, p["conv1"]["w"], p["conv1"]["b"], padding=1)
    h = swish(group_norm(h, p["norm2"], eps=GN_EPS))
    h = conv2d(h, p["conv2"]["w"], p["conv2"]["b"], padding=1)
    if "conv_out" in p:
        x = conv2d(x, p["conv_out"]["w"], p["conv_out"]["b"])
    return x + h


def attn_block(p, x):
    """Single-head full self-attention over H*W (vqgan_arch.py:184-243)."""
    b, h, w, c = x.shape
    hn = group_norm(x, p["norm"], eps=GN_EPS)
    q = conv2d(hn, p["q"]["w"], p["q"]["b"]).reshape(b, h * w, c)
    k = conv2d(hn, p["k"]["w"], p["k"]["b"]).reshape(b, h * w, c)
    v = conv2d(hn, p["v"]["w"], p["v"]["b"]).reshape(b, h * w, c)
    out = scaled_dot_product_attention(q, k, v, scale=c ** -0.5)
    out = out.reshape(b, h, w, c)
    return x + conv2d(out, p["proj_out"]["w"], p["proj_out"]["b"])


def _block_apply(spec, p, x):
    kind = spec[0]
    if kind == "conv":
        return conv2d(x, p["w"], p["b"], padding=1)
    if kind == "res":
        return res_block(p, x)
    if kind == "attn":
        return attn_block(p, x)
    if kind == "down":
        # asymmetric (0,1,0,1) zero-pad + stride-2 VALID conv (vqgan_arch.py:129-139)
        return conv2d(x, p["conv"]["w"], p["conv"]["b"], stride=2,
                      padding=[(0, 1), (0, 1)])
    if kind == "up":
        return conv2d(upsample_nearest_2x(x), p["conv"]["w"], p["conv"]["b"], padding=1)
    if kind == "norm":
        return group_norm(x, p, eps=GN_EPS)
    raise ValueError(kind)


def blocks_init(key, plan):
    keys = jax.random.split(key, len(plan))
    return {"blocks": [_block_init(k, s) for k, s in zip(keys, plan)]}


# ---------------------------------------------------------------------------
# Phase-packed execution of the 512-level (serving-time; see ops/phase_pack)
# ---------------------------------------------------------------------------

def phase512_encoder_end(plan) -> Optional[int]:
    """Index of the Downsample that exits the top (512) encoder level, if the
    leading blocks are packable (conv/res only)."""
    for i, s in enumerate(plan):
        if s[0] == "down":
            return i
        if s[0] not in ("conv", "res"):
            return None
    return None


def phase_encoder_end(plan, max_levels: int = 1) -> Optional[int]:
    """Index of the Downsample exiting the max_levels-th encoder level, if
    every block up to it is packable (conv/res/down). Levels past the last
    Downsample (the latent level with attention) are never packed."""
    end = None
    seen = 0
    for i, s in enumerate(plan):
        if s[0] == "down":
            seen += 1
            end = i
            if seen == max_levels:
                return end
        elif s[0] not in ("conv", "res"):
            return end
    return end


def phase512_generator_start(plan) -> Optional[int]:
    """Index of the final Upsample (into the 512 level), if the tail after it
    is packable (res/norm/conv only)."""
    ups = [i for i, s in enumerate(plan) if s[0] == "up"]
    if not ups:
        return None
    start = ups[-1]
    if all(s[0] in ("res", "norm", "conv") for s in plan[start + 1:]):
        return start
    return None


def phase_generator_start(plan, fuse_indices=(),
                          max_levels: Optional[int] = None) -> Optional[int]:
    """Earliest Upsample index from which the whole generator tail can run
    phase-packed: every later block is up/res/norm/conv (attn needs the true
    spatial layout) and no CFT/CFA/temp fusion tap lands at or after it.
    max_levels bounds how many upsample levels are packed (None = all valid;
    1 reproduces phase512_generator_start)."""
    ups = [i for i, s in enumerate(plan) if s[0] == "up"]
    if not ups:
        return None
    valid = []
    for u in ups:
        if (all(s[0] in ("up", "res", "norm", "conv") for s in plan[u + 1:])
                and all(f < u for f in fuse_indices)):
            valid.append(u)
    if not valid:
        return None
    if max_levels is not None:
        valid = valid[-max_levels:]
    return valid[0]


def phase512_prepare(params, plan, kind: str, gen_start: Optional[int] = None,
                     enc_end: Optional[int] = None):
    """Host-side (numpy) weight packing for the phase-packed region; returns
    a new params tree with `p512` packed kernels alongside the originals.
    Serving-time only — trainers keep the unpacked path (gradients must
    reach the canonical weights). gen_start overrides the generator tail
    start (e.g. phase_generator_start for multi-level packing); enc_end
    overrides the encoder prefix end (phase_encoder_end for multi-level)."""
    from comfyui_keep_tpu.ops import phase_pack as pp
    import numpy as np

    if kind == "encoder":
        end = enc_end if enc_end is not None else phase512_encoder_end(plan)
        rng = range(0, end + 1) if end is not None else range(0)
    else:
        start = gen_start if gen_start is not None else phase512_generator_start(plan)
        rng = range(start, len(plan)) if start is not None else range(0)

    # Fetch every tensor we will pack up front, SEQUENTIALLY: on the axon
    # tunnel backend a multi-array jax.device_get deadlocks (measured: a
    # dict fetch that never returns in 15 min where per-leaf np.asarray
    # completes in seconds), so one-at-a-time it is. Most of the wall time
    # here is the tunnel's one-time ~1-3 min device->host channel warmup on
    # the FIRST transfer of the process, not the per-array round trips.
    fetch = {}
    for i in rng:
        spec, p = plan[i], params["blocks"][i]
        if spec[0] == "conv":
            fetch[i] = {"w": p["w"], "b": p["b"]}
        elif spec[0] == "res":
            fetch[i] = {"c1w": p["conv1"]["w"], "c1b": p["conv1"]["b"],
                        "c2w": p["conv2"]["w"], "c2b": p["conv2"]["b"]}
        elif spec[0] in ("down", "up"):
            fetch[i] = {"w": p["conv"]["w"], "b": p["conv"]["b"]}
    import numpy as _np_mod
    fetched = jax.tree.map(_np_mod.asarray, fetch)

    def _np(t):
        return np.asarray(t)

    blocks = list(params["blocks"])
    for i in rng:
        spec, p = plan[i], blocks[i]
        f = fetched.get(i, {})
        if spec[0] == "conv":
            w, b = pp.pack_conv3x3(_np(f["w"]), _np(f["b"]))
            blocks[i] = {**p, "p512": {"w": w, "b": b}}
        elif spec[0] == "res":
            w1, b1 = pp.pack_conv3x3(_np(f["c1w"]), _np(f["c1b"]))
            w2, b2 = pp.pack_conv3x3(_np(f["c2w"]), _np(f["c2b"]))
            blocks[i] = {**p, "p512": {"conv1": {"w": w1, "b": b1},
                                       "conv2": {"w": w2, "b": b2}}}
        elif spec[0] == "down":
            w, b = pp.pack_downsample3x3(_np(f["w"]), _np(f["b"]))
            # parity-0 variant for levels entered via space_to_depth (second
            # and deeper packed encoder levels have no parity-flipping init
            # conv, so their Downsample sees parity 0)
            w0, b0 = pp.pack_downsample3x3_p0(_np(f["w"]), _np(f["b"]))
            blocks[i] = {**p, "p512": {"w": w, "b": b},
                         "p512_p0": {"w": w0, "b": b0}}
        elif spec[0] == "up":
            w, b = pp.pack_upconv3x3(_np(f["w"]), _np(f["b"]))
            # packed->packed variant for ups that receive an already-packed
            # level (multi-level tails run with no depth_to_space between
            # levels)
            kp2p, bp2p = pp.pack_upconv3x3_p2p(_np(f["w"]), _np(f["b"]))
            blocks[i] = {**p, "p512": {"w": w, "b": b},
                         "p512_p2p": {"k": kp2p, "b": bp2p}}
        # "norm" uses its unpacked scale/bias directly
    # upload packed kernels as device arrays, NOT numpy: numpy leaves
    # re-upload host->HBM on every jitted call (catastrophic through the
    # axon tunnel). Per-leaf jnp.asarray is async/non-blocking; the batched
    # device_put/device_get tree forms are avoided (tunnel deadlock, above).
    for i in rng:
        for pk in ("p512", "p512_p2p", "p512_p0"):
            if pk in blocks[i]:
                blocks[i] = {**blocks[i],
                             pk: jax.tree.map(jnp.asarray, blocks[i][pk])}
    return {**params, "blocks": blocks}


def _packed_res_block(p, x, parity: int, true_hw):
    from comfyui_keep_tpu.ops import phase_pack as pp
    h = pp.packed_group_norm(x, p["norm1"], true_hw, eps=GN_EPS,
                             parity=parity, swish_after=True)
    h = pp.packed_conv(h, p["p512"]["conv1"]["w"], p["p512"]["conv1"]["b"],
                       parity)
    h = pp.packed_group_norm(h, p["norm2"], true_hw, eps=GN_EPS,
                             parity=1 - parity, swish_after=True)
    h = pp.packed_conv(h, p["p512"]["conv2"]["w"], p["p512"]["conv2"]["b"],
                       1 - parity)
    if "conv_out" in p:
        x = pp.packed_conv1x1(x, p["conv_out"]["w"], p["conv_out"]["b"],
                              parity)
    return x + h


def _packed_encoder_prefix(params, plan, x, end: int, taps, tap_indices,
                           remat: bool):
    """Run blocks [0..end] (conv, res*, down per level) phase-packed;
    returns the unpacked feature map after the last packed Downsample.

    Multi-level: each Downsample emits an unpacked half-res map; if more
    packed blocks follow, it is re-packed via space_to_depth (one cheap
    layout pass on an already-half-res tensor) and that level's res convs
    run packed at parity 0 (its Downsample uses the parity-0 kernels — no
    parity-flipping init conv exists past level 0)."""
    from comfyui_keep_tpu.ops import phase_pack as pp
    q = _int8_acts()
    true_hw = (x.shape[-3], x.shape[-2])
    x = pp.space_to_depth(x)
    parity = 0
    for i in range(end + 1):
        spec, p = plan[i], params["blocks"][i]
        if q and i > 0 and spec[0] != "norm":
            # same insertion rule as blocks_apply / packed_generator_tail:
            # never quantize a pre-GroupNorm activation
            x = _quant_boundary(x)
        if spec[0] == "conv":
            x = pp.packed_conv(x, p["p512"]["w"], p["p512"]["b"], parity)
            parity ^= 1
        elif spec[0] == "res":
            fn = _packed_res_block
            if remat:
                fn = jax.checkpoint(_packed_res_block, static_argnums=(2, 3))
            x = fn(p, x, parity, true_hw)
        else:  # down
            if parity == 1:
                x = pp.packed_downsample(x, p["p512"]["w"], p["p512"]["b"])
            else:
                x = pp.packed_downsample_p0(x, p["p512_p0"]["w"],
                                            p["p512_p0"]["b"])
            if i < end:  # deeper packed level follows: re-pack at half res
                true_hw = (x.shape[-3], x.shape[-2])
                x = pp.space_to_depth(x)
                parity = 0
        if tap_indices is not None and i in tap_indices:
            taps[i] = (pp.depth_to_space(x, parity)
                       if spec[0] != "down" or i < end else x)
    return x


def packed_generator_tail(params, plan, x, start: int):
    """Run blocks [start..] (up/res* per level, then norm, conv) phase-packed;
    returns the unpacked full-res output. Multi-level: each Upsample consumes
    the (unpacked) previous level and emits a parity-1 packed next level —
    the only full-layout tensors ever materialized are the small per-level
    inputs (<= half final res), never the 512x512x64 stack."""
    from comfyui_keep_tpu.ops import phase_pack as pp
    q = _int8_acts()
    parity = None  # None = x is unpacked
    true_hw = None
    for j in range(start, len(plan)):
        spec, p = plan[j], params["blocks"][j]
        if q and j > start and spec[0] != "norm":
            x = _quant_boundary(x)
        if spec[0] == "up":
            if parity is None:
                true_hw = (x.shape[-3] * 2, x.shape[-2] * 2)
                x = pp.packed_upconv(x, p["p512"]["w"], p["p512"]["b"])
            elif "p512_p2p" in p and parity == 1:
                # packed level -> packed next level, no depth_to_space
                true_hw = (true_hw[0] * 2, true_hw[1] * 2)
                x = pp.packed_upconv_p2p(x, p["p512_p2p"]["k"],
                                         p["p512_p2p"]["b"])
            else:
                x = pp.depth_to_space(x, parity)
                true_hw = (x.shape[-3] * 2, x.shape[-2] * 2)
                x = pp.packed_upconv(x, p["p512"]["w"], p["p512"]["b"])
            parity = 1
        elif spec[0] == "res":
            x = _packed_res_block(p, x, parity, true_hw)
        elif spec[0] == "norm":
            x = pp.packed_group_norm(x, p, true_hw, eps=GN_EPS, parity=parity)
        else:  # conv
            x = pp.packed_conv(x, p["p512"]["w"], p["p512"]["b"], parity)
            parity ^= 1
    return pp.depth_to_space(x, parity=parity)


def blocks_apply(params, plan, x, tap_indices: Optional[Sequence[int]] = None,
                 stop_index: Optional[int] = None, remat: bool = False):
    """Run the plan; optionally collect features AFTER blocks in tap_indices
    (matching the reference loop `for i, block in enumerate(blocks)` with
    caching at keep_arch.py:1030-1039) and stop after stop_index.

    If the leading 512-level blocks carry `p512` packed kernels (added by
    phase512_prepare), that prefix runs phase-packed."""
    taps = {}
    i0 = 0
    first = params["blocks"][0] if params["blocks"] else None
    if isinstance(first, dict) and "p512" in first:
        # packed prefix extent = the leading run of blocks carrying packed
        # kernels, ending at a Downsample (single- or multi-level prepare)
        end = None
        for i, bp in enumerate(params["blocks"]):
            if not (isinstance(bp, dict) and "p512" in bp):
                break
            if plan[i][0] == "down":
                end = i
        if end is not None and (stop_index is None or stop_index >= end):
            x = _packed_encoder_prefix(params, plan, x, end, taps,
                                       tap_indices, remat)
            i0 = end + 1
    q = _int8_acts()
    for i in range(i0, len(plan)):
        spec, p = plan[i], params["blocks"][i]
        if q and i > i0 and spec[0] != "norm":
            x = _quant_boundary(x)
        fn = _block_apply
        if remat and spec[0] in ("res", "attn"):
            fn = jax.checkpoint(_block_apply, static_argnums=(0,))
        x = fn(spec, p, x)
        if tap_indices is not None and i in tap_indices:
            taps[i] = x
        if stop_index is not None and i == stop_index:
            break
    return (x, taps) if tap_indices is not None else x


# ---------------------------------------------------------------------------
# Quantizers
# ---------------------------------------------------------------------------

def vq_init(key, codebook_size: int, emb_dim: int):
    emb = jax.random.uniform(key, (codebook_size, emb_dim),
                             minval=-1.0 / codebook_size, maxval=1.0 / codebook_size)
    return {"embedding": emb}


def vq_indices(params, z):
    """Nearest-codebook indices. z: (..., C) -> (...)."""
    e = params["embedding"]
    z2 = jnp.sum(z * z, axis=-1, keepdims=True)
    e2 = jnp.sum(e * e, axis=-1)
    ze = jnp.einsum("...c,nc->...n", z, e,
                    preferred_element_type=jnp.promote_types(z.dtype,
                                                             jnp.float32))
    d = z2 + e2 - 2.0 * ze
    return jnp.argmin(d, axis=-1), d


def vq_quantize(params, z, beta: float = 0.25):
    """z: (..., H, W, C). Returns (z_q straight-through, loss, stats)."""
    idx, d = vq_indices(params, z)
    z_q = params["embedding"][idx]
    loss = jnp.mean((jax.lax.stop_gradient(z_q) - z) ** 2) + \
        beta * jnp.mean((z_q - jax.lax.stop_gradient(z)) ** 2)
    z_q = z + jax.lax.stop_gradient(z_q - z)
    counts = jnp.bincount(idx.reshape(-1), length=params["embedding"].shape[0])
    e_mean = counts / idx.size
    perplexity = jnp.exp(-jnp.sum(e_mean * jnp.log(e_mean + 1e-10)))
    stats = {"perplexity": perplexity, "min_encoding_indices": idx,
             "mean_distance": jnp.mean(d)}
    return z_q, loss, stats


def vq_lookup(params, indices):
    """get_codebook_feat (vqgan_arch.py:78-91): indices (...,) -> (..., C)."""
    return jnp.take(jnp.asarray(params["embedding"]), indices, axis=0)


def gumbel_quantizer_init(key, codebook_size: int, emb_dim: int, num_hiddens: int):
    k1, k2 = jax.random.split(key)
    return {
        "proj": conv2d_init(k1, 1, 1, num_hiddens, codebook_size),
        "embed": jax.random.normal(k2, (codebook_size, emb_dim)) * 0.02,
    }


def gumbel_quantize(params, z, key=None, tau: float = 1.0, kl_weight: float = 5e-4,
                    hard: bool = True):
    """GumbelQuantizer (vqgan_arch.py:94-126). z: (N, H, W, C)."""
    logits = conv2d(z, params["proj"]["w"], params["proj"]["b"])
    if key is not None:
        g = -jnp.log(-jnp.log(jax.random.uniform(key, logits.shape) + 1e-20) + 1e-20)
        y = jax.nn.softmax((logits + g) / tau, axis=-1)
    else:
        y = jax.nn.softmax(logits / tau, axis=-1)
    idx = jnp.argmax(y, axis=-1)
    if hard:
        y_hard = jax.nn.one_hot(idx, logits.shape[-1], dtype=y.dtype)
        y = y + jax.lax.stop_gradient(y_hard - y)
    z_q = jnp.einsum("bhwn,nd->bhwd", y, params["embed"])
    qy = jax.nn.softmax(logits, axis=-1)
    diff = kl_weight * jnp.mean(jnp.sum(
        qy * jnp.log(qy * logits.shape[-1] + 1e-10), axis=-1))
    return z_q, diff, {"min_encoding_indices": idx}


# ---------------------------------------------------------------------------
# Full autoencoder archs
# ---------------------------------------------------------------------------

DEFAULTS = dict(img_size=512, nf=64, ch_mult=(1, 2, 2, 4, 4, 8), res_blocks=2,
                attn_resolutions=(16,), codebook_size=1024, emb_dim=256, beta=0.25)


@ARCH_REGISTRY.register(name="VQAutoEncoder")
class VQAutoEncoder:
    """Stage-1 training arch (vqgan_arch.py:346-409): encoder+quantizer+decoder."""

    @staticmethod
    def make_plans(img_size=512, nf=64, ch_mult=(1, 2, 2, 4, 4, 8), res_blocks=2,
                   attn_resolutions=(16,), emb_dim=256, in_channels=3, **_):
        enc = encoder_plan(in_channels, nf, emb_dim, ch_mult, res_blocks,
                           img_size, attn_resolutions)
        gen = generator_plan(nf, emb_dim, ch_mult, res_blocks, img_size,
                             attn_resolutions)
        return enc, gen

    @staticmethod
    def init(key, quantizer="nearest", **cfg):
        cfg = {**DEFAULTS, **cfg}
        enc_plan, gen_plan = VQAutoEncoder.make_plans(**cfg)
        k1, k2, k3 = jax.random.split(key, 3)
        params = {
            "encoder": blocks_init(k1, enc_plan),
            "generator": blocks_init(k3, gen_plan),
        }
        if quantizer == "nearest":
            params["quantize"] = vq_init(k2, cfg["codebook_size"], cfg["emb_dim"])
        else:
            params["quantize"] = gumbel_quantizer_init(
                k2, cfg["codebook_size"], cfg["emb_dim"], cfg["emb_dim"])
        return params

    @staticmethod
    def apply(params, x, quantizer="nearest", beta=0.25, key=None, **cfg):
        cfg = {**DEFAULTS, **cfg}
        enc_plan, gen_plan = VQAutoEncoder.make_plans(**cfg)
        z = blocks_apply(params["encoder"], enc_plan, x)
        if quantizer == "nearest":
            z_q, loss, stats = vq_quantize(params["quantize"], z, beta)
        else:
            z_q, loss, stats = gumbel_quantize(params["quantize"], z, key=key)
        out = blocks_apply(params["generator"], gen_plan, z_q)
        return out, loss, stats


@ARCH_REGISTRY.register(name="VQHQEncoder")
class VQHQEncoder:
    """Encoder+quantizer only — GT latent codes for training (vqgan_arch.py:459-508)."""

    @staticmethod
    def init(key, **cfg):
        cfg = {**DEFAULTS, **cfg}
        enc_plan, _ = VQAutoEncoder.make_plans(**cfg)
        k1, k2 = jax.random.split(key)
        return {"encoder": blocks_init(k1, enc_plan),
                "quantize": vq_init(k2, cfg["codebook_size"], cfg["emb_dim"])}

    @staticmethod
    def apply(params, x, beta=0.25, **cfg):
        cfg = {**DEFAULTS, **cfg}
        enc_plan, _ = VQAutoEncoder.make_plans(**cfg)
        z = blocks_apply(params["encoder"], enc_plan, x)
        z_q, loss, stats = vq_quantize(params["quantize"], z, beta)
        return z, loss, stats


@ARCH_REGISTRY.register(name="VQGANDiscriminator")
class VQGANDiscriminator:
    """PatchGAN discriminator (vqgan_arch.py:413-456). NHWC; BN in inference
    form (running stats in params; training-mode stats handled by the model
    wrapper)."""

    @staticmethod
    def layer_specs(nc=3, ndf=64, n_layers=4):
        specs = [("conv", nc, ndf, 2, True)]
        mult_prev, mult = 1, 1
        for n in range(1, n_layers):
            mult_prev, mult = mult, min(2 ** n, 8)
            specs.append(("conv_bn", ndf * mult_prev, ndf * mult, 2, False))
        mult_prev, mult = mult, min(2 ** n_layers, 8)
        specs.append(("conv_bn", ndf * mult_prev, ndf * mult, 1, False))
        specs.append(("conv", ndf * mult, 1, 1, True))
        return specs

    @staticmethod
    def init(key, nc=3, ndf=64, n_layers=4):
        specs = VQGANDiscriminator.layer_specs(nc, ndf, n_layers)
        keys = jax.random.split(key, len(specs))
        layers = []
        for k, (kind, cin, cout, _, bias) in zip(keys, specs):
            p = {"conv": conv2d_init(k, 4, 4, cin, cout, bias=bias)}
            if kind == "conv_bn":
                p["bn"] = batch_norm_init(cout)
            layers.append(p)
        return {"layers": layers}

    @staticmethod
    def apply(params, x, nc=3, ndf=64, n_layers=4):
        specs = VQGANDiscriminator.layer_specs(nc, ndf, n_layers)
        n = len(specs)
        for i, (p, (kind, cin, cout, stride, bias)) in enumerate(zip(params["layers"], specs)):
            x = conv2d(x, p["conv"]["w"], p["conv"].get("b"), stride=stride, padding=1)
            if kind == "conv_bn":
                x = batch_norm(x, p["bn"])
            if i < n - 1:
                x = leaky_relu(x, 0.2)
        return x


@ARCH_REGISTRY.register(name="Discriminator3D")
class Discriminator3D:
    """Spectral-norm Conv3d video discriminator (vqgan_arch.py:511-591).
    Input (B, T, H, W, C) channels-last; reference transposes to (B,C,T,H,W) —
    here NDHWC is native."""

    SPECS = [  # (cin_mult_or_3, cout_mult, padding)
        ("in", 1, (1, 1, 1)), (1, 2, (1, 2, 2)), (2, 4, (1, 2, 2)),
        (4, 4, (1, 2, 2)), (4, 4, (1, 2, 2)),
    ]

    @staticmethod
    def init(key, in_channels=3, nf=32, use_spectral_norm=True):
        keys = jax.random.split(key, 6)
        layers = []
        for k, (cin_m, cout_m, _) in zip(keys[:5], Discriminator3D.SPECS):
            cin = in_channels if cin_m == "in" else nf * cin_m
            p = conv3d_init(k, 3, 5, 5, cin, nf * cout_m, bias=not use_spectral_norm)
            if use_spectral_norm:
                p["u"] = jax.random.normal(k, (nf * cout_m,))
                p["u"] = p["u"] / jnp.linalg.norm(p["u"])
            layers.append(p)
        layers.append(conv3d_init(keys[5], 3, 5, 5, nf * 4, nf * 4))  # final, no SN
        return {"layers": layers}

    @staticmethod
    def apply(params, x, use_sigmoid=False, use_spectral_norm=True):
        """x: (B, T, H, W, C) -> (B, T', H', W', nf*4)."""
        for i, p in enumerate(params["layers"][:-1]):
            w = p["w"]
            if use_spectral_norm and "u" in p:
                w, _ = spectral_norm_weight(w, p["u"])
            pad = Discriminator3D.SPECS[i][2]
            x = conv3d(x, w, p.get("b"), stride=(1, 2, 2),
                       padding=[(pad[0],) * 2, (pad[1],) * 2, (pad[2],) * 2])
            x = leaky_relu(x, 0.2)
        p = params["layers"][-1]
        x = conv3d(x, p["w"], p["b"], stride=(1, 2, 2),
                   padding=[(1, 1), (2, 2), (2, 2)])
        if use_sigmoid:
            x = jax.nn.sigmoid(x)
        return x
