#!/usr/bin/env python
"""Kalman-gain stage sublayer attribution on the real chip.

Round-4 ledger: kalman_calc_gain = 6.9 ms at ~7 TF/s effective — the worst
TF/s of any stage in the serving program (unfused small ops). This tool
breaks the 6.9 ms down: uncertainty-estimator transformer blocks (sparse-
causal attn / FFN / temporal attn sublayers) vs the res-block + 1x1 head,
to target the round-5 fusion work (VERDICT r4 item 2a).

Tunnel-safe timing: np.asarray of one output scalar is the only reliable
execution barrier through the axon tunnel (block_until_ready is a no-op).

Usage: python tools/_prof_kalman.py [--frames 20] [--iters 20]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--f32", action="store_true")
    args = ap.parse_args()

    import jax
    from comfyui_keep_tpu.utils.compile_cache import enable_persistent_compile_cache
    enable_persistent_compile_cache()
    import jax.numpy as jnp
    from comfyui_keep_tpu.models.keep import (KEEP, kalman_filter_init,
                                              kalman_calc_gain)
    from comfyui_keep_tpu.models import layers as L
    from comfyui_keep_tpu.models.vqgan import res_block
    from comfyui_keep_tpu.ops import conv2d

    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    cfg = KEEP.config("KEEP")
    p = kalman_filter_init(jax.random.PRNGKey(0), cfg["emb_dim"],
                           cfg["n_head"], cfg["kalman_attn_head_dim"],
                           cfg["num_uncertainty_layers"])
    p = jax.tree.map(lambda a: a.astype(dtype), p)
    t = args.frames
    hl = 16
    z = (jax.random.normal(jax.random.PRNGKey(1),
                           (1, t, hl, hl, cfg["emb_dim"])) * 0.3).astype(dtype)

    def fetch(out):
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])

    def timeit(label, fn, *a):
        f = jax.jit(fn)
        out = f(*a)
        fetch(out)
        s = time.perf_counter()
        for _ in range(args.iters):
            out = f(*a)
        fetch(out)
        ms = (time.perf_counter() - s) / args.iters * 1000
        print(f"{label:42s} {ms:7.2f} ms")
        return ms

    n_head = cfg["n_head"]

    timeit("kalman_calc_gain (full)",
           lambda p, z: kalman_calc_gain(p, z, n_head=n_head), p, z)

    def estimator_only(p, z):
        b, tt, h, w, c = z.shape
        x = z.reshape(b * tt, h * w, c)
        for blk in p["uncertainty_estimator"]:
            x = L.basic_transformer_block(blk, x, video_length=tt,
                                          heads=n_head)
        return x

    timeit("uncertainty estimator (3 blocks)", estimator_only, p, z)

    def head_only(p, z):
        b, tt, h, w, c = z.shape
        x = z.reshape(b * tt, h, w, c)
        g = p["kalman_gain_calculator"]
        x = res_block(g[0], x)
        x = res_block(g[1], x)
        x = res_block(g[2], x)
        x = conv2d(x, g[3]["w"], g[3]["b"])
        return jax.nn.sigmoid(x)

    timeit("gain head (3 res + 1x1 + sigmoid)", head_only, p, z)

    blk0 = p["uncertainty_estimator"][0]

    def one_block(blk, z):
        b, tt, h, w, c = z.shape
        x = z.reshape(b * tt, h * w, c)
        return L.basic_transformer_block(blk, x, video_length=tt,
                                         heads=n_head)

    timeit("one transformer block", one_block, blk0, z)

    def sc_attn_only(blk, z):
        b, tt, h, w, c = z.shape
        x = z.reshape(b * tt, h * w, c)
        h_ = L.layer_norm(x, blk["norm1"])
        return L.sparse_causal_attention(blk["attn1"], h_, tt,
                                         heads=n_head) + x

    timeit("  sparse-causal attn sublayer", sc_attn_only, blk0, z)

    def ff_only(blk, z):
        b, tt, h, w, c = z.shape
        x = z.reshape(b * tt, h * w, c)
        return L.feed_forward(blk["ff"], L.layer_norm(x, blk["norm3"])) + x

    timeit("  FFN sublayer", ff_only, blk0, z)

    def temporal_only(blk, z):
        b, tt, h, w, c = z.shape
        x = z.reshape(b * tt, h * w, c)
        bf, d, cc = x.shape
        bb = bf // tt
        xt = x.reshape(bb, tt, d, cc).transpose(0, 2, 1, 3).reshape(
            bb * d, tt, cc)
        h_ = L.layer_norm(xt, blk["norm_temp"])
        xt = L.cross_attention(blk["attn_temp"], h_, heads=n_head) + xt
        return xt.reshape(bb, d, tt, cc).transpose(0, 2, 1, 3).reshape(
            bf, d, cc)

    timeit("  temporal attn sublayer", temporal_only, blk0, z)


if __name__ == "__main__":
    main()
