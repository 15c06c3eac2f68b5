#!/usr/bin/env python
"""KEEP serving-path attribution on the real chip (docs/ROADMAP.md ledger).

Times the full forward and the profile_mode ablations (no_hq /
no_transformer / no_generator isolate scan-body components; no_scan
isolates the pre/post stages), plus the batched LQ encoder and Kalman gain
standalone. Tunnel-safe timing: np.asarray of one output scalar is the only
reliable execution barrier (block_until_ready is a no-op through the axon
tunnel).

Usage: python tools/_prof_keep.py [--frames 20] [--iters 5] [--f32]
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
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--modes", default=None,
                    help="comma list of profile modes to time "
                         "(default: full sweep; 'full' = no ablation)")
    args = ap.parse_args()

    import jax
    import os as _os, sys as _sys
    _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
    from comfyui_keep_tpu.utils.compile_cache import enable_persistent_compile_cache
    enable_persistent_compile_cache()
    import jax.numpy as jnp
    from comfyui_keep_tpu.models.keep import (KEEP, _plans, arch_tables,
                                              kalman_calc_gain)
    from comfyui_keep_tpu.models.vqgan import blocks_apply

    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    cfg = KEEP.config("KEEP")
    params = jax.jit(lambda k: KEEP.init(k, **cfg))(jax.random.PRNGKey(0))
    params = jax.tree.map(lambda a: a.astype(dtype), params)
    if os.environ.get("KEEP_TPU_NO_PHASE512") != "1":
        params = KEEP.prepare_phase512(params, **cfg)
    b, t = args.batch, args.frames
    x = (jax.random.normal(jax.random.PRNGKey(1), (b, t, 512, 512, 3))
         * 0.3).astype(dtype)
    flows = (jax.random.normal(jax.random.PRNGKey(3), (b, t - 1, 512, 512, 2))
             * 2).astype(dtype)

    def fetch(out):
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])

    def timeit(fn, *a):
        out = fn(*a)
        fetch(out)
        s = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        fetch(out)
        return (time.perf_counter() - s) / args.iters * 1000

    modes = (None, "no_hq", "no_transformer", "no_generator", "no_scan")
    if args.modes:
        modes = tuple(None if m == "full" else m
                      for m in args.modes.split(","))
    for mode in modes:
        fn = jax.jit(lambda p, z, f, m=mode: KEEP.apply(
            p, z, flows=f, remat=False, scan_unroll=2, profile_mode=m, **cfg))
        ms = timeit(fn, params, x, flows)
        print(f"profile_mode={mode}: {ms:.1f} ms")

    enc_plan, _ = _plans(cfg)
    _, enc_tap, _ = arch_tables(cfg)
    tapidx = [enc_tap[f] for f in cfg["cft_list"]]
    enc = jax.jit(lambda p, z: blocks_apply(
        p["encoder"], enc_plan, z.reshape(b * t, 512, 512, 3),
        tap_indices=tapidx))
    print(f"batched LQ encoder ({t}f): {timeit(enc, params, x):.1f} ms")
    z, _taps = enc(params, x)
    zc = z.reshape(b, t, z.shape[1], z.shape[2], -1)
    fetch(zc)
    gain = jax.jit(lambda p, zz: kalman_calc_gain(
        p["kalman_filter"], zz, n_head=cfg["n_head"]))
    print(f"kalman gain ({t}f): {timeit(gain, params, zc):.1f} ms")


if __name__ == "__main__":
    main()
