#!/usr/bin/env python
"""Batch-size scaling of the batched LQ encoder (straight conv stack).

_prof_keep.py --batch 2 found the (B*T=40)-frame encoder at 1507 ms vs
~40 ms for 20 frames — a >19x blow-up for 2x the work on a straight-line
conv stack. This probe isolates the batch-count dependence, with and
without phase packing, to find the trigger.

Usage: python tools/_prof_enc_batch.py [--iters 5] [--batches 20,40]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--batches", default="20,40")
    ap.add_argument("--unpacked", action="store_true")
    args = ap.parse_args()

    import jax
    import os as _os, sys as _sys
    _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
    from comfyui_keep_tpu.utils.compile_cache import enable_persistent_compile_cache
    enable_persistent_compile_cache()
    import jax.numpy as jnp
    from comfyui_keep_tpu.models.keep import KEEP, arch_tables, _plans
    from comfyui_keep_tpu.models.vqgan import blocks_apply

    dtype = jnp.bfloat16
    cfg = KEEP.config("KEEP")
    params = jax.jit(lambda k: KEEP.init(k, **cfg))(jax.random.PRNGKey(0))
    params = jax.tree.map(lambda a: a.astype(dtype), params)
    if not args.unpacked:
        params = KEEP.prepare_phase512(params, **cfg)
    enc_plan, _ = _plans(cfg)
    _, enc_tap, _ = arch_tables(cfg)
    tapidx = [enc_tap[f] for f in cfg["cft_list"]]

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

    enc = jax.jit(lambda p, z: blocks_apply(p["encoder"], enc_plan, z,
                                            tap_indices=tapidx))
    for n in (int(s) for s in args.batches.split(",")):
        x = (jax.random.normal(jax.random.PRNGKey(1), (n, 512, 512, 3))
             * 0.3).astype(dtype)
        ms = timeit(enc, params, x)
        print(f"encoder batch={n:3d} packed={not args.unpacked}: "
              f"{ms:8.1f} ms  ({ms / n:6.2f} ms/frame)", flush=True)


if __name__ == "__main__":
    main()
