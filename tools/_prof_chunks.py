#!/usr/bin/env python
"""apply_chunks (stage-batched multi-chunk serving) vs sequential B=1.

Times the EXACT production mapped-group program (GMFlow + KEEP.apply_chunks
over G 20-frame chunks, pipeline/processor.py:_restore_mapped_fn) against
G dispatches of the single-clip fused program, at the bench config.

Usage: python tools/_prof_chunks.py [--groups 1,2,4] [--frames 20]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--groups", default="1,2,4")
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    from comfyui_keep_tpu.utils.compile_cache import \
        enable_persistent_compile_cache
    enable_persistent_compile_cache()
    import jax.numpy as jnp
    from comfyui_keep_tpu.models.keep import KEEP
    from comfyui_keep_tpu.models.gmflow import GMFlow, flow_from_clip

    dt = jnp.bfloat16
    cfg = KEEP.config("KEEP")
    params = jax.jit(lambda k: KEEP.init(k, **cfg))(jax.random.PRNGKey(0))
    params = jax.tree.map(lambda a: a.astype(dt), params)
    params = KEEP.prepare_phase512(params, **cfg)
    gm = jax.jit(GMFlow.init)(jax.random.PRNGKey(2))
    gm = jax.tree.map(lambda a: a.astype(dt), gm)
    t = args.frames

    seq = jax.jit(lambda p, g, z: KEEP.apply(
        p, z, flows=flow_from_clip(g, z, planes=True), remat=False,
        scan_unroll=2, **cfg))
    grp = jax.jit(lambda p, g, z: KEEP.apply_chunks(
        p, z, flows=flow_from_clip(g, z, planes=True), scan_unroll=2, **cfg))

    def timeit(fn, x, iters):
        out = fn(params, gm, x)
        np.asarray(out.ravel()[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(params, gm, x)
        np.asarray(out.ravel()[0])
        return (time.perf_counter() - t0) / iters * 1000

    x1 = (jax.random.normal(jax.random.PRNGKey(1),
                            (1, t, 512, 512, 3)) * 0.3).astype(dt)
    base = timeit(seq, x1, args.iters)
    print(f"sequential B=1: {base:7.1f} ms/clip "
          f"({1000.0 * t / base:.1f} faces/s)", flush=True)
    for g in [int(v) for v in args.groups.split(",") if v.strip()]:
        xg = (jax.random.normal(jax.random.PRNGKey(1),
                                (g, t, 512, 512, 3)) * 0.3).astype(dt)
        ms = timeit(grp, xg, max(2, args.iters // g))
        print(f"apply_chunks G={g}: {ms:7.1f} ms/group = {ms / g:6.1f} ms/clip "
              f"({1000.0 * g * t / ms:.1f} faces/s, "
              f"{base / (ms / g):.2f}x vs sequential)", flush=True)


if __name__ == "__main__":
    main()
