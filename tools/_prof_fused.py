#!/usr/bin/env python
"""Attribution of the bench program: fused (GMFlow+KEEP) vs each part alone.

Answers "where does the 273 ms/clip go TODAY" with the exact programs the
bench compiles — not stage-level microbenchmarks, which over/under-state
due to layout boundaries and dispatch overhead (docs/ROADMAP.md).

Usage: python tools/_prof_fused.py [--frames 20] [--iters 6]
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
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--batch", type=int, default=1,
                    help="clip-batch B (chunks served together)")
    args = ap.parse_args()

    import jax
    import os as _os, sys as _sys
    _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
    from comfyui_keep_tpu.utils.compile_cache import enable_persistent_compile_cache
    enable_persistent_compile_cache()
    import jax.numpy as jnp
    from comfyui_keep_tpu.models.keep import KEEP
    from comfyui_keep_tpu.models.gmflow import GMFlow, flow_from_clip

    dtype = jnp.bfloat16
    cfg = KEEP.config("KEEP")
    params = jax.jit(lambda k: KEEP.init(k, **cfg))(jax.random.PRNGKey(0))
    params = jax.tree.map(lambda a: a.astype(dtype), params)
    if os.environ.get("KEEP_TPU_NO_PHASE512") != "1":
        params = KEEP.prepare_phase512(params, **cfg)
    gm = jax.jit(GMFlow.init)(jax.random.PRNGKey(2))
    gm = jax.tree.map(lambda a: a.astype(dtype), gm)
    b, t = args.batch, args.frames
    x = (jax.random.normal(jax.random.PRNGKey(1), (b, t, 512, 512, 3))
         * 0.3).astype(dtype)

    def fetch(out):
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])

    def timeit(name, fn, *a):
        out = fn(*a)
        fetch(out)
        s = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        fetch(out)
        ms = (time.perf_counter() - s) / args.iters * 1000
        print(f"{name:30s} {ms:8.1f} ms")
        return ms

    fused = jax.jit(lambda p, g, z: KEEP.apply(
        p, z, flows=flow_from_clip(g, z, planes=True), remat=False,
        scan_unroll=2, **cfg))
    flows_only = jax.jit(lambda g, z: flow_from_clip(g, z, planes=True))
    keep_only = jax.jit(lambda p, z, f: KEEP.apply(
        p, z, flows=f, remat=False, scan_unroll=2, **cfg))

    t_fused = 0.0
    if os.environ.get("KEEP_TPU_PROF_FUSED") == "1":
        t_fused = timeit("fused (bench program)", fused, params, gm, x)
    t_flow = timeit("flow_from_clip alone", flows_only, gm, x)
    f = flows_only(gm, x)
    f = tuple(np.asarray(v) for v in f)
    f = tuple(jnp.asarray(v) for v in f)
    t_keep = timeit("KEEP.apply alone", keep_only, params, x, f)
    print(f"{'sum of parts':30s} {t_flow + t_keep:8.1f} ms "
          f"(fused {t_fused:.1f})")


if __name__ == "__main__":
    main()
