#!/usr/bin/env python
"""GMFlow stage roofline: TF/s of the backbone conv stack + full flow path.

Completes the round-5 roofline table (docs/ROADMAP.md): every serving
stage gets an effective-TF/s statement against the chip's measured
ceilings (105 TF/s 4096^3 bf16 matmul; convs measured max ~60-83 TF/s on
KEEP shapes). FLOPs come from XLA's own cost analysis of the compiled
program; timing uses >=20 pipelined iters (tunnel rule, _prof_kalman.py).

Usage: python tools/_prof_gmflow_roofline.py [--frames 20] [--iters 20]
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
    args = ap.parse_args()

    import jax
    from comfyui_keep_tpu.utils.compile_cache import enable_persistent_compile_cache
    enable_persistent_compile_cache()
    import jax.numpy as jnp
    from comfyui_keep_tpu.models.gmflow import (GMFlow, backbone_apply,
                                                flow_from_clip)

    dtype = jnp.bfloat16
    gm = jax.jit(GMFlow.init)(jax.random.PRNGKey(2))
    gm = jax.tree.map(lambda a: a.astype(dtype), gm)
    t = args.frames
    x = (jax.random.normal(jax.random.PRNGKey(1), (1, t, 512, 512, 3))
         * 0.3).astype(dtype)
    frames = x.reshape(t, 512, 512, 3)

    def fetch(out):
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])

    def run(label, fn, *a):
        f = jax.jit(fn)
        flops = None
        try:
            ca = f.lower(*a).compile().cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            flops = ca.get("flops")
        except Exception:
            pass
        out = f(*a)
        fetch(out)
        s = time.perf_counter()
        for _ in range(args.iters):
            out = f(*a)
        fetch(out)
        ms = (time.perf_counter() - s) / args.iters * 1000
        tf = (flops / (ms / 1000) / 1e12) if flops else float("nan")
        print(f"{label:34s} {ms:8.2f} ms  {flops and flops/1e9 or float('nan'):9.1f} GFLOP  {tf:6.1f} TF/s")

    run("backbone (T frames, shared)",
        lambda p, z: backbone_apply(p["backbone"], z), gm, frames)
    run("flow_from_clip (T-1 pairs, full)",
        lambda p, z: flow_from_clip(p, z, planes=True), gm, x)


if __name__ == "__main__":
    main()
