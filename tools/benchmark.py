#!/usr/bin/env python
"""Per-frame latency benchmark CLI (first-class version of the reference's
keep_arch.py:1196-1203 __main__ micro-benchmark).

  python tools/benchmark.py --variant KEEP --frames 20 --iters 5 \
      [--dtype bf16|f32] [--no-flow] [--batch 1] [--trace DIR]
"""
import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--variant", default="KEEP")
    p.add_argument("--frames", type=int, default=20)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    p.add_argument("--no-flow", action="store_true",
                   help="KEEP only (zero flows), skip GMFlow")
    p.add_argument("--scan-unroll", type=int, default=2)
    p.add_argument("--no-phase-pack", action="store_true",
                   help="skip prepare_phase512 (serving weight packing)")
    p.add_argument("--trace", default=None,
                   help="capture a jax.profiler trace into this directory")
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from comfyui_keep_tpu.models.keep import KEEP
    from comfyui_keep_tpu.models.gmflow import GMFlow, flow_from_clip

    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    cfg = KEEP.config(args.variant)
    params = jax.jit(lambda k: KEEP.init(k, **cfg))(jax.random.PRNGKey(0))
    params = jax.tree.map(lambda a: a.astype(dt), params)
    if not args.no_phase_pack:
        params = KEEP.prepare_phase512(params, **cfg)
    size = cfg["img_size"]
    x = (jax.random.normal(jax.random.PRNGKey(1),
                           (args.batch, args.frames, size, size, 3))
         * 0.3).astype(dt)

    if args.no_flow:
        fn = jax.jit(lambda p, g, z: KEEP.apply(
            p, z, remat=False, scan_unroll=args.scan_unroll, **cfg))
        gm = None
    else:
        gm = jax.tree.map(lambda a: a.astype(dt),
                          jax.jit(GMFlow.init)(jax.random.PRNGKey(2)))
        fn = jax.jit(lambda p, g, z: KEEP.apply(
            p, z, flows=flow_from_clip(g, z, planes=True), remat=False,
            scan_unroll=args.scan_unroll, **cfg))

    out = fn(params, gm, x)
    np.asarray(out[0, -1, 0, 0, 0].astype(jnp.float32))  # compile+run

    if args.trace:
        jax.profiler.start_trace(args.trace)
    start = time.perf_counter()
    for _ in range(args.iters):
        out = fn(params, gm, x)
    np.asarray(out[0, -1, 0, 0, 0].astype(jnp.float32))
    elapsed = time.perf_counter() - start
    if args.trace:
        jax.profiler.stop_trace()

    frames = args.batch * args.frames * args.iters
    print(json.dumps({
        "variant": args.variant, "dtype": args.dtype,
        "frames": args.frames, "batch": args.batch,
        "with_flow": not args.no_flow,
        "ms_per_frame": round(elapsed / frames * 1000, 3),
        "faces_per_sec": round(frames / elapsed, 3),
        "device": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
