#!/usr/bin/env python
"""Per-frame latency benchmark CLI (first-class version of the reference's
keep_arch.py:1196-1203 __main__ micro-benchmark).

  python tools/benchmark.py --variant KEEP --frames 20 --iters 5 \
      [--dtype bf16|f32] [--no-flow] [--batch 1] [--trace DIR]

--train benchmarks the KEEP training step instead (fwd + losses + bwd +
Adam + EMA, the optimize_parameters path): ms/iter and frames/sec at the
given batch/frames. Runs on whatever mesh the default backend exposes
(1 device = single-chip; the trainer jits the same step sharded when built
with a mesh — see tests/test_parallel.py for the multi-device variant).
"""
import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    from comfyui_keep_tpu.utils.options import pin_platform_from_env
    pin_platform_from_env()
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
    p.add_argument("--train", action="store_true",
                   help="benchmark the KEEP training step instead of serving")
    p.add_argument("--mixed", action="store_true",
                   help="with --train: bf16 compute / f32 masters "
                        "(train.mixed_precision)")
    p.add_argument("--tiny", action="store_true",
                   help="64x64 toy config (smoke-testing the harness)")
    p.add_argument("--platform", default=None,
                   help="force a JAX platform (e.g. cpu). Env JAX_PLATFORMS "
                        "is too late in this image (sitecustomize imports "
                        "jax at startup) — this uses jax.config instead.")
    args = p.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    if args.train:
        return train_bench(args)

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


def train_bench(args):
    """KEEP training-step throughput (the optimize_parameters path:
    forward + codebook/CE/temporal/pixel losses + backward + Adam + EMA,
    models/keep_model.py:123-242 equivalent)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from comfyui_keep_tpu.models.keep import KEEP
    from comfyui_keep_tpu.models.vqgan import VQHQEncoder
    from comfyui_keep_tpu.training.trainers import KEEPTrainer

    if args.tiny:
        import __graft_entry__
        cfg = dict(__graft_entry__.TINY_CFG)
    else:
        cfg = KEEP.config(args.variant)
    size = cfg["img_size"]
    opt = {
        "model_type": "KEEPModel",
        "network_g": {"type": "KEEP", **cfg,
                      "fix_modules": ["quantize", "generator"]},
        "train": {
            "use_hq_feat_loss": True, "cross_entropy_loss": True,
            "entropy_loss_weight": 0.5,
            "pixel_opt": {"type": "L1Loss", "loss_weight": 1.0},
            "temporal_opt": {"type": "L1Loss", "loss_weight": 0.1},
            "temporal_warp_type": "GT",
            "optim_g": {"type": "Adam", "lr": 1e-4},
            "ema_decay": 0.99,
            "mixed_precision": bool(args.mixed),
        },
    }
    hq = VQHQEncoder.init(
        jax.random.PRNGKey(3), img_size=size, nf=cfg["nf"],
        ch_mult=cfg["ch_mult"], res_blocks=cfg["res_blocks"],
        attn_resolutions=cfg["attn_resolutions"],
        codebook_size=cfg["codebook_size"], emb_dim=cfg["emb_dim"])
    trainer = KEEPTrainer(opt, hq_vqgan_params=hq)
    state = trainer.make_state(jax.random.PRNGKey(0))

    b, t = args.batch, args.frames
    lq = jax.random.normal(jax.random.PRNGKey(1), (b, t, size, size, 3)) * 0.3
    gt = jax.random.normal(jax.random.PRNGKey(2), (b, t, size, size, 3)) * 0.3
    batch = {"lq": lq, "gt": gt}

    state, logs = trainer.train_step(state, batch)  # compile
    np.asarray(logs["l_total"])
    if args.trace:
        jax.profiler.start_trace(args.trace)
    import time
    start = time.perf_counter()
    for _ in range(args.iters):
        state, logs = trainer.train_step(state, batch)
    np.asarray(logs["l_total"])
    elapsed = time.perf_counter() - start
    if args.trace:
        jax.profiler.stop_trace()

    import json
    print(json.dumps({
        "mode": "train", "variant": args.variant,
        "mixed_precision": bool(args.mixed),
        "frames": t, "batch": b,
        "ms_per_iter": round(elapsed / args.iters * 1000, 3),
        "frames_per_sec": round(b * t * args.iters / elapsed, 3),
        "losses": {k: float(v) for k, v in logs.items()},
        "device": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
