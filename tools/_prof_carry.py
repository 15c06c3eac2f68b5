#!/usr/bin/env python
"""Carried-state serving: on-chip throughput + fidelity vs chunk reset.

VERDICT r4 item 6: the carried-state stream (KEEP.apply carry=... /
restore_face_stream(carry_chunks=True)) is the repo's flagship semantic
extension over the reference's per-chunk state reset
(keep_processor.py:263-270) — this gives it a number on the real chip:

- faces/s in carried mode vs chunk-reset mode on a 100-frame clip
- per-frame PSNR between the two modes (how far the carried stream
  diverges from reset semantics — largest right after each reset
  boundary, where the reset stream drops its temporal state)
- boundary discontinuity: mean |out[t] - out[t-1]| at chunk boundaries
  vs within chunks, for both modes (the artifact carried mode removes)

Usage: python tools/_prof_carry.py [--frames 100] [--clip 20]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--clip", type=int, default=20)
    args = ap.parse_args()

    from comfyui_keep_tpu.utils.compile_cache import enable_persistent_compile_cache
    enable_persistent_compile_cache()
    from comfyui_keep_tpu import api

    pack = api.load_models("KEEP", use_cache=False)
    import jax.numpy as jnp
    proc = pack.processor(jnp.bfloat16)
    rng = np.random.default_rng(0)
    # smooth synthetic "video": drifting low-frequency pattern so flows and
    # the recurrence are exercised (white noise would defeat warping)
    base = rng.random((args.frames + 8, 520, 520, 3)).astype(np.float32)
    from scipy.ndimage import gaussian_filter
    base = gaussian_filter(base, sigma=(0, 12, 12, 0))
    base = (base - base.min()) / (np.ptp(base) + 1e-8)
    faces = [(base[i:i + 1, i % 8:i % 8 + 512, i % 8:i % 8 + 512][0] * 255)
             .astype(np.uint8) for i in range(args.frames)]

    for mode in (False, True):
        proc.restore_face_stream(faces[:args.frames], max_clip_length=args.clip,
                                 carry_chunks=mode)  # warm compile
    results = {}
    for mode, name in ((False, "chunk-reset"), (True, "carried")):
        t0 = time.perf_counter()
        out = proc.restore_face_stream(faces, max_clip_length=args.clip,
                                       carry_chunks=mode)
        dt = time.perf_counter() - t0
        results[name] = (np.stack(out).astype(np.float32), dt)
        print(f"{name:12s}: {args.frames / dt:7.2f} faces/s "
              f"({dt * 1000:.0f} ms / {args.frames} frames)")

    a, b = results["chunk-reset"][0], results["carried"][0]
    mse = ((a - b) ** 2).reshape(args.frames, -1).mean(1)
    psnr = 10 * np.log10(255.0 ** 2 / np.maximum(mse, 1e-12))
    bounds = list(range(args.clip, args.frames, args.clip))
    print(f"per-frame PSNR carried-vs-reset: min {psnr.min():.1f} dB "
          f"median {np.median(psnr):.1f} dB")
    print(f"  at frames 0..{args.clip - 1} (identical state): "
          f"{psnr[:args.clip].min():.1f} dB min")
    print(f"  first frame after each reset: "
          f"{[round(float(psnr[i]), 1) for i in bounds]}")

    for name in ("chunk-reset", "carried"):
        o = results[name][0]
        d = np.abs(np.diff(o, axis=0)).reshape(args.frames - 1, -1).mean(1)
        at_b = [d[i - 1] for i in bounds]
        within = np.delete(d, [i - 1 for i in bounds])
        print(f"{name:12s}: frame-to-frame delta at boundaries "
              f"{np.mean(at_b):.3f} vs within-chunk {within.mean():.3f} "
              f"(ratio {np.mean(at_b) / within.mean():.2f}x)")


if __name__ == "__main__":
    main()
