#!/usr/bin/env python
"""bf16 serving-fidelity measurement (VERDICT r2 item 3).

bench.py measures bf16 serving; this tool attaches the fidelity statement:
PSNR between the bf16 TPU output and the f32(+highest-matmul) TPU output of
the SAME 20-frame clip through the full GMFlow+KEEP forward (the bench
program, full 512 config). Writes one JSON line + --out file.

Usage: python tools/bf16_fidelity.py [--frames 20] [--out bf16_fidelity.json]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run(dtype_name: str, frames: int, precision: str | None):
    import jax
    import jax.numpy as jnp
    from comfyui_keep_tpu.models.keep import KEEP
    from comfyui_keep_tpu.models.gmflow import GMFlow, flow_from_clip

    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    cfg = KEEP.config("KEEP")
    params = jax.jit(lambda k: KEEP.init(k, **cfg))(jax.random.PRNGKey(0))
    params = jax.tree.map(lambda a: a.astype(dtype), params)
    if os.environ.get("KEEP_TPU_NO_PHASE512") != "1":
        params = KEEP.prepare_phase512(params, **cfg)
    gm = jax.jit(GMFlow.init)(jax.random.PRNGKey(2))
    gm = jax.tree.map(lambda a: a.astype(dtype), gm)
    x = (jax.random.normal(jax.random.PRNGKey(1),
                           (1, frames, 512, 512, 3)) * 0.3).astype(dtype)

    def fwd(p, g, z):
        return KEEP.apply(p, z, flows=flow_from_clip(g, z, planes=True),
                          remat=False, scan_unroll=2, **cfg)

    if precision:
        with jax.default_matmul_precision(precision):
            out = jax.jit(fwd)(params, gm, x)
    else:
        out = jax.jit(fwd)(params, gm, x)
    return np.asarray(out, np.float32)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--frames", type=int, default=20)
    p.add_argument("--out", default="bf16_fidelity.json")
    args = p.parse_args(argv)

    import jax
    out_bf16 = run("bf16", args.frames, None)
    out_f32 = run("f32", args.frames, "highest")

    # outputs are [-1, 1]; PSNR on the same u8 quantization serving emits
    a = np.clip((out_bf16 + 1) / 2, 0, 1)
    b = np.clip((out_f32 + 1) / 2, 0, 1)
    a8 = np.round(a * 255.0)
    b8 = np.round(b * 255.0)
    mse = float(np.mean((a8 - b8) ** 2))
    psnr = float(10 * np.log10(255.0 ** 2 / mse)) if mse > 0 else float("inf")
    frac_exact = float(np.mean(a8 == b8))
    report = {
        "metric": "PSNR(bf16 serving output vs f32+highest output), dB",
        "frames": args.frames,
        "backend": jax.default_backend(),
        "psnr_db": round(psnr, 2),
        "max_abs_err_u8": float(np.max(np.abs(a8 - b8))),
        "frac_pixels_exact_u8": round(frac_exact, 4),
    }
    print(json.dumps(report))
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
