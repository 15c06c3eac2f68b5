#!/usr/bin/env python
"""bf16 serving-fidelity measurement (VERDICT r2 item 3).

bench.py measures bf16 serving; this tool attaches the fidelity statement:
PSNR between the bf16 TPU output and the f32(+highest-matmul) TPU output of
the SAME 20-frame clip through the full GMFlow+KEEP forward (the bench
program, full 512 config). Writes one JSON line + --out file.

Three numbers, because with random init the raw PSNR is bounded by discrete
codebook-argmax flips (keep_arch.py:1086-1088 picks top-1 of 1024 logits;
one flip swaps a whole decoded 16x16 patch — the same fp32 chaos floor the
parity harness measures, tools/parity_report.py forced_net_compare):
  psnr_db               raw bf16-vs-f32 output PSNR (floor-bounded)
  index_agreement       fraction of bf16 top-1 codebook picks equal to the
                        f32 run's picks, per step given the f32 trajectory
  psnr_db_forced        PSNR with the f32 run's indices teacher-forced into
                        the bf16 run — the continuous-path bf16 cost, the
                        number that transfers to trained checkpoints

Usage: python tools/bf16_fidelity.py [--frames 20] [--out bf16_fidelity.json]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build(dtype_name: str, frames: int):
    import jax
    import jax.numpy as jnp
    from comfyui_keep_tpu.models.keep import KEEP
    from comfyui_keep_tpu.models.gmflow import GMFlow

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
    return cfg, params, gm, x


def run(dtype_name: str, frames: int, precision, force_idx=None):
    """Returns (output f32 ndarray, natural top-1 indices (B, T, L))."""
    import jax
    import jax.numpy as jnp
    from comfyui_keep_tpu.models.keep import KEEP
    from comfyui_keep_tpu.models.gmflow import flow_from_clip

    cfg, params, gm, x = build(dtype_name, frames)

    def fwd(p, g, z, fi):
        out, aux = KEEP.apply(p, z, flows=flow_from_clip(g, z, planes=True),
                              remat=False, scan_unroll=2, force_indices=fi,
                              return_aux=True, **cfg)
        return out, jnp.argmax(aux["logits"], axis=-1)

    fi = None if force_idx is None else jnp.asarray(force_idx, jnp.int32)
    ctx = jax.default_matmul_precision(precision) if precision else None
    if ctx:
        with ctx:
            out, idx = jax.jit(fwd)(params, gm, x, fi)
    else:
        out, idx = jax.jit(fwd)(params, gm, x, fi)
    b, t = x.shape[:2]
    return (np.asarray(out, np.float32),
            np.asarray(idx).reshape(b, t, -1).astype(np.int32))


def to_u8(out):
    return np.round(np.clip((out + 1) / 2, 0, 1) * 255.0)


def psnr_u8(a8, b8):
    mse = float(np.mean((a8 - b8) ** 2))
    return float(10 * np.log10(255.0 ** 2 / mse)) if mse > 0 else float("inf")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--frames", type=int, default=20)
    p.add_argument("--out", default="bf16_fidelity.json")
    p.add_argument("--int8-acts", action="store_true",
                   help="measure the KEEP_TPU_INT8_ACTS=1 serving path "
                        "(int8 activation storage at conv-block boundaries, "
                        "bf16 compute) instead of plain bf16")
    args = p.parse_args(argv)

    import jax
    out_f32, idx_f32 = run("f32", args.frames, "highest")
    if args.int8_acts:
        os.environ["KEEP_TPU_INT8_ACTS"] = "1"
    out_bf16, idx_bf16 = run("bf16", args.frames, None)
    # teacher-forced bf16 run: same discrete trajectory as the f32 run;
    # its natural picks give per-step agreement given the f32 state
    out_forced, idx_forced = run("bf16", args.frames, None,
                                 force_idx=idx_f32)

    a8, b8, c8 = to_u8(out_bf16), to_u8(out_f32), to_u8(out_forced)
    serving = "bf16+int8-acts" if args.int8_acts else "bf16"
    report = {
        "metric": f"PSNR({serving} serving output vs f32+highest output), dB",
        "frames": args.frames,
        "backend": jax.default_backend(),
        "psnr_db": round(psnr_u8(a8, b8), 2),
        "psnr_db_forced": round(psnr_u8(c8, b8), 2),
        "index_agreement": round(float(np.mean(idx_forced == idx_f32)), 4),
        "index_agreement_free_run": round(
            float(np.mean(idx_bf16 == idx_f32)), 4),
        "max_abs_err_u8_forced": float(np.max(np.abs(c8 - b8))),
        "frac_pixels_exact_u8": round(float(np.mean(a8 == b8)), 4),
    }
    print(json.dumps(report))
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
