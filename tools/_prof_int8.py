#!/usr/bin/env python
"""int8 vs bf16 conv/matmul throughput probe on the real chip.

The v5e datasheet rates int8 at 2x bf16 peak (394 vs 197 TOPS). This probe
answers whether XLA actually lowers s8xs8->s32 convs/matmuls onto the fast
path for the shapes the KEEP encoders run (docs/ROADMAP.md ledger).

Usage: python tools/_prof_int8.py [--iters 20]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    def fetch(out):
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])

    def timeit(name, fn, *a, flops=None):
        out = fn(*a)
        fetch(out)
        s = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        fetch(out)
        ms = (time.perf_counter() - s) / args.iters * 1000
        tf = (flops / (ms / 1000) / 1e12) if flops else 0.0
        print(f"{name:44s} {ms:8.3f} ms  {tf:7.1f} TF/s")
        return ms

    key = jax.random.PRNGKey(0)

    # --- matmul ceiling ----------------------------------------------------
    m = 4096
    a_bf = jax.random.normal(key, (m, m), jnp.bfloat16)
    b_bf = jax.random.normal(key, (m, m), jnp.bfloat16)
    mm_flops = 2 * m * m * m
    mm_bf = jax.jit(lambda a, b: a @ b)
    timeit("matmul 4096^3 bf16", mm_bf, a_bf, b_bf, flops=mm_flops)

    a_i8 = (jax.random.normal(key, (m, m)) * 10).astype(jnp.int8)
    b_i8 = (jax.random.normal(key, (m, m)) * 10).astype(jnp.int8)
    mm_i8 = jax.jit(lambda a, b: lax.dot(a, b,
                                         preferred_element_type=jnp.int32))
    timeit("matmul 4096^3 int8->int32", mm_i8, a_i8, b_i8, flops=mm_flops)

    # --- conv shapes from the packed KEEP encoder --------------------------
    dn = ("NHWC", "HWIO", "NHWC")
    shapes = [
        # packed 512-level: 2x2 conv at 256^2, 256ch (the encoder hot conv)
        ((20, 256, 256, 256), (2, 2, 256, 256), "SAME"),
        # 256-level: 3x3 at 256^2, 128ch
        ((20, 256, 256, 128), (3, 3, 128, 128), "SAME"),
        # 128-level: 3x3 at 128^2, 256ch
        ((20, 128, 128, 256), (3, 3, 256, 256), "SAME"),
    ]
    for xs, ks, pad in shapes:
        cf = (np.prod(xs[:3]) * ks[0] * ks[1] * ks[2] * ks[3] * 2)
        x_bf = jax.random.normal(key, xs, jnp.bfloat16)
        k_bf = jax.random.normal(key, ks, jnp.bfloat16) * 0.05
        conv_bf = jax.jit(lambda x, k: lax.conv_general_dilated(
            x, k, (1, 1), pad, dimension_numbers=dn))
        timeit(f"conv {xs[1]}^2 x{xs[3]}ch k{ks[0]} bf16", conv_bf, x_bf,
               k_bf, flops=cf)

        x_i8 = (jax.random.normal(key, xs) * 10).astype(jnp.int8)
        k_i8 = (jax.random.normal(key, ks) * 10).astype(jnp.int8)
        conv_i8 = jax.jit(lambda x, k: lax.conv_general_dilated(
            x, k, (1, 1), pad, dimension_numbers=dn,
            preferred_element_type=jnp.int32))
        try:
            timeit(f"conv {xs[1]}^2 x{xs[3]}ch k{ks[0]} int8->int32",
                   conv_i8, x_i8, k_i8, flops=cf)
        except Exception as e:
            print(f"  int8 conv failed: {type(e).__name__}: {e}")

        # int8 inputs upcast path: quantized storage, bf16 compute
        conv_up = jax.jit(lambda x, k: lax.conv_general_dilated(
            x.astype(jnp.bfloat16), k.astype(jnp.bfloat16), (1, 1), pad,
            dimension_numbers=dn))
        timeit(f"conv {xs[1]}^2 x{xs[3]}ch k{ks[0]} i8-store/bf16-compute",
               conv_up, x_i8, k_i8, flops=cf)


if __name__ == "__main__":
    main()
