#!/usr/bin/env python
"""Static- vs dynamic-scale int8 activation boundaries, on-chip.

The in-model dynamic-scale experiment (KEEP_TPU_INT8_ACTS=1) measured
SLOWER than bf16 (246.6 vs 232.4 ms/clip): the per-tensor max forces a
second pass over the producer output, so HBM traffic goes up, not down.
This probe measures the fix — a static (calibration-time) scale lets the
quantize fuse into the producer conv epilogue and the dequantize into the
consumer, so the boundary tensor materializes once, in int8.

Chain: conv3x3 -> boundary -> conv3x3 (packed-encoder hot shape), x10.
Variants: bf16 boundary | dynamic-scale int8 | static-scale int8.

Usage: python tools/_prof_int8_static.py [--iters 10]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--depth", type=int, default=10)
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
        print(f"{name:40s} {ms:8.3f} ms  {tf:7.1f} TF/s")
        return ms

    key = jax.random.PRNGKey(0)
    # packed-encoder hot shape: 256^2 x 256ch, k2 (the 512-level packed conv)
    n, c, k = 256, 256, 2
    x = (jax.random.normal(key, (1, n, n, c)) * 0.3).astype(jnp.bfloat16)
    ws = [
        (jax.random.normal(jax.random.fold_in(key, i), (k, k, c, c))
         * 0.05).astype(jnp.bfloat16)
        for i in range(args.depth)
    ]
    dn = lax.conv_dimension_numbers(x.shape, ws[0].shape,
                                    ("NHWC", "HWIO", "NHWC"))

    def conv(z, w):
        return lax.conv_general_dilated(z, w, (1, 1), "SAME",
                                        dimension_numbers=dn)

    def chain_bf16(z, ws):
        for w in ws:
            z = jnp.maximum(conv(z, w), 0)
        return z

    def q_dyn(z):
        s = jnp.maximum(jnp.max(jnp.abs(z)).astype(jnp.float32) / 127.0, 1e-8)
        zq = jnp.clip(jnp.round(z.astype(jnp.float32) / s), -127, 127)
        zq, s = lax.optimization_barrier((zq.astype(jnp.int8), s))
        return zq.astype(jnp.bfloat16) * s.astype(jnp.bfloat16)

    def q_static(z, s):
        zq = jnp.clip(jnp.round(z.astype(jnp.float32) * (1.0 / s)),
                      -127, 127)
        zq = lax.optimization_barrier(zq.astype(jnp.int8))
        return zq.astype(jnp.bfloat16) * jnp.bfloat16(s)

    def chain_dyn(z, ws):
        for w in ws:
            z = q_dyn(jnp.maximum(conv(z, w), 0))
        return z

    def chain_static(z, ws):
        for w in ws:
            z = q_static(jnp.maximum(conv(z, w), 0), 0.02)
        return z

    flops = 2 * n * n * k * k * c * c * args.depth
    timeit("chain bf16", jax.jit(chain_bf16), x, ws, flops=flops)
    timeit("chain int8-dynamic", jax.jit(chain_dyn), x, ws, flops=flops)
    timeit("chain int8-static", jax.jit(chain_static), x, ws, flops=flops)

    # same for the k3 128ch full-res-equivalent shape
    c2, k2s = 128, 3
    x2 = (jax.random.normal(key, (1, n, n, c2)) * 0.3).astype(jnp.bfloat16)
    ws2 = [
        (jax.random.normal(jax.random.fold_in(key, 100 + i),
                           (k2s, k2s, c2, c2)) * 0.05).astype(jnp.bfloat16)
        for i in range(args.depth)
    ]
    dn2 = lax.conv_dimension_numbers(x2.shape, ws2[0].shape,
                                     ("NHWC", "HWIO", "NHWC"))
    conv2 = lambda z, w: lax.conv_general_dilated(  # noqa: E731
        z, w, (1, 1), "SAME", dimension_numbers=dn2)

    def chain_bf16_2(z, ws):
        for w in ws:
            z = jnp.maximum(conv2(z, w), 0)
        return z

    def chain_static_2(z, ws):
        for w in ws:
            z = q_static(jnp.maximum(conv2(z, w), 0), 0.02)
        return z

    flops2 = 2 * n * n * k2s * k2s * c2 * c2 * args.depth
    timeit("chain k3/128 bf16", jax.jit(chain_bf16_2), x2, ws2, flops=flops2)
    timeit("chain k3/128 int8-static", jax.jit(chain_static_2), x2, ws2,
           flops=flops2)


if __name__ == "__main__":
    main()
