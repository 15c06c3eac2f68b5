#!/usr/bin/env python
"""Minimal reproducer: the XLA-TPU B=2 scan-body conv layout pathology.

Finding (docs/ROADMAP.md, round-1/2 ledger): a lax.scan whose body is a
conv stack over a (B, 512, 512, C) carry runs ~1.8x WORSE than linear when
B goes 1 -> 2 (measured in-model: B=1 312 ms vs B=2 1101 ms per KEEP clip).
The HLO trace shows XLA layout assignment picking spatial-minor layouts
({0,3,2,1}) for the B=2 body convs; B=1 gets the normal NHWC-minor layouts.
Flattening the carry to (B, -1) does NOT fix it — the bad layouts come from
the B=2 body convs themselves, not the carry (ledger follow-up).

This repro isolates that: an 8-step scan of 3x3 SAME convs at 512^2x64ch,
timed at B=1 and B=2. Expected on v5e: B=2 much worse than 2x B=1.
Upstream XLA issue; the production workaround is chunk-parallelism
(lax.map of B=1 bodies — parallel/inference.py, pipeline/processor.py
_restore_mapped_fn) instead of batching the clip axis.

Usage: python tools/_repro_b2_layout.py [--steps 8] [--iters 5]
Dump HLO: XLA_FLAGS=--xla_dump_to=/tmp/b2dump python tools/_repro_b2_layout.py
"""
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--ch", type=int, default=64)
    ap.add_argument("--size", type=int, default=512)
    args = ap.parse_args()

    import jax
    import os as _os, sys as _sys
    _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
    from comfyui_keep_tpu.utils.compile_cache import enable_persistent_compile_cache
    enable_persistent_compile_cache()
    import jax.numpy as jnp
    from jax import lax

    dn = ("NHWC", "HWIO", "NHWC")
    k1 = (jax.random.normal(jax.random.PRNGKey(0),
                            (3, 3, args.ch, args.ch)) * 0.05
          ).astype(jnp.bfloat16)
    k2 = (jax.random.normal(jax.random.PRNGKey(1),
                            (3, 3, args.ch, args.ch)) * 0.05
          ).astype(jnp.bfloat16)

    def body(x, _):
        x = lax.conv_general_dilated(x, k1, (1, 1), "SAME",
                                     dimension_numbers=dn)
        x = jax.nn.silu(x)
        x = lax.conv_general_dilated(x, k2, (1, 1), "SAME",
                                     dimension_numbers=dn)
        return x, ()

    @jax.jit
    def run(x):
        out, _ = lax.scan(body, x, None, length=args.steps)
        return out

    def timeit(b):
        x = (jax.random.normal(jax.random.PRNGKey(2),
                               (b, args.size, args.size, args.ch)) * 0.1
             ).astype(jnp.bfloat16)
        out = run(x)
        np.asarray(out.ravel()[0])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = run(x)
        np.asarray(out.ravel()[0])
        ms = (time.perf_counter() - t0) / args.iters * 1000
        print(f"B={b}: {ms:8.2f} ms  ({ms / b:.2f} ms per batch element)")
        return ms

    m1 = timeit(1)
    m2 = timeit(2)
    print(f"B=2 / (2 x B=1) = {m2 / (2 * m1):.2f}x "
          f"({'PATHOLOGICAL (>1.2x)' if m2 > 2.4 * m1 else 'ok'})")


if __name__ == "__main__":
    main()
