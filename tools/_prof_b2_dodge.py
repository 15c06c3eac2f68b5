#!/usr/bin/env python
"""Dodges for the XLA-TPU B=2 scan-body conv layout pathology.

tools/_repro_b2_layout.py shows a scan of 512^2x64ch convs running far
worse than 2x when B goes 1 -> 2 (spatial-minor layouts on the B=2 body
convs). This probe measures two batch=1 reformulations that present XLA
with the SAME single-image layout class it already compiles well:

  hstack   two images stacked on H with a 2-row zero gap
           (1, 2*512+2, 512, C). Exact per-image SAME-conv semantics
           requires re-zeroing the gap rows after every conv (they
           otherwise accumulate edge leakage); that is one broadcast
           multiply fused into the conv epilogue — the same multiplicative
           boundary-mask trick phase-packing uses (ops/phase_pack.py).
  chgroup  two images stacked on C with feature_group_count=2 grouped
           convs (1, 512, 512, 2C). Exact semantics for conv; GroupNorm
           with doubled groups stays per-image.

Usage: python tools/_prof_b2_dodge.py [--steps 8] [--iters 5]
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

    s, c = args.size, args.ch
    dn = ("NHWC", "HWIO", "NHWC")
    key = jax.random.PRNGKey(0)
    k1 = (jax.random.normal(key, (3, 3, c, c)) * 0.05).astype(jnp.bfloat16)
    k2 = (jax.random.normal(jax.random.fold_in(key, 1), (3, 3, c, c))
          * 0.05).astype(jnp.bfloat16)

    def fetch(out):
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])

    def timeit(name, fn, *a):
        out = fn(*a)
        fetch(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        fetch(out)
        ms = (time.perf_counter() - t0) / args.iters * 1000
        print(f"{name:34s} {ms:8.2f} ms")
        return ms

    def conv(x, k, g=1):
        return lax.conv_general_dilated(x, k, (1, 1), "SAME",
                                        dimension_numbers=dn,
                                        feature_group_count=g)

    def make_scan(body):
        def fn(x):
            return lax.scan(lambda z, _: (body(z), None), x,
                            None, length=args.steps)[0]
        return jax.jit(fn)

    def body_plain(x):
        return jax.nn.silu(conv(jax.nn.silu(conv(x, k1)), k2))

    # --- B=1 and B=2 batched -------------------------------------------
    x1 = (jax.random.normal(key, (1, s, s, c)) * 0.3).astype(jnp.bfloat16)
    x2 = (jax.random.normal(key, (2, s, s, c)) * 0.3).astype(jnp.bfloat16)
    ms1 = timeit("B=1 batched", make_scan(body_plain), x1)
    ms2 = timeit("B=2 batched", make_scan(body_plain), x2)

    # --- H-stack with 2-row zero gap, gap re-zeroed each conv ----------
    gap = 2
    mask = np.ones((1, 2 * s + gap, 1, 1), np.float32)
    mask[:, s:s + gap] = 0.0
    mask = jnp.asarray(mask, jnp.bfloat16)
    xh = jnp.concatenate(
        [x2[0:1], jnp.zeros((1, gap, s, c), jnp.bfloat16), x2[1:2]], axis=1)

    def body_hstack(x):
        x = jax.nn.silu(conv(x, k1)) * mask
        return jax.nn.silu(conv(x, k2)) * mask

    msh = timeit("B=2 hstack(+gap mask)", make_scan(body_hstack), xh)

    # --- channel-group stack -------------------------------------------
    xg = jnp.concatenate([x2[0:1], x2[1:2]], axis=-1)
    kg1 = jnp.concatenate([k1, k1], axis=-1)  # (3,3,c,2c) grouped weights
    kg2 = jnp.concatenate([k2, k2], axis=-1)

    def body_group(x):
        return jax.nn.silu(conv(jax.nn.silu(conv(x, kg1, 2)), kg2, 2))

    msg = timeit("B=2 chgroup(fgc=2)", make_scan(body_group), xg)

    print(f"\nper-image: B=1 {ms1:.1f} | B=2/2 {ms2 / 2:.1f} | "
          f"hstack/2 {msh / 2:.1f} | chgroup/2 {msg / 2:.1f}")


if __name__ == "__main__":
    main()
