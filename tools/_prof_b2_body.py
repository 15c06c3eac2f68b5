#!/usr/bin/env python
"""Piecewise B=2 scan-body bisection on the real chip (VERDICT r4 item 3).

Round-4 state: the ISOLATED plain-conv B=2 scan is clean on this XLA
(0.88x of 2x B=1, tools/_repro_b2_layout.py) but the IN-MODEL KEEP scan is
still ~2x worse than linear at B=2 (923.6 vs 2x232.6 ms). The round-5
profile-mode split shows BOTH conv stacks in the body are pathological
(hq path 420 ms = 3.3x linear, generator 380 ms = 1.9x linear) while the
SAME encoder batched straight-line is better than linear (82.7 vs
2x51.3 ms). So the trigger is an op/pattern in the real body that the
plain repro lacks. This tool scans candidate bodies at B=1 and B=2:

  conv      2x conv3x3+silu, 64ch@512^2 (repro baseline — clean)
  conv_gn   conv3x3 + fused group_norm + silu x2 (res_block pattern)
  resblock  the real vqgan res_block
  packed    phase-packed conv pair (serving encoder's actual conv form)
  warp      flow_warp_xy + conv (barrier as in the real body)
  enc       real hq_encoder (blocks_apply, packed params) + cheap closure
  dec       real generator _decode_frame, carry=(out, cfa)

Usage: python tools/_prof_b2_body.py [--steps 8] [--iters 5] [--bodies ...]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--bodies", default="conv,conv_gn,resblock,packed,warp,enc,dec")
    args = ap.parse_args()

    import jax
    from comfyui_keep_tpu.utils.compile_cache import enable_persistent_compile_cache
    enable_persistent_compile_cache()
    import jax.numpy as jnp
    from jax import lax
    from comfyui_keep_tpu.models.keep import KEEP, _plans, arch_tables
    from comfyui_keep_tpu.models.vqgan import blocks_apply, res_block, _block_init
    from comfyui_keep_tpu.ops.warp import flow_warp_xy
    from comfyui_keep_tpu.ops import phase_pack as PP
    from comfyui_keep_tpu.ops.norm import group_norm

    dtype = jnp.bfloat16
    cfg = KEEP.config("KEEP")
    key = jax.random.PRNGKey(0)

    def fetch(out):
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])

    def time_scan(label, body, init_carry, xs, b):
        @jax.jit
        def run(c, xs):
            out, _ = lax.scan(body, c, xs, length=args.steps)
            return out

        out = run(init_carry, xs)
        fetch(out)
        s = time.perf_counter()
        for _ in range(args.iters):
            out = run(init_carry, xs)
        fetch(out)
        ms = (time.perf_counter() - s) / args.iters * 1000
        print(f"{label:10s} B={b}: {ms:8.2f} ms ({ms / b:7.2f} /elem)",
              flush=True)
        return ms

    def ratio(label, make):
        """make(b) -> (body, carry, xs)"""
        m1 = time_scan(label, *make(1), 1)
        m2 = time_scan(label, *make(2), 2)
        print(f"{label:10s} B=2 / 2xB=1 = {m2 / (2 * m1):.2f}x", flush=True)

    ch = 64
    k1 = (jax.random.normal(key, (3, 3, ch, ch)) * 0.05).astype(dtype)
    k2 = (jax.random.normal(key, (3, 3, ch, ch)) * 0.05).astype(dtype)
    dn = ("NHWC", "HWIO", "NHWC")

    def conv2(x):
        x = lax.conv_general_dilated(x, k1, (1, 1), "SAME", dimension_numbers=dn)
        x = jax.nn.silu(x)
        return lax.conv_general_dilated(x, k2, (1, 1), "SAME", dimension_numbers=dn)

    def img(b, c=ch, s=512):
        return (jax.random.normal(key, (b, s, s, c)) * 0.1).astype(dtype)

    bodies = args.bodies.split(",")

    if "conv" in bodies:
        ratio("conv", lambda b: (lambda c, _: (conv2(c), ()), img(b), None))

    gn_p = {"scale": jnp.ones((ch,), dtype), "bias": jnp.zeros((ch,), dtype)}

    if "conv_gn" in bodies:
        def body_gn(c, _):
            x = lax.conv_general_dilated(c, k1, (1, 1), "SAME",
                                         dimension_numbers=dn)
            x = jax.nn.silu(group_norm(x, gn_p))
            x = lax.conv_general_dilated(x, k2, (1, 1), "SAME",
                                         dimension_numbers=dn)
            return jax.nn.silu(group_norm(x, gn_p)), ()
        ratio("conv_gn", lambda b: (body_gn, img(b), None))

    if "resblock" in bodies:
        rb = jax.tree.map(lambda a: jnp.asarray(a, dtype),
                          _block_init(key, ("res", ch, ch)))
        ratio("resblock", lambda b: (
            lambda c, _: (res_block(rb, c), ()), img(b), None))

    # --- group_norm fine-grained variants (the conv_gn pathology) ---------
    def _gn_apply(x, scale, shift):
        return (x.astype(jnp.float32) * scale + shift).astype(x.dtype)

    if "gn_reduce" in bodies:
        # conv + per-channel sum reduce only (result folded in as a scalar)
        def body(c, _):
            x = lax.conv_general_dilated(c, k1, (1, 1), "SAME",
                                         dimension_numbers=dn)
            s = jnp.sum(x.astype(jnp.float32), axis=(-3, -2))  # (B, C)
            return jax.nn.silu(x) + 1e-6 * jnp.mean(s).astype(dtype), ()
        ratio("gn_reduce", lambda b: (body, img(b), None))

    if "gn_apply" in bodies:
        # conv + broadcast-apply of a FIXED per-(B,C) scale/shift (no reduce)
        def make(b):
            scale = jnp.ones((b, 1, 1, ch), jnp.float32)
            shift = jnp.zeros((b, 1, 1, ch), jnp.float32)

            def body(c, _):
                x = lax.conv_general_dilated(c, k1, (1, 1), "SAME",
                                             dimension_numbers=dn)
                return jax.nn.silu(_gn_apply(x, scale, shift)), ()
            return body, img(b), None
        ratio("gn_apply", make)

    if "gn_dot" in bodies:
        # stats via MXU dot instead of VPU reduce window
        def body(c, _):
            x = lax.conv_general_dilated(c, k1, (1, 1), "SAME",
                                         dimension_numbers=dn)
            xf = x.astype(jnp.float32).reshape(x.shape[0], -1, ch)
            ones = jnp.ones((xf.shape[1],), jnp.float32)
            s1 = jnp.einsum("bpc,p->bc", xf, ones)
            s2 = jnp.einsum("bpc,p->bc", jnp.square(xf), ones)
            g1 = s1.reshape(s1.shape[0], 32, -1).sum(-1)
            g2 = s2.reshape(s2.shape[0], 32, -1).sum(-1)
            n = xf.shape[1] * (ch // 32)
            mean = g1 / n
            inv = lax.rsqrt(g2 / n - mean * mean + 1e-6)
            scale = jnp.repeat(inv, ch // 32, -1)[:, None, None, :]
            shift = jnp.repeat(-mean * inv, ch // 32, -1)[:, None, None, :]
            return jax.nn.silu(_gn_apply(x, scale, shift)), ()
        ratio("gn_dot", lambda b: (body, img(b), None))

    if "gn_barrier" in bodies:
        # current group_norm but with a barrier between conv and GN
        def body(c, _):
            x = lax.conv_general_dilated(c, k1, (1, 1), "SAME",
                                         dimension_numbers=dn)
            x = jax.lax.optimization_barrier(x)
            return jax.nn.silu(group_norm(x, gn_p)), ()
        ratio("gn_barrier", lambda b: (body, img(b), None))

    if "gn_bf16" in bodies:
        # current structure but stats in bf16 (is the f32 cast the trigger?)
        def body(c, _):
            x = lax.conv_general_dilated(c, k1, (1, 1), "SAME",
                                         dimension_numbers=dn)
            s1 = jnp.sum(x, axis=(-3, -2))
            s2 = jnp.sum(jnp.square(x), axis=(-3, -2))
            g1 = s1.reshape(s1.shape[0], 32, -1).sum(-1)
            g2 = s2.reshape(s2.shape[0], 32, -1).sum(-1)
            n = x.shape[-3] * x.shape[-2] * (ch // 32)
            mean = g1 / n
            inv = lax.rsqrt(g2 / n - mean * mean + 1e-6)
            scale = jnp.repeat(inv, ch // 32, -1)[:, None, None, :]
            shift = jnp.repeat(-mean * inv, ch // 32, -1)[:, None, None, :]
            return jax.nn.silu(x * scale + shift), ()
        ratio("gn_bf16", lambda b: (body, img(b), None))

    if "gn_vmap" in bodies:
        # batch dodge: vmap the B=1 GN over the batch axis
        def gn1(x):
            return jax.nn.silu(group_norm(x[None], gn_p))[0]

        def body(c, _):
            x = lax.conv_general_dilated(c, k1, (1, 1), "SAME",
                                         dimension_numbers=dn)
            return jax.vmap(gn1)(x), ()
        ratio("gn_vmap", lambda b: (body, img(b), None))

    if "gn_outbar" in bodies:
        # barrier on the GN OUTPUT as well (keeps the normalize-apply from
        # fusing into the NEXT conv's input)
        def body(c, _):
            x = lax.conv_general_dilated(c, k1, (1, 1), "SAME",
                                         dimension_numbers=dn)
            x = jax.lax.optimization_barrier(
                jax.nn.silu(group_norm(x, gn_p)))
            x = lax.conv_general_dilated(x, k2, (1, 1), "SAME",
                                         dimension_numbers=dn)
            return jax.lax.optimization_barrier(
                jax.nn.silu(group_norm(x, gn_p))), ()
        ratio("gn_outbar", lambda b: (body, img(b), None))

    if "rb_skipbar" in bodies:
        # res_block with a barrier on the skip add
        rb2 = jax.tree.map(lambda a: jnp.asarray(a, dtype),
                           _block_init(key, ("res", ch, ch)))

        def body(c, _):
            h = jax.nn.silu(group_norm(c, rb2["norm1"]))
            h = lax.conv_general_dilated(h, rb2["conv1"]["w"], (1, 1),
                                         "SAME", dimension_numbers=dn)
            h = h + rb2["conv1"]["b"]
            h = jax.nn.silu(group_norm(h, rb2["norm2"]))
            h = lax.conv_general_dilated(h, rb2["conv2"]["w"], (1, 1),
                                         "SAME", dimension_numbers=dn)
            h = h + rb2["conv2"]["b"]
            return jax.lax.optimization_barrier(c + h), ()
        ratio("rb_skipbar", lambda b: (body, img(b), None))

    if "packed" in bodies:
        w = np.asarray(jax.random.normal(key, (3, 3, ch, ch)) * 0.02,
                       np.float32)
        pw, pb = PP.pack_conv3x3(w, np.zeros((ch,), np.float32))
        pw = jnp.asarray(pw, dtype)
        pb = jnp.asarray(pb, dtype)

        def body_packed(c, _):
            x = PP.packed_conv(c, pw, pb, 0)
            x = jax.nn.silu(x)
            x = PP.packed_conv(x, pw, pb, 1)
            return jax.nn.silu(x), ()
        ratio("packed", lambda b: (body_packed, img(b, 256, 256), None))

    if "warp" in bodies:
        def make_warp(b):
            fx = (jax.random.normal(key, (args.steps, b, 512, 512)) * 2
                  ).astype(dtype)
            fy = (jax.random.normal(key, (args.steps, b, 512, 512)) * 2
                  ).astype(dtype)

            def body(c, f):
                fxt, fyt = f
                x = jax.lax.optimization_barrier(flow_warp_xy(c, fxt, fyt))
                return conv2(x), ()
            return body, img(b), (fx, fy)
        ratio("warp", make_warp)

    params = None
    if "enc" in bodies or "dec" in bodies or "encdepth" in bodies:
        params = jax.jit(lambda k: KEEP.init(k, **cfg))(key)
        params = jax.tree.map(lambda a: a.astype(dtype), params)
        if os.environ.get("KEEP_TPU_NO_PHASE512") != "1":
            params = KEEP.prepare_phase512(params, **cfg)

    if "enc" in bodies:
        enc_plan, _ = _plans(cfg)

        def make_enc(b):
            def body(c, _):
                z = blocks_apply(params["hq_encoder"], enc_plan, c,
                                 remat=False)
                # cheap closure back to the (B,512,512,3) carry: broadcast
                # the latent mean; keeps the loop data-dependent without
                # introducing generator convs
                return c * 0.5 + jnp.mean(z).astype(dtype), ()
            return body, img(b, 3), None
        ratio("enc", make_enc)

    if "encdepth" in bodies:
        # depth bisection of the hq_encoder: scan a PREFIX of the block
        # plan (closure as in 'enc'); the first depth whose B=2 ratio
        # blows up names the culprit block type
        enc_plan, _ = _plans(cfg)
        pp = params["hq_encoder"]
        for d in (3, 6, 9, 12, 15, 17, 23, 25):
            def make_d(b, d=d):
                def body(c, _):
                    z = blocks_apply(pp, enc_plan, c, remat=False,
                                     stop_index=d - 1)
                    return c * 0.5 + jnp.mean(z).astype(dtype), ()
                return body, img(b, 3), None
            ratio(f"enc[:{d}]", make_d)

    if "dec" in bodies:
        _, enc_tap, _ = arch_tables(cfg)
        tap = {enc_tap[f]: f for f in cfg["cft_list"]}
        enc_plan, _ = _plans(cfg)

        def make_dec(b):
            x0 = img(b, 3)
            z, taps = jax.jit(lambda xx: blocks_apply(
                params["encoder"], enc_plan, xx, tap_indices=list(tap),
                remat=False))(x0)
            enc_t = {tap[i]: v for i, v in taps.items()}
            quant, _, _ = jax.jit(lambda zz: KEEP._tokens_to_code(
                params, cfg, zz.reshape(b, z.shape[1], z.shape[2], -1)))(z)
            out0, cfa0, _ = jax.jit(lambda q: KEEP._decode_frame(
                params, cfg, q, enc_t, {}, first=True))(quant)

            def body(carry, _):
                prev_out, prev_cfa = carry
                out, new_cfa, _ = KEEP._decode_frame(
                    params, cfg, jax.lax.optimization_barrier(quant), enc_t,
                    prev_cfa, first=False)
                out = jax.lax.optimization_barrier(out)
                return (out, new_cfa), ()
            return body, (out0, cfa0), None
        ratio("dec", make_dec)


if __name__ == "__main__":
    main()
