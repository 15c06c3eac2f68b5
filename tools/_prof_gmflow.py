"""GMFlow stage attribution on chip: backbone vs transformer vs matching
vs flow-attn vs upsampler, whole-clip scale (20 frames / 19 pairs)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from comfyui_keep_tpu.models.gmflow import (
    GMFlow, backbone_apply, transformer_apply, global_correlation_softmax,
    flow_attention, upsample_flow_convex, add_position, flow_from_clip)

dt = jnp.bfloat16
gm = jax.tree.map(lambda a: a.astype(dt), jax.jit(GMFlow.init)(jax.random.PRNGKey(2)))
x = (jax.random.normal(jax.random.PRNGKey(1), (1, 20, 512, 512, 3)) * 0.3).astype(dt)


def timeit(fn, *a, iters=8):
    out = fn(*a)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0].astype(jnp.float32))
    s = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0].astype(jnp.float32))
    return (time.perf_counter() - s) / iters * 1000


full = jax.jit(lambda g, z: flow_from_clip(g, z))
print("full_clip_ms", round(timeit(full, gm, x), 1), flush=True)

# stage 1: backbone on all 20 frames (as flow_from_clip does)
imgs = (x.reshape(20, 512, 512, 3) + 1) * 127.5  # FlowGenerator scaling-ish
bb = jax.jit(lambda g, z: GMFlow.extract_features(g, z))
feats = bb(gm, imgs)
print("backbone20_ms", round(timeit(bb, gm, imgs), 1), flush=True)

f = jax.block_until_ready(feats)
f0, f1 = f[:19], f[1:]

tr = jax.jit(lambda g, a, b: transformer_apply(g["transformer"], *add_position(a, b, 2, 128)[:2], 2))
t0, t1 = tr(gm, f0, f1)
print("transformer19_ms", round(timeit(tr, gm, f0, f1), 1), flush=True)

t0 = jax.block_until_ready(t0)
mt = jax.jit(lambda a, b: global_correlation_softmax(a, b))
fl = mt(t0, t1)[0]
print("matching19_ms", round(timeit(mt, t0, t1), 1), flush=True)

fa = jax.jit(lambda g, a, fl: flow_attention(g["feature_flow_attn"], a, fl))
fl2 = fa(gm, t0, fl)
print("flowattn19_ms", round(timeit(fa, gm, t0, fl), 1), flush=True)

up = jax.jit(lambda g, fl, a: upsample_flow_convex(g["upsampler"], fl, a))
print("upsample19_ms", round(timeit(up, gm, fl2, t0), 1), flush=True)
