"""GMFlow transformer: attention_pallas block_q sweep (on-chip)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from comfyui_keep_tpu.ops.pallas_kernels import attention_pallas

dt = jnp.bfloat16
b, l, d = 152, 1024, 128  # 19 pairs x2 dirs x4 windows
q = jax.random.normal(jax.random.PRNGKey(0), (b, l, d)).astype(dt)
k = jax.random.normal(jax.random.PRNGKey(1), (b, l, d)).astype(dt)
v = jax.random.normal(jax.random.PRNGKey(2), (b, l, d)).astype(dt)
bias = jax.random.normal(jax.random.PRNGKey(3), (4, l, l)).astype(jnp.float32)

for use_bias in (False, True):
    for bq in (256, 512, 1024):
        fn = jax.jit(lambda q, k, v, bias, bq=bq, ub=use_bias: attention_pallas(
            q, k, v, 1.0 / np.sqrt(d), bias=bias if ub else None, block_q=bq))
        out = fn(q, k, v, bias)
        np.asarray(out[0, 0, 0].astype(jnp.float32))
        s = time.perf_counter()
        iters = 30
        for _ in range(iters):
            out = fn(q, k, v, bias)
        np.asarray(out[0, 0, 0].astype(jnp.float32))
        ms = (time.perf_counter() - s) / iters * 1000
        gflop = 2 * 2 * b * l * l * d / 1e9
        print(f"bias={use_bias} bq={bq} ms={ms:.2f} tflops={gflop/ms:.1f}",
              flush=True)
