import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from comfyui_keep_tpu.models.gmflow import GMFlow, transformer_apply, add_position

dtype = jnp.bfloat16
gm = jax.jit(GMFlow.init)(jax.random.PRNGKey(2))
gm = jax.tree.map(lambda a: a.astype(dtype), gm)
f0 = jax.random.normal(jax.random.PRNGKey(5), (19, 64, 64, 128), dtype)
f1 = jax.random.normal(jax.random.PRNGKey(6), (19, 64, 64, 128), dtype)

def fetch(o): np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])
def timeit(fn, *a, iters=8):
    o = fn(*a); fetch(o)
    s = time.perf_counter()
    for _ in range(iters): o = fn(*a)
    fetch(o)
    return (time.perf_counter()-s)/iters*1000

tf = jax.jit(lambda g, a, c: transformer_apply(g["transformer"], *add_position(a, c, 2, 128), 2))
print(f"transformer (19 pairs): {timeit(tf, gm, f0, f1):.1f} ms")
