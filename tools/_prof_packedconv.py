"""Experiment: phase-packed 2x2 conv as Pallas 4-matmul GEMM vs XLA conv.

Case: parity-1 packed input (257,257,256) -> VALID 2x2 conv -> (256,256,256)
(the shape of every second conv in the packed 512-level stacks). The row
halo is handled by passing x[:-1] and x[1:] as separate operands — no
overlapping BlockSpecs or manual DMA needed.
"""
import sys, time, functools
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H = 257  # parity-1 cells
CO = 256
CI = 256
BR = 8   # output rows per grid step

dt = jnp.bfloat16
x = jax.random.normal(jax.random.PRNGKey(0), (H, H, CI)).astype(dt)
w = (jax.random.normal(jax.random.PRNGKey(1), (2, 2, CI, CO)) * 0.05).astype(dt)


def xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x[None], w, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]


def _kernel(xt_ref, xb_ref, w_ref, o_ref):
    wj = w_ref[...]
    acc = jnp.zeros((BR * (H - 1), CO), jnp.float32)
    for ty, xr in ((0, xt_ref), (1, xb_ref)):
        blk = xr[...]
        for tx in (0, 1):
            a = blk[:, tx:tx + (H - 1), :].reshape(BR * (H - 1), CI)
            acc += jnp.dot(a, wj[ty, tx], preferred_element_type=jnp.float32)
    o_ref[...] = acc.astype(o_ref.dtype).reshape(BR, H - 1, CO)


def pallas_conv(x, w):
    n_out = H - 1  # 256
    xt = x[:-1]
    xb = x[1:]
    grid = (n_out // BR,)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BR, H, CI), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BR, H, CI), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 2, CI, CO), lambda j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BR, n_out, CO), lambda j: (j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_out, n_out, CO), x.dtype),
    )(xt, xb, w)


def timeit(fn, *a, iters=50):
    out = fn(*a)
    np.asarray(out.ravel()[0].astype(jnp.float32))
    s = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    np.asarray(out.ravel()[0].astype(jnp.float32))
    return (time.perf_counter() - s) / iters * 1000


fx = jax.jit(xla_conv)
fp = jax.jit(pallas_conv)
rx = fx(x, w)
rp = fp(x, w)
err = float(jnp.max(jnp.abs(rx.astype(jnp.float32) - rp.astype(jnp.float32))))
print("max_err", err, flush=True)
gflop = 2 * 4 * (H - 1) * (H - 1) * CI * CO / 1e9

# chained: 20 data-dependent convs in ONE program (sub-ms standalone
# timings through the tunnel are dispatch-dominated, docs/ROADMAP.md)
N = 20


def chain(conv):
    def run(x, w):
        def body(i, x):
            y = conv(x, w)                      # (256, 256, CO)
            z = jnp.concatenate([y, y[-1:]], 0)
            return jnp.concatenate([z, z[:, -1:]], 1)  # back to (257, 257)
        return jax.lax.fori_loop(0, N, body, x)
    return jax.jit(run)


for name, f in (("xla", chain(xla_conv)), ("pallas", chain(pallas_conv))):
    ms = timeit(f, x, w, iters=20) / N
    print(f"{name}-chained ms/conv={ms:.3f} tflops={gflop/ms:.1f}", flush=True)
