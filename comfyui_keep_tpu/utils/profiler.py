"""Profiling / tracing harness (SURVEY §5.1's TPU equivalent): jax.profiler
traces plus a first-class per-frame latency benchmark (the reference's
keep_arch __main__ micro-benchmark, keep_arch.py:1196-1203, promoted to a
CLI: `python -m comfyui_keep_tpu.utils.profiler`)."""
import argparse
import contextlib
import time
from typing import Callable, Optional

import numpy as np


@contextlib.contextmanager
def trace(logdir: Optional[str]):
    """jax.profiler trace context (open with TensorBoard / xprof)."""
    import jax
    if logdir:
        jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        if logdir:
            jax.profiler.stop_trace()


def time_fn(fn: Callable, *args, iters: int = 10, warmup: int = 1):
    """Median wall time of fn(*args) with device sync via host fetch."""
    import jax
    for _ in range(warmup):
        out = fn(*args)
        jax.tree.map(lambda x: np.asarray(x.ravel()[0]) if hasattr(x, "ravel")
                     else x, jax.tree.leaves(out)[:1])
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0].ravel()[0])
        times.append(time.perf_counter() - t0)
    return float(np.median(times)), times


def keep_latency_benchmark(t: int = 20, iters: int = 5, dtype="bf16",
                           logdir: Optional[str] = None, variant="KEEP"):
    import jax
    import jax.numpy as jnp
    from comfyui_keep_tpu.models.keep import KEEP, count_parameters
    cfg = KEEP.config(variant)
    params = KEEP.init(jax.random.PRNGKey(0), **cfg)
    print(f"Total parameters: {count_parameters(params) / 1e6:.2f} M")
    if dtype == "bf16":
        params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, t, 512, 512, 3)) * 0.3
    x = x.astype(jnp.bfloat16 if dtype == "bf16" else jnp.float32)
    fn = jax.jit(lambda p, z: KEEP.apply(p, z, remat=False, **cfg))
    with trace(logdir):
        med, _ = time_fn(fn, params, x, iters=iters)
    print(f"Forward pass time: {med / t * 1000:.2f} ms/frame "
          f"({t / med:.2f} faces/sec)")
    return med


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=20)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--dtype", choices=["bf16", "f32"], default="bf16")
    p.add_argument("--trace-dir", default=None)
    p.add_argument("--variant", default="KEEP")
    a = p.parse_args()
    keep_latency_benchmark(a.frames, a.iters, a.dtype, a.trace_dir, a.variant)
