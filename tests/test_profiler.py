"""Profiling harness (utils/profiler.py) — the reference's keep_arch
__main__ micro-benchmark (keep_arch.py:1196-1203) promoted to a library."""
import jax
import jax.numpy as jnp
import numpy as np

from comfyui_keep_tpu.utils.profiler import time_fn, trace


def test_time_fn_median_and_samples():
    fn = jax.jit(lambda a: a * 2 + 1)
    x = jnp.ones((8, 8), jnp.float32)
    med, times = time_fn(fn, x, iters=4, warmup=1)
    assert len(times) == 4
    assert med > 0
    assert np.isclose(med, float(np.median(times)))


def test_time_fn_syncs_pytree_outputs():
    # Outputs that are pytrees (not bare arrays) must still sync/fetch.
    fn = jax.jit(lambda a: {"y": a + 1, "z": a - 1})
    med, times = time_fn(fn, jnp.zeros((4,), jnp.float32), iters=2)
    assert med > 0 and len(times) == 2


def test_trace_none_is_noop():
    with trace(None):
        y = jax.jit(lambda a: a + 1)(jnp.zeros((2,)))
    assert float(y[0]) == 1.0


def test_trace_writes_profile(tmp_path):
    logdir = str(tmp_path / "prof")
    try:
        with trace(logdir):
            jax.block_until_ready(jax.jit(lambda a: a @ a)(
                jnp.ones((16, 16), jnp.float32)))
    except Exception:  # pragma: no cover - profiler availability varies
        import pytest
        pytest.skip("jax.profiler trace unavailable on this backend")
    import os
    entries = []
    for root, _dirs, files in os.walk(logdir):
        entries.extend(files)
    assert entries, "trace(logdir) produced no profile files"
