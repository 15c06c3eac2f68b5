"""Persistent XLA compilation cache.

The big fused serving program (GMFlow + KEEP, 20-frame 512 clip) takes
~8-9 minutes to compile cold through the tunnel TPU backend; a trivial
matmul's first compile alone is ~3.5 min of backend warmup. With the
persistent cache the same program loads in seconds, which is the
difference between bench/certification runs being robust one-shots and
them racing their own timeouts (BENCH_r03 class of failure).

The reference framework has no equivalent (torch eager recompiles
nothing); this is TPU-native operational plumbing, analogous in spirit to
the reference's model-weight caching (modules/utils.py:41-97) but for
compiled executables.
"""
import os

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache")


def enable_persistent_compile_cache(cache_dir: str | None = None) -> str:
    """Point jax at an on-disk compilation cache (idempotent; safe before
    or after backend init — entries are keyed on program + compile flags
    + platform, so CPU-mesh tests and TPU runs coexist in one dir).

    Env overrides: KEEP_TPU_COMPILE_CACHE=<dir> relocates it,
    KEEP_TPU_COMPILE_CACHE=0 disables."""
    env = os.environ.get("KEEP_TPU_COMPILE_CACHE")
    if env == "0":
        return ""
    cache_dir = env or cache_dir or _DEFAULT_DIR
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # default threshold (1 s) skips small programs; we want the test-lane
    # compiles cached too
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return cache_dir
