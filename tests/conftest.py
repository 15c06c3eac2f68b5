"""Test configuration: force a virtual 8-device CPU mesh.

The reference framework's distributed paths (NCCL DDP, see SURVEY.md §2.10) are
rebuilt here as jax.sharding over a Mesh; tests exercise them on 8 virtual CPU
devices so no real multi-chip hardware is required. CPU is also required for
numerics-parity tests against torch (TPU matmuls are bf16-ish by default).

NB: the environment's sitecustomize imports jax at interpreter startup, so
JAX_PLATFORMS in os.environ is too late here — use jax.config instead (works
as long as no backend has been initialized yet).
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", os.environ.get("KEEP_TPU_TEST_PLATFORM", "cpu"))

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
