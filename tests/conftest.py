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

# persistent XLA compilation cache: the heavy full-512 / mesh-trainer test
# compiles are one-time costs instead of per-run costs
from comfyui_keep_tpu.utils.compile_cache import enable_persistent_compile_cache  # noqa: E402

enable_persistent_compile_cache()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# ---------------------------------------------------------------------------
# fast/slow lanes: tests measured >10s on an 8-vCPU host (full-512 configs,
# mesh trainer compiles, multi-minute parity subprocesses) are marked `slow`
# here in one place. Default `pytest tests/` still runs everything (CI lane);
# the fast developer lane is `pytest -m "not slow"` (<5 min).
# ---------------------------------------------------------------------------

_SLOW_TESTS = {
    # >60s
    "test_keep_forward_parity",                      # full-512 KEEP golden
    "test_apply_chunks_matches_per_chunk",           # 65s mapped-group equality
    "test_trainer_dp_tp_mesh_step",
    "test_ring_carry_pipeline_matches_host_streaming",
    "test_zip_ckpt_configs_1_3",                     # parity_report subprocess
    "test_ring_carry_pipeline_with_gmflow_matches_flowed_host",
    # 15-60s
    "test_train_and_test_cli_end_to_end",            # 2 CLI subprocesses
    "test_keep_step_mixed",                          # bf16 KEEP step compile
    "test_srgan_gan_step_mixed",                     # bf16 g/d step compiles
    "test_train_flow_cli_smoke",                     # GMFlow CLI subprocess, ~70s
    "test_generator_tail_multilevel",
    "test_dfdnet_forward",
    "test_legacy_ckpt_configs_2_4_5",
    "test_hifacegan_generator",
    "test_inception_shapes",
    "test_train_pipeline_end_to_end",
    "test_carry_roundtrip",
    "test_multiscale_refine_parity",
    "test_full_sequence_interleaved_restore",
    "test_dropout_frame_pastes_single_face",
    "test_two_process_dp_step",
    "test_pipeline_batched_stage1_matches_sequential",
    "test_hifacegan_discriminator",
    "test_ecbsr_rep_params_exact",
    "test_single_frame_carry_chunk",
    "test_random_weight_factories",
    "test_hifacegan_mixed_guidance_forward",
    "test_single_chip_chunk_stream_bitwise",
    "test_chunk_parallel_matches_sequential",
    "test_compositing_matches_reference_helper",
    # round-4 re-measurement on the 8-vCPU host (--durations of the full
    # not-slow lane): torch-reference-side compute dominates these, so the
    # XLA compile cache cannot make them fast
    "test_iteration_conditional_flow_freeze",
    "test_gan_train_step_with_lazy_reg",
    "test_video_recurrent_trainer_step",
    "test_srgan_trainer_step",
    "test_iconvsr_parity",
    "test_encoder_prefix_multilevel",
    "test_carried_chunks_stream",
    "test_realesrgan_trainer_step",
    "test_basicvsr_parity",
    "test_synthesize_shapes_and_ranges",
    "test_basicvsrpp_parity",
    "test_toflow_parity",
    "test_keep_prepare_smoke",
    "test_edvr_parity",
    "test_random_init_matches_reference_structure",
    # 10-15s
    "test_gmflow_bf16_serving_dtype",
    "test_detect_faces_value_parity",
    "test_spynet_parity",
    "test_batched_matches_per_frame",
    "test_plane_flows_equal_interleaved",
    "test_full_path_matches_reference_helper",
    "test_detector_fn_end_to_end_shapes",
    "test_local_variants_parity",
    "test_batched_full_chunks_bitwise",
}

# ambiguous bare names, matched as (file, test) instead
_SLOW_QUALIFIED = {
    ("test_facelib_golden.py", "test_forward_parity"),   # ParseNet, 21s
    ("test_flow_harness.py", "test_train_step"),         # GMFlow trainer, 16s
    ("test_training.py", "test_train_step"),             # KEEP mesh trainer, 50s
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        name = item.name.split("[")[0]
        fname = os.path.basename(str(item.fspath))
        if name in _SLOW_TESTS or (fname, name) in _SLOW_QUALIFIED:
            item.add_marker(pytest.mark.slow)
