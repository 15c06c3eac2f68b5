"""comfyui_keep_tpu — TPU-native video face super-resolution framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
wildminder/ComfyUI-KEEP (KEEP: Kalman-inspired feature propagation for video
face super-resolution, ECCV 2024). The compute path is functional JAX compiled
with jit/pjit over NHWC arrays; hot ops are Pallas TPU kernels; scaling is
jax.sharding over a device Mesh instead of NCCL/DDP.

Layer map (mirrors reference SURVEY.md §1, redesigned TPU-first):
  api        — user-facing entry points (load_models / restore_image / restore_sequence)
  pipeline   — detect → track → align → restore → paste orchestration, batched on device
  models     — KEEP, VQGAN, GMFlow, RetinaFace, ParseNet, upscalers (arch registry)
  ops        — NHWC conv/norm/attention/resample/warp primitives + Pallas kernels
  parallel   — mesh construction, sharding rules, collectives
  training   — losses, optimizers, EMA, train loop, model wrappers
  data       — datasets, degradations, samplers
  metrics    — PSNR/SSIM/NIQE/FID
  utils      — checkpoint conversion (.pth → pytree), registry, config, logging
"""

__version__ = "0.1.0"
