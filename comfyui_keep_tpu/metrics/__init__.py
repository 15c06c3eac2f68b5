"""Quality metrics (reference wm_basicsr/metrics): PSNR/SSIM (numpy + batched
JAX twins), NIQE, FID. Dispatch by config dict mirrors metrics/__init__.py:10-24."""
from copy import deepcopy

from comfyui_keep_tpu.utils.registry import METRIC_REGISTRY
from comfyui_keep_tpu.metrics.psnr_ssim import (
    calculate_psnr, calculate_ssim, calculate_psnr_jax, calculate_ssim_jax)
from comfyui_keep_tpu.metrics.niqe import calculate_niqe
from comfyui_keep_tpu.metrics.fid import calculate_fid


def calculate_metric(data, opt):
    """opt: dict with 'type' plus kwargs (reference metrics/__init__.py)."""
    opt = deepcopy(opt)
    metric_type = opt.pop("type")
    return METRIC_REGISTRY.get(metric_type)(**data, **opt)
