"""Data pipeline: datasets, online degradations, samplers, prefetch.

Host-side numpy/cv2 (data augmentation runs on CPU workers; the device feed
is double-buffered in data/prefetch.py — the TPU answer to the reference's
CUDAPrefetcher side-stream, prefetch_dataloader.py:82-140).
"""
from copy import deepcopy

from comfyui_keep_tpu.utils.registry import DATASET_REGISTRY
from comfyui_keep_tpu.data import datasets  # noqa: F401 — registers datasets


def build_dataset(opt):
    """Reference data/__init__.py:25-37."""
    opt = deepcopy(opt)
    return DATASET_REGISTRY.get(opt["type"])(opt)
