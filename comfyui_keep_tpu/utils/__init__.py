from comfyui_keep_tpu.utils.registry import (
    Registry, ARCH_REGISTRY, MODEL_REGISTRY, DATASET_REGISTRY, LOSS_REGISTRY,
    METRIC_REGISTRY,
)
