from comfyui_keep_tpu.training.losses import build_loss
from comfyui_keep_tpu.training import losses  # registers LOSS_REGISTRY entries
