from comfyui_keep_tpu.training.losses import build_loss
from comfyui_keep_tpu.training import losses  # registers LOSS_REGISTRY entries
# Auto-register all model wrappers on package import, mirroring the
# reference's scan-and-import factory (wm_basicsr/models/__init__.py:10-29):
# anything consulting MODEL_REGISTRY sees the full zoo without needing to
# touch build_model first.
from comfyui_keep_tpu.training import trainers  # registers MODEL_REGISTRY entries
from comfyui_keep_tpu.training.trainers import build_model
