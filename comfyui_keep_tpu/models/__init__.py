"""Architecture namespaces. Importing this package registers every arch in
ARCH_REGISTRY (reference behavior: wm_basicsr/archs/__init__.py:12-24 imports
all *_arch.py files)."""
from comfyui_keep_tpu.utils.registry import ARCH_REGISTRY

from comfyui_keep_tpu.models import vqgan  # noqa: F401
from comfyui_keep_tpu.models import keep  # noqa: F401
from comfyui_keep_tpu.models import gmflow  # noqa: F401
from comfyui_keep_tpu.models import sr_basic  # noqa: F401
from comfyui_keep_tpu.models import parsenet  # noqa: F401
from comfyui_keep_tpu.models import retinaface  # noqa: F401
from comfyui_keep_tpu.models import vgg  # noqa: F401
from comfyui_keep_tpu.models import spynet  # noqa: F401
from comfyui_keep_tpu.models import discriminators  # noqa: F401
from comfyui_keep_tpu.models import sr_extra  # noqa: F401
from comfyui_keep_tpu.models import video_sr  # noqa: F401
from comfyui_keep_tpu.models import stylegan2  # noqa: F401
from comfyui_keep_tpu.models import swinir  # noqa: F401
from comfyui_keep_tpu.models import misc_archs  # noqa: F401
from comfyui_keep_tpu.models import inception  # noqa: F401
from comfyui_keep_tpu.models import hifacegan  # noqa: F401
from comfyui_keep_tpu.models import dfdnet  # noqa: F401
from comfyui_keep_tpu.models import stylegan2_bilinear  # noqa: F401
from comfyui_keep_tpu.models import bisenet  # noqa: F401
from comfyui_keep_tpu.facelib import yolov5face  # noqa: F401


def build_network(name: str):
    return ARCH_REGISTRY.get(name)
