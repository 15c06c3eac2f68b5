from comfyui_keep_tpu.facelib.helper import FaceRestoreHelper
from comfyui_keep_tpu.facelib.factory import (init_detection_model,
                                              init_parsing_model)
from comfyui_keep_tpu.facelib import align_trans, face_utils  # noqa: F401
