"""ComfyUI node protocol layer (reference nodes.py:17-149).

Three nodes with the same keys, display names, input schemas and semantics:
KEEP_ModelLoader / KEEP_FaceUpscaleImage / KEEP_ProcessImageSequence.
Runs inside ComfyUI when available; standalone, the node classes still work
on numpy images (ComfyUI IMAGE = B,H,W,C float32 RGB [0,1]).
"""
from typing import Optional

import numpy as np

from comfyui_keep_tpu import api
from comfyui_keep_tpu.utils.image import comfy_to_cv2, cv2_to_comfy


class KEEP_ModelLoaderNode:
    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "keep_model": (["KEEP", "Asian"], {"default": "KEEP"}),
            "detection_model": ([
                "retinaface_resnet50", "retinaface_mobile0.25",
                "YOLOv5l", "YOLOv5n"], {"default": "retinaface_resnet50"}),
        }, "optional": {
            "bg_upscale_model": ("UPSCALE_MODEL",),
            "face_upscale_model": ("UPSCALE_MODEL",),
        }}

    RETURN_TYPES = ("KEEP_MODEL_PACK",)
    FUNCTION = "load_model_pack"
    CATEGORY = "KEEP"

    def load_model_pack(self, keep_model, detection_model,
                        bg_upscale_model=None, face_upscale_model=None,
                        keep_ckpt: Optional[str] = None):
        pack = api.load_models(
            model_type=keep_model, keep_ckpt=keep_ckpt,
            bg_upscaler=bg_upscale_model, face_upscaler=face_upscale_model)
        pack.detection_model = detection_model
        return (pack,)


class KEEP_FaceUpscaleImageNode:
    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "keep_model": ("KEEP_MODEL_PACK",),
            "image": ("IMAGE",),
            "final_upscale_factor": ("FLOAT", {"default": 1.0, "min": 0.5,
                                               "max": 8.0, "step": 0.1}),
            "has_aligned_face": ("BOOLEAN", {"default": False}),
            "only_center_face": ("BOOLEAN", {"default": True}),
            "draw_box": ("BOOLEAN", {"default": False}),
        }}

    RETURN_TYPES = ("IMAGE",)
    FUNCTION = "upscale_face_image"
    CATEGORY = "KEEP"

    def upscale_face_image(self, keep_model, image, final_upscale_factor,
                           has_aligned_face, only_center_face, draw_box):
        try:
            keep_model.load_device()
            img_bgr = comfy_to_cv2(np.asarray(image))
            out = api.restore_image(
                keep_model, img_bgr, final_upscale_factor,
                has_aligned=has_aligned_face,
                only_center_face=only_center_face, draw_box=draw_box)
            return (cv2_to_comfy(out),)
        finally:
            keep_model.offload()  # nodes.py:88 lifecycle


class KEEP_ProcessImageSequenceNode:
    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "keep_model": ("KEEP_MODEL_PACK",),
            "images": ("IMAGE",),
            "final_upscale_factor": ("FLOAT", {"default": 1.0, "min": 0.5,
                                               "max": 8.0, "step": 0.1}),
            "has_aligned_frames": ("BOOLEAN", {"default": False}),
            "only_center_face": ("BOOLEAN", {"default": True}),
            "draw_box": ("BOOLEAN", {"default": False}),
            "max_clip_length": ("INT", {"default": 20, "min": 2, "max": 100}),
        }}

    RETURN_TYPES = ("IMAGE",)
    FUNCTION = "process_sequence"
    CATEGORY = "KEEP"

    def process_sequence(self, keep_model, images, final_upscale_factor,
                         has_aligned_frames, only_center_face, draw_box,
                         max_clip_length):
        try:
            keep_model.load_device()
            frames = [comfy_to_cv2(f) for f in np.asarray(images)]
            outs = api.restore_sequence(
                keep_model, frames, final_upscale_factor,
                has_aligned_frames=has_aligned_frames,
                only_center_face=only_center_face, draw_box=draw_box,
                max_clip_length=max_clip_length)
            return (np.concatenate([cv2_to_comfy(f) for f in outs], axis=0),)
        finally:
            keep_model.offload()


NODE_CLASS_MAPPINGS = {
    "KEEP_ModelLoader": KEEP_ModelLoaderNode,
    "KEEP_FaceUpscaleImage": KEEP_FaceUpscaleImageNode,
    "KEEP_ProcessImageSequence": KEEP_ProcessImageSequenceNode,
}
NODE_DISPLAY_NAME_MAPPINGS = {
    "KEEP_ModelLoader": "Load KEEP Models",
    "KEEP_FaceUpscaleImage": "KEEP Single Image",
    "KEEP_ProcessImageSequence": "KEEP Image Sequence",
}
