"""User-facing API — the framework's equivalent of the reference's three
ComfyUI nodes (nodes.py:17-149) and model loader (keep_model_loader.py:18-145).

    pack = load_models(model_type="KEEP", keep_ckpt="KEEP-b76feb75.pth", ...)
    out = restore_image(pack, img_bgr, final_upscale_factor=2, ...)
    frames = restore_sequence(pack, frames_bgr, max_clip_length=20, ...)

Device lifecycle: params are host numpy after load; `pack.load_device()`
moves them to the accelerator, `pack.offload()` brings them back
(keep_model_loader.py:28-61 semantics — in JAX this is device_put/device_get).
A process-global cache mirrors the reference's keyed model cache
(keep_model_loader.py:74-86).
"""
from typing import Callable, Dict, Optional, Tuple

import numpy as np

from comfyui_keep_tpu.models.keep import KEEP, convert_checkpoint, VARIANTS
from comfyui_keep_tpu.models.gmflow import GMFlow, convert_gmflow_checkpoint
from comfyui_keep_tpu.pipeline.processor import KEEPFaceProcessor
from comfyui_keep_tpu.facelib.helper import FaceRestoreHelper

_MODEL_CACHE: Dict[Tuple, "KEEPModelPack"] = {}


class KEEPModelPack:
    def __init__(self, keep_params, keep_cfg, gmflow_params=None,
                 face_helper=None, bg_upscaler=None, face_upscaler=None,
                 model_type="KEEP"):
        self.keep_params = keep_params
        self.keep_cfg = keep_cfg
        self.gmflow_params = gmflow_params
        self.face_helper = face_helper
        self.bg_upscaler = bg_upscaler
        self.face_upscaler = face_upscaler
        self.model_type = model_type
        self._on_device = False

    def load_device(self, dtype=None):
        import jax
        import jax.numpy as jnp
        cast = (lambda a: jnp.asarray(a, dtype)) if dtype else jnp.asarray
        self.keep_params = jax.tree.map(cast, self.keep_params)
        if self.gmflow_params is not None:
            self.gmflow_params = jax.tree.map(cast, self.gmflow_params)
        self._on_device = True
        return self

    def offload(self):
        import jax
        self.keep_params = jax.tree.map(np.asarray, self.keep_params)
        if self.gmflow_params is not None:
            self.gmflow_params = jax.tree.map(np.asarray, self.gmflow_params)
        self._on_device = False
        return self

    def processor(self, dtype=None) -> KEEPFaceProcessor:
        return KEEPFaceProcessor(
            self.keep_params, self.keep_cfg, gmflow_params=self.gmflow_params,
            face_helper=self.face_helper, bg_upscaler=self.bg_upscaler,
            face_upscaler=self.face_upscaler, dtype=dtype)


def load_models(model_type: str = "KEEP",
                keep_ckpt: Optional[str] = None,
                detector: Optional[Callable] = None,
                parser: Optional[Callable] = None,
                bg_upscaler: Optional[Callable] = None,
                face_upscaler: Optional[Callable] = None,
                use_cache: bool = True,
                seed: int = 0,
                cfg_overrides: Optional[dict] = None) -> KEEPModelPack:
    """Build a model pack. With keep_ckpt: convert the reference .pth
    (flownet weights included in the single checkpoint,
    keep_model_loader.py:120 + modules/utils.py:81). Without: random init
    (testing/benchmarks)."""
    cache_key = (model_type, keep_ckpt, id(detector), bg_upscaler is not None,
                 face_upscaler is not None)
    if use_cache and cache_key in _MODEL_CACHE:
        pack = _MODEL_CACHE[cache_key]
        pack.bg_upscaler = bg_upscaler
        pack.face_upscaler = face_upscaler
        return pack

    cfg = KEEP.config(model_type, **(cfg_overrides or {}))
    if keep_ckpt is not None:
        from comfyui_keep_tpu.utils.checkpoint import read_pth
        sd = read_pth(keep_ckpt)
        keep_params, flownet_sd = convert_checkpoint(sd)
        gmflow_params = convert_gmflow_checkpoint(flownet_sd) if flownet_sd else None
    else:
        import jax
        keep_params = KEEP.init(jax.random.PRNGKey(seed), **cfg)
        gmflow_params = GMFlow.init(jax.random.PRNGKey(seed + 1))

    face_helper = None
    if detector is not None or parser is not None:
        face_helper = FaceRestoreHelper(upscale_factor=1,
                                        face_size=cfg["img_size"],
                                        detector=detector, parser=parser,
                                        use_parse=parser is not None)

    pack = KEEPModelPack(keep_params, cfg, gmflow_params, face_helper,
                         bg_upscaler, face_upscaler, model_type)
    if use_cache:
        _MODEL_CACHE[cache_key] = pack
    return pack


def restore_image(pack: KEEPModelPack, img_bgr: np.ndarray,
                  final_upscale_factor: float = 1.0, has_aligned: bool = False,
                  only_center_face: bool = False, draw_box: bool = False,
                  dtype=None) -> np.ndarray:
    """KEEP Single Image node equivalent (nodes.py:47-88)."""
    return pack.processor(dtype).process_image(
        img_bgr, final_upscale_factor, has_aligned, only_center_face, draw_box)


def restore_sequence(pack: KEEPModelPack, frames_bgr, final_upscale_factor: float = 1.0,
                     has_aligned_frames: bool = False, only_center_face: bool = False,
                     draw_box: bool = False, max_clip_length: int = 20,
                     carry_chunks: bool = False, dtype=None):
    """KEEP Image Sequence node equivalent (nodes.py:91-136).
    carry_chunks=True is the carried-state extension: the Kalman recurrence
    streams across max_clip_length chunk boundaries instead of the
    reference's per-chunk reset."""
    return pack.processor(dtype).process_image_sequence(
        frames_bgr, final_upscale_factor, has_aligned_frames,
        only_center_face, draw_box, max_clip_length,
        carry_chunks=carry_chunks)


# ComfyUI-compatible node descriptors (display parity with nodes.py:139-149)
NODE_CLASS_MAPPINGS = {
    "KEEP_ModelLoader": load_models,
    "KEEP_FaceUpscaleImage": restore_image,
    "KEEP_ProcessImageSequence": restore_sequence,
}
NODE_DISPLAY_NAME_MAPPINGS = {
    "KEEP_ModelLoader": "Load KEEP Models",
    "KEEP_FaceUpscaleImage": "KEEP Single Image",
    "KEEP_ProcessImageSequence": "KEEP Image Sequence",
}
