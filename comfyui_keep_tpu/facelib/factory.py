"""Detection/parsing model factories — rebuild of reference
wm_facelib/detection/__init__.py:32-89 and parsing/__init__.py:22-51.

    detector = init_detection_model("retinaface_resnet50",
                                    model_rootpath="/models/facedetection")
    parser = init_parsing_model("parsenet", model_rootpath=...)

Both return the FaceRestoreHelper plug-in callables (detector(img_bgr_u8,
conf) -> (N, 15); parser(face_rgb_pm1) -> (1, 512, 512, 19) logits). With a
``model_rootpath`` the named .pth is loaded from there (downloading via the
sha-checked zoo util if missing and egress permits, modules/utils.py:101-153
semantics); without one, when ``require_weights=False``, a random init is
returned for shape/pipeline testing. ``module.`` prefixes are stripped and
``state_dict``-wrapped checkpoints unwrapped exactly as the reference does.
"""
import os
from typing import Callable, Optional

import numpy as np

from comfyui_keep_tpu.utils.zoo import FACELIB_MODEL_URLS, load_file_from_url

# cli-name -> checkpoint filename (detection/__init__.py:25-30)
MODEL_NAMES = {
    "retinaface_resnet50": "detection_Resnet50_Final.pth",
    "retinaface_mobile0.25": "detection_mobilenet0.25_Final.pth",
    "YOLOv5n": "yolov5n-face.pth",
    "YOLOv5l": "yolov5l-face.pth",
    "parsenet": "parsing_parsenet.pth",
    "bisenet": "parsing_bisenet.pth",
}


def _resolve_ckpt(model_name: str, model_rootpath: Optional[str]) -> Optional[str]:
    if model_name not in MODEL_NAMES:
        raise NotImplementedError(f"{model_name} is not implemented.")
    fname = MODEL_NAMES[model_name]
    if model_rootpath is not None:
        path = os.path.join(model_rootpath, fname)
        if os.path.exists(path):
            return path
        if fname in FACELIB_MODEL_URLS:
            return load_file_from_url(FACELIB_MODEL_URLS[fname],
                                      model_rootpath, file_name=fname)
        raise FileNotFoundError(path)
    return None


def _load_sd(path: str):
    """torch.load + state_dict unwrap + module.-prefix strip
    (detection/__init__.py:74-89)."""
    from comfyui_keep_tpu.utils.checkpoint import read_pth
    sd = read_pth(path, prefer=("state_dict",))
    return sd  # read_pth already strips 'module.'


def init_detection_model(model_name: str, half: bool = False,
                         model_rootpath: Optional[str] = None,
                         require_weights: bool = True,
                         seed: int = 0) -> Callable:
    """Build a face detector by name (detection/__init__.py:32-89).

    ``half`` casts params to bfloat16 (the TPU half type) rather than fp16.
    """
    import jax
    import jax.numpy as jnp
    from comfyui_keep_tpu.utils.checkpoint import convert_state_dict

    ckpt = _resolve_ckpt(model_name, model_rootpath)
    if ckpt is None and require_weights:
        raise ValueError(
            f"init_detection_model({model_name!r}): no model_rootpath given; "
            "pass require_weights=False for a random-weight detector")

    if model_name in ("retinaface_resnet50", "retinaface_mobile0.25"):
        from comfyui_keep_tpu.models.retinaface import RetinaFace, make_detector_fn
        network = "resnet50" if model_name.endswith("resnet50") else "mobile0.25"
        if ckpt is not None:
            params = convert_state_dict(_load_sd(ckpt))
        else:
            params = RetinaFace.init(jax.random.PRNGKey(seed), network=network)
        if half:
            params = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), params)
        return make_detector_fn(params, network=network)

    if model_name in ("YOLOv5l", "YOLOv5n"):
        from comfyui_keep_tpu.facelib.yolov5face import YoloFace, make_yolo_detector_fn
        config = "yolov5l" if model_name == "YOLOv5l" else "yolov5n"
        if ckpt is not None:
            params = convert_state_dict(_load_sd(ckpt))
        else:
            params = YoloFace.init(jax.random.PRNGKey(seed), config=config)
        if half:
            params = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), params)
        return make_yolo_detector_fn(params, config=config)

    raise NotImplementedError(f"{model_name} is not implemented.")


def init_parsing_model(model_name: str = "parsenet", half: bool = False,
                       model_rootpath: Optional[str] = None,
                       require_weights: bool = True,
                       seed: int = 0) -> Callable:
    """Build a face parser by name (parsing/__init__.py:22-51; this framework
    additionally wires the vendored BiSeNet, parsing/bisenet.py)."""
    import jax
    import jax.numpy as jnp

    ckpt = _resolve_ckpt(model_name, model_rootpath)
    if ckpt is None and require_weights:
        raise ValueError(
            f"init_parsing_model({model_name!r}): no model_rootpath given; "
            "pass require_weights=False for a random-weight parser")

    if model_name == "parsenet":
        from comfyui_keep_tpu.models.parsenet import (ParseNet,
                                                      convert_parsenet_checkpoint,
                                                      make_parser_fn)
        if ckpt is not None:
            params = convert_parsenet_checkpoint(_load_sd(ckpt))
        else:
            params = ParseNet.init(jax.random.PRNGKey(seed))
        if half:
            params = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), params)
        return make_parser_fn(params)

    if model_name == "bisenet":
        from comfyui_keep_tpu.models.bisenet import (BiSeNet,
                                                     convert_bisenet_checkpoint,
                                                     make_parser_fn)
        if ckpt is not None:
            params = convert_bisenet_checkpoint(_load_sd(ckpt))
        else:
            params = BiSeNet.init(jax.random.PRNGKey(seed))
        if half:
            params = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), params)
        return make_parser_fn(params)

    raise NotImplementedError(f"{model_name} is not implemented.")
