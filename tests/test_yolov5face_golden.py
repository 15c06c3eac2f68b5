"""Golden parity: YOLOv5-face model vs the reference torch implementation."""
import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests import reference_oracle as oracle

pytestmark = pytest.mark.skipif(not oracle.reference_available(),
                                reason="reference repo not mounted")

FACELIB = "/root/reference/modules/deps/wm_facelib"


@pytest.fixture(scope="module")
def ref_yolo():
    # stub package shells so yolov5face submodules import without executing
    # wm_facelib/__init__ (which pulls in comfy)
    oracle._install_stubs_arch_util()  # torchvision stub for utils/general
    for name, path in (("wm_facelib", FACELIB),
                       ("wm_facelib.detection", f"{FACELIB}/detection")):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__path__ = [path]
            sys.modules[name] = mod
    import importlib
    return importlib.import_module(
        "wm_facelib.detection.yolov5face.models.yolo")


@pytest.mark.parametrize("config", ["yolov5n", "yolov5l"])
def test_yolo_forward_parity(ref_yolo, rng, config):
    from comfyui_keep_tpu.facelib.yolov5face import YoloFace
    from comfyui_keep_tpu.utils.checkpoint import convert_state_dict
    torch.manual_seed(0)
    net = ref_yolo.Model(
        cfg=f"{FACELIB}/detection/yolov5face/models/{config}.yaml").eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()
          if "anchor" not in k}
    tree = convert_state_dict(sd)
    params = {"model": tree["model"]}
    x = rng.random((1, 64, 64, 3), dtype=np.float32)
    with torch.no_grad():
        ref_pred, _ = net(torch.tensor(x.transpose(0, 3, 1, 2)))
    ours = YoloFace.apply(params, jnp.asarray(x), config=config)
    np.testing.assert_allclose(np.asarray(ours), ref_pred.numpy(),
                               atol=2e-3, rtol=1e-2)


def test_yolo_detector_fn_interface(rng):
    from comfyui_keep_tpu.facelib.yolov5face import (YoloFace,
                                                     make_yolo_detector_fn)
    params = YoloFace.init(jax.random.PRNGKey(0), config="yolov5n")
    det = make_yolo_detector_fn(params, config="yolov5n", target_size=64,
                                jit=False)
    img = (rng.random((48, 72, 3)) * 255).astype(np.uint8)
    out = det(img, conf_threshold=0.0)
    assert out.ndim == 2 and out.shape[1] == 15
