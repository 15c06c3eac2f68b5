"""Golden parity: FaceAligner vs reference face_restoration_helper.py:486-611."""
import sys
import types

import numpy as np
import pytest

from tests import reference_oracle as oracle

torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")

pytestmark = pytest.mark.skipif(not oracle.reference_available(),
                                reason="reference repo not mounted")

HELPER = "/root/reference/modules/deps/wm_facelib/utils/face_restoration_helper.py"


@pytest.fixture(scope="module")
def ref_aligner_cls():
    # the reference module imports comfy + wm_facelib subpackages at module
    # scope; stub them (none are used by FaceAligner)
    stubs = {}
    for name in ["comfy", "comfy.model_management", "comfy.utils",
                 "wm_facelib", "wm_facelib.detection", "wm_facelib.parsing",
                 "wm_facelib.utils", "wm_facelib.utils.misc",
                 "torchvision", "torchvision.transforms",
                 "torchvision.transforms.functional"]:
        if name not in sys.modules:
            mod = types.ModuleType(name)
            sys.modules[name] = mod
            stubs[name] = mod
    sys.modules["torchvision.transforms.functional"].normalize = \
        lambda t, mean, std, inplace=False: t
    sys.modules["comfy.model_management"].get_torch_device = lambda: "cpu"
    sys.modules["comfy.utils"].tiled_scale = lambda *a, **k: None
    misc = sys.modules["wm_facelib.utils.misc"]
    for fn in ["img2tensor", "imwrite", "is_gray", "bgr2gray", "adain_npy"]:
        setattr(misc, fn, lambda *a, **k: None)
    sys.modules["wm_facelib.detection"].init_detection_model = lambda *a, **k: None
    sys.modules["wm_facelib.parsing"].init_parsing_model = lambda *a, **k: None
    mod = oracle._module_from_file("ref_frh", HELPER)
    yield mod.FaceAligner
    for name in stubs:
        sys.modules.pop(name, None)


@pytest.fixture
def landmarks(rng):
    base = np.array([[193., 240.], [319., 240.], [257., 314.],
                     [201., 371.], [313., 371.]])
    return base + rng.standard_normal((5, 2)) * 15


def test_template_math(ref_aligner_cls):
    from comfyui_keep_tpu.facelib.helper import FaceAligner
    for kw in [dict(upscale_factor=1),
               dict(upscale_factor=2, face_size=256),
               dict(upscale_factor=1, crop_ratio=(1.5, 2.0)),
               dict(upscale_factor=1, template_3points=True),
               dict(upscale_factor=1, det_model="dlib")]:
        ref = ref_aligner_cls(device="cpu", **kw)
        ours = FaceAligner(**kw)
        np.testing.assert_allclose(ours.face_template, ref.face_template)
        assert ours.face_size == ref.face_size


def test_align_single_face(ref_aligner_cls, rng, landmarks):
    from comfyui_keep_tpu.facelib.helper import FaceAligner
    img = rng.random((512, 512, 3))
    ref = ref_aligner_cls(upscale_factor=1, device="cpu")
    ours = FaceAligner(upscale_factor=1)
    a = ref.align_single_face(img.copy(), landmarks)
    b = ours.align_single_face(img.copy(), landmarks)
    np.testing.assert_allclose(a, b, atol=1e-12)


def test_align_pair_face(ref_aligner_cls, rng, landmarks):
    from comfyui_keep_tpu.facelib.helper import FaceAligner
    gt = rng.random((512, 512, 3))
    lq = cv2.resize(gt, (128, 128), interpolation=cv2.INTER_AREA)
    ref = ref_aligner_cls(upscale_factor=1, device="cpu")
    ours = FaceAligner(upscale_factor=1)
    a_lq, a_gt = ref.align_pair_face(lq.copy(), gt.copy(), landmarks)
    b_lq, b_gt = ours.align_pair_face(lq.copy(), gt.copy(), landmarks)
    np.testing.assert_allclose(a_gt, b_gt, atol=1e-12)
    np.testing.assert_allclose(a_lq, b_lq, atol=1e-12)
