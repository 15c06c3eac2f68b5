"""Golden parity: BiSeNet parser, align_trans/cp2tform, face_utils."""
import importlib.util
import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests import reference_oracle as oracle

torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")

pytestmark = pytest.mark.skipif(not oracle.reference_available(),
                                reason="reference repo not mounted")

FACELIB = "/root/reference/modules/deps/wm_facelib"


def _load(name, path):
    return oracle._module_from_file(name, path)


def _load_pkgmod(name, path, package_stubs=()):
    """Load a reference module that does package-relative imports by
    materializing stub parent packages first."""
    for pkg in package_stubs:
        if pkg not in sys.modules:
            m = types.ModuleType(pkg)
            m.__path__ = []
            sys.modules[pkg] = m
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_bisenet():
    _load_pkgmod("ref_parsing_pkg.resnet", f"{FACELIB}/parsing/resnet.py",
                 package_stubs=("ref_parsing_pkg",))
    sys.modules["ref_parsing_pkg"].resnet = sys.modules["ref_parsing_pkg.resnet"]
    # bisenet does `from .resnet import ResNet18`
    spec = importlib.util.spec_from_file_location(
        "ref_parsing_pkg.bisenet", f"{FACELIB}/parsing/bisenet.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_parsing_pkg.bisenet"] = mod
    spec.loader.exec_module(mod)
    return mod


class TestBiSeNet:
    @pytest.fixture(scope="class")
    def nets(self, ref_bisenet):
        from comfyui_keep_tpu.models.bisenet import (BiSeNet,
                                                     convert_bisenet_checkpoint)
        torch.manual_seed(0)
        net = ref_bisenet.BiSeNet(num_class=19).eval()
        sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
        tree = convert_bisenet_checkpoint(sd)
        return net, tree, BiSeNet

    def test_param_count(self, nets):
        net, tree, _ = nets
        n_ref = sum(p.numel() for p in net.parameters()) + \
            sum(b.numel() for b in net.buffers() if b.ndim > 0)
        n_ours = sum(x.size for x in jax.tree.leaves(tree))
        assert n_ours == n_ref

    def test_forward_parity(self, nets, rng):
        net, tree, BiSeNet = nets
        x = rng.standard_normal((1, 128, 128, 3), dtype=np.float32) * 0.5
        with torch.no_grad():
            ref = net(torch.tensor(x.transpose(0, 3, 1, 2)))
        ours = BiSeNet.apply(tree, jnp.asarray(x))
        for o, r in zip(ours, ref):
            np.testing.assert_allclose(np.asarray(o),
                                       r.numpy().transpose(0, 2, 3, 1),
                                       atol=3e-3, rtol=1e-2)
        np.testing.assert_array_equal(
            np.asarray(ours[0]).argmax(-1), ref[0].numpy().argmax(1))

    def test_return_feat(self, nets, rng):
        net, tree, BiSeNet = nets
        x = rng.standard_normal((1, 64, 64, 3), dtype=np.float32) * 0.5
        with torch.no_grad():
            ref = net(torch.tensor(x.transpose(0, 3, 1, 2)), return_feat=True)
        ours = BiSeNet.apply(tree, jnp.asarray(x), return_feat=True)
        assert len(ours) == len(ref) == 6
        np.testing.assert_allclose(np.asarray(ours[3]),
                                   ref[3].numpy().transpose(0, 2, 3, 1),
                                   atol=3e-3, rtol=1e-2)


class TestAlignTrans:
    @pytest.fixture(scope="class")
    def ref_mods(self):
        cp2 = _load("ref_cp2tform", f"{FACELIB}/detection/matlab_cp2tform.py")
        # align_trans does `from .matlab_cp2tform import ...`
        pkg = types.ModuleType("ref_det_pkg")
        pkg.__path__ = []
        sys.modules["ref_det_pkg"] = pkg
        sys.modules["ref_det_pkg.matlab_cp2tform"] = cp2
        spec = importlib.util.spec_from_file_location(
            "ref_det_pkg.align_trans", f"{FACELIB}/detection/align_trans.py")
        at = importlib.util.module_from_spec(spec)
        sys.modules["ref_det_pkg.align_trans"] = at
        spec.loader.exec_module(at)
        return cp2, at

    def test_similarity_transform(self, ref_mods, rng):
        from comfyui_keep_tpu.facelib import align_trans as ours
        cp2, _ = ref_mods
        for i in range(8):
            src = rng.uniform(0, 100, (5, 2))
            dst = rng.uniform(0, 100, (5, 2))
            t_ref, tinv_ref = cp2.get_similarity_transform(src.copy(), dst.copy())
            t, tinv = ours.get_similarity_transform(src.copy(), dst.copy())
            np.testing.assert_allclose(t, t_ref, atol=1e-9)
            np.testing.assert_allclose(tinv, tinv_ref, atol=1e-9)
            m_ref = cp2.get_similarity_transform_for_cv2(src.copy(), dst.copy())
            m = ours.get_similarity_transform_for_cv2(src.copy(), dst.copy())
            np.testing.assert_allclose(m, m_ref, atol=1e-9)

    def test_nonreflective(self, ref_mods, rng):
        from comfyui_keep_tpu.facelib import align_trans as ours
        cp2, _ = ref_mods
        src = rng.uniform(0, 50, (4, 2))
        dst = rng.uniform(0, 50, (4, 2))
        t_ref, tinv_ref = cp2.get_similarity_transform(src.copy(), dst.copy(),
                                                       reflective=False)
        t, tinv = ours.get_similarity_transform(src.copy(), dst.copy(),
                                                reflective=False)
        np.testing.assert_allclose(t, t_ref, atol=1e-9)
        np.testing.assert_allclose(tinv, tinv_ref, atol=1e-9)

    def test_tform_fwd_inv(self, ref_mods, rng):
        from comfyui_keep_tpu.facelib import align_trans as ours
        cp2, _ = ref_mods
        trans = np.array([[0.9, 0.1, 0], [-0.1, 0.9, 0], [3.0, -2.0, 1.0]])
        uv = rng.uniform(-10, 10, (6, 2))
        np.testing.assert_allclose(ours.tformfwd(trans, uv),
                                   cp2.tformfwd(trans, uv), atol=1e-12)
        np.testing.assert_allclose(ours.tforminv(trans, uv),
                                   cp2.tforminv(trans, uv), atol=1e-12)

    def test_reference_points(self, ref_mods):
        from comfyui_keep_tpu.facelib import align_trans as ours
        _, at = ref_mods
        for kwargs in (dict(),
                       dict(default_square=True),
                       dict(output_size=(112, 112), default_square=True),
                       dict(output_size=(224, 224), default_square=True,
                            inner_padding_factor=0.1),
                       dict(output_size=(224, 224), default_square=True,
                            inner_padding_factor=0.25, outer_padding=(8, 8))):
            ref = at.get_reference_facial_points(**kwargs)
            got = ours.get_reference_facial_points(**kwargs)
            np.testing.assert_allclose(got, ref, atol=1e-6)

    def test_affine_matrix(self, ref_mods, rng):
        from comfyui_keep_tpu.facelib import align_trans as ours
        _, at = ref_mods
        src = rng.uniform(0, 100, (5, 2)).astype(np.float32)
        dst = rng.uniform(0, 100, (5, 2)).astype(np.float32)
        np.testing.assert_allclose(
            ours.get_affine_transform_matrix(src, dst),
            at.get_affine_transform_matrix(src, dst), atol=1e-4)

    def test_warp_and_crop_face(self, ref_mods, rng):
        from comfyui_keep_tpu.facelib import align_trans as ours
        _, at = ref_mods
        img = rng.integers(0, 255, (160, 140, 3)).astype(np.uint8)
        pts = ours.REFERENCE_FACIAL_POINTS + rng.uniform(-6, 6, (5, 2))
        ref112 = ours.get_reference_facial_points(
            output_size=(112, 112), default_square=True)
        for kwargs in (dict(),
                       dict(crop_size=(112, 112), reference_pts=ref112),
                       dict(align_type="affine"),
                       dict(align_type="cv2_affine")):
            ref = at.warp_and_crop_face(img, pts.copy(), **kwargs)
            got = ours.warp_and_crop_face(img, pts.copy(), **kwargs)
            # integer warps: allow 1-lsb rounding differences on a few pixels
            diff = np.abs(got.astype(int) - ref.astype(int))
            assert (diff > 1).mean() < 2e-3
            assert diff.max() <= 30  # no structural mismatch


class TestFaceUtils:
    @pytest.fixture(scope="class")
    def ref_mod(self):
        return _load("ref_face_utils", f"{FACELIB}/utils/face_utils.py")

    def test_bboxes(self, ref_mod, rng):
        from comfyui_keep_tpu.facelib import face_utils as ours
        for _ in range(6):
            l, t = rng.uniform(0, 50, 2)
            bbox = (l, t, l + rng.uniform(10, 80), t + rng.uniform(10, 80))
            for pa in (True, False):
                assert ours.compute_increased_bbox(bbox, 0.3, pa) == \
                    ref_mod.compute_increased_bbox(bbox, 0.3, pa)
            grown = ours.compute_increased_bbox(bbox, 0.4)
            assert ours.get_valid_bboxes(grown, 120, 130) == \
                ref_mod.get_valid_bboxes(grown, 120, 130)

    @pytest.mark.parametrize("n_lm", [5, 68, 98])
    def test_align_crop_face_landmarks(self, ref_mod, rng, n_lm):
        from comfyui_keep_tpu.facelib import face_utils as ours
        img = rng.integers(0, 255, (200, 180, 3)).astype(np.uint8)
        if n_lm == 5:
            lm = np.array([[70, 80], [110, 80], [90, 100], [75, 120],
                           [105, 120]], float)
        else:
            # plausible face geometry: landmark clusters near the canonical
            # eye/mouth positions (only those index ranges feed the crop)
            lm = np.tile([90.0, 100.0], (n_lm, 1)) + rng.normal(0, 3, (n_lm, 2))
            if n_lm == 68:
                lm[36:42] = [70, 80] + rng.normal(0, 2, (6, 2))
                lm[42:48] = [110, 80] + rng.normal(0, 2, (6, 2))
                lm[48] = [75, 120]
                lm[54] = [105, 120]
            else:
                lm[60:68] = [70, 80] + rng.normal(0, 2, (8, 2))
                lm[68:76] = [110, 80] + rng.normal(0, 2, (8, 2))
                lm[76] = [75, 120]
                lm[82] = [105, 120]
        ref_face, ref_inv = ref_mod.align_crop_face_landmarks(
            img, lm, output_size=64, return_inverse_affine=True)
        got_face, got_inv = ours.align_crop_face_landmarks(
            img, lm, output_size=64, return_inverse_affine=True)
        assert got_face.shape == ref_face.shape
        np.testing.assert_allclose(got_inv, ref_inv, atol=1e-4, rtol=1e-4)
        diff = np.abs(got_face.astype(np.float64) - ref_face.astype(np.float64))
        assert np.quantile(diff, 0.999) <= 2.0

    def test_paste_face_back(self, ref_mod, rng):
        from comfyui_keep_tpu.facelib import face_utils as ours
        img = rng.integers(0, 255, (120, 110, 3)).astype(np.float32)
        face = rng.integers(0, 255, (64, 64, 3)).astype(np.float32)
        inv = np.array([[0.8, 0.05, 20.0], [-0.05, 0.8, 25.0]])
        ref = ref_mod.paste_face_back(img.copy(), face.copy(), inv)
        got = ours.paste_face_back(img.copy(), face.copy(), inv)
        np.testing.assert_allclose(got, ref, atol=1e-3)


class TestFactory:
    def test_random_weight_factories(self, rng):
        from comfyui_keep_tpu.facelib import (init_detection_model,
                                              init_parsing_model)
        det = init_detection_model("retinaface_mobile0.25",
                                   require_weights=False)
        img = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
        out = det(img, conf_threshold=0.99)
        assert out.ndim == 2 and out.shape[1] == 15
        parser = init_parsing_model("bisenet", require_weights=False)
        logits = parser(jnp.zeros((1, 64, 64, 3), jnp.float32))
        assert logits.shape == (1, 64, 64, 19)

    def test_random_weight_parsenet_fullsize(self):
        """Regression: random-init ParseNet (fixed 512 config) forward —
        init used to omit the down/up resblock shortcut convs and the
        decoder adds failed (models/parsenet.py scale arg)."""
        from comfyui_keep_tpu.facelib import init_parsing_model
        parser = init_parsing_model("parsenet", require_weights=False)
        logits = parser(jnp.zeros((1, 512, 512, 3), jnp.float32))
        assert logits.shape == (1, 512, 512, 19)

    def test_unknown_names(self):
        from comfyui_keep_tpu.facelib import (init_detection_model,
                                              init_parsing_model)
        with pytest.raises(NotImplementedError):
            init_detection_model("nope", require_weights=False)
        with pytest.raises(NotImplementedError):
            init_parsing_model("nope", require_weights=False)


def test_get_largest_face_matches_reference():
    """Clipped-area selection parity (face_restoration_helper.py:133-151)."""
    from comfyui_keep_tpu.facelib.helper import FaceRestoreHelper
    dets = [np.array([-50.0, 10.0, 100.0, 200.0, 0.9]),     # clipped left
            np.array([10.0, 10.0, 150.0, 150.0, 0.9]),
            np.array([100.0, 100.0, 500.0, 500.0, 0.9])]    # clipped r/b
    h, w = 300, 300
    # reference math inline
    clip = lambda v, l: min(max(v, 0), l)
    areas = [(clip(f[2], w) - clip(f[0], w)) * (clip(f[3], h) - clip(f[1], h))
             for f in dets]
    face, idx = FaceRestoreHelper.get_largest_face(dets, h, w)
    assert idx == int(np.argmax(areas))
    np.testing.assert_array_equal(face, dets[idx])
    assert FaceRestoreHelper.get_largest_face([], h, w) == (None, -1)
