"""End-to-end tests for BASELINE configs 2, 4 and 5 — each full path runs as
ONE pipeline with value-level assertions against the reference helper
executed under torch (VERDICT round-1 item 2).

  config 2: unaligned single image — detect -> align -> restore ->
            ParseNet-soft-mask paste-back (keep_processor.py:134-194,
            face_restoration_helper.py:346-475).
  config 4: multiface 3-frame clip — per-frame detect, Hungarian tracking,
            interleaved batched restore, per-frame paste
            (keep_processor.py:196-307).
  config 5: bg + face upscalers + final_upscale_factor compositing
            (keep_processor.py:126-132, 279-304).
"""
import sys
import types

import numpy as np
import pytest

from tests import reference_oracle as oracle

torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")

pytestmark = pytest.mark.skipif(not oracle.reference_available(),
                                reason="reference repo not mounted")

from comfyui_keep_tpu import api
from comfyui_keep_tpu.facelib.helper import FaceRestoreHelper, FFHQ_TEMPLATE_512

HELPER_PATH = "/root/reference/modules/deps/wm_facelib/utils/face_restoration_helper.py"
MISC_PATH = "/root/reference/modules/deps/wm_facelib/utils/misc.py"
KEEP_PROC_PATH = "/root/reference/modules/keep_processor.py"

TINY = dict(img_size=64, nf=32, ch_mult=(1, 2, 2), res_blocks=2,
            attn_resolutions=(16,), codebook_size=64, emb_dim=32, dim_embd=64,
            n_head=8, n_layers=2, latent_size=256, cft_list=("32", "64"),
            cfa_list=("16",), cfa_nhead=2, cfa_dim=16, kalman_attn_head_dim=8,
            num_uncertainty_layers=1, temp_reg_list=())

FACE = 64  # helper face_size matching TINY img_size


# ---------------------------------------------------------------------------
# synthetic detector / parser
# ---------------------------------------------------------------------------

def face_landmarks_at(scale: float, angle_deg: float, cx: float, cy: float):
    """5-point landmarks for a synthetic face: the FFHQ template under a
    similarity transform placed at (cx, cy)."""
    t = FFHQ_TEMPLATE_512 - FFHQ_TEMPLATE_512.mean(0)
    th = np.deg2rad(angle_deg)
    rot = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    return (t @ rot.T) * scale + np.array([cx, cy])


def detection_row(landmarks, score=0.999):
    lm = np.asarray(landmarks, np.float32)
    x1, y1 = lm.min(0) - 10
    x2, y2 = lm.max(0) + 10
    return np.concatenate([[x1, y1, x2, y2, score], lm.reshape(-1)]).astype(np.float32)


def make_stub_detector(rows_per_call):
    """Detector stub: returns the next (N, 15) array per call (the sequence
    pipeline calls it exactly once per frame, in order)."""
    calls = list(rows_per_call)

    def detector(img_bgr, conf_threshold):
        return np.asarray(calls.pop(0), np.float32).reshape(-1, 15)

    return detector


def synth_parse_logits(h=512, w=512):
    """Deterministic 19-class logits: class 1 (skin) inside an ellipse,
    class 0 outside — exercises the MASK_COLORMAP -> double-blur -> border
    zeroing chain with a nontrivial mask."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    inside = (((xx - w / 2) / (w * 0.33)) ** 2 +
              ((yy - h / 2) / (h * 0.38)) ** 2) < 1.0
    logits = np.zeros((1, h, w, 19), np.float32)
    logits[0, :, :, 0] = 5.0
    logits[0, inside, 1] = 10.0
    return logits


def stub_parser(x):
    # signature: (1, 512, 512, 3) rgb [-1,1] -> (1, 512, 512, 19)
    return synth_parse_logits()


class TorchParseStub(torch.nn.Module):
    def forward(self, x):
        logits = synth_parse_logits()[0].transpose(2, 0, 1)[None]
        return torch.tensor(logits), None


# ---------------------------------------------------------------------------
# reference-helper oracle
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ref_helper_mod():
    stubs = {}
    for name in ["comfy", "comfy.model_management", "comfy.utils",
                 "wm_facelib", "wm_facelib.detection", "wm_facelib.parsing",
                 "wm_facelib.utils",
                 "torchvision", "torchvision.transforms",
                 "torchvision.transforms.functional"]:
        if name not in sys.modules:
            mod = types.ModuleType(name)
            sys.modules[name] = mod
            stubs[name] = mod

    def _tv_normalize(t, mean, std, inplace=False):
        mean = torch.tensor(mean).view(-1, 1, 1)
        std = torch.tensor(std).view(-1, 1, 1)
        if inplace:
            t.sub_(mean).div_(std)
            return t
        return (t - mean) / std

    sys.modules["torchvision.transforms.functional"].normalize = _tv_normalize
    sys.modules["comfy.model_management"].get_torch_device = lambda: "cpu"
    sys.modules["comfy.utils"].tiled_scale = lambda *a, **k: None
    sys.modules["comfy.utils"].ProgressBar = lambda *a, **k: types.SimpleNamespace(update=lambda *a: None)
    # real misc functions (img2tensor/is_gray/bgr2gray/adain_npy), torch-only
    misc = oracle._module_from_file("ref_facelib_misc", MISC_PATH)
    sys.modules["wm_facelib.utils.misc"] = misc
    sys.modules["wm_facelib.detection"].init_detection_model = lambda *a, **k: None
    sys.modules["wm_facelib.parsing"].init_parsing_model = lambda *a, **k: TorchParseStub()
    mod = oracle._module_from_file("ref_frh_e2e", HELPER_PATH)
    yield mod
    for name in stubs:
        sys.modules.pop(name, None)
    sys.modules.pop("wm_facelib.utils.misc", None)


@pytest.fixture(scope="module")
def ref_keep_processor():
    """Load reference keep_processor.py (track_faces/interpolate_sequence)
    with its package-relative import stubbed."""
    pkg = types.ModuleType("ref_keepmod")
    pkg.__path__ = []
    utils = types.ModuleType("ref_keepmod.utils")
    utils.comfy_image_to_cv2 = lambda t: t
    utils.cv2_to_comfy_image = lambda a: a
    stubs = {"ref_keepmod": pkg, "ref_keepmod.utils": utils}
    for name in ["comfy", "comfy.utils", "torchvision",
                 "torchvision.transforms", "torchvision.transforms.functional"]:
        if name not in sys.modules:
            mod = types.ModuleType(name)
            sys.modules[name] = mod
            stubs[name] = mod
    if not hasattr(sys.modules["comfy.utils"], "ProgressBar"):
        sys.modules["comfy.utils"].ProgressBar = \
            lambda *a, **k: types.SimpleNamespace(update=lambda *a: None)
        sys.modules["comfy.utils"].tiled_scale = lambda *a, **k: None
    if not hasattr(sys.modules["torchvision.transforms.functional"], "normalize"):
        sys.modules["torchvision.transforms.functional"].normalize = \
            lambda t, m, s, inplace=False: t
    sys.modules.update({k: v for k, v in stubs.items() if k.startswith("ref_keepmod")})
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_keepmod.keep_processor", KEEP_PROC_PATH)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_keepmod.keep_processor"] = mod
    spec.loader.exec_module(mod)
    yield mod
    for name in stubs:
        sys.modules.pop(name, None)
    sys.modules.pop("ref_keepmod.keep_processor", None)


@pytest.fixture(scope="module")
def pack():
    p = api.load_models("KEEP", use_cache=False, cfg_overrides=TINY)
    p.gmflow_params = None  # zero flows; GMFlow has its own golden tests
    return p


def _make_image(rng, h=600, w=600):
    return (rng.random((h, w, 3)) * 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# config 2 — unaligned single image, parse-mask paste-back
# ---------------------------------------------------------------------------

class TestConfig2Unaligned:
    def test_full_path_matches_reference_helper(self, pack, ref_helper_mod, rng):
        img = _make_image(rng)
        lm = face_landmarks_at(scale=0.9, angle_deg=8.0, cx=310.0, cy=280.0)
        det = make_stub_detector([detection_row(lm)[None]])

        helper = FaceRestoreHelper(face_size=FACE, detector=det,
                                   parser=stub_parser, use_parse=True)
        pack.face_helper = helper
        proc = pack.processor()
        ours = proc.process_image(img, final_upscale_factor=1.0,
                                  has_aligned=False)

        # reference side: same landmarks through the torch helper
        ref = ref_helper_mod.FaceRestoreHelper(
            upscale_factor=1, face_size=FACE, use_parse=True, device="cpu",
            model_rootpath="/tmp")
        ref.read_image(img)
        ref.all_landmarks_5 = [lm]
        ref.align_warp_face()
        # alignment parity: identical affine + crop
        assert len(ref.cropped_faces) == 1
        np.testing.assert_allclose(helper.affine_matrices[0],
                                   ref.affine_matrices[0], atol=1e-8)
        np.testing.assert_array_equal(helper.cropped_faces[0],
                                      ref.cropped_faces[0])

        # restore the reference's crop through OUR net (bitwise same input
        # -> same restored face), then reference paste-back
        restored = proc.restore_face_stream(list(ref.cropped_faces),
                                            max_clip_length=2)
        ref.restored_faces = [f.astype(np.uint8) for f in restored]
        ref.get_inverse_affine()
        ref_out = ref.paste_faces_to_input_image()

        assert ours.shape == ref_out.shape == img.shape
        # uint8 rounding: ours blends in float32, reference in float64
        diff = np.abs(ours.astype(np.int16) - ref_out.astype(np.int16))
        assert diff.max() <= 1, f"max pixel delta {diff.max()}"
        # the paste really modified the face region
        changed = (ours != img).any(axis=-1).mean()
        assert changed > 0.005

    def test_eye_dist_filter_and_center_face(self, pack, rng):
        """Two detections: one with degenerate eye distance is filtered; of
        the remaining, only_center_face keeps the more central one
        (face_restoration_helper.py:205-255)."""
        img = _make_image(rng)
        lm_center = face_landmarks_at(0.8, 0.0, 300.0, 300.0)
        lm_corner = face_landmarks_at(0.8, 0.0, 80.0, 80.0)
        tiny = face_landmarks_at(0.01, 0.0, 500.0, 500.0)  # eye dist < 5
        rows = np.stack([detection_row(lm_corner), detection_row(lm_center),
                         detection_row(tiny)])
        det = make_stub_detector([rows])
        helper = FaceRestoreHelper(face_size=FACE, detector=det,
                                   parser=None, use_parse=False)
        helper.read_image(img)
        n = helper.get_face_landmarks_5(only_center_face=True, resize=640,
                                        eye_dist_threshold=5)
        assert n == 1
        np.testing.assert_allclose(helper.all_landmarks_5[0], lm_center)

    def test_pad_blur_matches_reference(self, ref_helper_mod, rng):
        """pad_blur branch golden: the reflect-pad + edge-blur + median-fade
        source image and the (offset-quirk-faithful) crop match the torch
        reference bit-for-bit (face_restoration_helper.py:259-324)."""
        img = _make_image(rng, 200, 220)
        # face near the border so the pad actually triggers (max(pad) > 1)
        lm = face_landmarks_at(0.35, 10.0, 40.0, 50.0)

        ours = FaceRestoreHelper(face_size=FACE, detector=None, parser=None,
                                 use_parse=False, pad_blur=True)
        ours.read_image(img)
        ours.all_landmarks_5 = [lm]
        ours.align_warp_face()

        ref = ref_helper_mod.FaceRestoreHelper(
            upscale_factor=1, face_size=FACE, pad_blur=True, device="cpu",
            model_rootpath="/tmp")
        ref.read_image(img)
        ref.all_landmarks_5 = [lm]
        ref.align_warp_face()

        assert len(ours.pad_input_imgs) == len(ref.pad_input_imgs) == 1
        assert ours.pad_input_imgs[0].shape == ref.pad_input_imgs[0].shape
        assert ours.pad_input_imgs[0].shape != img.shape  # pad happened
        np.testing.assert_array_equal(ours.pad_input_imgs[0],
                                      ref.pad_input_imgs[0])
        np.testing.assert_array_equal(ours.cropped_faces[0],
                                      ref.cropped_faces[0])


# ---------------------------------------------------------------------------
# config 4 — multiface tracked sequence
# ---------------------------------------------------------------------------

class TestConfig4Multiface:
    def _two_face_clip(self, rng, n_frames=3):
        frames = [_make_image(rng) for _ in range(n_frames)]
        lms_a = [face_landmarks_at(0.8, 0.0, 180.0 + 6 * i, 200.0)
                 for i in range(n_frames)]
        lms_b = [face_landmarks_at(0.7, -5.0, 430.0, 380.0 + 5 * i)
                 for i in range(n_frames)]
        rows = [np.stack([detection_row(a), detection_row(b)])
                for a, b in zip(lms_a, lms_b)]
        return frames, lms_a, lms_b, rows

    def test_tracking_matches_reference(self, ref_keep_processor, rng):
        """Our track_faces + interp + smoothing == the reference's on the
        same raw per-frame landmark lists (keep_processor.py:42-115,
        216-231), including a dropout frame."""
        from comfyui_keep_tpu.pipeline import tracking
        _, lms_a, lms_b, _ = self._two_face_clip(rng, n_frames=5)
        raw = []
        for i in range(5):
            if i == 2:
                raw.append([lms_a[i]])  # face B missed on frame 2
            else:
                raw.append([lms_a[i], lms_b[i]])

        ours = tracking.track_faces(raw)
        ref = ref_keep_processor.track_faces(raw)
        assert set(ours.keys()) == set(ref.keys())
        for k in ref:
            assert len(ours[k]) == len(ref[k])
            for o, r in zip(ours[k], ref[k]):
                np.testing.assert_allclose(o, r, equal_nan=True)

        # interpolation parity on the NaN-padded track
        from scipy.ndimage import gaussian_filter1d
        ours_sm = tracking.smooth_landmark_tracks(ours, 5, sigma=2.0)
        for k, track in ref.items():
            arr = np.array([np.asarray(lm).reshape(10) for lm in track])
            for j in range(10):
                arr[:, j] = ref_keep_processor.interpolate_sequence(arr[:, j])
            arr = gaussian_filter1d(arr, sigma=2, axis=0)
            np.testing.assert_allclose(ours_sm[k].reshape(5, 10), arr,
                                       atol=1e-10)

    def test_full_sequence_interleaved_restore(self, pack, rng):
        """Full config-4 run: the flattened face stream must interleave
        tracks per frame ([f0t0, f0t1, f1t0, f1t1, ...],
        keep_processor.py:237-254) and each paste must land at that frame's
        affine."""
        frames, lms_a, lms_b, rows = self._two_face_clip(rng)
        det = make_stub_detector(rows)
        helper = FaceRestoreHelper(face_size=FACE, detector=det,
                                   parser=stub_parser, use_parse=True)
        pack.face_helper = helper
        proc = pack.processor()

        seen_streams = []
        orig = proc.restore_face_stream

        def spy(faces, max_clip_length=20, **kw):
            seen_streams.append([f.copy() for f in faces])
            return orig(faces, max_clip_length, **kw)

        proc.restore_face_stream = spy
        outs = proc.process_image_sequence(frames, final_upscale_factor=1.0,
                                           only_center_face=False,
                                           max_clip_length=4)
        assert len(outs) == 3
        assert all(o.shape == frames[0].shape for o in outs)
        # 2 faces x 3 frames, interleaved per frame
        assert len(seen_streams) == 1 and len(seen_streams[0]) == 6

        # reconstruct the expected stream: per frame, per track (track order);
        # landmarks must take the same float32 detection-row round trip the
        # pipeline's detector output takes (then *scale_back promotes to f64)
        from comfyui_keep_tpu.pipeline import tracking
        as_det = lambda lm: (detection_row(lm)[5:].reshape(5, 2)
                             .astype(np.float64))
        raw = [[as_det(lms_a[i]), as_det(lms_b[i])] for i in range(3)]
        tracks = tracking.track_faces(raw)
        sm = tracking.smooth_landmark_tracks(tracks, 3, sigma=2.0)
        expect = []
        h2 = FaceRestoreHelper(face_size=FACE, detector=None, parser=None,
                               use_parse=False)
        for i in range(3):
            h2.clean_all()
            h2.read_image(frames[i])
            h2.all_landmarks_5 = [sm[k][i] for k in sorted(sm)]
            h2.align_warp_face()
            expect.extend(h2.cropped_faces)
        assert len(expect) == 6
        for got, exp in zip(seen_streams[0], expect):
            np.testing.assert_array_equal(got, exp)

        # every frame's two faces actually pasted (pixels changed near both)
        for i, out in enumerate(outs):
            changed = (out != frames[i]).any(axis=-1)
            ca = changed[150:250, 130:230].mean()   # around face A
            cb = changed[330:430, 380:480].mean()   # around face B
            assert ca > 0.05 and cb > 0.05, (i, ca, cb)

    def test_dropout_frame_pastes_single_face(self, pack, rng):
        """A frame where one track is missing gets its landmarks interpolated
        (so both faces still restore) — parity with interpolate_sequence
        (keep_processor.py:216-231)."""
        frames, lms_a, lms_b, _ = self._two_face_clip(rng)
        rows = [np.stack([detection_row(lms_a[0]), detection_row(lms_b[0])]),
                detection_row(lms_a[1])[None],   # face B missed
                np.stack([detection_row(lms_a[2]), detection_row(lms_b[2])])]
        det = make_stub_detector(rows)
        helper = FaceRestoreHelper(face_size=FACE, detector=det,
                                   parser=None, use_parse=False)
        pack.face_helper = helper
        proc = pack.processor()
        outs = proc.process_image_sequence(frames, final_upscale_factor=1.0,
                                           only_center_face=False,
                                           max_clip_length=6)
        # face B region on the middle frame is still modified (interpolated lm)
        changed = (outs[1] != frames[1]).any(axis=-1)
        assert changed[330:430, 380:480].mean() > 0.05

    def test_aligned_sequence_returns_background_only(self, pack, rng):
        """Reference quirk reproduced exactly: with has_aligned_frames the
        stage-4 loop appends ONLY the upscaled background and skips the
        paste (keep_processor.py:289-291 'aligned case could be handled
        better') — with no bg upscaler and factor 1.0 the output frames
        equal the inputs bit-for-bit even though the faces were restored."""
        frames = [_make_image(rng, 96, 96) for _ in range(3)]
        pack.face_helper = FaceRestoreHelper(face_size=FACE, detector=None,
                                             parser=None, use_parse=False)
        proc = pack.processor()
        outs = proc.process_image_sequence(frames, final_upscale_factor=1.0,
                                           has_aligned_frames=True,
                                           max_clip_length=4)
        assert len(outs) == 3
        for o, f in zip(outs, frames):
            np.testing.assert_array_equal(o, f)


# ---------------------------------------------------------------------------
# config 5 — bg + face upscalers + final_upscale_factor compositing
# ---------------------------------------------------------------------------

def _nearest2x_upscaler(img_bgr_u8):
    return img_bgr_u8.repeat(2, axis=0).repeat(2, axis=1)


def _blur_face_upscaler(img_bgr_u8):
    up = img_bgr_u8.repeat(2, axis=0).repeat(2, axis=1)
    return cv2.blur(up, (3, 3))


class TestConfig5Upscalers:
    def test_compositing_matches_reference_helper(self, pack, ref_helper_mod,
                                                  rng):
        img = _make_image(rng)
        lm = face_landmarks_at(0.9, -4.0, 320.0, 300.0)
        det = make_stub_detector([detection_row(lm)[None]])
        helper = FaceRestoreHelper(face_size=FACE, detector=det,
                                   parser=stub_parser, use_parse=True)
        pack.face_helper = helper
        pack.bg_upscaler = _nearest2x_upscaler
        pack.face_upscaler = _blur_face_upscaler
        try:
            proc = pack.processor()
            ours = proc.process_image(img, final_upscale_factor=2.0,
                                      has_aligned=False)
            assert ours.shape == (1200, 1200, 3)

            # reference: same restored face + same upscalers through the
            # torch helper (its _run_upscaler is the comfy tiled path —
            # substitute the same plain callable)
            ref = ref_helper_mod.FaceRestoreHelper(
                upscale_factor=2, face_size=FACE, use_parse=True,
                device="cpu", model_rootpath="/tmp")
            ref._run_upscaler = lambda model, im: _blur_face_upscaler(im)
            ref.read_image(img)
            ref.all_landmarks_5 = [lm]
            ref.align_warp_face()
            np.testing.assert_array_equal(helper.cropped_faces[0],
                                          ref.cropped_faces[0])
            restored = proc.restore_face_stream(list(ref.cropped_faces),
                                                max_clip_length=2)
            ref.restored_faces = [f.astype(np.uint8) for f in restored]
            ref.get_inverse_affine()
            bg = _nearest2x_upscaler(img)
            ref_out = ref.paste_faces_to_input_image(
                upsample_img=bg, face_upsampler=object())
            diff = np.abs(ours.astype(np.int16) - ref_out.astype(np.int16))
            assert diff.max() <= 1, f"max pixel delta {diff.max()}"

            # far corner is pure upscaled background
            np.testing.assert_array_equal(ours[:100, :100], bg[:100, :100])
        finally:
            pack.bg_upscaler = None
            pack.face_upscaler = None

    def test_sequence_with_upscalers(self, pack, rng):
        """Config 5 over a 2-frame clip: every output frame is
        final_upscale_factor-sized with faces composited."""
        frames = [_make_image(rng, 520, 640) for _ in range(2)]
        lms = [face_landmarks_at(0.6, 0.0, 320.0 + 4 * i, 260.0)
               for i in range(2)]
        det = make_stub_detector([detection_row(l)[None] for l in lms])
        helper = FaceRestoreHelper(face_size=FACE, detector=det,
                                   parser=stub_parser, use_parse=True)
        pack.face_helper = helper
        pack.bg_upscaler = _nearest2x_upscaler
        pack.face_upscaler = _blur_face_upscaler
        try:
            proc = pack.processor()
            outs = proc.process_image_sequence(frames,
                                               final_upscale_factor=2.0,
                                               only_center_face=True,
                                               max_clip_length=4)
            assert len(outs) == 2
            assert all(o.shape == (1040, 1280, 3) for o in outs)
            for i, o in enumerate(outs):
                bg = _nearest2x_upscaler(frames[i])
                np.testing.assert_array_equal(o[:40, :40], bg[:40, :40])
                assert (o != bg).any()
        finally:
            pack.bg_upscaler = None
            pack.face_upscaler = None

    def test_sub512_frames_paste_at_stage2_geometry(self, pack, rng):
        """Sub-512 frames: stage 2 aligns against the min-side-512-upscaled
        frame (read_image, face_restoration_helper.py:172-184), so stage 4's
        paste canvas must use that geometry too — 300x400 @ x2 -> 1024x1366,
        with the face landing where the upscaled-frame affine puts it."""
        frames = [_make_image(rng, 300, 400)]
        # landmarks in the UPSCALED (512x683) frame space, since detection
        # runs on read_image's output
        lm = face_landmarks_at(0.5, 0.0, 340.0, 260.0)
        det = make_stub_detector([detection_row(lm)[None]])
        helper = FaceRestoreHelper(face_size=FACE, detector=det,
                                   parser=None, use_parse=False)
        pack.face_helper = helper
        proc = pack.processor()
        outs = proc.process_image_sequence(frames, final_upscale_factor=2.0,
                                           only_center_face=True,
                                           max_clip_length=4)
        assert outs[0].shape == (1024, 1366, 3)
        changed = (outs[0] != cv2.resize(
            frames[0], (1366, 1024),
            interpolation=cv2.INTER_LANCZOS4)).any(axis=-1)
        # face was pasted around (680, 520) in output coords (lm * 2)
        assert changed[420:620, 580:780].mean() > 0.05
