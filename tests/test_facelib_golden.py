"""Golden parity for the face toolkit nets (ParseNet, RetinaFace components)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests import reference_oracle as oracle

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(not oracle.reference_available(),
                                reason="reference repo not mounted")

FACELIB = "/root/reference/modules/deps/wm_facelib"


def _load(name, path):
    return oracle._module_from_file(name, path)


class TestParseNet:
    @pytest.fixture(scope="class")
    def nets(self):
        from comfyui_keep_tpu.models.parsenet import (ParseNet,
                                                      convert_parsenet_checkpoint)
        ref_mod = _load("ref_parsenet", f"{FACELIB}/parsing/parsenet.py")
        torch.manual_seed(0)
        # full-size config (init_parsing_model: in_size=512, out_size=512)
        net = ref_mod.ParseNet(in_size=512, out_size=512).eval()
        sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
        tree = convert_parsenet_checkpoint(sd)
        return net, tree, ParseNet

    def test_param_count(self, nets):
        net, tree, _ = nets
        n_ref = sum(p.numel() for p in net.parameters()) + \
            sum(b.numel() for b in net.buffers() if b.ndim > 0)
        n_ours = sum(x.size for x in jax.tree.leaves(tree))
        assert n_ours == n_ref

    def test_forward_parity(self, nets, rng):
        net, tree, ParseNet = nets
        x = rng.standard_normal((1, 512, 512, 3), dtype=np.float32) * 0.5
        with torch.no_grad():
            ref_mask, ref_img = net(torch.tensor(x.transpose(0, 3, 1, 2)))
        mask, img = ParseNet.apply(tree, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(mask),
                                   ref_mask.numpy().transpose(0, 2, 3, 1),
                                   atol=2e-3, rtol=1e-2)
        # argmax classes identical (what the paste mask uses)
        np.testing.assert_array_equal(np.asarray(mask).argmax(-1),
                                      ref_mask.numpy().argmax(1))

    def test_random_init_matches_reference_structure(self, nets):
        """ParseNet.init must build the same tree as the converted torch
        state dict (regression: down/up resblocks always carry a shortcut
        conv even when cin == cout — random-init forward used to fail)."""
        _, tree, ParseNet = nets
        ours = ParseNet.init(jax.random.PRNGKey(0))
        ref_paths = {jax.tree_util.keystr(k)
                     for k, _ in jax.tree_util.tree_leaves_with_path(tree)}
        our_paths = {jax.tree_util.keystr(k)
                     for k, _ in jax.tree_util.tree_leaves_with_path(ours)}
        assert our_paths == ref_paths
        mask, img = ParseNet.apply(ours, jnp.zeros((1, 512, 512, 3)))
        assert mask.shape == (1, 512, 512, 19) and img.shape == (1, 512, 512, 3)


class TestRetinaFaceComponents:
    @pytest.fixture(scope="class")
    def ref_net_mod(self):
        return _load("ref_retinaface_net", f"{FACELIB}/detection/retinaface/retinaface_net.py")

    @pytest.fixture(scope="class")
    def ref_utils_mod(self):
        oracle._install_stubs_arch_util()  # provides torchvision stub
        return _load("ref_retinaface_utils", f"{FACELIB}/detection/retinaface/retinaface_utils.py")

    def test_mobilenet_parity(self, ref_net_mod, rng):
        from comfyui_keep_tpu.models.retinaface import (mobilenet_init,
                                                        mobilenet_features)
        from comfyui_keep_tpu.utils.checkpoint import convert_state_dict
        torch.manual_seed(0)
        net = ref_net_mod.MobileNetV1().eval()
        sd = {k: v.detach().numpy() for k, v in net.state_dict().items()
              if not k.startswith("fc.")}
        tree = convert_state_dict(sd)
        x = rng.standard_normal((1, 64, 64, 3), dtype=np.float32)
        xt = torch.tensor(x.transpose(0, 3, 1, 2))
        with torch.no_grad():
            f1 = net.stage1(xt)
            f2 = net.stage2(f1)
            f3 = net.stage3(f2)
        ours = mobilenet_features({k: tree[k] for k in ("stage1", "stage2", "stage3")},
                                  jnp.asarray(x))
        for o, r in zip(ours, (f1, f2, f3)):
            np.testing.assert_allclose(np.asarray(o),
                                       r.numpy().transpose(0, 2, 3, 1),
                                       atol=1e-4, rtol=1e-3)

    def test_fpn_ssh_parity(self, ref_net_mod, rng):
        from comfyui_keep_tpu.models.retinaface import (_fpn_init, _fpn,
                                                        _ssh_init, _ssh)
        from comfyui_keep_tpu.utils.checkpoint import convert_state_dict
        torch.manual_seed(1)
        fpn = ref_net_mod.FPN([64, 128, 256], 64).eval()
        ssh = ref_net_mod.SSH(64, 64).eval()
        fpn_tree = convert_state_dict({k: v.numpy() for k, v in fpn.state_dict().items()})
        ssh_tree = convert_state_dict({k: v.numpy() for k, v in ssh.state_dict().items()})
        feats = [rng.standard_normal((1, s, s, c), dtype=np.float32)
                 for s, c in ((16, 64), (8, 128), (4, 256))]
        tfeats = [torch.tensor(f.transpose(0, 3, 1, 2)) for f in feats]
        with torch.no_grad():
            ref_fpn = fpn(tfeats)
            ref_ssh = ssh(ref_fpn[0])
        ours_fpn = _fpn(fpn_tree, [jnp.asarray(f) for f in feats], leaky=0.1)
        for o, r in zip(ours_fpn, ref_fpn):
            np.testing.assert_allclose(np.asarray(o), r.numpy().transpose(0, 2, 3, 1),
                                       atol=1e-4, rtol=1e-3)
        ours_ssh = _ssh(ssh_tree, ours_fpn[0], leaky=0.1)
        np.testing.assert_allclose(np.asarray(ours_ssh),
                                   ref_ssh.numpy().transpose(0, 2, 3, 1),
                                   atol=1e-4, rtol=1e-3)

    def test_priors_and_decode_parity(self, ref_utils_mod, rng):
        from comfyui_keep_tpu.models.retinaface import (prior_box, decode_boxes,
                                                        decode_landms, CFG)
        cfg = dict(CFG["resnet50"])
        ref_pb = ref_utils_mod.PriorBox(
            {"min_sizes": cfg["min_sizes"], "steps": cfg["steps"], "clip": False},
            image_size=(96, 128)).forward()
        ours_pb = prior_box(cfg, (96, 128))
        np.testing.assert_allclose(ours_pb, ref_pb.numpy(), atol=1e-6)

        n = ours_pb.shape[0]
        loc = rng.standard_normal((n, 4), dtype=np.float32) * 0.3
        pre = rng.standard_normal((n, 10), dtype=np.float32) * 0.3
        ref_boxes = ref_utils_mod.decode(torch.tensor(loc), ref_pb, [0.1, 0.2])
        ref_landms = ref_utils_mod.decode_landm(torch.tensor(pre), ref_pb, [0.1, 0.2])
        np.testing.assert_allclose(np.asarray(decode_boxes(jnp.asarray(loc), jnp.asarray(ours_pb), [0.1, 0.2])),
                                   ref_boxes.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(decode_landms(jnp.asarray(pre), jnp.asarray(ours_pb), [0.1, 0.2])),
                                   ref_landms.numpy(), atol=1e-5)

    def test_nms(self):
        from comfyui_keep_tpu.models.retinaface import nms_numpy
        dets = np.array([
            [0, 0, 10, 10, 0.9],
            [1, 1, 11, 11, 0.8],   # IoU ~0.68 with first -> suppressed at 0.4
            [20, 20, 30, 30, 0.7],
        ], np.float32)
        assert nms_numpy(dets, 0.4) == [0, 2]

    def test_detector_fn_end_to_end_shapes(self, rng):
        """Random-weight mobile0.25 detector through the full host+device
        pipeline (no semantic check without real weights)."""
        from comfyui_keep_tpu.models.retinaface import RetinaFace, make_detector_fn
        params = RetinaFace.init(jax.random.PRNGKey(0), network="mobile0.25")
        det = make_detector_fn(params, network="mobile0.25", jit=False)
        img = (rng.random((64, 96, 3)) * 255).astype(np.uint8)
        out = det(img, conf_threshold=0.0)  # accept everything pre-NMS
        assert out.ndim == 2 and out.shape[1] == 15


def test_resnet50_shapes(rng):
    from comfyui_keep_tpu.models.resnet import resnet50_init, resnet50_features
    p = resnet50_init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3), dtype=np.float32))
    f2, f3, f4 = resnet50_features(p, x)
    assert f2.shape == (1, 8, 8, 512)
    assert f3.shape == (1, 4, 4, 1024)
    assert f4.shape == (1, 2, 2, 2048)


class TestDetectFacesComposed:
    """Value-level golden for the COMPOSED detect_faces pipeline
    (priors -> decode -> score filter -> sort -> NMS -> landmark ordering)
    vs reference retinaface.py:208-252 on a fixed random-weight mobile0.25
    net — exact (N, 15) agreement, not just shapes."""

    @pytest.fixture(scope="class")
    def ref_retinaface_mod(self):
        # shared installer (mini-torchvision ILG/nms oracles) — also used by
        # tools/parity_report.py's real-detector certification path
        return oracle.install_ref_retinaface()

    @pytest.mark.parametrize("network", [
        "mobile0.25",
        pytest.param("resnet50", marks=pytest.mark.slow),
    ])
    def test_detect_faces_value_parity(self, ref_retinaface_mod, rng, network):
        from comfyui_keep_tpu.models.retinaface import make_detector_fn
        from comfyui_keep_tpu.utils.checkpoint import convert_state_dict
        torch.manual_seed(7)
        net = ref_retinaface_mod.RetinaFace(network_name=network,
                                            half=False).eval()
        # at random init, eval-mode BatchNorms collapse whole pyramid levels
        # to constant features and every prior scores IDENTICALLY —
        # threshold/NMS ordering is then undefined; randomize the stats
        # (49 unique values in the top 60 after this)
        oracle.randomize_bn_stats(net, seed=11)
        sd = {k: v.detach().numpy() for k, v in net.state_dict().items()
              if not k.startswith("body.fc")}
        params = convert_state_dict(sd)
        det = make_detector_fn(params, network=network, jit=False)

        # structured synthetic image (gradients + blobs, not pure noise)
        yy, xx = np.mgrid[0:256, 0:320].astype(np.float32)
        img = np.stack([
            127 + 100 * np.sin(xx / 23.0) * np.cos(yy / 17.0),
            127 + 90 * np.cos((xx + yy) / 31.0),
            (rng.random((256, 320)) * 255),
        ], axis=-1).clip(0, 255).astype(np.uint8)

        # random-weight scores cluster near 0.5 with ~1e-4 typical gaps; a
        # fixed threshold inside the cluster flips borderline candidates on
        # f32 noise (~1e-6). Pick the threshold at the LARGEST score gap in
        # the upper half so both frameworks split identically, keeping the
        # score filter genuinely exercised.
        with torch.no_grad():
            all_rows = net.detect_faces(img.astype(np.float32),
                                        conf_threshold=0.0)
        # stay within the top ~60 scores: their inter-score gaps (~1e-3) are
        # orders above cross-framework f32 noise (~1e-5), so the filter, the
        # sort order, and the NMS suppression cascade are all stable
        scores = np.sort(all_rows[:, 4])[::-1]
        top = scores[:60]
        gaps = top[:-1] - top[1:]
        gi = int(np.argmax(gaps[10:])) + 10  # keep >=10 candidates
        thr = float((top[gi] + top[gi + 1]) / 2)
        with torch.no_grad():
            theirs = net.detect_faces(img.astype(np.float32),
                                      conf_threshold=thr)
        ours = det(img, conf_threshold=thr)
        assert ours.shape == theirs.shape and ours.shape[1] == 15
        assert ours.shape[0] > 0, "degenerate test: nothing survived NMS"
        # rows may be locally permuted where scores tie within f32 noise;
        # require a one-to-one match: every reference row has exactly one
        # counterpart within 0.1 px (boxes + landmarks) and 1e-4 score
        used = set()
        for r in theirs:
            d = np.abs(ours[:, :4] - r[:4]).max(axis=1)
            j = int(np.argmin(d))
            assert j not in used, "two reference rows matched one of ours"
            used.add(j)
            np.testing.assert_allclose(ours[j, :4], r[:4], atol=0.1,
                                       rtol=1e-3)
            np.testing.assert_allclose(ours[j, 5:], r[5:], atol=0.1,
                                       rtol=1e-3)
            np.testing.assert_allclose(ours[j, 4], r[4], atol=1e-4,
                                       rtol=1e-4)


class TestBatchedDetector:
    def test_batched_matches_per_frame(self, rng):
        """detect_batch (the reference's batched_detect_faces,
        retinaface.py:327-383) yields the same (n, 15) rows per frame as N
        single-image calls."""
        from comfyui_keep_tpu.models.retinaface import (RetinaFace,
                                                        make_detector_fn)
        params = RetinaFace.init(jax.random.PRNGKey(0), network="mobile0.25")
        det = make_detector_fn(params, network="mobile0.25", jit=False)
        frames = (rng.random((3, 64, 96, 3)) * 255).astype(np.uint8)
        batched = det.detect_batch(frames, conf_threshold=0.0)
        assert len(batched) == 3
        for f, rows in zip(frames, batched):
            single = det(f, conf_threshold=0.0)
            assert rows.shape == single.shape
            np.testing.assert_allclose(rows, single, atol=2e-2, rtol=1e-3)
            # NMS survivors and their order must agree exactly
            assert rows.shape[0] == single.shape[0]

    def test_pipeline_batched_stage1_matches_sequential(self, rng):
        """_detect_all takes the one-program path for uniform clips and
        returns the same landmark lists as the per-frame loop."""
        from comfyui_keep_tpu.facelib.helper import FaceRestoreHelper
        from comfyui_keep_tpu.models.retinaface import (RetinaFace,
                                                        make_detector_fn)
        from comfyui_keep_tpu.pipeline.processor import KEEPFaceProcessor

        params = RetinaFace.init(jax.random.PRNGKey(1), network="mobile0.25")
        det = make_detector_fn(params, network="mobile0.25", jit=False)
        helper = FaceRestoreHelper(face_size=64, detector=det, parser=None,
                                   use_parse=False)
        proc = KEEPFaceProcessor.__new__(KEEPFaceProcessor)
        proc.face_helper = helper
        frames = [(rng.random((64, 96, 3)) * 255).astype(np.uint8)
                  for _ in range(3)]
        raw_batched = proc._detect_all(frames, only_center_face=False,
                                       progress=None)
        det_nobatch = lambda img, conf_threshold=0.8: det(img, conf_threshold)
        helper.detector = det_nobatch  # strips detect_batch -> per-frame path
        raw_seq = proc._detect_all(frames, only_center_face=False,
                                   progress=None)
        assert len(raw_batched) == len(raw_seq) == 3
        for lb, ls in zip(raw_batched, raw_seq):
            assert len(lb) == len(ls)
            for a, b in zip(lb, ls):
                np.testing.assert_allclose(a, b, atol=2e-2, rtol=1e-3)


def test_align_multi(rng):
    """align_multi (retinaface.py:254-279): detect -> 112x112 ArcFace-template
    warps, limit honored."""
    from comfyui_keep_tpu.models.retinaface import align_multi
    rows_fixed = np.asarray(
        [[10, 10, 50, 50, 0.99, 20, 20, 40, 20, 30, 30, 22, 40, 38, 40],
         [5, 5, 30, 30, 0.9, 10, 10, 20, 10, 15, 15, 11, 20, 19, 20]],
        np.float32)
    det = lambda img, conf: rows_fixed
    img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    rows, faces = align_multi(det, img, conf_threshold=0.5)
    assert rows.shape == (2, 15) and len(faces) == 2
    assert all(f.shape == (112, 112, 3) for f in faces)
    rows, faces = align_multi(det, img, limit=1)
    assert rows.shape == (1, 15) and len(faces) == 1
    det_none = lambda img, conf: np.zeros((0, 15), np.float32)
    rows, faces = align_multi(det_none, img)
    assert rows.shape == (0, 15) and faces == []
