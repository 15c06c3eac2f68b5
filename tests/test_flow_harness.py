"""GMFlow train/eval harness: flow IO parity vs reference frame_utils,
augmentor invariants, dataset walking, validators, GMFlowTrainer step."""
import os

import numpy as np
import pytest

from comfyui_keep_tpu.data import flow_datasets as fdata
from tests import reference_oracle as oracle

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def ref_frame_utils():
    if not oracle.reference_available():
        pytest.skip("no reference")
    return oracle._module_from_file(
        "ref_frame_utils",
        f"{oracle.REF_ROOT}/archs/gmflow/utils/frame_utils.py")


class TestFlowIO:
    def test_flo_roundtrip_and_ref_parity(self, tmp_path, rng,
                                          ref_frame_utils):
        flow = rng.standard_normal((17, 23, 2), dtype=np.float32) * 30
        p = str(tmp_path / "a.flo")
        fdata.write_flo(p, flow)
        np.testing.assert_array_equal(fdata.read_flo(p), flow)
        np.testing.assert_array_equal(ref_frame_utils.readFlow(p), flow)
        # reference-written file reads back identically
        p2 = str(tmp_path / "b.flo")
        ref_frame_utils.writeFlow(p2, flow)
        np.testing.assert_array_equal(fdata.read_flo(p2), flow)

    def test_kitti_roundtrip_and_ref_parity(self, tmp_path, rng,
                                            ref_frame_utils):
        flow = (rng.standard_normal((16, 20, 2)) * 50).astype(np.float32)
        p = str(tmp_path / "k.png")
        fdata.write_flow_kitti(p, flow)
        ours_f, ours_v = fdata.read_flow_kitti(p)
        ref_f, ref_v = ref_frame_utils.readFlowKITTI(p)
        np.testing.assert_array_equal(ours_f, ref_f)
        np.testing.assert_array_equal(ours_v, ref_v)
        np.testing.assert_allclose(ours_f, flow, atol=1 / 64.0)
        assert (ours_v == 1).all()

    def test_pfm_read_ref_parity(self, tmp_path, rng, ref_frame_utils):
        data = rng.standard_normal((8, 10, 3), dtype=np.float32)
        p = str(tmp_path / "f.pfm")
        with open(p, "wb") as f:
            f.write(b"PF\n10 8\n-1.0\n")
            np.flipud(data).astype("<f").tofile(f)
        np.testing.assert_array_equal(fdata.read_pfm(p),
                                      ref_frame_utils.readPFM(p))


class TestAugmentors:
    def test_dense_augmentor_shapes(self, rng):
        np.random.seed(0)
        aug = fdata.FlowAugmentor(crop_size=(64, 96))
        img1 = rng.integers(0, 255, (128, 160, 3), dtype=np.uint8)
        img2 = rng.integers(0, 255, (128, 160, 3), dtype=np.uint8)
        flow = rng.standard_normal((128, 160, 2), dtype=np.float32) * 5
        for _ in range(5):
            a, b, f = aug(img1, img2, flow)
            assert a.shape == (64, 96, 3) and b.shape == (64, 96, 3)
            assert f.shape == (64, 96, 2)
            assert a.dtype == np.uint8

    def test_sparse_resize_scatter(self):
        flow = np.zeros((4, 4, 2), np.float32)
        flow[2, 2] = [1.0, 2.0]
        valid = np.zeros((4, 4), np.float32)
        valid[2, 2] = 1
        f2, v2 = fdata.SparseFlowAugmentor.resize_sparse_flow_map(
            flow, valid, fx=2.0, fy=2.0)
        assert f2.shape == (8, 8, 2) and v2.shape == (8, 8)
        assert v2.sum() == 1
        yy, xx = np.argwhere(v2 == 1)[0]
        np.testing.assert_allclose(f2[yy, xx], [2.0, 4.0])

    def test_sparse_augmentor_shapes(self, rng):
        np.random.seed(1)
        aug = fdata.SparseFlowAugmentor(crop_size=(64, 96))
        img1 = rng.integers(0, 255, (128, 160, 3), dtype=np.uint8)
        img2 = rng.integers(0, 255, (128, 160, 3), dtype=np.uint8)
        flow = rng.standard_normal((128, 160, 2), dtype=np.float32)
        valid = (rng.random((128, 160)) > 0.5).astype(np.float32)
        a, b, f, v = aug(img1, img2, flow, valid)
        assert a.shape == (64, 96, 3) and f.shape == (64, 96, 2)
        assert v.shape == (64, 96)

    def test_color_jitter_identity_when_zero(self, rng):
        jit = fdata.ColorJitterNP()
        img = rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
        np.testing.assert_array_equal(jit(img), img)


def _make_sintel_tree(root, scenes=("alley_1",), frames=3, hw=(32, 48)):
    from PIL import Image
    rng = np.random.default_rng(0)
    for scene in scenes:
        img_dir = os.path.join(root, "training", "clean", scene)
        flo_dir = os.path.join(root, "training", "flow", scene)
        os.makedirs(img_dir), os.makedirs(flo_dir)
        for i in range(frames):
            arr = rng.integers(0, 255, hw + (3,), dtype=np.uint8)
            Image.fromarray(arr).save(
                os.path.join(img_dir, f"frame_{i:04d}.png"))
            if i < frames - 1:
                fdata.write_flo(os.path.join(flo_dir, f"frame_{i:04d}.flo"),
                                rng.standard_normal(hw + (2,),
                                                    dtype=np.float32))


class TestDatasetsAndEval:
    def test_sintel_dataset(self, tmp_path):
        root = str(tmp_path / "Sintel")
        _make_sintel_tree(root)
        ds = fdata.MpiSintel(root=root)
        assert len(ds) == 2
        s = ds[0]
        assert s["img1"].shape == (32, 48, 3)
        assert s["flow"].shape == (32, 48, 2)
        assert s["valid"].min() >= 0 and s["img1"].max() > 1.0

    def test_chairs_dataset_and_validate(self, tmp_path):
        from PIL import Image
        from comfyui_keep_tpu.training.flow_eval import validate_chairs
        root = str(tmp_path / "chairs")
        os.makedirs(root)
        rng = np.random.default_rng(1)
        for i in range(1, 21):
            for j in (1, 2):
                Image.fromarray(rng.integers(0, 255, (32, 48, 3),
                                             dtype=np.uint8)).save(
                    os.path.join(root, f"{i:05d}_img{j}.ppm"))
            fdata.write_flo(os.path.join(root, f"{i:05d}_flow.flo"),
                            np.full((32, 48, 2), 2.0, np.float32))
        train = fdata.FlyingChairs(split="training", root=root)
        val = fdata.FlyingChairs(split="validation", root=root)
        assert len(train) + len(val) == 20 and len(val) == 2
        res = validate_chairs(lambda a, b: np.zeros(a.shape[:3] + (2,)),
                              root=root, with_speed_metric=True)
        # gt flow is (2,2) everywhere -> EPE = 2*sqrt(2) ~ 2.828
        np.testing.assert_allclose(res["chairs_epe"], 2 * np.sqrt(2),
                                   rtol=1e-6)
        assert res["chairs_1px"] == 1.0 and res["chairs_3px"] == 0.0
        assert res["chairs_s0_10"] == pytest.approx(2 * np.sqrt(2))

    def test_validate_sintel_and_padder(self, tmp_path):
        from comfyui_keep_tpu.training.flow_eval import (InputPadder,
                                                         validate_sintel)
        root = str(tmp_path / "Sintel")
        _make_sintel_tree(root, hw=(30, 46))  # non-multiple-of-8
        res = validate_sintel(lambda a, b: np.zeros(a.shape[:3] + (2,)),
                              root=root, dstype="clean")
        assert "sintel_clean_epe" in res and res["sintel_clean_epe"] > 0
        pad = InputPadder((1, 30, 46, 3))
        x = np.zeros((1, 30, 46, 3))
        (xp,) = pad.pad(x)
        assert xp.shape[1] % 8 == 0 and xp.shape[2] % 8 == 0
        assert pad.unpad(xp).shape == x.shape

    def test_inference_on_dir(self, tmp_path):
        from PIL import Image
        from comfyui_keep_tpu.training.flow_eval import inference_on_dir
        ind = str(tmp_path / "in")
        outd = str(tmp_path / "out")
        os.makedirs(ind)
        rng = np.random.default_rng(2)
        for i in range(3):
            Image.fromarray(rng.integers(0, 255, (32, 48, 3),
                                         dtype=np.uint8)).save(
                os.path.join(ind, f"{i:03d}.png"))
        flows = inference_on_dir(
            lambda a, b: np.ones(a.shape[:3] + (2,)), ind, outd,
            save_flo_flow=True)
        assert len(flows) == 2
        assert os.path.isfile(os.path.join(outd, "0000_flow.png"))
        np.testing.assert_array_equal(
            fdata.read_flo(os.path.join(outd, "0000_pred.flo")),
            np.ones((32, 48, 2), np.float32))

    def test_flow_to_image(self):
        from comfyui_keep_tpu.utils.flow import flow_to_image
        flow = np.zeros((8, 8, 2))
        flow[:4, :, 0] = 3.0
        img = flow_to_image(flow)
        assert img.shape == (8, 8, 3) and img.dtype == np.uint8
        # zero flow is near-white in the Middlebury convention
        assert (img[6, 6] > 240).all()


class TestGMFlowTrainer:
    def test_train_step(self, rng):
        import jax
        from comfyui_keep_tpu.training.trainers import build_model
        opt = {"model_type": "GMFlowModel", "network_g": {},
               "train": {"lr": 1e-4, "num_steps": 100}}
        tr = build_model(opt)
        state = tr.make_state(jax.random.PRNGKey(0))
        batch = {
            "img1": rng.random((1, 32, 32, 3), dtype=np.float32) * 255,
            "img2": rng.random((1, 32, 32, 3), dtype=np.float32) * 255,
            "flow": rng.standard_normal((1, 32, 32, 2), dtype=np.float32),
            "valid": np.ones((1, 32, 32), np.float32),
        }
        p0 = jax.tree.map(np.asarray, state.params)
        state, logs = tr.train_step(state, batch)
        assert np.isfinite(logs["l_flow"]) and np.isfinite(logs["epe"])
        moved = jax.tree.map(lambda a, b: not np.allclose(a, b),
                             p0, jax.tree.map(np.asarray, state.params))
        assert any(jax.tree.leaves(moved))


def test_out_of_boundary_mask():
    """compute_out_of_boundary_mask parity (gmflow utils/utils.py:36-53):
    correspondence must stay in-plane AND |flow| bounded by the image."""
    from comfyui_keep_tpu.training.flow_eval import compute_out_of_boundary_mask
    h, w = 4, 5
    flow = np.zeros((h, w, 2), np.float32)
    flow[0, 0] = (-1.0, 0.0)        # lands at x=-1 -> out
    flow[1, 1] = (3.0, 2.0)         # lands at (4, 3) -> in
    flow[2, 2] = (10.0, 0.0)        # |u| > w-1 -> out (large-flow guard)
    flow[3, 4] = (0.0, 0.5)         # lands at y=3.5 -> out (y > h-1)
    m = compute_out_of_boundary_mask(flow)
    assert m.shape == (h, w)
    assert not m[0, 0] and m[1, 1] and not m[2, 2] and not m[3, 4]
    assert m[0, 1]  # zero flow interior stays valid
