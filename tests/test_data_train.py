"""Data pipeline + end-to-end train loop tests (tiny synthetic data)."""
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from comfyui_keep_tpu.data import build_dataset, degradations as D
from comfyui_keep_tpu.data.prefetch import DataLoader, DevicePrefetcher
from comfyui_keep_tpu.data.samplers import EnlargedSampler
from comfyui_keep_tpu.data.transforms import augment, paired_random_crop


class TestDegradations:
    def test_kernels_normalized(self, rng):
        for kind in ("iso", "aniso", "generalized_iso", "plateau_aniso"):
            k = D.random_mixed_kernels([kind], [1.0], 21, (0.6, 5), (0.6, 5))
            assert k.shape == (21, 21)
            np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-6)

    def test_kernel_matches_reference(self, rng):
        from tests import reference_oracle as oracle
        if not oracle.reference_available():
            pytest.skip("no reference")
        oracle._install_stubs_arch_util()  # torchvision stub
        import sys
        tv = sys.modules["torchvision"]
        if not hasattr(tv, "transforms"):
            import types
            tv.transforms = types.ModuleType("torchvision.transforms")
            tv.transforms.functional = types.ModuleType(
                "torchvision.transforms.functional")
            tv.transforms.functional.rgb_to_grayscale = None
            sys.modules["torchvision.transforms"] = tv.transforms
            sys.modules["torchvision.transforms.functional"] = tv.transforms.functional
        ref = oracle._module_from_file(
            "ref_degradations",
            "/root/reference/modules/deps/wm_basicsr/data/degradations.py")
        k1 = D.bivariate_Gaussian(21, 2.0, 3.0, 0.5, isotropic=False)
        k2 = ref.bivariate_Gaussian(21, 2.0, 3.0, 0.5, isotropic=False)
        np.testing.assert_allclose(k1, k2, atol=1e-12)
        g1 = D.bivariate_generalized_Gaussian(13, 1.5, 2.5, 0.3, 1.5, isotropic=False)
        g2 = ref.bivariate_generalized_Gaussian(13, 1.5, 2.5, 0.3, 1.5, isotropic=False)
        np.testing.assert_allclose(g1, g2, atol=1e-12)
        p1 = D.bivariate_plateau(13, 1.5, 2.5, 0.3, 2.0, isotropic=False)
        p2 = ref.bivariate_plateau(13, 1.5, 2.5, 0.3, 2.0, isotropic=False)
        np.testing.assert_allclose(p1, p2, atol=1e-12)
        s1 = D.circular_lowpass_kernel(np.pi / 3, 13)
        s2 = ref.circular_lowpass_kernel(np.pi / 3, 13)
        np.testing.assert_allclose(s1, s2, atol=1e-12)

    def test_noise_and_jpeg(self, rng):
        img = rng.random((32, 32, 3)).astype(np.float32)
        out = D.random_add_gaussian_noise(img, (5, 10), gray_prob=0.5,
                                          rng=np.random.default_rng(0))
        assert out.shape == img.shape and out.min() >= 0 and out.max() <= 1
        out = D.add_poisson_noise(img, scale=0.5, rng=np.random.default_rng(0))
        assert np.isfinite(out).all()
        out = D.add_jpg_compression(img, quality=50)
        assert out.shape == img.shape

    def test_video_compression_fallback(self, rng):
        frames = [rng.random((64, 64, 3)).astype(np.float32) for _ in range(4)]
        out = D.add_video_compression(frames, crf=28)
        assert len(out) == 4
        assert all(o.shape == (64, 64, 3) for o in out)
        # compression should change the data but stay close
        assert 0 < np.abs(out[0] - frames[0]).mean() < 0.2


class TestTransforms:
    def test_paired_random_crop(self, rng):
        gt = rng.random((32, 32, 3))
        lq = rng.random((16, 16, 3))
        g, l = paired_random_crop(gt, lq, 8, 2)
        assert g.shape == (8, 8, 3) and l.shape == (4, 4, 3)

    def test_augment_flow_consistency(self, rng):
        img = rng.random((8, 8, 3))
        flow = rng.random((8, 8, 2)).astype(np.float32)
        out, fl, status = augment([img], flows=[flow], return_status=True,
                                  rng=__import__("random").Random(3))
        assert out[0].shape == img.shape and fl[0].shape == flow.shape


class TestSamplerLoader:
    def test_enlarged_sampler_sharding(self):
        s0 = EnlargedSampler(10, num_replicas=2, rank=0, ratio=2)
        s1 = EnlargedSampler(10, num_replicas=2, rank=1, ratio=2)
        i0, i1 = list(iter(s0)), list(iter(s1))
        assert len(i0) == len(i1) == 10
        assert all(0 <= i < 10 for i in i0 + i1)

    def test_dataloader_batches(self, tmp_path, rng):
        class DS:
            def __len__(self):
                return 7

            def __getitem__(self, i):
                return {"x": np.full((2, 2), i, np.float32), "name": str(i)}

        dl = DataLoader(DS(), batch_size=2, shuffle=True, num_workers=2)
        batches = list(dl)
        assert len(batches) == 3
        assert batches[0]["x"].shape == (2, 2, 2)
        assert isinstance(batches[0]["name"], list)

    def test_prefetcher_propagates_worker_errors(self):
        """A failing loader (bad sharding, IO error, ...) must raise out of
        next(), not kill the worker thread and deadlock the train loop."""
        class BadLoader:
            def __iter__(self):
                raise RuntimeError("loader exploded")

        pf = DevicePrefetcher(BadLoader())
        with pytest.raises(RuntimeError, match="loader exploded"):
            pf.next()
        # and the prefetcher is reusable after the error surfaced
        class OneBatch:
            def __iter__(self):
                yield {"lq": np.zeros((1, 2, 2, 3), np.float32)}

        pf2 = DevicePrefetcher(OneBatch())
        out = pf2.next()
        assert out is not None and out["lq"].shape == (1, 2, 2, 3)
        assert pf2.next() is None


@pytest.fixture
def vfhq_dir(tmp_path, rng):
    clip = tmp_path / "gt" / "clip_000"
    clip.mkdir(parents=True)
    for i in range(12):
        cv2.imwrite(str(clip / f"{i:08d}.png"),
                    (rng.random((64, 64, 3)) * 255).astype(np.uint8))
    meta = tmp_path / "meta.txt"
    meta.write_text("\n".join(f"clip_000/12/{i}" for i in range(4, 8)))
    return tmp_path


def test_vfhq_dataset(vfhq_dir):
    ds = build_dataset({
        "type": "VFHQRealDegradationDataset",
        "dataroot_gt": str(vfhq_dir / "gt"),
        "meta_info_file": str(vfhq_dir / "meta.txt"),
        "num_frame": 4, "scale": 2, "interval_list": [1],
        "use_flip": True, "use_rot": False,
    })
    item = ds[0]
    assert item["gt"].shape == (4, 64, 64, 3)
    assert item["lq"].shape == (4, 32, 32, 3)
    # ±0.5 normalized
    assert item["gt"].min() >= -1.0 and item["gt"].max() <= 1.0


def test_train_pipeline_end_to_end(vfhq_dir, tmp_path):
    """Full loop: VFHQ degradation data -> KEEP trainer, 2 iters, save."""
    import jax
    from comfyui_keep_tpu.models.vqgan import VQHQEncoder
    from comfyui_keep_tpu.training.train import train_pipeline

    tiny = dict(img_size=64, nf=32, ch_mult=(1, 2, 2), res_blocks=1,
                attn_resolutions=(16,), codebook_size=32, emb_dim=32,
                dim_embd=32, n_head=4, n_layers=1, latent_size=256,
                cft_list=("32",), cfa_list=(), cfa_nhead=2, cfa_dim=8,
                kalman_attn_head_dim=8, num_uncertainty_layers=1,
                temp_reg_list=())
    opt = {
        "name": "tiny_e2e", "is_train": True, "manual_seed": 0,
        "model_type": "KEEPModel",
        "network_g": {"type": "KEEP", **tiny,
                      "fix_modules": ["quantize", "generator"]},
        "datasets": {"train": {
            "type": "VFHQRealDegradationDataset",
            "dataroot_gt": str(vfhq_dir / "gt"),
            "meta_info_file": str(vfhq_dir / "meta.txt"),
            "num_frame": 2, "scale": 1, "interval_list": [1],
            "use_flip": False, "use_rot": False, "batch_size_per_gpu": 1,
        }},
        "train": {"total_iter": 2,
                  "pixel_opt": {"type": "L1Loss"},
                  "optim_g": {"type": "Adam", "lr": 1e-4}},
        "logger": {"print_freq": 1, "save_checkpoint_freq": 2},
        "path": {"experiments_root": str(tmp_path / "exp"),
                 "models": str(tmp_path / "exp/models"),
                 "training_states": str(tmp_path / "exp/training_states"),
                 "log": str(tmp_path / "exp"),
                 "visualization": str(tmp_path / "exp/vis")},
    }
    hq = VQHQEncoder.init(jax.random.PRNGKey(1), img_size=64, nf=32,
                          ch_mult=(1, 2, 2), res_blocks=1,
                          attn_resolutions=(16,), codebook_size=32, emb_dim=32)
    state, logs = train_pipeline(opt, use_mesh=False,
                                 trainer_kwargs={"hq_vqgan_params": hq})
    assert state.iter == 2
    assert np.isfinite(logs["l_total"])
    assert os.path.exists(tmp_path / "exp/models/net_g_2.npz")


def test_single_vfhq_dataset(vfhq_dir):
    meta = vfhq_dir / "global_meta.txt"
    meta.write_text("clip_000/12\n")
    ds = build_dataset({
        "type": "SingleVFHQDataset",
        "dataroot_gt": str(vfhq_dir / "gt"),
        "global_meta_info_file": str(meta),
        "use_flip": False, "use_rot": False, "normalize": True,
    })
    assert len(ds) == 12
    item = ds[3]
    assert item["gt"].shape == (64, 64, 3)
    np.testing.assert_array_equal(item["in"], item["gt"])
    assert item["gt"].min() >= -1.0 and item["gt"].max() <= 1.0
    assert item["key"] == "clip_000/00000012/00000003"
    # registry alias parity with the reference class names
    from comfyui_keep_tpu.utils.registry import DATASET_REGISTRY
    from comfyui_keep_tpu.data.datasets import VFHQRealDegradationDataset
    assert DATASET_REGISTRY.get("VFHQDataset") is VFHQRealDegradationDataset


def test_test_pipeline(tmp_path, rng):
    """test_pipeline: SR model + paired folder -> metric dict."""
    from comfyui_keep_tpu.training.train import test_pipeline
    lq_dir, gt_dir = tmp_path / "lq", tmp_path / "gt"
    lq_dir.mkdir(), gt_dir.mkdir()
    for i in range(2):
        img = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(gt_dir / f"{i}.png"),
                    cv2.resize(img, (32, 32)))
        cv2.imwrite(str(lq_dir / f"{i}.png"), img)
    opt = {
        "name": "t", "model_type": "SRModel", "manual_seed": 0,
        "network_g": {"type": "MSRResNet", "num_feat": 8, "num_block": 1,
                      "upscale": 2},
        "datasets": {"test_1": {"type": "PairedImageDataset", "name": "toy",
                                "dataroot_lq": str(lq_dir),
                                "dataroot_gt": str(gt_dir), "scale": 2}},
        "train": {"pixel_opt": {"type": "L1Loss"}},
        "val": {"metrics": {"psnr": {"type": "calculate_psnr",
                                     "crop_border": 0}}},
        "path": {},
    }
    res = test_pipeline(opt)
    assert "toy" in res and np.isfinite(res["toy"]["psnr"])


class TestDataUtil:
    def test_generate_frame_indices_reference_examples(self):
        from comfyui_keep_tpu.data.util import generate_frame_indices
        # documented examples (data_util.py:52-59), crt_idx=0, num_frames=5,
        # max_frame_num=100
        assert generate_frame_indices(0, 100, 5, "replicate") == [0, 0, 0, 1, 2]
        assert generate_frame_indices(0, 100, 5, "reflection") == [2, 1, 0, 1, 2]
        assert generate_frame_indices(0, 100, 5, "reflection_circle") == \
            [4, 3, 0, 1, 2]
        assert generate_frame_indices(0, 100, 5, "circle") == [3, 4, 0, 1, 2]
        # right border, reflection
        assert generate_frame_indices(99, 100, 3, "reflection") == [98, 99, 98]

    def test_paired_paths_and_read_seq(self, tmp_path, rng):
        from comfyui_keep_tpu.data.util import (paired_paths_from_folder,
                                                read_img_seq)
        lq, gt = tmp_path / "lq", tmp_path / "gt"
        lq.mkdir(), gt.mkdir()
        for i in range(3):
            img = (rng.random((8, 8, 3)) * 255).astype(np.uint8)
            cv2.imwrite(str(lq / f"f{i}.png"), img)
            cv2.imwrite(str(gt / f"f{i}.png"), img)
        paths = paired_paths_from_folder([str(lq), str(gt)], ["lq", "gt"],
                                         "{}")
        assert len(paths) == 3 and "lq_path" in paths[0]
        seq, names = read_img_seq(str(gt), return_imgname=True)
        assert seq.shape == (3, 8, 8, 3) and names == ["f0", "f1", "f2"]
        assert 0.0 <= seq.min() and seq.max() <= 1.0

    def test_duf_downsample_matches_reference(self, rng):
        import torch
        import torch.nn.functional as F
        from comfyui_keep_tpu.data.util import (duf_downsample,
                                                generate_gaussian_kernel)
        x = rng.random((1, 2, 32, 32, 3)).astype(np.float32)
        ours = np.asarray(duf_downsample(x, scale=4))
        # reference implementation (data_util.py:285-317) inline, torch CHW
        xt = torch.from_numpy(x.transpose(0, 1, 4, 2, 3))
        b, t, c, h, w = xt.size()
        xt = xt.reshape(-1, 1, h, w)
        pad = 13 // 2 + 4 * 2
        xt = F.pad(xt, (pad, pad, pad, pad), "reflect")
        gk = torch.from_numpy(
            generate_gaussian_kernel(13, 1.6)).float()[None, None]
        y = F.conv2d(xt, gk, stride=4)[:, :, 2:-2, 2:-2]
        ref = y.reshape(b, t, c, y.size(2), y.size(3)).numpy()
        np.testing.assert_allclose(ours, ref.transpose(0, 1, 3, 4, 2),
                                   atol=1e-5, rtol=1e-5)


class TestRecurrentDatasets:
    """New recurrent/test dataset variants (reference reds_dataset.py:209,
    vimeo90k_dataset.py:120, video_test_dataset.py:14/134/202/252)."""

    @staticmethod
    def _write_clip(root, clip, n, h=32, w=32, rng=None, scale=1):
        import cv2
        d = root / clip
        d.mkdir(parents=True, exist_ok=True)
        rng = rng or np.random.default_rng(0)
        for i in range(n):
            img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
            cv2.imwrite(str(d / f"{i:08d}.png"), img)

    def test_reds_recurrent(self, tmp_path, rng):
        from comfyui_keep_tpu.data import build_dataset
        for clip in ("000", "001"):
            self._write_clip(tmp_path / "gt", clip, 12, 32, 32)
            self._write_clip(tmp_path / "lq", clip, 12, 16, 16)
        meta = tmp_path / "meta.txt"
        meta.write_text("000 12 (32,32,3)\n001 12 (32,32,3)\n")
        ds = build_dataset({
            "type": "REDSRecurrentDataset", "dataroot_gt": str(tmp_path / "gt"),
            "dataroot_lq": str(tmp_path / "lq"), "meta_info_file": str(meta),
            "val_partition": "REDS4", "test_mode": False, "num_frame": 4,
            "gt_size": 16, "scale": 2, "phase": "train",
            "interval_list": [1, 2], "random_reverse": True})
        # clip 000 is in the REDS4 val partition -> excluded
        assert len(ds) == 12
        item = ds[0]
        assert item["lq"].shape == (4, 8, 8, 3)
        assert item["gt"].shape == (4, 16, 16, 3)
        ds_val = build_dataset({
            "type": "REDSRecurrentDataset", "dataroot_gt": str(tmp_path / "gt"),
            "dataroot_lq": str(tmp_path / "lq"), "meta_info_file": str(meta),
            "val_partition": "REDS4", "test_mode": True, "num_frame": 4,
            "scale": 2})
        assert len(ds_val) == 12 and ds_val.keys[0].startswith("000/")

    def test_vimeo_recurrent_flip_sequence(self, tmp_path, rng):
        import cv2
        from comfyui_keep_tpu.data import build_dataset
        for root, size in (("gt", 32), ("lq", 16)):
            d = tmp_path / root / "00001" / "0001"
            d.mkdir(parents=True)
            for i in range(1, 8):
                img = (rng.random((size, size, 3)) * 255).astype(np.uint8)
                cv2.imwrite(str(d / f"im{i}.png"), img)
        meta = tmp_path / "meta.txt"
        meta.write_text("00001/0001 7 (32,32,3)\n")
        ds = build_dataset({
            "type": "Vimeo90KRecurrentDataset",
            "dataroot_gt": str(tmp_path / "gt"),
            "dataroot_lq": str(tmp_path / "lq"), "meta_info_file": str(meta),
            "num_frame": 7, "gt_size": 16, "scale": 2, "phase": "train",
            "flip_sequence": True})
        item = ds[0]
        assert item["lq"].shape == (14, 8, 8, 3)
        assert item["gt"].shape == (14, 16, 16, 3)
        np.testing.assert_array_equal(item["lq"][7], item["lq"][6])

    def test_video_test_window_and_recurrent(self, tmp_path, rng):
        from comfyui_keep_tpu.data import build_dataset
        self._write_clip(tmp_path / "gt", "clipA", 6, 32, 32)
        self._write_clip(tmp_path / "lq", "clipA", 6, 16, 16)
        win = build_dataset({
            "type": "VideoTestDataset", "dataroot_gt": str(tmp_path / "gt"),
            "dataroot_lq": str(tmp_path / "lq"), "num_frame": 5,
            "padding": "reflection_circle"})
        assert len(win) == 6  # one item per frame
        item = win[0]
        assert item["lq"].shape == (5, 16, 16, 3)
        assert item["gt"].shape == (32, 32, 3)
        assert item["idx"] == "0/6" and item["border"] == 1
        assert win[3]["border"] == 0

        rec = build_dataset({
            "type": "VideoRecurrentTestDataset",
            "dataroot_gt": str(tmp_path / "gt"),
            "dataroot_lq": str(tmp_path / "lq")})
        assert len(rec) == 1  # one item per folder
        clip = rec[0]
        assert clip["lq"].shape == (6, 16, 16, 3)
        assert clip["gt"].shape == (6, 32, 32, 3)
        assert clip["folder"] == "clipA"

    def test_video_test_duf(self, tmp_path, rng):
        from comfyui_keep_tpu.data import build_dataset
        self._write_clip(tmp_path / "gt", "clipA", 4, 32, 32)
        self._write_clip(tmp_path / "lq", "clipA", 4, 16, 16)
        ds = build_dataset({
            "type": "VideoTestDUFDataset", "dataroot_gt": str(tmp_path / "gt"),
            "dataroot_lq": str(tmp_path / "lq"), "num_frame": 3,
            "padding": "reflection", "use_duf_downsampling": True,
            "scale": 2})
        item = ds[1]
        assert item["lq"].shape == (3, 16, 16, 3)   # GT 32 duf-downsampled x2
        assert item["gt"].shape == (32, 32, 3)

    def test_vimeo_test_dataset(self, tmp_path, rng):
        import cv2
        from comfyui_keep_tpu.data import build_dataset
        for root, size in (("gt", 32), ("lq", 16)):
            d = tmp_path / root / "00001" / "0001"
            d.mkdir(parents=True)
            for i in range(1, 8):
                img = (rng.random((size, size, 3)) * 255).astype(np.uint8)
                cv2.imwrite(str(d / f"im{i}.png"), img)
        meta = tmp_path / "meta.txt"
        meta.write_text("00001/0001 7 (32,32,3)\n")
        ds = build_dataset({
            "type": "VideoTestVimeo90KDataset",
            "dataroot_gt": str(tmp_path / "gt"),
            "dataroot_lq": str(tmp_path / "lq"), "meta_info_file": str(meta),
            "num_frame": 7})
        item = ds[0]
        assert item["lq"].shape == (7, 16, 16, 3)
        assert item["gt"].shape == (32, 32, 3)


def test_build_dataloader_phases(tmp_path, rng):
    """build_dataloader parity (reference data/__init__.py:40-90): train
    batches with drop_last + sampler, val batch 1 without drop."""
    import cv2
    from comfyui_keep_tpu.data import build_dataloader, build_dataset
    from comfyui_keep_tpu.data.samplers import EnlargedSampler
    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(5):
        cv2.imwrite(str(d / f"{i}.png"),
                    (rng.random((16, 16, 3)) * 255).astype(np.uint8))
    ds = build_dataset({"type": "SingleImageDataset",
                        "dataroot_lq": str(d), "phase": "val"})
    train = build_dataloader(ds, {"phase": "train", "batch_size_per_gpu": 2},
                             sampler=EnlargedSampler(len(ds), 1, 0), seed=1)
    batches = list(train)
    assert all(b["lq"].shape[0] == 2 for b in batches)
    assert len(batches) == 2  # drop_last
    val = build_dataloader(ds, {"phase": "val"})
    assert len(list(val)) == 5
    import pytest as _pytest
    with _pytest.raises(ValueError):
        build_dataloader(ds, {"phase": "bogus"})


def test_train_pipeline_validates_at_val_freq(tmp_path, rng):
    """val datasets + val.val_freq must actually run validation during
    training (reference train.py validation hook) — the metrics land in
    the training log under val/<name>/<metric>."""
    import cv2
    from comfyui_keep_tpu.training.train import train_pipeline
    for sub, size in (("gt", 32), ("lq", 16)):
        d = tmp_path / sub
        d.mkdir()
        for i in range(3):
            cv2.imwrite(str(d / f"{i:03d}.png"),
                        (rng.random((size, size, 3)) * 255).astype(np.uint8))
    ds_opt = {"type": "PairedImageDataset", "dataroot_gt": str(tmp_path / "gt"),
              "dataroot_lq": str(tmp_path / "lq"), "scale": 2}
    opt = {
        "name": "val_t", "is_train": True, "manual_seed": 0,
        "model_type": "SRModel",
        "network_g": {"type": "MSRResNet", "num_feat": 8, "num_block": 1,
                      "upscale": 2},
        "datasets": {
            "train": {**ds_opt, "gt_size": 16, "use_hflip": False,
                      "use_rot": False, "batch_size_per_gpu": 1},
            "val": {**ds_opt, "name": "tinyval"},
        },
        "train": {"total_iter": 2, "pixel_opt": {"type": "L1Loss"},
                  "optim_g": {"type": "Adam", "lr": 1e-3}},
        "val": {"val_freq": 2, "save_img": True,
                "metrics": {"psnr": {"type": "calculate_psnr",
                                     "crop_border": 0}}},
        "logger": {"print_freq": 10},
        "path": {"experiments_root": str(tmp_path / "exp"),
                 "models": str(tmp_path / "exp/models"),
                 "training_states": str(tmp_path / "exp/training_states"),
                 "log": str(tmp_path / "exp"),
                 "visualization": str(tmp_path / "exp/vis")},
    }
    state, logs = train_pipeline(opt, use_mesh=False)
    assert state.iter == 2
    assert "val/tinyval/psnr" in logs and np.isfinite(logs["val/tinyval/psnr"])
    # save_img: reference layout <vis>/<img_name>/<img_name>_<iter>.png
    saved = tmp_path / "exp" / "vis" / "000" / "000_2.png"
    assert saved.exists(), "val.save_img must write restored images"


def test_train_pipeline_tb_logger_and_lr(tmp_path, rng):
    """logger.use_tb_logger must produce a real event file (it was a silent
    no-op: the writers existed but the pipeline never created them), and
    the logged LR must be the scheduled value, not a 0.0 placeholder."""
    pytest.importorskip("torch.utils.tensorboard")
    from comfyui_keep_tpu.training.train import train_pipeline
    from comfyui_keep_tpu.training.trainers import SRTrainer
    for sub, size in (("gt", 32), ("lq", 16)):
        d = tmp_path / sub
        d.mkdir()
        for i in range(3):
            cv2.imwrite(str(d / f"{i:03d}.png"),
                        (rng.random((size, size, 3)) * 255).astype(np.uint8))
    opt = {
        "name": "tb_t", "is_train": True, "manual_seed": 0,
        "model_type": "SRModel",
        "network_g": {"type": "MSRResNet", "num_feat": 8, "num_block": 1,
                      "upscale": 2},
        "datasets": {"train": {
            "type": "PairedImageDataset", "dataroot_gt": str(tmp_path / "gt"),
            "dataroot_lq": str(tmp_path / "lq"), "gt_size": 16, "scale": 2,
            "use_hflip": False, "use_rot": False, "batch_size_per_gpu": 1,
        }},
        "train": {"total_iter": 2, "pixel_opt": {"type": "L1Loss"},
                  "optim_g": {"type": "Adam", "lr": 1e-3},
                  "scheduler": {"type": "MultiStepLR", "milestones": [1],
                                "gamma": 0.5}},
        "logger": {"print_freq": 1, "use_tb_logger": True},
        "path": {"experiments_root": str(tmp_path / "exp"),
                 "models": str(tmp_path / "exp/models"),
                 "training_states": str(tmp_path / "exp/training_states"),
                 "log": str(tmp_path / "exp"),
                 "visualization": str(tmp_path / "exp/vis")},
    }
    train_pipeline(opt, use_mesh=False)
    tb_dir = tmp_path / "exp" / "tb_logger"
    assert tb_dir.is_dir() and any(
        f.name.startswith("events") for f in tb_dir.iterdir())
    # scheduled LR: MultiStepLR multiplier after milestone 1 is 0.5
    tr = SRTrainer(opt)
    assert tr.current_lr(0) == pytest.approx(1e-3)
    assert tr.current_lr(2) == pytest.approx(5e-4)
