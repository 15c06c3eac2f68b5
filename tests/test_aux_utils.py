"""Aux subsystem tests: DiffJPEG (golden vs reference), USM, RealESRGANer,
video IO, options/config, logger."""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")

from tests import reference_oracle as oracle


class TestDiffJPEG:
    @pytest.fixture(scope="class")
    def ref_jpeg(self):
        if not oracle.reference_available():
            pytest.skip("no reference")
        mod = oracle._module_from_file(
            "ref_diffjpeg",
            "/root/reference/modules/deps/wm_basicsr/utils/diffjpeg.py")
        return mod

    @pytest.mark.parametrize("quality,diff", [(20, False), (70, False),
                                              (50, True)])
    def test_vs_reference(self, ref_jpeg, rng, quality, diff):
        from comfyui_keep_tpu.utils.diffjpeg import diff_jpeg
        x = rng.random((1, 24, 24, 3), dtype=np.float32)
        net = ref_jpeg.DiffJPEG(differentiable=diff)
        with torch.no_grad():
            ref = net(torch.tensor(x.transpose(0, 3, 1, 2)),
                      quality=float(quality))
        ours = diff_jpeg(jnp.asarray(x), quality=float(quality),
                         differentiable=diff)
        np.testing.assert_allclose(np.asarray(ours),
                                   ref.numpy().transpose(0, 2, 3, 1),
                                   atol=2e-3, rtol=1e-2)

    def test_differentiable(self, rng):
        from comfyui_keep_tpu.utils.diffjpeg import diff_jpeg
        x = jnp.asarray(rng.random((1, 16, 16, 3), dtype=np.float32))
        g = jax.grad(lambda z: jnp.sum(diff_jpeg(z, 50.0) ** 2))(x)
        assert np.isfinite(np.asarray(g)).all()


def test_usm_sharp_twins(rng):
    from comfyui_keep_tpu.utils.img_process import usm_sharp, usm_sharp_jax
    img = rng.random((32, 32, 3), dtype=np.float32)
    a = usm_sharp(img, radius=13)
    b = np.asarray(usm_sharp_jax(jnp.asarray(img[None]), radius=13))[0]
    np.testing.assert_allclose(a, b, atol=2e-3)


def test_realesrganer(rng):
    from comfyui_keep_tpu.pipeline.realesrganer import RealESRGANer
    from comfyui_keep_tpu.models.sr_basic import SRVGGNetCompact
    params = SRVGGNetCompact.init(jax.random.PRNGKey(0), num_feat=8,
                                  num_conv=2, upscale=2)
    up = RealESRGANer(
        2, lambda p, x: SRVGGNetCompact.apply(p, x, upscale=2), params,
        tile=16, tile_pad=4, pre_pad=4)
    img = (rng.random((30, 42, 3)) * 255).astype(np.uint8)
    out, mode = up.enhance(img)
    assert out.shape == (60, 84, 3) and mode == "RGB"
    # alpha path
    rgba = (rng.random((20, 20, 4)) * 255).astype(np.uint8)
    out, mode = up.enhance(rgba, outscale=1.5)
    assert out.shape == (30, 30, 4) and mode == "RGBA"
    # gray path
    gray = (rng.random((20, 20)) * 255).astype(np.uint8)
    out, mode = up.enhance(gray)
    assert out.shape == (40, 40) and mode == "L"


def test_video_io_roundtrip(tmp_path, rng):
    from comfyui_keep_tpu.utils.video import VideoReader, VideoWriter
    path = str(tmp_path / "clip.mp4")
    frames = [(rng.random((32, 48, 3)) * 255).astype(np.uint8)
              for _ in range(5)]
    w = VideoWriter(path, 32, 48, fps=10)
    for f in frames:
        w.write_frame(f)
    w.close()
    r = VideoReader(path)
    assert r.get_fps() == pytest.approx(10, rel=0.1)
    got = []
    while True:
        f = r.get_frame()
        if f is None:
            break
        got.append(f)
    r.close()
    assert len(got) == 5
    assert got[0].shape == (32, 48, 3)


def test_options_yaml(tmp_path):
    from comfyui_keep_tpu.utils.options import (yaml_load, apply_force_yml,
                                                _postprocess_yml_value)
    cfg = tmp_path / "opt.yml"
    cfg.write_text("name: test\ntrain:\n  lr: 0.001\n  ema_decay: 0.99\n")
    opt = yaml_load(str(cfg))
    assert opt["train"]["lr"] == 0.001
    apply_force_yml(opt, ["train:ema_decay=0.5", "train:lr=1e-4"])
    assert opt["train"]["ema_decay"] == 0.5
    assert opt["train"]["lr"] == 1e-4
    assert _postprocess_yml_value("none") is None
    assert _postprocess_yml_value("true") is True
    assert _postprocess_yml_value("[1,2]") == [1, 2]


def test_logger_and_misc(tmp_path):
    from comfyui_keep_tpu.utils.logger import (AvgTimer, MessageLogger,
                                               get_env_info, get_root_logger)
    from comfyui_keep_tpu.utils.misc import sizeof_fmt, set_random_seed
    t = AvgTimer()
    t.record()
    assert t.get_avg_time() >= 0
    ml = MessageLogger({"name": "x", "train": {"total_iter": 10},
                        "logger": {"print_freq": 1}})
    ml({"iter": 1, "epoch": 0, "lrs": [1e-4], "time": 0.1, "l_pix": 0.5})
    assert "JAX" in get_env_info()
    assert sizeof_fmt(2048) == "2.0 KB"
    set_random_seed(3)


def test_shipped_option_files_parse_and_resolve():
    """The example YAMLs in options/ must parse and reference registered
    model types and datasets."""
    import glob
    import yaml
    import comfyui_keep_tpu.training.trainers  # noqa: F401
    import comfyui_keep_tpu.data.datasets  # noqa: F401
    from comfyui_keep_tpu.utils.registry import (DATASET_REGISTRY,
                                                 MODEL_REGISTRY)
    files = glob.glob(os.path.join(os.path.dirname(__file__), "..",
                                   "options", "*.yml"))
    assert files
    for f in files:
        opt = yaml.safe_load(open(f))
        assert MODEL_REGISTRY.get(opt["model_type"]) is not None
        for ds in opt.get("datasets", {}).values():
            assert DATASET_REGISTRY.get(ds["type"]) is not None


def test_plot_util(tmp_path):
    """utils/plot.py vs reference plot_util.py semantics (txt readers +
    tensorboard IIR smoothing)."""
    from comfyui_keep_tpu.utils.plot import (read_data_from_txt_1v,
                                             read_data_from_txt_2v,
                                             smooth_data)
    log = tmp_path / "train.log"
    log.write_text("iter 100 loss 0.5\niter 200 loss 0.25\nnoise line\n"
                   "iter 300 loss 0.125\n")
    steps, vals = read_data_from_txt_2v(str(log), r"iter (\d+) loss ([\d.]+)")
    assert steps == [100, 200, 300] and vals == [0.5, 0.25, 0.125]
    steps1, _ = read_data_from_txt_2v(str(log), r"iter (\d+) loss ([\d.]+)",
                                      step_one=True)
    assert steps1 == [101, 201, 301]
    assert read_data_from_txt_1v(str(log), r"iter \d+ loss ([\d.]+)") == vals
    # y[i] = w*y[i-1] + (1-w)*x[i], seeded with x[0] (plot_util.py:68-83)
    assert smooth_data([1.0, 0.0, 0.0], 0.5) == [1.0, 0.5, 0.25]


def test_zoo_lazy_configs_and_gdrive_surface():
    """zoo is importable as the entry module (no import cycle) and exposes
    the google-drive downloader (download_util.py:11-66 equivalent)."""
    from comfyui_keep_tpu.utils import zoo
    cfgs = zoo.KEEP_MODEL_CONFIGS
    assert set(cfgs) == {"KEEP", "Asian"}
    assert callable(zoo.download_file_from_google_drive)


def test_lmdb_maker_roundtrip(tmp_path, rng):
    """make_lmdb_from_imgs -> FileClient lmdb backend roundtrip + meta file
    format (reference lmdb_util.py:9-207). Skips when lmdb is absent."""
    pytest.importorskip("lmdb")
    import cv2
    from comfyui_keep_tpu.utils.lmdb_util import (imgs_from_lmdb,
                                                  make_lmdb_from_imgs)
    src = tmp_path / "imgs"
    src.mkdir()
    names, keys = [], []
    for i in range(3):
        img = (rng.random((8, 10, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(src / f"f{i}.png"), img)
        names.append(f"f{i}.png")
        keys.append(f"f{i}")
    out = tmp_path / "data.lmdb"
    make_lmdb_from_imgs(str(src), str(out), names, keys, batch=2,
                        map_size=1 << 24)
    meta = (out / "meta_info.txt").read_text().strip().splitlines()
    assert meta[0] == "f0.png (8,10,3) 1"
    back = imgs_from_lmdb(out, keys)
    for i, img in enumerate(back):
        ref = cv2.imread(str(src / f"f{i}.png"), cv2.IMREAD_UNCHANGED)
        np.testing.assert_array_equal(img, ref)
