"""Smoke tests for the documented CLI entry points (reference CLIs:
wm_basicsr/train.py, wm_basicsr/test.py, and the checkpoint conversion
path of keep_model_loader.py) — each runs as a real subprocess the way a
user invokes it, on the CPU backend."""
import os
import subprocess
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"  # applied via utils.options.pin_platform_from_env
    # pin an 8-device virtual fleet so the train CLI exercises the mesh path
    # (global batch = batch_size_per_gpu x data-axis size) deterministically
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    return env


def _run(args, cwd, timeout=600):
    proc = subprocess.run([sys.executable, *args], capture_output=True,
                          text=True, cwd=cwd, env=_env(), timeout=timeout)
    assert proc.returncode == 0, (
        f"{' '.join(args)} failed\nstdout:\n{proc.stdout[-4000:]}\n"
        f"stderr:\n{proc.stderr[-4000:]}")
    return proc


@pytest.fixture
def paired_dir(tmp_path):
    rng = np.random.default_rng(3)
    for sub, size in (("gt", 32), ("lq", 16)):
        d = tmp_path / sub
        d.mkdir()
        for i in range(3):
            img = (rng.random((size, size, 3)) * 255).astype(np.uint8)
            cv2.imwrite(str(d / f"{i:03d}.png"), img)
    return tmp_path


def test_train_and_test_cli_end_to_end(paired_dir, tmp_path):
    """tools/train.py then tools/test.py, exactly as documented: a 2-iter
    SRModel run that saves net_g_2.npz, then a test run that loads it and
    validates with PSNR."""
    train_yml = tmp_path / "train_tiny.yml"
    train_yml.write_text(f"""
name: tiny_cli_sr
model_type: SRModel
manual_seed: 0
scale: 2
network_g:
  type: MSRResNet
  num_feat: 8
  num_block: 1
  upscale: 2
datasets:
  train:
    type: PairedImageDataset
    dataroot_gt: {paired_dir / 'gt'}
    dataroot_lq: {paired_dir / 'lq'}
    gt_size: 16
    scale: 2
    use_hflip: false
    use_rot: false
    batch_size_per_gpu: 1
    dataset_enlarge_ratio: 8
train:
  total_iter: 4
  pixel_opt: {{type: L1Loss}}
  optim_g: {{type: Adam, lr: 1.0e-3}}
logger:
  print_freq: 1
  save_checkpoint_freq: 2
""")
    _run([os.path.join(REPO, "tools", "train.py"), "-opt", str(train_yml),
          "--force_yml", "train:total_iter=2"], cwd=str(tmp_path))
    saved = tmp_path / "experiments" / "tiny_cli_sr" / "models" / "net_g_2.npz"
    assert saved.exists(), "--force_yml total_iter=2 must stop + save at 2"

    test_yml = tmp_path / "test_tiny.yml"
    test_yml.write_text(f"""
name: tiny_cli_sr
model_type: SRModel
manual_seed: 0
scale: 2
network_g:
  type: MSRResNet
  num_feat: 8
  num_block: 1
  upscale: 2
path:
  pretrain_network_g: {saved}
datasets:
  test_1:
    name: tiny_val
    type: PairedImageDataset
    dataroot_gt: {paired_dir / 'gt'}
    dataroot_lq: {paired_dir / 'lq'}
    scale: 2
val:
  metrics:
    psnr:
      type: calculate_psnr
      crop_border: 0
""")
    proc = _run([os.path.join(REPO, "tools", "test.py"),
                 "-opt", str(test_yml)], cwd=str(tmp_path))
    blob = proc.stdout + proc.stderr
    assert "tiny_val" in blob and "psnr" in blob.lower()


def test_train_flow_cli_smoke(tmp_path):
    """tools/train_flow.py: 2 steps of GMFlow chairs training on a tiny
    synthetic FlyingChairs tree, sharded over the 8-device virtual mesh,
    with a checkpoint save (reference gmflow/main.py:20-557 CLI)."""
    from comfyui_keep_tpu.data.flow_datasets import write_flo
    PIL = pytest.importorskip("PIL.Image")
    root = tmp_path / "chairs"
    root.mkdir()
    rng = np.random.default_rng(5)
    for i in range(1, 11):
        for j in (1, 2):
            PIL.fromarray(rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)
                          ).save(str(root / f"{i:05d}_img{j}.ppm"))
        write_flo(str(root / f"{i:05d}_flow.flo"),
                  np.full((32, 48, 2), 1.0, np.float32))
    ckpt_dir = tmp_path / "exp"
    _run([os.path.join(REPO, "tools", "train_flow.py"),
          "--stage", "chairs", "--image_size", "32", "48",
          "--batch_size", "8", "--num_steps", "2", "--summary_freq", "1",
          "--save_freq", "2", "--chairs_root", str(root),
          "--checkpoint_dir", str(ckpt_dir)], cwd=str(tmp_path))
    assert (ckpt_dir / "gmflow_chairs_2.npz").exists()


def test_convert_checkpoint_cli(tmp_path):
    """tools/convert_checkpoint.py: torch .pth -> torch-free .npz with the
    reference loader semantics (params preference, module. strip)."""
    torch = pytest.importorskip("torch")
    sd = {"module.body.0.weight": torch.arange(12., dtype=torch.float32
                                               ).reshape(3, 4),
          "module.body.0.bias": torch.ones(3)}
    src = tmp_path / "tiny.pth"
    torch.save({"params": sd}, str(src))
    dst = tmp_path / "tiny.npz"
    _run([os.path.join(REPO, "tools", "convert_checkpoint.py"),
          str(src), str(dst), "--arch", "generic"], cwd=str(tmp_path),
         timeout=300)
    assert dst.exists()
    data = np.load(str(dst))
    joined = "\n".join(data.files)
    assert "module" not in joined, "module. prefix must be stripped"
    # converted tree: weight -> w (HWIO for convs; this 2-D one stays as-is)
    w = [data[k] for k in data.files if k.endswith("/w")][0]
    np.testing.assert_allclose(np.sort(w.ravel()),
                               np.arange(12., dtype=np.float32))
