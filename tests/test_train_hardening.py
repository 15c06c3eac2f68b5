"""Regression tests for the round-5 training-pipeline review findings:
video validation during training, GAN discriminator resume, accumulation
coverage across trainer overrides, logged-LR fidelity, scheduler
jit/eager agreement, and the video save_img layout."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from comfyui_keep_tpu.training.trainers import build_model
from comfyui_keep_tpu.training.train import run_validation


class _StubTrainer:
    """Minimal trainer facade for run_validation: nearest-up x2."""

    def forward(self, params, lq):
        # lq (1,T,H,W,C) or (1,H,W,C) -> x2 upscale
        return jnp.repeat(jnp.repeat(lq, 2, axis=-3), 2, axis=-2)


def _video_loader(rng, t=3, n=2):
    items = []
    for i in range(n):
        lq = rng.random((1, t, 8, 8, 3), dtype=np.float32)
        up = np.repeat(np.repeat(lq, 2, axis=2), 2, axis=3)
        gt = np.clip(up + 0.01 * rng.standard_normal(up.shape), 0, 1)
        items.append({"lq": lq, "gt": gt.astype(np.float32),
                      "folder": [f"clip{i}"]})
    return items


def test_run_validation_video_returns_flat_metrics(rng):
    """train_pipeline logs `for k, v in res.items()` with float v — a video
    val dataset must yield the per-metric averages, not the
    (per_folder, avg) tuple (previously crashed at the first val_freq)."""
    res = run_validation(
        _StubTrainer(), None,
        [("v", "VideoRecurrentDataset", _video_loader(rng))],
        {"psnr": {"type": "calculate_psnr", "crop_border": 0}})
    assert set(res) == {"v"}
    for k, v in res["v"].items():  # the exact pattern train_pipeline runs
        assert isinstance(v, float) and np.isfinite(v)
    assert res["v"]["psnr"] > 35  # near-identity restore (0.01 noise)


def test_run_validation_video_save_layout(rng, tmp_path):
    """Video frames save as <vis>/<dataset>/<folder>/<frame>_<iter>.png
    (video_base_model.py:74-85), not the doubled
    <vis>/<folder>/<frame>/<folder>/<frame>_<iter>.png nesting."""
    pytest.importorskip("cv2")
    vis = tmp_path / "vis"
    opt = {"is_train": True, "path": {"visualization": str(vis)},
           "val": {"save_img": True}}
    run_validation(
        _StubTrainer(), None,
        [("valset", "VideoRecurrentDataset", _video_loader(rng, t=2, n=1))],
        {}, opt=opt, current_iter=500)
    expect = vis / "valset" / "clip0" / "00000001_500.png"
    assert expect.exists(), sorted(
        os.path.join(r, f) for r, _, fs in os.walk(vis) for f in fs)


def test_accumulate_steps_wraps_every_trainer_family():
    """train.accumulate_steps must reach the optimizer in every
    make_optimizer override (KEEP / VideoRecurrent / GMFlow) — previously
    only BaseTrainer wrapped MultiSteps and the KEEP config documenting the
    option got a silent no-op."""
    import optax
    from comfyui_keep_tpu.training.trainers import (GMFlowTrainer,
                                                    KEEPTrainer,
                                                    VideoRecurrentTrainer)
    tiny_keep = dict(img_size=64, nf=32, ch_mult=(1, 2, 2), res_blocks=2,
                     attn_resolutions=(16,), codebook_size=64, emb_dim=32,
                     dim_embd=64, n_head=8, n_layers=2, latent_size=256,
                     cft_list=("32", "64"), cfa_list=("16",), cfa_nhead=2,
                     cfa_dim=16, kalman_attn_head_dim=8,
                     num_uncertainty_layers=1, temp_reg_list=("32",))
    keep = KEEPTrainer({
        "model_type": "KEEPModel",
        "network_g": {"type": "KEEP", **tiny_keep},
        "train": {"optim_g": {"type": "Adam", "lr": 1e-3},
                  "accumulate_steps": 2},
    })
    vid = VideoRecurrentTrainer({
        "model_type": "VideoRecurrentModel",
        "network_g": {"type": "BasicVSR", "num_feat": 8, "num_block": 1},
        "train": {"pixel_opt": {"type": "L1Loss"},
                  "optim_g": {"type": "Adam", "lr": 1e-4},
                  "accumulate_steps": 3},
    })
    flow = GMFlowTrainer({
        "model_type": "GMFlowModel",
        "train": {"lr": 4e-4, "accumulate_steps": 2},
    })
    for tr in (keep, vid, flow):
        params = {"w": jnp.zeros((2, 2))}  # structure irrelevant to wrap
        tx = tr.make_optimizer(params)
        assert isinstance(tx.init(params), optax.MultiStepsState), type(tr)


def test_accumulate_steps_rejected_for_stylegan2():
    """StyleGAN2's lazy-regularization extra tx.update calls would
    mis-count a MultiSteps window — must refuse loudly, not silently
    accumulate wrong."""
    from comfyui_keep_tpu.training.trainers import StyleGAN2Trainer
    tr = StyleGAN2Trainer({
        "model_type": "StyleGAN2Model",
        "network_g": {"out_size": 16, "num_style_feat": 16, "num_mlp": 2},
        "train": {"accumulate_steps": 2},
    })
    with pytest.raises(ValueError, match="accumulate_steps"):
        tr.make_optimizer({})


def test_current_lr_accounts_for_accumulation():
    """With accumulate_steps=k the applied schedule advances once per k
    micro-batches; the logged LR must evaluate schedule(it // k), not
    schedule(it)."""
    from comfyui_keep_tpu.training.trainers import SRTrainer
    opt = {
        "model_type": "SRModel",
        "network_g": {"type": "MSRResNet", "num_feat": 8, "num_block": 1,
                      "upscale": 2},
        "train": {"pixel_opt": {"type": "L1Loss"},
                  "optim_g": {"type": "Adam", "lr": 1e-3},
                  "scheduler": {"type": "MultiStepLR", "milestones": [2],
                                "gamma": 0.1},
                  "accumulate_steps": 2},
    }
    tr = SRTrainer(opt)
    # micro-iter 3 -> window position 1 (< milestone 2) -> full LR
    assert tr.current_lr(3) == pytest.approx(1e-3)
    # micro-iter 5 -> window position 2 (>= milestone) -> decayed
    assert tr.current_lr(5) == pytest.approx(1e-4)


def test_gmflow_current_lr_tracks_onecycle():
    """GMFlow's optimizer carries its own cosine one-cycle schedule;
    current_lr must report it (previously logged the constant base lr)."""
    from comfyui_keep_tpu.training.trainers import GMFlowTrainer
    tr = GMFlowTrainer({"model_type": "GMFlowModel",
                        "train": {"lr": 4e-4, "num_steps": 1000}})
    tr.make_optimizer({})  # builds + stores the schedule
    lr0 = tr.current_lr(0)
    lr_peak = tr.current_lr(50)  # pct_start=0.05 -> peak at ~step 50
    assert lr0 < 4e-4 * 0.2  # warmup starts at peak/div_factor
    assert lr_peak == pytest.approx(4e-4, rel=1e-3)


def test_multi_step_restart_unsorted_concrete_matches_traced():
    """Concrete and traced paths must agree for UNSORTED restarts — the
    in-jit schedule is the applied LR, the concrete path the logged one."""
    from comfyui_keep_tpu.training.schedulers import multi_step_restart_lr
    m = multi_step_restart_lr(milestones=[100], gamma=0.5,
                              restarts=[10, 5], restart_weights=[0.1, 0.5])
    traced = jax.jit(lambda s: jnp.asarray(m(s)))
    for step in (0, 4, 5, 9, 10, 12, 150):
        assert m(step) == pytest.approx(
            float(traced(jnp.asarray(step, jnp.int32))), rel=1e-6), step
    assert m(12) == pytest.approx(0.1)  # most recent restart (10) wins


def _tiny_srgan_opt():
    return {
        "model_type": "SRGANModel",
        "network_g": {"type": "MSRResNet", "num_feat": 8, "num_block": 1,
                      "upscale": 2},
        "network_d": {"type": "UNetDiscriminatorSN", "num_in_ch": 3,
                      "num_feat": 8},
        "train": {"pixel_opt": {"type": "L1Loss"},
                  "gan_opt": {"type": "GANLoss", "gan_type": "vanilla",
                              "loss_weight": 0.1},
                  "optim_g": {"type": "Adam", "lr": 1e-4},
                  "optim_d": {"type": "Adam", "lr": 1e-4}},
    }


def test_gan_discriminator_survives_resume(tmp_path, rng):
    """state.save(extra=trainer.extra_state()) + load_extra_state round-trip:
    a resumed GAN run must continue with the TRAINED discriminator and its
    Adam moments, not fresh random init (base_model.py:207-252 saves net_d
    and its optimizer)."""
    from comfyui_keep_tpu.training.state import TrainState
    batch = {"lq": jnp.asarray(rng.random((1, 16, 16, 3), dtype=np.float32)),
             "gt": jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32))}

    tr = build_model(_tiny_srgan_opt())
    state = tr.make_state(jax.random.PRNGKey(0))
    for _ in range(2):
        state, _ = tr.train_step(state, batch)
    d_trained = jax.tree.map(np.asarray, tr.d_params)
    net_dir, st_dir = str(tmp_path / "m"), str(tmp_path / "s")
    state.save(net_dir, st_dir, state.iter, extra=tr.extra_state())

    tr2 = build_model(_tiny_srgan_opt())
    s2 = tr2.make_state(jax.random.PRNGKey(1))  # different init
    latest = TrainState.latest_state(st_dir)
    s2.resume_optimizer(s2.resume(latest))
    tr2.load_extra_state(s2.resume_extra)
    for a, b in zip(jax.tree.leaves(d_trained),
                    jax.tree.leaves(jax.tree.map(np.asarray, tr2.d_params))):
        np.testing.assert_array_equal(a, b)


def test_resume_partial_graft_is_counted():
    """graft_tree(stats=...) reports kept-vs-loaded so train_pipeline can
    warn on a partial restore instead of claiming a clean one."""
    from comfyui_keep_tpu.training.state import graft_tree
    live = {"a": jnp.ones((2, 2)), "b": {"w": jnp.ones((3,))}}
    ckpt = {"a": np.zeros((2, 2)), "b": {"w": np.zeros((4,))}}  # shape clash
    stats = {}
    out = graft_tree(live, ckpt, stats=stats)
    assert stats == {"loaded": 1, "kept": 1}
    np.testing.assert_array_equal(np.asarray(out["a"]), 0)
    np.testing.assert_array_equal(np.asarray(out["b"]["w"]), 1)
