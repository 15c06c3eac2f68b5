"""Validation loops + GAN/video trainers."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from comfyui_keep_tpu.training.validation import (validate_images,
                                                  validate_videos,
                                                  flip_seq_self_ensemble)
from comfyui_keep_tpu.training.trainers import build_model


def test_validate_images_psnr(rng):
    gt = rng.random((1, 32, 32, 3), dtype=np.float32)
    noisy = np.clip(gt + rng.standard_normal(gt.shape).astype(np.float32) * 0.05,
                    0, 1)
    loader = [{"lq": noisy, "gt": gt}]
    res = validate_images(lambda lq: lq, loader,
                          {"psnr": {"type": "calculate_psnr", "crop_border": 0}})
    assert 20 < res["psnr"] < 40


def test_validate_videos_per_folder(rng):
    gt = rng.random((1, 3, 16, 16, 3), dtype=np.float32)
    loader = [{"lq": gt, "gt": gt, "folder": "clipA"},
              {"lq": gt * 0.9, "gt": gt, "folder": "clipB"}]
    per_folder, avg = validate_videos(
        lambda lq: lq, loader,
        {"psnr": {"type": "calculate_psnr", "crop_border": 0}})
    assert set(per_folder) == {"clipA", "clipB"}
    assert per_folder["clipA"]["psnr"] > per_folder["clipB"]["psnr"]
    assert "psnr" in avg


def test_flip_seq_ensemble(rng):
    lq = jnp.asarray(rng.random((1, 4, 8, 8, 3), dtype=np.float32))
    out = flip_seq_self_ensemble(lambda x: x * 2.0, lq)
    np.testing.assert_allclose(np.asarray(out), np.asarray(lq) * 2.0, atol=1e-6)


def test_srgan_trainer_step(rng):
    opt = {
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
    tr = build_model(opt)
    state = tr.make_state(jax.random.PRNGKey(0))
    batch = {"lq": jnp.asarray(rng.random((1, 16, 16, 3), dtype=np.float32)),
             "gt": jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32))}
    state, logs = tr.gan_train_step(state, batch, current_iter=1)
    assert {"l_g_pix", "l_g_gan", "l_d", "l_d_real", "l_d_fake"} <= set(logs)
    assert all(np.isfinite(v) for v in logs.values())


def test_video_recurrent_trainer_step(rng):
    opt = {
        "model_type": "VideoRecurrentModel",
        "network_g": {"type": "BasicVSR", "num_feat": 8, "num_block": 1},
        "train": {"pixel_opt": {"type": "CharbonnierLoss", "eps": 1e-12},
                  "flow_lr_mul": 0.125,
                  "optim_g": {"type": "Adam", "lr": 1e-4}},
    }
    tr = build_model(opt)
    state = tr.make_state(jax.random.PRNGKey(0))
    batch = {"lq": jnp.asarray(rng.random((1, 3, 64, 64, 3), dtype=np.float32)),
             "gt": jnp.asarray(rng.random((1, 3, 256, 256, 3), dtype=np.float32))}
    p0 = np.asarray(state.params["spynet"]["basic_module"][0]["basic_module"][0]["w"])
    state, logs = tr.train_step(state, batch)
    assert np.isfinite(logs["l_pix"])
    # flow net trains at reduced lr (not frozen, not zero update)
    p1 = np.asarray(state.params["spynet"]["basic_module"][0]["basic_module"][0]["w"])
    assert not np.allclose(p0, p1)


class TestStyleGAN2Trainer:
    def test_gan_train_step_with_lazy_reg(self, rng):
        import jax
        from comfyui_keep_tpu.training.trainers import build_model
        opt = {
            "model_type": "StyleGAN2Model",
            "network_g": {"out_size": 32, "num_style_feat": 16, "num_mlp": 2,
                          "channel_multiplier": 1, "narrow": 0.25},
            "network_d": {"out_size": 32, "channel_multiplier": 1},
            "train": {"optim_g": {"lr": 1e-3}, "optim_d": {"lr": 1e-3},
                      "net_g_reg_every": 2, "net_d_reg_every": 2,
                      "mixing_prob": 1.0, "ema_decay": 0.99},
        }
        tr = build_model(opt)
        state = tr.make_state(jax.random.PRNGKey(0))
        batch = {"gt": jnp.asarray(
            rng.standard_normal((2, 32, 32, 3), dtype=np.float32))}
        state, logs = tr.gan_train_step(state, batch, current_iter=1)
        assert np.isfinite(logs["l_g"]) and np.isfinite(logs["l_d"])
        assert "l_d_r1" not in logs
        state, logs = tr.gan_train_step(state, batch, current_iter=2)
        # lazy regularization fires on reg_every multiples
        assert np.isfinite(logs["l_d_r1"]) and np.isfinite(logs["l_g_path"])
        assert tr.mean_path_length > 0 or logs["l_g_path"] >= 0


class TestRealESRGANFeed:
    OPT = dict(scale=2, gt_size=32, queue_size=4,
               resize_prob=[0.2, 0.7, 0.1], resize_range=[0.5, 1.5],
               gaussian_noise_prob=0.5, noise_range=[1, 10],
               poisson_scale_range=[0.05, 1.0], gray_noise_prob=0.4,
               jpeg_range=[60, 95], second_blur_prob=0.8,
               resize_prob2=[0.3, 0.4, 0.3], resize_range2=[0.3, 1.2],
               gaussian_noise_prob2=0.5, noise_range2=[1, 10],
               poisson_scale_range2=[0.05, 1.0], gray_noise_prob2=0.4,
               jpeg_range2=[60, 95])

    def _batch(self, rng, b=2, hw=64):
        from comfyui_keep_tpu.data.degradations import random_mixed_kernels
        k = np.stack([np.pad(random_mixed_kernels(
            ["iso"], [1.0], 7, [0.5, 2], [0.5, 2]), 7) for _ in range(b)])
        return {"gt": rng.random((b, hw, hw, 3)).astype(np.float32),
                "kernel1": k.astype(np.float32),
                "kernel2": k.astype(np.float32),
                "sinc_kernel": k.astype(np.float32)}

    def test_synthesize_shapes_and_ranges(self, rng):
        from comfyui_keep_tpu.training.realesrgan_feed import (
            TrainingPairPool, realesrgan_synthesize)
        np.random.seed(0)
        pool = TrainingPairPool(4)
        out = realesrgan_synthesize(self._batch(rng), self.OPT,
                                    jax.random.PRNGKey(0), pool=pool)
        assert out["gt"].shape == (2, 32, 32, 3)
        assert out["lq"].shape == (2, 16, 16, 3)
        assert out["gt_usm"].shape == (2, 32, 32, 3)
        assert float(jnp.min(out["lq"])) >= 0 and float(jnp.max(out["lq"])) <= 1

    def test_realesrgan_trainer_step(self, rng):
        np.random.seed(1)
        opt = {"model_type": "RealESRGANModel",
               "network_g": {"type": "MSRResNet", "num_feat": 8,
                             "num_block": 1, "upscale": 2},
               "network_d": {"type": "UNetDiscriminatorSN",
                             "num_in_ch": 3, "num_feat": 8},
               "train": {"pixel_opt": {"type": "L1Loss"},
                         "gan_opt": {"type": "GANLoss", "gan_type": "vanilla",
                                     "loss_weight": 0.1},
                         "optim_g": {"type": "Adam", "lr": 1e-4},
                         "optim_d": {"type": "Adam", "lr": 1e-4}},
               **self.OPT}
        tr = build_model(opt)
        state = tr.make_state(jax.random.PRNGKey(0))
        batch = tr.feed_data(self._batch(rng, b=2, hw=64))
        assert batch["lq"].shape == (2, 16, 16, 3)
        state, logs = tr.gan_train_step(state, batch, current_iter=1)
        assert all(np.isfinite(v) for v in logs.values())


def test_realesrgan_feed_primitives_torch_parity(rng):
    """filter2d / bicubic / area resize vs torch (the on-device synthesis
    building blocks, img_process_util.py filter2D + F.interpolate)."""
    import torch
    import torch.nn.functional as F
    from comfyui_keep_tpu.training.realesrgan_feed import (filter2d,
                                                           resize_torch)
    img = rng.random((2, 16, 16, 3)).astype(np.float32)
    ker = rng.random((2, 5, 5)).astype(np.float32)
    ker /= ker.sum(axis=(1, 2), keepdims=True)
    ours = np.asarray(filter2d(jnp.asarray(img), jnp.asarray(ker)))
    t = torch.from_numpy(img.transpose(0, 3, 1, 2))
    b, c, h, w = t.size()
    tp = F.pad(t, (2, 2, 2, 2), mode="reflect").reshape(1, b * c, h + 4, w + 4)
    kk = torch.from_numpy(ker).view(b, 1, 5, 5).repeat(1, c, 1, 1)
    ref = F.conv2d(tp, kk.reshape(b * c, 1, 5, 5),
                   groups=b * c).reshape(b, c, h, w).numpy()
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1), atol=1e-6)

    x = rng.random((1, 17, 23, 3)).astype(np.float32)
    for mode, tol in [("bicubic", 2e-5), ("area", 2e-6)]:
        for oh, ow in [(9, 12), (34, 46)] if mode == "bicubic" else [(9, 12)]:
            ref = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                                size=(oh, ow), mode=mode,
                                **({"align_corners": False}
                                   if mode == "bicubic" else {})).numpy()
            ours = np.asarray(resize_torch(jnp.asarray(x), (oh, ow), mode))
            np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1),
                                       atol=tol, rtol=1e-3)


def test_keep_and_video_trainers_have_eval_forward(rng):
    """run_validation / tools/test.py call trainer.forward — the KEEP and
    video trainers must provide it (only the SR family did)."""
    from comfyui_keep_tpu.models.vqgan import VQHQEncoder
    from comfyui_keep_tpu.training.trainers import KEEPTrainer

    tiny = dict(img_size=64, nf=32, ch_mult=(1, 2, 2), res_blocks=1,
                attn_resolutions=(16,), codebook_size=32, emb_dim=32,
                dim_embd=32, n_head=4, n_layers=1, latent_size=256,
                cft_list=("32",), cfa_list=(), cfa_nhead=2, cfa_dim=8,
                kalman_attn_head_dim=8, num_uncertainty_layers=1,
                temp_reg_list=())
    opt = {"model_type": "KEEPModel",
           "network_g": {"type": "KEEP", **tiny,
                         "fix_modules": ["quantize", "generator"]},
           "train": {"pixel_opt": {"type": "L1Loss"},
                     "optim_g": {"type": "Adam", "lr": 1e-4}}}
    hq = VQHQEncoder.init(jax.random.PRNGKey(3), img_size=64, nf=32,
                          ch_mult=(1, 2, 2), res_blocks=1,
                          attn_resolutions=(16,), codebook_size=32,
                          emb_dim=32)
    tr = KEEPTrainer(opt, hq_vqgan_params=hq)
    params = tr.init_params(jax.random.PRNGKey(0))
    lq = jnp.asarray(rng.random((1, 2, 64, 64, 3), np.float32) - 0.5)
    out = tr.forward(params, lq)
    assert out.shape == lq.shape and np.isfinite(np.asarray(out)).all()

    vopt = {"model_type": "VideoRecurrentModel",
            "network_g": {"type": "BasicVSR", "num_feat": 8, "num_block": 1},
            "train": {"pixel_opt": {"type": "CharbonnierLoss"},
                      "optim_g": {"type": "Adam", "lr": 1e-4}}}
    vtr = build_model(vopt)
    vparams = vtr.init_params(jax.random.PRNGKey(1))
    vlq = jnp.asarray(rng.random((1, 3, 64, 64, 3), np.float32))
    vout = vtr.forward(vparams, vlq)
    assert vout.shape == (1, 3, 256, 256, 3)


def test_gan_trainers_dispatch_from_train_step(rng):
    """train_pipeline only calls train_step — the GAN trainers must route
    it to their g/d alternation (they previously fell through to
    BaseTrainer's generator-only step: no GAN loss, frozen discriminator)."""
    opt = {
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
    tr = build_model(opt)
    state = tr.make_state(jax.random.PRNGKey(0))
    batch = {"lq": jnp.asarray(rng.random((1, 16, 16, 3), dtype=np.float32)),
             "gt": jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32))}
    d0 = jax.tree.map(np.asarray, tr.d_params)
    state, logs = tr.train_step(state, batch)
    assert {"l_g_gan", "l_d"} <= set(logs) and state.iter == 1
    # the discriminator actually trained
    moved = any(not np.allclose(a, b) for a, b in
                zip(jax.tree.leaves(d0), jax.tree.leaves(
                    jax.tree.map(np.asarray, tr.d_params))))
    assert moved
