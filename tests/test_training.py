"""Training framework tests: losses vs torch, schedulers vs reference,
KEEP/SR train steps on tiny configs."""
import numpy as np
import chex
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from comfyui_keep_tpu.training import losses as L
from comfyui_keep_tpu.training import schedulers as S
from comfyui_keep_tpu.training.state import ema_update, freeze_mask
from comfyui_keep_tpu.training.trainers import KEEPTrainer, SRTrainer

from tests import reference_oracle as oracle


class TestLosses:
    def test_basic_losses(self, rng):
        a = rng.standard_normal((2, 8, 8, 3), dtype=np.float32)
        b = rng.standard_normal((2, 8, 8, 3), dtype=np.float32)
        ta, tb = torch.tensor(a), torch.tensor(b)
        np.testing.assert_allclose(float(L.L1Loss()(jnp.asarray(a), jnp.asarray(b))),
                                   torch.nn.functional.l1_loss(ta, tb).item(), rtol=1e-5)
        np.testing.assert_allclose(float(L.MSELoss()(jnp.asarray(a), jnp.asarray(b))),
                                   torch.nn.functional.mse_loss(ta, tb).item(), rtol=1e-5)
        ch = float(L.CharbonnierLoss(eps=1e-12)(jnp.asarray(a), jnp.asarray(b)))
        ref = torch.sqrt((ta - tb) ** 2 + 1e-12).mean().item()
        np.testing.assert_allclose(ch, ref, rtol=1e-5)

    def test_tv_loss(self, rng):
        a = rng.standard_normal((1, 6, 6, 3), dtype=np.float32)
        tv = float(L.WeightedTVLoss()(jnp.asarray(a)))
        ta = torch.tensor(a.transpose(0, 3, 1, 2))
        ref = (torch.nn.functional.l1_loss(ta[:, :, :-1], ta[:, :, 1:]) +
               torch.nn.functional.l1_loss(ta[:, :, :, :-1], ta[:, :, :, 1:])).item()
        np.testing.assert_allclose(tv, ref, rtol=1e-5)

    @pytest.mark.parametrize("gan_type", ["vanilla", "lsgan", "wgan",
                                          "wgan_softplus", "hinge"])
    def test_gan_losses(self, rng, gan_type):
        x = rng.standard_normal((4, 5), dtype=np.float32)
        tx = torch.tensor(x)
        gl = L.GANLoss(gan_type, loss_weight=1.0)
        ours_real = float(gl(jnp.asarray(x), True, is_disc=True))
        if gan_type == "vanilla":
            ref = torch.nn.functional.binary_cross_entropy_with_logits(
                tx, torch.ones_like(tx)).item()
        elif gan_type == "lsgan":
            ref = torch.nn.functional.mse_loss(tx, torch.ones_like(tx)).item()
        elif gan_type == "wgan":
            ref = (-tx.mean()).item()
        elif gan_type == "wgan_softplus":
            ref = torch.nn.functional.softplus(-tx).mean().item()
        else:
            ref = torch.nn.functional.relu(1 - tx).mean().item()
        np.testing.assert_allclose(ours_real, ref, rtol=1e-5)

    def test_perceptual_loss_with_vgg(self, rng):
        from comfyui_keep_tpu.models.vgg import VGGFeatureExtractor
        params = VGGFeatureExtractor.init(jax.random.PRNGKey(0))
        fn = lambda x, layers: VGGFeatureExtractor.apply(params, x, layers)
        pl = L.PerceptualLoss({"conv1_2": 1.0, "conv2_2": 0.5}, fn,
                              perceptual_weight=1.0, style_weight=1.0)
        x = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32))
        gt = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32))
        p, s = pl(x, gt)
        assert np.isfinite(float(p)) and np.isfinite(float(s))

    def test_gradient_penalty(self, rng):
        disc = lambda x: jnp.sum(x ** 2, axis=(1, 2, 3))
        real = jnp.asarray(rng.random((2, 4, 4, 3), dtype=np.float32))
        fake = jnp.asarray(rng.random((2, 4, 4, 3), dtype=np.float32))
        gp = L.gradient_penalty_loss(disc, real, fake, jax.random.PRNGKey(0))
        assert np.isfinite(float(gp))


class TestSchedulers:
    @pytest.fixture(scope="class")
    def ref_sched_mod(self):
        if not oracle.reference_available():
            pytest.skip("no reference")
        return oracle._module_from_file(
            "ref_lr_sched",
            "/root/reference/modules/deps/wm_basicsr/models/lr_scheduler.py")

    def test_multistep_restart(self, ref_sched_mod):
        lin = torch.nn.Linear(2, 2)
        opt = torch.optim.SGD(lin.parameters(), lr=1.0)
        ref = ref_sched_mod.MultiStepRestartLR(opt, milestones=[3, 6],
                                               gamma=0.5, restarts=[8],
                                               restart_weights=[0.7])
        ours = S.multi_step_restart_lr([3, 6], 0.5, restarts=[8],
                                       restart_weights=[0.7])
        for step in range(12):
            np.testing.assert_allclose(ours(step), opt.param_groups[0]["lr"],
                                       rtol=1e-6, err_msg=f"step {step}")
            opt.step()
            ref.step()

    def test_cosine_restart(self, ref_sched_mod):
        lin = torch.nn.Linear(2, 2)
        opt = torch.optim.SGD(lin.parameters(), lr=2.0)
        ref = ref_sched_mod.CosineAnnealingRestartLR(
            opt, periods=[4, 4], restart_weights=[1, 0.5], eta_min=0.2)
        ours = S.cosine_annealing_restart_lr([4, 4], [1, 0.5], eta_min=0.2,
                                             base_lr=2.0)
        for step in range(8):
            np.testing.assert_allclose(2.0 * ours(step),
                                       opt.param_groups[0]["lr"], rtol=1e-6,
                                       err_msg=f"step {step}")
            opt.step()
            ref.step()


TINY = dict(img_size=64, nf=32, ch_mult=(1, 2, 2), res_blocks=2,
            attn_resolutions=(16,), codebook_size=64, emb_dim=32, dim_embd=64,
            n_head=8, n_layers=2, latent_size=256, cft_list=("32", "64"),
            cfa_list=("16",), cfa_nhead=2, cfa_dim=16, kalman_attn_head_dim=8,
            num_uncertainty_layers=1, temp_reg_list=("32",))


class TestKEEPTrainer:
    @pytest.fixture(scope="class")
    def trainer_and_state(self):
        from comfyui_keep_tpu.models.vqgan import VQHQEncoder
        opt = {
            "model_type": "KEEPModel",
            "network_g": {"type": "KEEP", **TINY,
                          "fix_modules": ["quantize", "generator"]},
            "train": {
                "use_hq_feat_loss": True, "feat_loss_weight": 1.0,
                "cross_entropy_loss": True, "entropy_loss_weight": 0.5,
                "pixel_opt": {"type": "L1Loss", "loss_weight": 1.0},
                "temporal_opt": {"type": "L1Loss", "loss_weight": 0.1},
                "temporal_warp_type": "GT",
                "optim_g": {"type": "Adam", "lr": 1e-3},
                "ema_decay": 0.99,
            },
        }
        hq = VQHQEncoder.init(jax.random.PRNGKey(3), img_size=64, nf=32,
                              ch_mult=(1, 2, 2), res_blocks=2,
                              attn_resolutions=(16,), codebook_size=64,
                              emb_dim=32)
        tr = KEEPTrainer(opt, hq_vqgan_params=hq)
        # trainer cfg must match hq encoder cfg for GT indices
        state = tr.make_state(jax.random.PRNGKey(0))
        return tr, state

    def test_train_step(self, trainer_and_state, rng):
        tr, state = trainer_and_state
        batch = {
            "lq": jnp.asarray(rng.random((1, 2, 64, 64, 3), dtype=np.float32) - 0.5),
            "gt": jnp.asarray(rng.random((1, 2, 64, 64, 3), dtype=np.float32) - 0.5),
        }
        p0 = jax.tree.map(np.asarray, state.params)
        state, logs = tr.train_step(state, batch)
        assert np.isfinite(logs["l_total"])
        assert {"l_feat_encoder", "l_cross_entropy", "l_temporal", "l_pix"} <= set(logs)
        # frozen modules unchanged; others updated
        np.testing.assert_array_equal(
            np.asarray(state.params["quantize"]["embedding"]),
            p0["quantize"]["embedding"])
        assert not np.allclose(
            np.asarray(state.params["feat_emb"]["w"]), p0["feat_emb"]["w"])
        # EMA moved toward params
        assert state.ema_params is not None

    def test_second_step_reuses_jit(self, trainer_and_state, rng):
        tr, state = trainer_and_state
        batch = {
            "lq": jnp.asarray(rng.random((1, 2, 64, 64, 3), dtype=np.float32) - 0.5),
            "gt": jnp.asarray(rng.random((1, 2, 64, 64, 3), dtype=np.float32) - 0.5),
        }
        state, logs = tr.train_step(state, batch)
        assert np.isfinite(logs["l_total"])


class TestSRTrainer:
    def test_sr_train_step(self, rng):
        opt = {
            "model_type": "SRModel",
            "network_g": {"type": "MSRResNet", "num_feat": 8, "num_block": 1,
                          "upscale": 2},
            "train": {"pixel_opt": {"type": "L1Loss"},
                      "optim_g": {"type": "Adam", "lr": 1e-3}},
        }
        tr = SRTrainer(opt)
        state = tr.make_state(jax.random.PRNGKey(0))
        batch = {"lq": jnp.asarray(rng.random((2, 8, 8, 3), dtype=np.float32)),
                 "gt": jnp.asarray(rng.random((2, 16, 16, 3), dtype=np.float32))}
        state, logs = tr.train_step(state, batch)
        assert np.isfinite(logs["l_pix"])

    def test_self_ensemble_shapes(self, rng):
        opt = {"network_g": {"type": "MSRResNet", "num_feat": 8,
                             "num_block": 1, "upscale": 2},
               "train": {"pixel_opt": {"type": "L1Loss"}}}
        tr = SRTrainer(opt)
        params = tr.init_params(jax.random.PRNGKey(0))
        lq = jnp.asarray(rng.random((1, 8, 8, 3), dtype=np.float32))
        out = tr.test_selfensemble(params, lq)
        assert out.shape == (1, 16, 16, 3)


def test_ema_update():
    p = {"a": jnp.ones((2,))}
    e = {"a": jnp.zeros((2,))}
    out = ema_update(e, p, 0.9)
    np.testing.assert_allclose(np.asarray(out["a"]), 0.1)


def test_freeze_mask():
    params = {"generator": {"w": jnp.ones(2)}, "encoder": {"w": jnp.ones(2)}}
    mask = freeze_mask(params, ("generator",))
    assert mask["generator"]["w"] == "frozen"
    assert mask["encoder"]["w"] == "trainable"


def test_flow_loss():
    import jax.numpy as jnp
    from comfyui_keep_tpu.training.flow_losses import (flow_loss_func,
                                                       end_point_error)
    gt = jnp.ones((1, 8, 8, 2))
    preds = [gt * 0.5, gt * 0.9]
    loss, metrics = flow_loss_func(preds, gt)
    assert float(loss) > 0
    assert float(metrics["epe"]) == pytest.approx(
        float(jnp.sqrt(jnp.sum((preds[-1] - gt) ** 2, -1)).mean()), rel=1e-5)
    assert float(end_point_error(gt, gt)) == 0.0


class TestVideoRecurrentFixFlow:
    def test_iteration_conditional_flow_freeze(self, rng):
        from comfyui_keep_tpu.training.trainers import VideoRecurrentTrainer
        opt = {
            "model_type": "VideoRecurrentModel",
            "network_g": {"type": "BasicVSR", "num_feat": 8, "num_block": 1},
            "train": {"pixel_opt": {"type": "L1Loss"},
                      "optim_g": {"type": "Adam", "lr": 1e-2},
                      "fix_flow": 2, "flow_lr_mul": 0.125},
        }
        tr = VideoRecurrentTrainer(opt)
        state = tr.make_state(jax.random.PRNGKey(0))
        batch = {"lq": jnp.asarray(rng.random((1, 2, 64, 64, 3), np.float32)),
                 "gt": jnp.asarray(rng.random((1, 2, 256, 256, 3), np.float32))}
        p0 = jax.tree.map(np.asarray, state.params["spynet"])
        state, _ = tr.train_step(state, batch)  # current_iter == 1 < fix_flow
        p1 = jax.tree.map(np.asarray, state.params["spynet"])
        chex.assert_trees_all_equal(p0, p1)
        state, _ = tr.train_step(state, batch)  # current_iter == 2 -> unfrozen
        p2 = jax.tree.map(np.asarray, state.params["spynet"])
        moved = jax.tree.leaves(jax.tree.map(
            lambda a, b: not np.allclose(a, b), p1, p2))
        assert any(moved)


def test_ldl_artifact_map_parity(rng):
    """get_refined_artifact_map vs the reference loss_util.py:99-147."""
    import torch.nn.functional as F
    from comfyui_keep_tpu.training.losses import get_refined_artifact_map
    gt = rng.random((2, 12, 12, 3)).astype(np.float32)
    out = rng.random((2, 12, 12, 3)).astype(np.float32)
    ema = rng.random((2, 12, 12, 3)).astype(np.float32)
    ours = np.asarray(get_refined_artifact_map(
        jnp.asarray(gt), jnp.asarray(out), jnp.asarray(ema), 7))

    def t(a):
        return torch.from_numpy(a.transpose(0, 3, 1, 2))
    res_ema = torch.sum(torch.abs(t(gt) - t(ema)), 1, keepdim=True)
    res_sr = torch.sum(torch.abs(t(gt) - t(out)), 1, keepdim=True)
    plw = torch.var(res_sr.clone(), dim=(-1, -2, -3), keepdim=True) ** (1 / 5)
    rp = F.pad(res_sr.clone(), pad=[3] * 4, mode="reflect")
    uf = rp.unfold(2, 7, 1).unfold(3, 7, 1)
    pxw = torch.var(uf, dim=(-1, -2), unbiased=True,
                    keepdim=True).squeeze(-1).squeeze(-1)
    ref = plw * pxw
    ref[res_sr < res_ema] = 0
    np.testing.assert_allclose(ours[..., 0], ref.numpy()[:, 0],
                               atol=1e-5, rtol=1e-4)


class TestMixedPrecision:
    """train.mixed_precision: bf16 compute, f32 masters (TPU-first
    extension; the reference has no AMP path for these trainers)."""

    def _sr_opt(self, mixed):
        return {
            "model_type": "SRModel",
            "network_g": {"type": "MSRResNet", "num_feat": 8, "num_block": 1,
                          "upscale": 2},
            "train": {"pixel_opt": {"type": "L1Loss"},
                      "optim_g": {"type": "Adam", "lr": 1e-3},
                      "ema_decay": 0.99,
                      **({"mixed_precision": True} if mixed else {})},
        }

    def test_sr_step_matches_f32_and_keeps_f32_masters(self, rng):
        batch = {"lq": jnp.asarray(rng.random((2, 8, 8, 3), np.float32)),
                 "gt": jnp.asarray(rng.random((2, 16, 16, 3), np.float32))}
        losses = {}
        for mixed in (False, True):
            tr = SRTrainer(self._sr_opt(mixed))
            state = tr.make_state(jax.random.PRNGKey(0))
            state, logs = tr.train_step(state, batch)
            state, logs = tr.train_step(state, batch)
            losses[mixed] = logs["l_pix"]
            # masters, EMA and optimizer state never leave f32
            for leaf in jax.tree.leaves(state.params) + \
                    jax.tree.leaves(state.ema_params):
                assert leaf.dtype == jnp.float32
        assert np.isfinite(losses[True])
        # bf16 compute tracks the f32 loss to bf16 resolution
        np.testing.assert_allclose(losses[True], losses[False],
                                   rtol=2e-2, atol=2e-3)

    def test_keep_step_mixed(self, rng):
        from comfyui_keep_tpu.models.vqgan import VQHQEncoder
        opt = {
            "model_type": "KEEPModel",
            "network_g": {"type": "KEEP", **TINY,
                          "fix_modules": ["quantize", "generator"]},
            "train": {
                "use_hq_feat_loss": True, "cross_entropy_loss": True,
                "pixel_opt": {"type": "L1Loss", "loss_weight": 1.0},
                "temporal_opt": {"type": "L1Loss", "loss_weight": 0.1},
                "temporal_warp_type": "GT",
                "optim_g": {"type": "Adam", "lr": 1e-3},
                "mixed_precision": True,
            },
        }
        hq = VQHQEncoder.init(jax.random.PRNGKey(3), img_size=64, nf=32,
                              ch_mult=(1, 2, 2), res_blocks=2,
                              attn_resolutions=(16,), codebook_size=64,
                              emb_dim=32)
        tr = KEEPTrainer(opt, hq_vqgan_params=hq)
        # frozen aux nets ride the compute dtype
        assert all(l.dtype == jnp.bfloat16
                   for l in jax.tree.leaves(tr.hq_vqgan_params))
        state = tr.make_state(jax.random.PRNGKey(0))
        batch = {
            "lq": jnp.asarray(rng.random((1, 2, 64, 64, 3), np.float32) - .5),
            "gt": jnp.asarray(rng.random((1, 2, 64, 64, 3), np.float32) - .5),
        }
        p0 = jax.tree.map(np.asarray, state.params)
        state, logs = tr.train_step(state, batch)
        assert all(np.isfinite(v) for v in logs.values())
        for leaf in jax.tree.leaves(state.params):
            assert leaf.dtype == jnp.float32
        assert not np.allclose(np.asarray(state.params["feat_emb"]["w"]),
                               p0["feat_emb"]["w"])

    def test_srgan_gan_step_mixed(self, rng):
        from comfyui_keep_tpu.training.trainers import build_model
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
                      "optim_d": {"type": "Adam", "lr": 1e-4},
                      "mixed_precision": True},
        }
        tr = build_model(opt)
        state = tr.make_state(jax.random.PRNGKey(0))
        batch = {"lq": jnp.asarray(rng.random((1, 16, 16, 3), np.float32)),
                 "gt": jnp.asarray(rng.random((1, 32, 32, 3), np.float32))}
        state, logs = tr.gan_train_step(state, batch, current_iter=1)
        assert {"l_g_pix", "l_g_gan", "l_d"} <= set(logs)
        assert all(np.isfinite(v) for v in logs.values())
        for leaf in jax.tree.leaves(state.params) + \
                jax.tree.leaves(tr.d_params):
            assert leaf.dtype == jnp.float32


def test_gradient_accumulation(rng):
    """train.accumulate_steps=2: params move once per 2 micro-steps
    (optax.MultiSteps window), matching a single step on averaged grads."""
    opt = {
        "model_type": "SRModel",
        "network_g": {"type": "MSRResNet", "num_feat": 8, "num_block": 1,
                      "upscale": 2},
        "train": {"pixel_opt": {"type": "L1Loss"},
                  "optim_g": {"type": "Adam", "lr": 1e-3},
                  "accumulate_steps": 2},
    }
    tr = SRTrainer(opt)
    state = tr.make_state(jax.random.PRNGKey(0))
    batch = {"lq": jnp.asarray(rng.random((2, 8, 8, 3), np.float32)),
             "gt": jnp.asarray(rng.random((2, 16, 16, 3), np.float32))}
    p0 = jax.tree.map(np.asarray, state.params)
    state, logs = tr.train_step(state, batch)
    np.testing.assert_array_equal(  # mid-window: grads held, params frozen
        np.asarray(jax.tree.leaves(state.params)[0]), jax.tree.leaves(p0)[0])
    state, logs = tr.train_step(state, batch)
    assert not np.allclose(np.asarray(jax.tree.leaves(state.params)[0]),
                           jax.tree.leaves(p0)[0])
    assert np.isfinite(logs["l_pix"])


def test_resume_restores_weights_and_optimizer(tmp_path, rng):
    """Interrupt/resume equivalence: save at iter 2, rebuild the trainer
    fresh, resume, take one more step — bitwise-equal to the uninterrupted
    3-step run (weights AND Adam moments both restored; the reference's
    resume_training restores optimizers, base_model.py)."""
    from comfyui_keep_tpu.training.state import TrainState

    def make(seed=0):
        opt = {
            "model_type": "SRModel",
            "network_g": {"type": "MSRResNet", "num_feat": 8, "num_block": 1,
                          "upscale": 2},
            "train": {"pixel_opt": {"type": "L1Loss"},
                      "optim_g": {"type": "Adam", "lr": 1e-3},
                      "ema_decay": 0.99},
        }
        tr = SRTrainer(opt)
        return tr, tr.make_state(jax.random.PRNGKey(seed))

    batches = [{"lq": jnp.asarray(rng.random((2, 8, 8, 3), np.float32)),
                "gt": jnp.asarray(rng.random((2, 16, 16, 3), np.float32))}
               for _ in range(3)]

    # uninterrupted 3-step run
    tr, state = make()
    for b in batches:
        state, _ = tr.train_step(state, b, rng=jax.random.PRNGKey(7))
    straight = jax.tree.map(np.asarray, state.params)

    # 2 steps, save, fresh trainer, resume, 1 more step
    tr1, s1 = make()
    for b in batches[:2]:
        s1, _ = tr1.train_step(s1, b, rng=jax.random.PRNGKey(7))
    s1.save(str(tmp_path / "models"), str(tmp_path / "states"), 2)

    tr2, s2 = make(seed=123)  # different init: restore must overwrite it
    latest = TrainState.latest_state(str(tmp_path / "states"))
    opt_data = s2.resume(latest)
    s2.resume_optimizer(opt_data)
    from comfyui_keep_tpu.training.state import graft_tree
    from comfyui_keep_tpu.utils.checkpoint import load_npz
    net = load_npz(str(tmp_path / "models" / "net_g_2.npz"))
    s2.params = graft_tree(s2.params, net["params"])
    s2.ema_params = graft_tree(s2.ema_params, net["params_ema"])
    assert s2.iter == 2
    s2, _ = tr2.train_step(s2, batches[2], rng=jax.random.PRNGKey(7))

    for a, b in zip(jax.tree.leaves(straight), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7,
                                   rtol=1e-6)


def test_train_pipeline_auto_resume_loads_weights(tmp_path, rng):
    """train_pipeline --auto_resume must reload net_g_<iter>.npz, not just
    the iteration counter."""
    import cv2
    from comfyui_keep_tpu.training.train import train_pipeline
    for sub, size in (("gt", 32), ("lq", 16)):
        d = tmp_path / sub
        d.mkdir()
        for i in range(3):
            cv2.imwrite(str(d / f"{i:03d}.png"),
                        (rng.random((size, size, 3)) * 255).astype(np.uint8))
    opt = {
        "name": "resume_t", "is_train": True, "manual_seed": 0,
        "model_type": "SRModel",
        "network_g": {"type": "MSRResNet", "num_feat": 8, "num_block": 1,
                      "upscale": 2},
        "datasets": {"train": {
            "type": "PairedImageDataset", "dataroot_gt": str(tmp_path / "gt"),
            "dataroot_lq": str(tmp_path / "lq"), "gt_size": 16, "scale": 2,
            "use_hflip": False, "use_rot": False, "batch_size_per_gpu": 1,
        }},
        "train": {"total_iter": 2, "pixel_opt": {"type": "L1Loss"},
                  "optim_g": {"type": "Adam", "lr": 1e-3}},
        "logger": {"print_freq": 10, "save_checkpoint_freq": 2},
        "path": {"experiments_root": str(tmp_path / "exp"),
                 "models": str(tmp_path / "exp/models"),
                 "training_states": str(tmp_path / "exp/training_states"),
                 "log": str(tmp_path / "exp"),
                 "visualization": str(tmp_path / "exp/vis")},
    }
    state, _ = train_pipeline(opt, use_mesh=False)
    saved = jax.tree.map(np.asarray, state.params)

    opt2 = {**opt, "auto_resume": True}
    state2, _ = train_pipeline(opt2, use_mesh=False)  # total_iter reached
    assert state2.iter == 2
    for a, b in zip(jax.tree.leaves(saved), jax.tree.leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_schedulers_trace_compatible():
    """Schedules must accept the traced optax count inside the jitted train
    step (int()/bisect raised ConcretizationTypeError before) and agree
    with their concrete-step values."""
    from comfyui_keep_tpu.training.schedulers import (
        build_scheduler, with_warmup)
    scheds = [
        build_scheduler({"type": "MultiStepLR",
                         "milestones": [3, 7, 9], "gamma": 0.5}),
        build_scheduler({"type": "MultiStepRestartLR",
                         "milestones": [2, 5], "gamma": 0.1,
                         "restarts": [0, 6], "restart_weights": [1, 0.5]}),
        build_scheduler({"type": "CosineAnnealingRestartLR",
                         "periods": [4, 6], "restart_weights": [1, 0.7],
                         "eta_min": 1e-7, "base_lr": 1e-4}),
    ]
    for sched in scheds:
        for s in (sched, with_warmup(sched, 3)):
            traced = jax.jit(lambda i: s(i))
            for step in range(12):
                np.testing.assert_allclose(float(traced(step)), s(step),
                                           rtol=1e-5, atol=1e-8)
