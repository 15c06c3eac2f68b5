"""Model trainers — TPU-native equivalents of the reference model wrappers
(models/sr_model.py, keep_model.py, keep_gan_model.py, video_*_model.py).

Design: each trainer owns pure loss functions + ONE jitted train step, data-
parallel over a jax.sharding Mesh (the DDP replacement, SURVEY.md §2.10):
params replicated, batch sharded on axis 'data', gradients reduced by XLA
(implicit psum from the sharding). EMA, LR schedules, checkpoint/resume live
in training/state.py.
"""
from typing import Any, Callable, Dict, Optional

import numpy as np

import comfyui_keep_tpu.models  # noqa: F401 — populate ARCH_REGISTRY

from comfyui_keep_tpu.training.losses import build_loss
from comfyui_keep_tpu.training.schedulers import build_scheduler, with_warmup
from comfyui_keep_tpu.training.state import (TrainState, build_optimizer,
                                             ema_update, masked_optimizer,
                                             freeze_mask)
from comfyui_keep_tpu.utils.registry import MODEL_REGISTRY


def _make_mesh(n_devices: Optional[int] = None):
    import jax
    from jax.sharding import Mesh
    devs = jax.devices() if n_devices is None else jax.devices()[:n_devices]
    return Mesh(np.array(devs), ("data",))


class BaseTrainer:
    """Shared plumbing (reference BaseModel, models/base_model.py:13-392)."""

    def __init__(self, opt: Dict, mesh=None):
        self.opt = opt
        self.mesh = mesh
        train_opt = opt.get("train", {})
        self.ema_decay = train_opt.get("ema_decay", 0)
        sched_opt = train_opt.get("scheduler")
        self.schedule = None
        if sched_opt:
            self.schedule = with_warmup(build_scheduler(sched_opt),
                                        train_opt.get("warmup_iter", -1))
        # train.mixed_precision: true|"bfloat16" — bf16 network compute with
        # f32 master weights / optimizer / EMA (the standard TPU recipe; no
        # loss scaling needed, bf16 keeps f32's exponent range). Grads reach
        # the optimizer in f32 through the cast's VJP. The reference has no
        # AMP path for these trainers; this is a TPU-first extension.
        mp = train_opt.get("mixed_precision", False)
        self.compute_dtype = None
        if mp:
            self.compute_dtype = "bfloat16" if mp is True else str(mp)
        self._step_fn = None

    def _cast_compute(self, tree):
        """Cast every floating leaf to the compute dtype (no-op if off)."""
        if not self.compute_dtype:
            return tree
        import jax
        import jax.numpy as jnp
        dt = jnp.dtype(self.compute_dtype)
        return jax.tree.map(
            lambda a: a.astype(dt)
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
            else a, tree)

    def _compute_loss_fn(self):
        """loss_fn for the jitted step: identity in full precision; under
        mixed precision the network sees bf16 params/batch and the scalar
        loss/aux are upcast so the optimizer math stays f32."""
        if not self.compute_dtype:
            return self.loss_fn
        import jax
        import jax.numpy as jnp

        def wrapped(params, batch, rng):
            loss, aux = self.loss_fn(self._cast_compute(params),
                                     self._cast_compute(batch), rng)
            return (jnp.asarray(loss, jnp.float32),
                    jax.tree.map(lambda v: jnp.asarray(v, jnp.float32), aux))
        return wrapped

    def _accum_steps(self) -> int:
        return int(self.opt.get("train", {}).get("accumulate_steps", 1))

    def _wrap_accum(self, tx):
        """train.accumulate_steps: k micro-batches per optimizer step (grads
        averaged by optax.MultiSteps; params/LR schedule advance once per
        window). Large effective batches without the HBM of a large batch —
        a TPU-first extension, no reference equivalent. Every
        make_optimizer override must end with this wrap, or the option is a
        silent no-op for that model type."""
        accum = self._accum_steps()
        if accum > 1:
            import optax
            tx = optax.MultiSteps(tx, every_k_schedule=accum)
        return tx

    def current_lr(self, it: int) -> float:
        """Effective generator LR at iteration `it` (schedules return a
        multiplier of the base LR — see build_optimizer/schedulers). Under
        accumulate_steps=k the schedule inside the optimizer advances once
        per k micro-batches (MultiSteps inner count), so the logged position
        is it // k — otherwise the logged LR decays k times faster than the
        applied one."""
        t = self.opt.get("train", {})
        base = float(t.get("optim_g", {}).get("lr", t.get("lr", 0.0)))
        if self.schedule is not None:
            return base * float(self.schedule(it // self._accum_steps()))
        return base

    def _tp_axis(self):
        """Mesh axis name for tensor parallelism, if the mesh has one."""
        if self.mesh is not None and "model" in self.mesh.axis_names \
                and int(self.mesh.shape["model"]) > 1:
            return "model"
        return None

    # subclasses define: init_params(key), loss_fn(params, batch, rngs)
    def make_state(self, key) -> TrainState:
        import jax
        params = self.init_params(key)
        if self._tp_axis():
            # Megatron-style column/row param shards; tx.init and the EMA
            # copy inherit the committed shardings leaf-by-leaf.
            from ..parallel.tensor import shard_params
            params = shard_params(params, self.mesh, self._tp_axis())
        tx = self.make_optimizer(params)
        self.tx = tx
        opt_state = tx.init(params)
        ema = jax.tree.map(lambda x: x, params) if self.ema_decay > 0 else None
        return TrainState(params=params, opt_state=opt_state, ema_params=ema)

    def make_optimizer(self, params):
        train_opt = self.opt.get("train", {})
        tx = build_optimizer(dict(train_opt.get("optim_g", {"type": "Adam", "lr": 1e-4})),
                             schedule=self.schedule)
        frozen = tuple(self.opt.get("network_g", {}).get("fix_modules", ()) or ())
        if frozen:
            tx = masked_optimizer(tx, params, frozen)
        return self._wrap_accum(tx)

    def train_step(self, state: TrainState, batch, rng=None):
        import jax
        import optax
        if self._step_fn is None:
            loss_fn = self._compute_loss_fn()

            def step(params, opt_state, ema, batch, rng):
                (loss, loss_dict), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params, batch, rng)
                updates, opt_state = self.tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                if ema is not None:
                    ema = ema_update(ema, params, self.ema_decay)
                return params, opt_state, ema, loss_dict

            if self.mesh is not None and self._tp_axis():
                # dp x tp: params/opt_state/ema arrive committed with their
                # tensor-parallel shardings (make_state); only the batch
                # needs placing. GSPMD inserts the activation all-reduces.
                self._step_fn = jax.jit(step)
            elif self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                repl = NamedSharding(self.mesh, P())
                dp = NamedSharding(self.mesh, P("data"))
                self._step_fn = jax.jit(
                    step, in_shardings=(repl, repl, repl, dp, repl),
                    out_shardings=(repl, repl, repl, repl))
            else:
                self._step_fn = jax.jit(step)
        import jax as _j
        rng = rng if rng is not None else _j.random.PRNGKey(state.iter)
        if self._tp_axis():
            from jax.sharding import NamedSharding, PartitionSpec as P
            batch = _j.device_put(batch, NamedSharding(self.mesh, P("data")))
        params, opt_state, ema, loss_dict = self._step_fn(
            state.params, state.opt_state, state.ema_params, batch, rng)
        state.params, state.opt_state, state.ema_params = params, opt_state, ema
        state.iter += 1
        return state, {k: float(v) for k, v in loss_dict.items()}


@MODEL_REGISTRY.register(name="SRModel")
class SRTrainer(BaseTrainer):
    """Single-image SR trainer (models/sr_model.py:15-279): pixel +
    perceptual losses; test() with optional x8 self-ensemble."""

    def __init__(self, opt, mesh=None, feature_fn=None):
        super().__init__(opt, mesh)
        train_opt = opt.get("train", {})
        self.cri_pix = build_loss(train_opt["pixel_opt"]) \
            if train_opt.get("pixel_opt") else None
        self.cri_perceptual = None
        if train_opt.get("perceptual_opt"):
            self.cri_perceptual = build_loss(train_opt["perceptual_opt"],
                                             feature_fn=feature_fn)
        net = dict(opt["network_g"])
        from comfyui_keep_tpu.utils.registry import ARCH_REGISTRY
        self.arch = ARCH_REGISTRY.get(net.pop("type"))
        net.pop("fix_modules", None)
        self.net_cfg = net

    def init_params(self, key):
        return self.arch.init(key, **self.net_cfg)

    def forward(self, params, lq):
        return self.arch.apply(params, lq, **{
            k: v for k, v in self.net_cfg.items()
            if k in ("upscale", "scale", "act_type")})

    def loss_fn(self, params, batch, rng):
        import jax.numpy as jnp
        out = self.forward(params, batch["lq"])
        total = 0.0
        loss_dict = {}
        if self.cri_pix is not None:
            l_pix = self.cri_pix(out, batch["gt"])
            total += l_pix
            loss_dict["l_pix"] = l_pix
        if self.cri_perceptual is not None:
            l_p, l_s = self.cri_perceptual(out, batch["gt"])
            if l_p is not None:
                total += l_p
                loss_dict["l_percep"] = l_p
            if l_s is not None:
                total += l_s
                loss_dict["l_style"] = l_s
        loss_dict["l_total"] = total
        return total, loss_dict

    def test_selfensemble(self, params, lq):
        """x8 flip/transpose ensemble (sr_model.py self-ensemble)."""
        outs = []

        def tf(x, hf, vf, tr):
            if hf:
                x = x[:, :, ::-1]
            if vf:
                x = x[:, ::-1]
            if tr:
                x = x.transpose(0, 2, 1, 3)
            return x

        for hf in (False, True):
            for vf in (False, True):
                for tr in (False, True):
                    y = self.forward(params, tf(lq, hf, vf, tr))
                    if tr:
                        y = y.transpose(0, 2, 1, 3)
                    if vf:
                        y = y[:, ::-1]
                    if hf:
                        y = y[:, :, ::-1]
                    outs.append(y)
        return sum(outs) / len(outs)


@MODEL_REGISTRY.register(name="KEEPModel")
class KEEPTrainer(BaseTrainer):
    """KEEP stage II/III trainer (models/keep_model.py:17-242).

    Losses: HQ-feat codebook L2 (:147-154), cross-entropy on codebook logits
    vs frozen VQHQEncoder GT indices (:127-133, 157-162), temporal
    flow-warped feature consistency over gen_feat_dict (:165-210), pixel,
    perceptual (:213-234).
    """

    def __init__(self, opt, mesh=None, feature_fn=None,
                 hq_vqgan_params=None, gmflow_params=None):
        super().__init__(opt, mesh)
        from comfyui_keep_tpu.models.keep import KEEP
        self.KEEP = KEEP
        cfg = dict(opt["network_g"])
        cfg.pop("type", None)
        self.fix_modules = tuple(cfg.pop("fix_modules", ("quantize", "generator")))
        self.cfg = KEEP.config(cfg.pop("variant", "KEEP"), **cfg)

        t = opt.get("train", {})
        self.hq_feat_loss = t.get("use_hq_feat_loss", False)
        self.feat_loss_weight = t.get("feat_loss_weight", 1.0)
        self.cross_entropy_loss = t.get("cross_entropy_loss", False)
        self.entropy_loss_weight = t.get("entropy_loss_weight", 0.5)
        self.cri_pix = build_loss(t["pixel_opt"]) if t.get("pixel_opt") else None
        self.cri_perceptual = build_loss(t["perceptual_opt"], feature_fn=feature_fn) \
            if t.get("perceptual_opt") else None
        self.cri_temporal = build_loss(t["temporal_opt"]) if t.get("temporal_opt") else None
        self.temporal_type = t.get("temporal_warp_type", "GT")
        # frozen aux nets ride the compute dtype too (they are closure
        # constants, not optimizer state — nothing to keep in f32)
        self.hq_vqgan_params = self._cast_compute(hq_vqgan_params)
        self.gmflow_params = self._cast_compute(gmflow_params)

    def init_params(self, key):
        return self.KEEP.init(key, **self.cfg)

    def make_optimizer(self, params):
        train_opt = self.opt.get("train", {})
        tx = build_optimizer(dict(train_opt.get("optim_g", {"type": "Adam", "lr": 1e-4})),
                             schedule=self.schedule)
        if self.fix_modules:
            tx = masked_optimizer(tx, params, self.fix_modules)
        return self._wrap_accum(tx)

    def _gt_indices(self, gt):
        """Frozen VQHQEncoder top-1 codebook indices of the GT frames."""
        import jax
        import jax.numpy as jnp
        from comfyui_keep_tpu.models.vqgan import (VQAutoEncoder, blocks_apply,
                                                   vq_indices)
        b, tt = gt.shape[:2]
        enc_plan, _ = VQAutoEncoder.make_plans(img_size=self.cfg["img_size"],
                                               nf=self.cfg["nf"],
                                               ch_mult=self.cfg["ch_mult"],
                                               res_blocks=self.cfg["res_blocks"],
                                               attn_resolutions=self.cfg["attn_resolutions"],
                                               emb_dim=self.cfg["emb_dim"])
        x = gt.reshape((-1,) + gt.shape[2:])
        z = blocks_apply(self.hq_vqgan_params["encoder"], enc_plan, x)
        idx, _ = vq_indices(self.hq_vqgan_params["quantize"], z)
        return jax.lax.stop_gradient(idx.reshape(b * tt, -1))

    def _flows(self, clip):
        import jax.numpy as jnp
        if self.gmflow_params is None:  # static-scene fallback (tests/tools)
            b, t, h, w, _ = clip.shape
            return jnp.zeros((b, t - 1, h, w, 2), clip.dtype)
        from comfyui_keep_tpu.models.gmflow import flow_from_clip
        return flow_from_clip(self.gmflow_params, clip)

    def forward(self, params, lq):
        """Eval forward for validation/test (keep_model.py test(): net_g on
        the lq clip with its flows)."""
        return self.KEEP.apply(params, lq, flows=self._flows(lq), **self.cfg)

    def loss_fn(self, params, batch, rng):
        total, loss_dict, _ = self._loss_outs(params, batch, rng)
        return total, loss_dict

    def _loss_outs(self, params, batch, rng):
        """(total, loss_dict, outs) — the GAN subclass needs the restored
        frames for the adversarial term, and re-running KEEP.apply for them
        would double the generator forward per step."""
        import jax
        import jax.numpy as jnp
        import optax
        from comfyui_keep_tpu.ops.warp import flow_warp, resize_flow

        lq, gt = batch["lq"], batch["gt"]
        flows = self._flows(lq) if self.gmflow_params is not None else None
        outs, aux = self.KEEP.apply(params, lq, flows=flows, detach_16=True,
                                    return_aux=True, **self.cfg)
        total = 0.0
        loss_dict = {}
        b, tt = gt.shape[:2]

        if self.hq_feat_loss or self.cross_entropy_loss:
            idx_gt = self._gt_indices(gt)

        if self.hq_feat_loss:
            from comfyui_keep_tpu.models.vqgan import vq_lookup
            hl = aux["lq_feat"].shape[1]
            quant_gt = vq_lookup(params["quantize"], idx_gt).reshape(
                b * tt, hl, hl, -1)
            l_feat = jnp.mean((jax.lax.stop_gradient(quant_gt) -
                               aux["lq_feat"]) ** 2) * self.feat_loss_weight
            total += l_feat
            loss_dict["l_feat_encoder"] = l_feat

        if self.cross_entropy_loss:
            ce = optax.softmax_cross_entropy_with_integer_labels(
                aux["logits"], idx_gt).mean() * self.entropy_loss_weight
            total += ce
            loss_dict["l_cross_entropy"] = ce

        if self.cri_temporal is not None and aux["gen_feat_dict"]:
            if self.temporal_type == "GT":
                tflows = jax.lax.stop_gradient(self._flows(gt))
            elif self.temporal_type == "HR":
                tflows = jax.lax.stop_gradient(self._flows(outs))
            else:  # Diff
                gt_f = jax.lax.stop_gradient(self._flows(gt))
                hr_f = jax.lax.stop_gradient(self._flows(outs))
            l_temporal = 0.0
            for f_size, feat in aux["gen_feat_dict"].items():
                _, _, fh, fw, fc = feat.shape
                prev = feat[:, :-1].reshape(-1, fh, fw, fc)
                curr = feat[:, 1:].reshape(-1, fh, fw, fc)
                if self.temporal_type in ("GT", "HR"):
                    fl = resize_flow(tflows.reshape((-1,) + tflows.shape[2:]),
                                     (fh, fw))
                    l_temporal += self.cri_temporal(curr, flow_warp(prev, fl))
                else:
                    gfl = resize_flow(gt_f.reshape((-1,) + gt_f.shape[2:]), (fh, fw))
                    hfl = resize_flow(hr_f.reshape((-1,) + hr_f.shape[2:]), (fh, fw))
                    l_temporal += self.cri_temporal(flow_warp(prev, gfl),
                                                    flow_warp(prev, hfl))
            total += l_temporal
            loss_dict["l_temporal"] = l_temporal

        if self.cri_pix is not None:
            l_pix = self.cri_pix(outs, gt)
            total += l_pix
            loss_dict["l_pix"] = l_pix

        if self.cri_perceptual is not None:
            flat_out = outs.reshape((-1,) + outs.shape[2:])
            flat_gt = gt.reshape((-1,) + gt.shape[2:])
            res = self.cri_perceptual(flat_out, flat_gt)
            if isinstance(res, tuple):
                l_p, l_s = res
                if l_p is not None:
                    total += l_p
                    loss_dict["l_percep"] = l_p
                if l_s is not None:
                    total += l_s
                    loss_dict["l_style"] = l_s
            else:
                total += res
                loss_dict["l_percep"] = res

        loss_dict["l_total"] = total
        return total, loss_dict, outs


@MODEL_REGISTRY.register(name="KEEPGANModel")
class KEEPGANTrainer(KEEPTrainer):
    """Adds a 3D discriminator with g/d alternation and net_d_start_iter
    gating (models/keep_gan_model.py:17-303)."""

    def __init__(self, opt, mesh=None, **kw):
        super().__init__(opt, mesh, **kw)
        t = opt.get("train", {})
        self.cri_gan = build_loss(t["gan_opt"]) if t.get("gan_opt") else None
        self.net_d_iters = t.get("net_d_iters", 1)
        self.net_d_start_iter = t.get("net_d_start_iter", 0)
        from comfyui_keep_tpu.models.vqgan import Discriminator3D
        self.disc = Discriminator3D
        self._d_step = None

    def make_state(self, key):
        import jax
        state = super().make_state(key)
        kd = jax.random.fold_in(key, 777)
        self.d_params = self.disc.init(kd, **self.opt.get("network_d", {}).get("args", {}))
        self.tx_d = build_optimizer(dict(self.opt["train"].get(
            "optim_d", {"type": "Adam", "lr": 1e-4})), schedule=self.schedule)
        self.d_opt_state = self.tx_d.init(self.d_params)
        return state

    def extra_state(self):
        """Trainer-owned checkpoint extra: the discriminator + its optimizer
        (the reference saves net_d_<iter>.pth and its optimizer in the
        .state file, base_model.py:207-252 — without this a resumed GAN run
        pairs a trained generator with a fresh random discriminator)."""
        return {"d_params": self.d_params, "d_opt_state": self.d_opt_state}

    def load_extra_state(self, data):
        from comfyui_keep_tpu.training.state import graft_tree
        from comfyui_keep_tpu.utils.logger import get_root_logger
        if not data:
            get_root_logger().warning(
                "resume state has no discriminator snapshot; the GAN "
                "discriminator continues from fresh init")
            return
        self.d_params = graft_tree(self.d_params, data.get("d_params"))
        self.d_opt_state = graft_tree(self.d_opt_state,
                                      data.get("d_opt_state"))

    def train_step(self, state, batch, rng=None):
        """train_pipeline entry point: dispatch to the g/d alternation
        (without this the GAN model types would silently train generator-
        only through BaseTrainer.train_step)."""
        return self.gan_train_step(state, batch,
                                   current_iter=state.iter + 1, rng=rng)

    def _gan_step_fns(self, use_gan):
        """Jitted g and d updates, cached per use_gan variant — the training
        hot loop must run as compiled programs, not op-by-op dispatch (the
        generator-only BaseTrainer.train_step is jitted; the adversarial
        path gets the same treatment)."""
        if not hasattr(self, "_gan_jit_cache"):
            self._gan_jit_cache = {}
        key = bool(use_gan)
        if key in self._gan_jit_cache:
            return self._gan_jit_cache[key]
        import jax
        import optax

        def g_loss(params, d_params, batch, rng):
            params = self._cast_compute(params)       # bf16 compute path
            d_params = self._cast_compute(d_params)   # (identity when off);
            batch = self._cast_compute(batch)         # grads exit f32 via the
            total, loss_dict, outs = self._loss_outs(params, batch, rng)
            if use_gan:
                fake_pred = self.disc.apply(d_params, outs)
                l_gan = self.cri_gan(fake_pred, True, is_disc=False)
                total = total + l_gan
                loss_dict["l_g_gan"] = l_gan
            return total, (loss_dict, outs)

        def g_step(params, opt_state, ema, d_params, batch, rng):
            (_, (loss_dict, outs)), grads = jax.value_and_grad(
                g_loss, has_aux=True)(params, d_params, batch, rng)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if ema is not None:
                ema = ema_update(ema, params, self.ema_decay)
            return params, opt_state, ema, loss_dict, outs

        def d_loss(dp, real, fake):
            dp = self._cast_compute(dp)
            real_pred = self.disc.apply(dp, self._cast_compute(real))
            fake_pred = self.disc.apply(
                dp, jax.lax.stop_gradient(self._cast_compute(fake)))
            l_real = self.cri_gan(real_pred, True, is_disc=True)
            l_fake = self.cri_gan(fake_pred, False, is_disc=True)
            return l_real + l_fake, (l_real, l_fake)

        def d_step(d_params, d_opt_state, real, fake):
            (loss, (lr_, lf_)), grads = jax.value_and_grad(
                d_loss, has_aux=True)(d_params, real, fake)
            updates, d_opt_state = self.tx_d.update(grads, d_opt_state,
                                                    d_params)
            d_params = optax.apply_updates(d_params, updates)
            return d_params, d_opt_state, (loss, lr_, lf_)

        fns = (jax.jit(g_step), jax.jit(d_step))
        self._gan_jit_cache[key] = fns
        return fns

    def gan_train_step(self, state, batch, current_iter, rng=None):
        """One g/d alternation (keep_gan_model.py:262-296): generator update
        with GAN term once current_iter >= net_d_start_iter, then a
        discriminator update on (gt, output)."""
        import jax

        use_gan = self.cri_gan is not None and current_iter >= self.net_d_start_iter
        rng = rng if rng is not None else jax.random.PRNGKey(current_iter)
        g_step, d_step = self._gan_step_fns(use_gan)

        state.params, state.opt_state, state.ema_params, loss_dict, outs = \
            g_step(state.params, state.opt_state, state.ema_params,
                   self.d_params, batch, rng)
        loss_dict = dict(loss_dict)
        if use_gan:
            self.d_params, self.d_opt_state, (ld, lr_, lf_) = d_step(
                self.d_params, self.d_opt_state, batch["gt"], outs)
            loss_dict.update({"l_d": ld, "l_d_real": lr_, "l_d_fake": lf_})
        state.iter += 1
        return state, {k: float(v) for k, v in loss_dict.items()}

    def d_train_step(self, d_params, d_opt_state, real, fake):
        """Standalone discriminator update (kept for direct callers/tests)."""
        _, d_step = self._gan_step_fns(True)
        d_params, d_opt_state, (loss, lr_, lf_) = d_step(
            d_params, d_opt_state, real, fake)
        return d_params, d_opt_state, {"l_d": float(loss),
                                       "l_d_real": float(lr_),
                                       "l_d_fake": float(lf_)}


@MODEL_REGISTRY.register(name="SRGANModel")
class SRGANTrainer(SRTrainer):
    """GAN-based SR trainer (models/srgan_model.py, also the base of
    ESRGANModel / RealESRGANModel): pixel + perceptual + GAN losses with g/d
    alternation, net_d_iters / net_d_init_iters gating."""

    def __init__(self, opt, mesh=None, feature_fn=None):
        super().__init__(opt, mesh, feature_fn)
        t = opt.get("train", {})
        self.cri_gan = build_loss(t["gan_opt"]) if t.get("gan_opt") else None
        self.net_d_iters = t.get("net_d_iters", 1)
        self.net_d_init_iters = t.get("net_d_init_iters", 0)
        from comfyui_keep_tpu.utils.registry import ARCH_REGISTRY
        d_opt = dict(opt.get("network_d", {"type": "UNetDiscriminatorSN"}))
        self.d_arch = ARCH_REGISTRY.get(d_opt.pop("type"))
        self.d_cfg = d_opt
        import inspect
        sig = inspect.signature(self.d_arch.apply)
        self._d_apply_cfg = {k: v for k, v in d_opt.items()
                             if k in sig.parameters}

    def make_state(self, key):
        import jax
        state = super().make_state(key)
        self.d_params = self.d_arch.init(jax.random.fold_in(key, 777),
                                         **self.d_cfg)
        self.tx_d = build_optimizer(dict(self.opt["train"].get(
            "optim_d", {"type": "Adam", "lr": 1e-4})), schedule=self.schedule)
        self.d_opt_state = self.tx_d.init(self.d_params)
        return state

    def extra_state(self):
        """Discriminator + optimizer for checkpoint/resume (see
        KEEPGANTrainer.extra_state)."""
        return {"d_params": self.d_params, "d_opt_state": self.d_opt_state}

    def load_extra_state(self, data):
        from comfyui_keep_tpu.training.state import graft_tree
        from comfyui_keep_tpu.utils.logger import get_root_logger
        if not data:
            get_root_logger().warning(
                "resume state has no discriminator snapshot; the GAN "
                "discriminator continues from fresh init")
            return
        self.d_params = graft_tree(self.d_params, data.get("d_params"))
        self.d_opt_state = graft_tree(self.d_opt_state,
                                      data.get("d_opt_state"))

    def train_step(self, state, batch, rng=None):
        """train_pipeline entry point: dispatch to the g/d alternation
        (without this the GAN model types would silently train generator-
        only through BaseTrainer.train_step)."""
        return self.gan_train_step(state, batch, current_iter=state.iter + 1)

    def _gan_step_fns(self):
        """Jitted (g_step, fwd, d_step) — the hot loop runs compiled
        programs, not op-by-op eager dispatch."""
        if hasattr(self, "_gan_jit_cache"):
            return self._gan_jit_cache
        import jax
        import optax

        def g_loss(params, d_params, batch):
            params = self._cast_compute(params)      # bf16 compute, f32 grads
            d_params = self._cast_compute(d_params)  # (identity when off)
            batch = self._cast_compute(batch)
            out = self.forward(params, batch["lq"])
            total, loss_dict = 0.0, {}
            if self.cri_pix is not None:
                l_pix = self.cri_pix(out, batch["gt"])
                total += l_pix
                loss_dict["l_g_pix"] = l_pix
            if self.cri_perceptual is not None:
                l_p, l_s = self.cri_perceptual(out, batch["gt"])
                if l_p is not None:
                    total += l_p
                    loss_dict["l_g_percep"] = l_p
                if l_s is not None:
                    total += l_s
                    loss_dict["l_g_style"] = l_s
            if self.cri_gan is not None:
                fake_pred = self.d_arch.apply(d_params, out, **self._d_apply_cfg)
                l_gan = self.cri_gan(fake_pred, True, is_disc=False)
                total += l_gan
                loss_dict["l_g_gan"] = l_gan
            return total, (loss_dict, out)

        def g_step(params, opt_state, ema, d_params, batch):
            (_, (logs, out)), grads = jax.value_and_grad(
                g_loss, has_aux=True)(params, d_params, batch)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if ema is not None:
                ema = ema_update(ema, params, self.ema_decay)
            return params, opt_state, ema, logs, out

        def fwd(params, lq):
            return self.forward(self._cast_compute(params),
                                self._cast_compute(lq))

        def d_loss(dp, real, fake):
            dp = self._cast_compute(dp)
            real_pred = self.d_arch.apply(dp, self._cast_compute(real),
                                          **self._d_apply_cfg)
            l_real = self.cri_gan(real_pred, True, is_disc=True)
            fake_pred = self.d_arch.apply(
                dp, jax.lax.stop_gradient(self._cast_compute(fake)),
                **self._d_apply_cfg)
            l_fake = self.cri_gan(fake_pred, False, is_disc=True)
            return l_real + l_fake, (l_real, l_fake)

        def d_step(d_params, d_opt_state, real, fake):
            (ld, (lr_, lf_)), dgrads = jax.value_and_grad(
                d_loss, has_aux=True)(d_params, real, fake)
            dupd, d_opt_state = self.tx_d.update(dgrads, d_opt_state,
                                                 d_params)
            d_params = optax.apply_updates(d_params, dupd)
            return d_params, d_opt_state, (ld, lr_, lf_)

        self._gan_jit_cache = (jax.jit(g_step), jax.jit(fwd), jax.jit(d_step))
        return self._gan_jit_cache

    def gan_train_step(self, state, batch, current_iter):
        train_g = (current_iter % self.net_d_iters == 0 and
                   current_iter >= self.net_d_init_iters)
        g_step, fwd, d_step = self._gan_step_fns()

        logs = {}
        if train_g:
            state.params, state.opt_state, state.ema_params, logs, out = \
                g_step(state.params, state.opt_state, state.ema_params,
                       self.d_params, batch)
            logs = dict(logs)
        else:
            out = fwd(state.params, batch["lq"])

        if self.cri_gan is not None:
            self.d_params, self.d_opt_state, (ld, lr_, lf_) = d_step(
                self.d_params, self.d_opt_state, batch["gt"], out)
            logs.update({"l_d": ld, "l_d_real": lr_, "l_d_fake": lf_})
        state.iter += 1
        return state, {k: float(v) for k, v in logs.items()}


class _RealESRGANFeed:
    """Shared on-device two-order degradation feed
    (models/realesrgan_model.py:25-186 / realesrnet_model.py). Degradation
    hyperparameters are read from the top-level opt (reference yml layout:
    resize_prob, resize_range, gaussian_noise_prob, noise_range,
    poisson_scale_range, gray_noise_prob, jpeg_range, second_blur_prob,
    *2 variants, gt_size, scale, queue_size)."""

    def _init_feed(self, opt):
        from comfyui_keep_tpu.training.realesrgan_feed import TrainingPairPool
        self._degrade_opt = opt
        self._pool = TrainingPairPool(opt.get("queue_size", 180))
        self._feed_counter = 0
        self._l1_gt_usm = opt.get("l1_gt_usm", True)

    def feed_data(self, batch):
        """Synthesize the LQ on device when the batch carries blur kernels
        (RealESRGANDataset); paired/val batches pass through unchanged."""
        if "kernel1" not in batch:
            return batch
        import jax
        from comfyui_keep_tpu.training.realesrgan_feed import \
            realesrgan_synthesize
        self._feed_counter += 1
        out = realesrgan_synthesize(batch, self._degrade_opt,
                                    jax.random.PRNGKey(self._feed_counter),
                                    pool=self._pool)
        gt = out["gt_usm"] if self._l1_gt_usm else out["gt"]
        return {"lq": out["lq"], "gt": gt, "gt_raw": out["gt"],
                "gt_usm": out["gt_usm"]}


@MODEL_REGISTRY.register(name="RealESRNetModel")
class RealESRNetTrainer(_RealESRGANFeed, SRTrainer):
    """RealESRNet: pixel-only training on synthesized pairs
    (models/realesrnet_model.py)."""

    def __init__(self, opt, mesh=None, feature_fn=None):
        SRTrainer.__init__(self, opt, mesh=mesh, feature_fn=feature_fn)
        self._init_feed(opt)


@MODEL_REGISTRY.register(name="RealESRGANModel")
class RealESRGANTrainer(_RealESRGANFeed, SRGANTrainer):
    """RealESRGAN: the same synthesis + GAN training
    (models/realesrgan_model.py)."""

    def __init__(self, opt, mesh=None, feature_fn=None):
        SRGANTrainer.__init__(self, opt, mesh=mesh, feature_fn=feature_fn)
        self._init_feed(opt)


# model-type aliases: the reference registers a wrapper class per family
# (models/*.py, SURVEY §2.7); these share the trainers above.
MODEL_REGISTRY.register(SRGANTrainer, name="ESRGANModel")
MODEL_REGISTRY.register(SRTrainer, name="SwinIRModel")


@MODEL_REGISTRY.register(name="VideoRecurrentModel")
class VideoRecurrentTrainer(BaseTrainer):
    """Recurrent video SR trainer (models/video_recurrent_model.py:15-197):
    flow-net LR multiplier and fix_flow warmup freeze, clip-level training."""

    def __init__(self, opt, mesh=None, flow_prefix="spynet"):
        super().__init__(opt, mesh)
        t = opt.get("train", {})
        self.cri_pix = build_loss(t["pixel_opt"]) if t.get("pixel_opt") else None
        self.flow_lr_mul = t.get("flow_lr_mul", 0.125)
        self.fix_flow_iter = t.get("fix_flow", 0)
        self.flow_prefix = flow_prefix
        from comfyui_keep_tpu.utils.registry import ARCH_REGISTRY
        net = dict(opt["network_g"])
        self.arch = ARCH_REGISTRY.get(net.pop("type"))
        self.net_cfg = net

    def init_params(self, key):
        return self.arch.init(key, **self.net_cfg)

    def make_optimizer(self, params):
        import optax
        train_opt = self.opt.get("train", {})
        base = dict(train_opt.get("optim_g", {"type": "Adam", "lr": 1e-4}))
        tx_main = build_optimizer(dict(base), schedule=self.schedule)
        flow_opt = dict(base)
        flow_opt["lr"] = flow_opt.get("lr", 1e-4) * self.flow_lr_mul
        tx_flow = build_optimizer(flow_opt, schedule=self.schedule)
        mask = freeze_mask(params, (self.flow_prefix,))
        # 'frozen' label marks the flow subtree -> reduced-lr transform
        return self._wrap_accum(optax.multi_transform(
            {"trainable": tx_main, "frozen": tx_flow}, mask))

    def train_step(self, state, batch, rng=None):
        if self.fix_flow_iter:
            # thread the iteration in as a traced scalar so the freeze can
            # switch off at fix_flow_iter without recompiling
            batch = dict(batch)
            batch["_iter"] = np.asarray(state.iter + 1, np.int32)
        return super().train_step(state, batch, rng)

    def forward(self, params, lq):
        """Eval forward for validation/test (video_base_model.py test())."""
        return self.arch.apply(params, lq, **{
            k: v for k, v in self.net_cfg.items()
            if k in ("num_feat", "mid_channels", "deformable_groups")})

    def loss_fn(self, params, batch, rng):
        if self.fix_flow_iter:
            import jax
            import jax.numpy as jnp
            batch = dict(batch)
            it = batch.pop("_iter")
            # warmup freeze (video_recurrent_model.py:105-115): flow net (and
            # EDVR feature extractor) grads are zero until current_iter
            # reaches fix_flow_iter, then everything trains. Values are
            # unchanged either way; only the gradient path is gated.
            live = (it >= self.fix_flow_iter).astype(jnp.float32)
            params = dict(params)
            for prefix in {self.flow_prefix, "edvr"} & set(params):
                params[prefix] = jax.tree.map(
                    lambda a: live.astype(a.dtype) * a +
                    (1 - live).astype(a.dtype) * jax.lax.stop_gradient(a),
                    params[prefix])
        out = self.arch.apply(params, batch["lq"], **{
            k: v for k, v in self.net_cfg.items()
            if k in ("num_feat", "mid_channels", "deformable_groups")})
        l_pix = self.cri_pix(out, batch["gt"])
        return l_pix, {"l_pix": l_pix, "l_total": l_pix}


MODEL_REGISTRY.register(VideoRecurrentTrainer, name="VideoBaseModel")
MODEL_REGISTRY.register(VideoRecurrentTrainer, name="VideoGANModel")
MODEL_REGISTRY.register(VideoRecurrentTrainer, name="VideoRecurrentGANModel")
MODEL_REGISTRY.register(VideoRecurrentTrainer, name="EDVRModel")


@MODEL_REGISTRY.register(name="GMFlowModel")
class GMFlowTrainer(BaseTrainer):
    """GMFlow optical-flow trainer (reference archs/gmflow/main.py:180-420):
    AdamW(lr 4e-4, wd 1e-4) + one-cycle cosine LR (pct_start 0.05) + global
    grad-norm clip 1.0 + sequence-weighted EPE loss (gamma 0.9). Batches:
    img1/img2 (B,H,W,3) in [0,255], flow (B,H,W,2), valid (B,H,W)."""

    def __init__(self, opt, mesh=None):
        super().__init__(opt, mesh=mesh)
        t = opt.get("train", {})
        self.lr = t.get("lr", 4e-4)
        self.weight_decay = t.get("weight_decay", 1e-4)
        self.grad_clip = t.get("grad_clip", 1.0)
        self.gamma = t.get("gamma", 0.9)
        self.num_steps = t.get("num_steps", 100000)
        g = opt.get("network_g", {})
        self.attn_splits = g.get("attn_splits", 2)
        self.corr_radius = g.get("corr_radius", -1)
        self.prop_radius = g.get("prop_radius", -1)

    def init_params(self, key):
        from comfyui_keep_tpu.models.gmflow import GMFlow
        return GMFlow.init(key)

    def make_optimizer(self, params):
        import optax
        # OneCycleLR(anneal_strategy='cos', pct_start=0.05) equivalent
        # (main.py:353-357)
        sched = optax.cosine_onecycle_schedule(
            transition_steps=self.num_steps + 10, peak_value=self.lr,
            pct_start=0.05)
        self._lr_sched = sched  # logged by current_lr
        return self._wrap_accum(optax.chain(
            optax.clip_by_global_norm(self.grad_clip),
            optax.adamw(sched, weight_decay=self.weight_decay)))

    def current_lr(self, it: int) -> float:
        """The applied LR comes from the one-cycle schedule inside adamw
        (driven by the optimizer's own count, advancing once per
        accumulation window) — BaseTrainer.current_lr would log the raw
        base lr instead."""
        if getattr(self, "_lr_sched", None) is None:
            return super().current_lr(it)
        return float(self._lr_sched(it // self._accum_steps()))

    def loss_fn(self, params, batch, rng):
        from comfyui_keep_tpu.models.gmflow import GMFlow
        from comfyui_keep_tpu.training.flow_losses import flow_loss_func
        pred = GMFlow.apply(params, batch["img1"], batch["img2"],
                            attn_splits=self.attn_splits,
                            corr_radius=self.corr_radius,
                            prop_radius=self.prop_radius)
        loss, metrics = flow_loss_func([pred], batch["flow"],
                                       valid=batch.get("valid"),
                                       gamma=self.gamma)
        metrics = dict(metrics)
        metrics["l_flow"] = loss
        return loss, metrics


def build_model(opt: Dict, **kw):
    """Reference models/__init__.py:18-29."""
    return MODEL_REGISTRY.get(opt["model_type"])(opt, **kw)


@MODEL_REGISTRY.register(name="StyleGAN2Model")
class StyleGAN2Trainer(BaseTrainer):
    """StyleGAN2 trainer (models/stylegan2_model.py:21-293): non-saturating
    logistic GAN (wgan_softplus), style mixing, lazy R1 every
    net_d_reg_every iters and path-length regularization every
    net_g_reg_every iters, with the reference's reg-adjusted Adam lr/betas
    ratio = reg_every / (reg_every + 1)."""

    def __init__(self, opt, mesh=None):
        super().__init__(opt, mesh)
        g = opt.get("network_g", {})
        self.out_size = g.get("out_size", 64)
        self.num_style_feat = g.get("num_style_feat", 512)
        t = opt.get("train", {})
        self.r1_reg_weight = t.get("r1_reg_weight", 10.0)
        self.path_reg_weight = t.get("path_reg_weight", 2.0)
        self.net_g_reg_every = t.get("net_g_reg_every", 4)
        self.net_d_reg_every = t.get("net_d_reg_every", 16)
        self.mixing_prob = t.get("mixing_prob", 0.9)
        self.mean_path_length = 0.0
        self.cri_gan = build_loss(t.get("gan_opt", {
            "type": "GANLoss", "gan_type": "wgan_softplus"}))

    def init_params(self, key):
        from comfyui_keep_tpu.models.stylegan2 import StyleGAN2Generator
        return StyleGAN2Generator.init(
            key, self.out_size, num_style_feat=self.num_style_feat,
            **{k: v for k, v in self.opt.get("network_g", {}).items()
               if k in ("num_mlp", "channel_multiplier", "narrow")})

    def make_optimizer(self, params):
        import optax
        if self._accum_steps() > 1:
            # lazy R1 / path regularization issue EXTRA tx.update calls per
            # iteration — MultiSteps' every-k gating would mis-count them;
            # refuse loudly instead of accumulating wrong
            raise ValueError(
                "train.accumulate_steps is not supported for StyleGAN2Model "
                "(lazy-regularization double updates)")
        t = self.opt.get("train", {})
        base = t.get("optim_g", {"lr": 2e-3})
        ratio = self.net_g_reg_every / (self.net_g_reg_every + 1)
        return optax.adam(base.get("lr", 2e-3) * ratio,
                          b1=0.0, b2=0.99 ** ratio)

    def current_lr(self, it: int) -> float:
        """The applied generator LR is the reg-adjusted constant
        lr * reg_every/(reg_every+1) (stylegan2_model.py's ratio'd Adam) —
        BaseTrainer.current_lr would log the raw base lr."""
        t = self.opt.get("train", {})
        base = float(t.get("optim_g", {}).get("lr", 2e-3))
        ratio = self.net_g_reg_every / (self.net_g_reg_every + 1)
        return base * ratio

    def extra_state(self):
        """Discriminator + optimizer + running path length for resume."""
        return {"d_params": self.d_params, "d_opt_state": self.d_opt_state,
                "mean_path_length": np.asarray(self.mean_path_length,
                                               np.float32)}

    def load_extra_state(self, data):
        from comfyui_keep_tpu.training.state import graft_tree
        from comfyui_keep_tpu.utils.logger import get_root_logger
        if not data:
            get_root_logger().warning(
                "resume state has no discriminator snapshot; the GAN "
                "discriminator continues from fresh init")
            return
        self.d_params = graft_tree(self.d_params, data.get("d_params"))
        self.d_opt_state = graft_tree(self.d_opt_state,
                                      data.get("d_opt_state"))
        if data.get("mean_path_length") is not None:
            self.mean_path_length = float(
                np.asarray(data["mean_path_length"]))

    def make_state(self, key):
        import jax
        from comfyui_keep_tpu.models.stylegan2 import StyleGAN2Discriminator
        import optax
        state = super().make_state(key)
        self.disc = StyleGAN2Discriminator
        d_cfg = self.opt.get("network_d", {})
        self.d_params = self.disc.init(
            jax.random.fold_in(key, 99), d_cfg.get("out_size", self.out_size),
            channel_multiplier=d_cfg.get("channel_multiplier", 2))
        t = self.opt.get("train", {})
        ratio = self.net_d_reg_every / (self.net_d_reg_every + 1)
        self.tx_d = optax.adam(
            t.get("optim_d", {}).get("lr", 2e-3) * ratio,
            b1=0.0, b2=0.99 ** ratio)
        self.d_opt_state = self.tx_d.init(self.d_params)
        return state

    def _mixing_noise(self, key, batch):
        import jax
        k1, k2, k3 = jax.random.split(key, 3)
        n1 = jax.random.normal(k1, (batch, self.num_style_feat))
        if float(jax.random.uniform(k3)) < self.mixing_prob:
            n2 = jax.random.normal(k2, (batch, self.num_style_feat))
            return [n1, n2]
        return [n1]

    def _g_apply(self, params, styles, rng):
        from comfyui_keep_tpu.models.stylegan2 import StyleGAN2Generator
        img, _ = StyleGAN2Generator.apply(
            params, styles, self.out_size,
            num_style_feat=self.num_style_feat, randomize_noise=True, rng=rng)
        return img

    def train_step(self, state, batch, rng=None):
        """train_pipeline entry point: dispatch to the g/d alternation."""
        return self.gan_train_step(state, batch,
                                   current_iter=state.iter + 1, rng=rng)

    def _sg2_fns(self):
        """Jitted update pieces (d, r1, fake-synthesis, g, path, ema) — the
        alternation's hot path runs as compiled programs. Cached on self;
        jit retraces per noise-list structure (1 vs 2 styles), giving at
        most two variants per piece."""
        if hasattr(self, "_sg2_jit"):
            return self._sg2_jit
        import jax
        import optax
        from comfyui_keep_tpu.training.losses import (g_path_regularize,
                                                      r1_penalty)

        def d_step(d_params, d_opt_state, real, fake):
            def d_loss(dp):
                real_pred = self.disc.apply(dp, real, self.out_size)
                fake_pred = self.disc.apply(dp, fake, self.out_size)
                return (self.cri_gan(real_pred, True, is_disc=True) +
                        self.cri_gan(fake_pred, False, is_disc=True))
            l_d, grads = jax.value_and_grad(d_loss)(d_params)
            updates, d_opt_state = self.tx_d.update(grads, d_opt_state,
                                                    d_params)
            return optax.apply_updates(d_params, updates), d_opt_state, l_d

        def r1_step(d_params, d_opt_state, real):
            def d_r1(dp):
                return r1_penalty(
                    lambda r: self.disc.apply(dp, r, self.out_size), real) * (
                    self.r1_reg_weight / 2 * self.net_d_reg_every)
            l_r1, grads = jax.value_and_grad(d_r1)(d_params)
            updates, d_opt_state = self.tx_d.update(grads, d_opt_state,
                                                    d_params)
            return optax.apply_updates(d_params, updates), d_opt_state, l_r1

        def fake_step(params, noise, kn):
            import jax as _jax
            return _jax.lax.stop_gradient(self._g_apply(params, noise, kn))

        def g_step(params, opt_state, d_params, noise, kn):
            def g_loss(gp):
                img = self._g_apply(gp, noise, kn)
                return self.cri_gan(
                    self.disc.apply(d_params, img, self.out_size),
                    True, is_disc=False)
            l_g, grads = jax.value_and_grad(g_loss)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, l_g

        def path_step(params, opt_state, latents, kp, kn, mean_path_length):
            def g_path(gp):
                from comfyui_keep_tpu.models.stylegan2 import \
                    StyleGAN2Generator

                def fake_fn(lat):
                    img, _ = StyleGAN2Generator.apply(
                        gp, [lat], self.out_size,
                        num_style_feat=self.num_style_feat,
                        randomize_noise=True, rng=kn)
                    return img
                pen, pm, _ = g_path_regularize(fake_fn, latents, kp,
                                               mean_path_length)
                return pen * self.path_reg_weight * self.net_g_reg_every, pm

            (l_path, pm), grads = jax.value_and_grad(
                g_path, has_aux=True)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, l_path, pm

        def ema_step(ema, params):
            return ema_update(ema, params, self.ema_decay)

        self._sg2_jit = tuple(jax.jit(f) for f in (
            d_step, r1_step, fake_step, g_step, path_step, ema_step))
        return self._sg2_jit

    def gan_train_step(self, state, batch, current_iter, rng=None):
        """One alternation (stylegan2_model.py:185-254): d step (+lazy R1),
        then g step (+lazy path regularization)."""
        import jax
        rng = rng if rng is not None else jax.random.PRNGKey(current_iter)
        kd, kg, kp, kn = jax.random.split(rng, 4)
        real = batch["gt"]
        b = real.shape[0]
        logs = {}
        d_step, r1_step, fake_step, g_step, path_step, ema_step = \
            self._sg2_fns()

        # ---- discriminator -------------------------------------------------
        noise = self._mixing_noise(kd, b)
        fake = fake_step(state.params, noise, kn)
        self.d_params, self.d_opt_state, l_d = d_step(
            self.d_params, self.d_opt_state, real, fake)
        logs["l_d"] = float(l_d)

        if current_iter % self.net_d_reg_every == 0:
            self.d_params, self.d_opt_state, l_r1 = r1_step(
                self.d_params, self.d_opt_state, real)
            logs["l_d_r1"] = float(l_r1)

        # ---- generator -----------------------------------------------------
        noise = self._mixing_noise(kg, b)
        state.params, state.opt_state, l_g = g_step(
            state.params, state.opt_state, self.d_params, noise, kn)
        logs["l_g"] = float(l_g)

        if current_iter % self.net_g_reg_every == 0:
            path_batch = max(1, b // 2)
            latents = jax.random.normal(kp, (path_batch, self.num_style_feat))
            state.params, state.opt_state, l_path, pm = path_step(
                state.params, state.opt_state, latents, kp, kn,
                np.float32(self.mean_path_length))
            self.mean_path_length = float(pm)
            logs["l_g_path"] = float(l_path)

        if state.ema_params is not None:
            state.ema_params = ema_step(state.ema_params, state.params)
        state.iter += 1
        return state, logs


# HiFaceGAN trains like SRGAN with a (multi-scale capable) discriminator;
# MultiScaleGANLoss handles list-of-scales D outputs
# (reference models/hifacegan_model.py builds on sr_model + gan_loss)
MODEL_REGISTRY.register(SRGANTrainer, name="HiFaceGANModel")
