"""Loss library (reference wm_basicsr/losses/: basic_loss.py, gan_loss.py).

Every loss is a pure function/callable over jnp arrays (NHWC); GAN
regularizers use jax.grad instead of autograd.grad. LPIPSLoss is registered
(the reference's KEEPModel references it at keep_model.py:230 even though the
fork's registry lacks it — noted in SURVEY §2.8) and implemented as a
VGG-feature distance with learned linear weights when provided.
"""
import math
from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from comfyui_keep_tpu.utils.registry import LOSS_REGISTRY

_REDUCES = {"none": lambda x: x, "mean": jnp.mean, "sum": jnp.sum}


def _weighted(raw, weight, reduction):
    if weight is not None:
        raw = raw * weight
    return _REDUCES[reduction](raw)


def l1_loss(pred, target, weight=None, reduction="mean"):
    return _weighted(jnp.abs(pred - target), weight, reduction)


def mse_loss(pred, target, weight=None, reduction="mean"):
    return _weighted((pred - target) ** 2, weight, reduction)


def charbonnier_loss(pred, target, weight=None, reduction="mean", eps=1e-12):
    return _weighted(jnp.sqrt((pred - target) ** 2 + eps), weight, reduction)


@LOSS_REGISTRY.register(name="L1Loss")
class L1Loss:
    def __init__(self, loss_weight=1.0, reduction="mean"):
        self.loss_weight = loss_weight
        self.reduction = reduction

    def __call__(self, pred, target, weight=None):
        return self.loss_weight * l1_loss(pred, target, weight, self.reduction)


@LOSS_REGISTRY.register(name="MSELoss")
class MSELoss:
    def __init__(self, loss_weight=1.0, reduction="mean"):
        self.loss_weight = loss_weight
        self.reduction = reduction

    def __call__(self, pred, target, weight=None):
        return self.loss_weight * mse_loss(pred, target, weight, self.reduction)


@LOSS_REGISTRY.register(name="CharbonnierLoss")
class CharbonnierLoss:
    def __init__(self, loss_weight=1.0, reduction="mean", eps=1e-12):
        self.loss_weight = loss_weight
        self.reduction = reduction
        self.eps = eps

    def __call__(self, pred, target, weight=None):
        return self.loss_weight * charbonnier_loss(pred, target, weight,
                                                   self.reduction, self.eps)


@LOSS_REGISTRY.register(name="WeightedTVLoss")
class WeightedTVLoss:
    """L1 total variation with optional per-pixel weights
    (basic_loss.py WeightedTVLoss). NHWC."""

    def __init__(self, loss_weight=1.0, reduction="mean"):
        if reduction not in ("mean", "sum"):
            raise ValueError(f"unsupported reduction {reduction}")
        self.l1 = L1Loss(loss_weight, reduction)

    def __call__(self, pred, weight=None):
        yw = None if weight is None else weight[:, :-1, :, :]
        xw = None if weight is None else weight[:, :, :-1, :]
        ydiff = self.l1(pred[:, :-1], pred[:, 1:], weight=yw)
        xdiff = self.l1(pred[:, :, :-1], pred[:, :, 1:], weight=xw)
        return ydiff + xdiff


@LOSS_REGISTRY.register(name="PerceptualLoss")
class PerceptualLoss:
    """VGG feature + style loss (basic_loss.py:146-253).

    feature_fn(x, layer_list) -> {layer: activation NHWC}; constructed from
    models/vgg.py (use_input_norm/range_norm applied there).
    """

    def __init__(self, layer_weights: Dict[str, float], feature_fn: Callable,
                 perceptual_weight=1.0, style_weight=0.0, criterion="l1"):
        self.layer_weights = layer_weights
        self.feature_fn = feature_fn
        self.perceptual_weight = perceptual_weight
        self.style_weight = style_weight
        self.criterion = criterion

    def _crit(self, a, b):
        if self.criterion == "l1":
            return jnp.mean(jnp.abs(a - b))
        if self.criterion == "l2" or self.criterion == "mse":
            return jnp.mean((a - b) ** 2)
        if self.criterion == "fro":
            return jnp.linalg.norm(a - b)
        raise ValueError(self.criterion)

    @staticmethod
    def _gram(x):
        n, h, w, c = x.shape
        f = x.reshape(n, h * w, c)
        return jnp.einsum("nlc,nld->ncd", f, f) / (c * h * w)

    def __call__(self, x, gt):
        layers = list(self.layer_weights)
        fx = self.feature_fn(x, layers)
        fgt = self.feature_fn(jax.lax.stop_gradient(gt), layers)
        percep = None
        if self.perceptual_weight > 0:
            percep = sum(self._crit(fx[k], fgt[k]) * self.layer_weights[k]
                         for k in layers) * self.perceptual_weight
        style = None
        if self.style_weight > 0:
            style = sum(self._crit(self._gram(fx[k]), self._gram(fgt[k])) *
                        self.layer_weights[k] for k in layers) * self.style_weight
        return percep, style


@LOSS_REGISTRY.register(name="LPIPSLoss")
class LPIPSLoss:
    """LPIPS-style distance: unit-normalized VGG features, (optionally
    learned) per-layer weights, spatial mean of squared differences."""

    def __init__(self, feature_fn: Callable, layers=("relu1_2", "relu2_2",
                 "relu3_4", "relu4_4", "relu5_4"), loss_weight=1.0,
                 linear_weights: Optional[Dict] = None):
        self.feature_fn = feature_fn
        self.layers = list(layers)
        self.loss_weight = loss_weight
        self.linear_weights = linear_weights

    def __call__(self, x, gt):
        fx = self.feature_fn(x, self.layers)
        fgt = self.feature_fn(jax.lax.stop_gradient(gt), self.layers)
        total = 0.0
        for k in self.layers:
            a = fx[k] / (jnp.linalg.norm(fx[k], axis=-1, keepdims=True) + 1e-10)
            b = fgt[k] / (jnp.linalg.norm(fgt[k], axis=-1, keepdims=True) + 1e-10)
            d = (a - b) ** 2
            if self.linear_weights is not None and k in self.linear_weights:
                d = d * self.linear_weights[k]
                total += jnp.mean(jnp.sum(d, axis=-1))
            else:
                total += jnp.mean(jnp.sum(d, axis=-1))
        return self.loss_weight * total


@LOSS_REGISTRY.register(name="GANLoss")
class GANLoss:
    """vanilla | lsgan | wgan | wgan_softplus | hinge (gan_loss.py:11-113)."""

    def __init__(self, gan_type, real_label_val=1.0, fake_label_val=0.0,
                 loss_weight=1.0):
        self.gan_type = gan_type
        self.real_label_val = real_label_val
        self.fake_label_val = fake_label_val
        self.loss_weight = loss_weight

    def _target(self, x, target_is_real):
        return jnp.full_like(
            x, self.real_label_val if target_is_real else self.fake_label_val)

    def __call__(self, x, target_is_real, is_disc=False):
        if self.gan_type == "vanilla":
            t = self._target(x, target_is_real)
            loss = jnp.mean(jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x))))
        elif self.gan_type == "lsgan":
            loss = jnp.mean((x - self._target(x, target_is_real)) ** 2)
        elif self.gan_type == "wgan":
            loss = -jnp.mean(x) if target_is_real else jnp.mean(x)
        elif self.gan_type == "wgan_softplus":
            loss = jnp.mean(jax.nn.softplus(-x)) if target_is_real \
                else jnp.mean(jax.nn.softplus(x))
        elif self.gan_type == "hinge":
            if is_disc:
                x = -x if target_is_real else x
                loss = jnp.mean(jnp.maximum(1 + x, 0))
            else:
                loss = -jnp.mean(x)
        else:
            raise NotImplementedError(self.gan_type)
        return loss if is_disc else loss * self.loss_weight


@LOSS_REGISTRY.register(name="MultiScaleGANLoss")
class MultiScaleGANLoss(GANLoss):
    def __call__(self, x, target_is_real, is_disc=False):
        if isinstance(x, (list, tuple)):
            total = 0.0
            for xi in x:
                if isinstance(xi, (list, tuple)):
                    xi = xi[-1]
                total += super().__call__(xi, target_is_real, is_disc)
            return total / len(x)
        return super().__call__(x, target_is_real, is_disc)


def r1_penalty(disc_fn, real):
    """R1 gradient penalty (gan_loss.py:143-160)."""
    grads = jax.grad(lambda r: jnp.sum(disc_fn(r)))(real)
    return jnp.mean(jnp.sum(grads ** 2, axis=tuple(range(1, grads.ndim))))


def g_path_regularize(fake_fn, latents, key, mean_path_length, decay=0.01):
    """StyleGAN2 path-length regularization (gan_loss.py:163-180)."""
    fake = fake_fn(latents)
    noise = jax.random.normal(key, fake.shape) / math.sqrt(
        fake.shape[1] * fake.shape[2])
    grads = jax.grad(lambda l: jnp.sum(fake_fn(l) * noise))(latents)
    path_lengths = jnp.sqrt(jnp.mean(jnp.sum(grads ** 2, axis=1), axis=-1) + 1e-12)
    path_mean = mean_path_length + decay * (jnp.mean(path_lengths) - mean_path_length)
    penalty = jnp.mean((path_lengths - path_mean) ** 2)
    return penalty, jax.lax.stop_gradient(path_mean), path_lengths


def gradient_penalty_loss(disc_fn, real, fake, key, weight=None):
    """WGAN-GP interpolated gradient penalty (gan_loss.py:183-207)."""
    alpha = jax.random.uniform(key, (real.shape[0],) + (1,) * (real.ndim - 1))
    interp = alpha * real + (1 - alpha) * fake
    grads = jax.grad(lambda x: jnp.sum(disc_fn(x)))(interp)
    if weight is not None:
        grads = grads * weight
    norm = jnp.sqrt(jnp.sum(grads.reshape(grads.shape[0], -1) ** 2, axis=1))
    loss = jnp.mean((norm - 1) ** 2)
    if weight is not None:
        loss = loss / jnp.mean(weight)
    return loss


def build_loss(opt: Dict, **extra):
    """Reference losses/__init__.py:19-31: config dict -> loss object."""
    opt = dict(opt)
    loss_type = opt.pop("type")
    return LOSS_REGISTRY.get(loss_type)(**opt, **extra)


def get_local_weights(residual, ksize: int):
    """LDL pixel-level artifact weights: unbiased local variance of the
    residual over a ksize window with reflect padding (loss_util.py:99-119).
    residual: (B, H, W, 1) NHWC."""
    pad = (ksize - 1) // 2
    rp = jnp.pad(residual, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                 mode="reflect")
    # extract all ksize*ksize shifted views and compute variance across them
    patches = jnp.stack([
        rp[:, dy:dy + residual.shape[1], dx:dx + residual.shape[2], :]
        for dy in range(ksize) for dx in range(ksize)], axis=-1)
    return jnp.var(patches, axis=-1, ddof=1)


def get_refined_artifact_map(img_gt, img_output, img_ema, ksize: int):
    """LDL artifact map (CVPR 2022; loss_util.py:121-147). NHWC images ->
    (B, H, W, 1) weights; zero where the EMA model already fits better."""
    residual_ema = jnp.sum(jnp.abs(img_gt - img_ema), axis=-1, keepdims=True)
    residual_sr = jnp.sum(jnp.abs(img_gt - img_output), axis=-1, keepdims=True)
    patch_level = jnp.var(residual_sr, axis=(1, 2, 3), ddof=1,
                          keepdims=True) ** (1 / 5)
    overall = patch_level * get_local_weights(residual_sr, ksize)
    return jnp.where(residual_sr < residual_ema, 0.0, overall)
