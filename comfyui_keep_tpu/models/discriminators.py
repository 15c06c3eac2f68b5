"""Discriminators (reference archs/discriminator_arch.py): VGG-style (SRGAN/
ESRGAN) and U-Net with spectral norm (RealESRGAN)."""
import jax
import jax.numpy as jnp

from comfyui_keep_tpu.ops import (conv2d, conv2d_init, linear, linear_init,
                                  batch_norm, batch_norm_init, leaky_relu,
                                  resize_bilinear)
from comfyui_keep_tpu.ops.spectral import spectral_norm_weight
from comfyui_keep_tpu.utils.registry import ARCH_REGISTRY


@ARCH_REGISTRY.register(name="VGGStyleDiscriminator")
class VGGStyleDiscriminator:
    @staticmethod
    def _specs(num_in_ch, nf, input_size):
        blocks = [("conv0_0", num_in_ch, nf, 3, 1, True, False),
                  ("conv0_1", nf, nf, 4, 2, False, True)]
        mults = [(1, 2), (2, 2), (2, 4), (4, 4), (4, 8), (8, 8), (8, 8), (8, 8)]
        names = ["conv1_0", "conv1_1", "conv2_0", "conv2_1", "conv3_0",
                 "conv3_1", "conv4_0", "conv4_1"]
        for n, (mi, mo) in zip(names, mults):
            k, s = (3, 1) if n.endswith("_0") else (4, 2)
            blocks.append((n, nf * mi, nf * mo, k, s, False, True))
        if input_size == 256:
            blocks.append(("conv5_0", nf * 8, nf * 8, 3, 1, False, True))
            blocks.append(("conv5_1", nf * 8, nf * 8, 4, 2, False, True))
        return blocks

    @staticmethod
    def init(key, num_in_ch=3, num_feat=64, input_size=128):
        specs = VGGStyleDiscriminator._specs(num_in_ch, num_feat, input_size)
        ks = jax.random.split(key, len(specs) + 2)
        p = {}
        for k, (name, cin, cout, ksz, s, bias, bn) in zip(ks, specs):
            p[name] = conv2d_init(k, ksz, ksz, cin, cout, bias=bias)
            if bn:
                p["bn" + name[4:]] = batch_norm_init(cout)
        p["linear1"] = linear_init(ks[-2], num_feat * 8 * 4 * 4, 100)
        p["linear2"] = linear_init(ks[-1], 100, 1)
        return p

    @staticmethod
    def apply(params, x, num_in_ch=3, num_feat=64, input_size=128):
        specs = VGGStyleDiscriminator._specs(num_in_ch, num_feat, input_size)
        for name, cin, cout, ksz, s, bias, bn in specs:
            x = conv2d(x, params[name]["w"], params[name].get("b"),
                       stride=s, padding=1)
            if bn:
                x = batch_norm(x, params["bn" + name[4:]])
            x = leaky_relu(x, 0.2)
        b = x.shape[0]
        # torch flattens NCHW (C, H, W) order — transpose before reshape
        x = x.transpose(0, 3, 1, 2).reshape(b, -1)
        x = leaky_relu(linear(x, params["linear1"]["w"], params["linear1"]["b"]), 0.2)
        return linear(x, params["linear2"]["w"], params["linear2"]["b"])


@ARCH_REGISTRY.register(name="UNetDiscriminatorSN")
class UNetDiscriminatorSN:
    SN_LAYERS = ("conv1", "conv2", "conv3", "conv4", "conv5", "conv6",
                 "conv7", "conv8")

    @staticmethod
    def init(key, num_in_ch=3, num_feat=64):
        ks = jax.random.split(key, 10)
        nf = num_feat
        dims = {"conv0": (3, num_in_ch, nf, True), "conv1": (4, nf, nf * 2, False),
                "conv2": (4, nf * 2, nf * 4, False), "conv3": (4, nf * 4, nf * 8, False),
                "conv4": (3, nf * 8, nf * 4, False), "conv5": (3, nf * 4, nf * 2, False),
                "conv6": (3, nf * 2, nf, False), "conv7": (3, nf, nf, False),
                "conv8": (3, nf, nf, False), "conv9": (3, nf, 1, True)}
        p = {}
        for k, (name, (ksz, cin, cout, bias)) in zip(ks, dims.items()):
            p[name] = conv2d_init(k, ksz, ksz, cin, cout, bias=bias)
            if name in UNetDiscriminatorSN.SN_LAYERS:
                u = jax.random.normal(jax.random.fold_in(k, 1), (cout,))
                p[name]["u"] = u / jnp.linalg.norm(u)
        return p

    @staticmethod
    def _c(p, x, name, stride=1, pad=1, sn=False):
        w = p[name]["w"]
        if sn and "u" in p[name]:
            w, _ = spectral_norm_weight(w, p[name]["u"])
        return conv2d(x, w, p[name].get("b"), stride=stride, padding=pad)

    @staticmethod
    def apply(params, x, skip_connection=True):
        U = UNetDiscriminatorSN
        x0 = leaky_relu(U._c(params, x, "conv0"), 0.2)
        x1 = leaky_relu(U._c(params, x0, "conv1", 2, 1, sn=True), 0.2)
        x2 = leaky_relu(U._c(params, x1, "conv2", 2, 1, sn=True), 0.2)
        x3 = leaky_relu(U._c(params, x2, "conv3", 2, 1, sn=True), 0.2)
        x3 = resize_bilinear(x3, (x3.shape[1] * 2, x3.shape[2] * 2))
        x4 = leaky_relu(U._c(params, x3, "conv4", sn=True), 0.2)
        if skip_connection:
            x4 = x4 + x2
        x4 = resize_bilinear(x4, (x4.shape[1] * 2, x4.shape[2] * 2))
        x5 = leaky_relu(U._c(params, x4, "conv5", sn=True), 0.2)
        if skip_connection:
            x5 = x5 + x1
        x5 = resize_bilinear(x5, (x5.shape[1] * 2, x5.shape[2] * 2))
        x6 = leaky_relu(U._c(params, x5, "conv6", sn=True), 0.2)
        if skip_connection:
            x6 = x6 + x0
        out = leaky_relu(U._c(params, x6, "conv7", sn=True), 0.2)
        out = leaky_relu(U._c(params, out, "conv8", sn=True), 0.2)
        return U._c(params, out, "conv9")
