"""HiFaceGAN — rebuild of reference archs/hifacegan_arch.py +
hifacegan_util.py: SPADE-modulated generator with a Local-Importance-Pooling
encoder, plus the pix2pixHD-style multiscale discriminator. NHWC; spectral
norm via ops/spectral.py.
"""
import jax
import jax.numpy as jnp

from comfyui_keep_tpu.ops import (conv2d, conv2d_init, instance_norm,
                                  leaky_relu, relu, upsample_nearest_2x,
                                  resize_bilinear)
from comfyui_keep_tpu.ops.resample import resize_nearest
from comfyui_keep_tpu.ops.spectral import spectral_norm_weight
from comfyui_keep_tpu.utils.registry import ARCH_REGISTRY


def _sn_conv_init(key, k, cin, cout, bias=True):
    p = conv2d_init(key, k, k, cin, cout, bias=bias)
    u = jax.random.normal(jax.random.fold_in(key, 9), (cout,))
    p["u"] = u / jnp.linalg.norm(u)
    return p


def _sn_conv(p, x, k=3, stride=1, dilation=1):
    w, _ = spectral_norm_weight(p["w"], p["u"])
    return conv2d(x, w, p.get("b"), stride=stride,
                  padding=((k - 1) // 2) * dilation, dilation=dilation)


# -- SPADE (hifacegan_util.py:12-55) -----------------------------------------

def _spade_init(key, norm_nc, label_nc, ks=3):
    nhidden = 128 if norm_nc > 128 else norm_nc
    k1, k2, k3 = jax.random.split(key, 3)
    return {"mlp_shared": [conv2d_init(k1, ks, ks, label_nc, nhidden)],
            "mlp_gamma": {"w": conv2d_init(k2, ks, ks, nhidden, norm_nc,
                                           bias=False)["w"]},
            "mlp_beta": {"w": conv2d_init(k3, ks, ks, nhidden, norm_nc,
                                          bias=False)["w"]}}


def _spade(p, x, segmap, ks=3):
    normalized = instance_norm(x)  # 'syncbatch' falls back to instance
    seg = resize_nearest(segmap, (x.shape[1], x.shape[2]))
    actv = relu(conv2d(seg, p["mlp_shared"][0]["w"], p["mlp_shared"][0]["b"],
                       padding=ks // 2))
    gamma = conv2d(actv, p["mlp_gamma"]["w"], padding=ks // 2)
    beta = conv2d(actv, p["mlp_beta"]["w"], padding=ks // 2)
    return normalized * gamma + beta


def _spade_res_init(key, fin, fout, semantic_nc=3):
    fmid = min(fin, fout)
    ks = jax.random.split(key, 6)
    p = {"conv_0": _sn_conv_init(ks[0], 3, fin, fmid),
         "conv_1": _sn_conv_init(ks[1], 3, fmid, fout),
         "norm_0": _spade_init(ks[2], fin, semantic_nc),
         "norm_1": _spade_init(ks[3], fmid, semantic_nc)}
    if fin != fout:
        p["conv_s"] = _sn_conv_init(ks[4], 1, fin, fout, bias=False)
        p["norm_s"] = _spade_init(ks[5], fin, semantic_nc)
    return p


def _spade_res(p, x, seg):
    xs = x
    if "conv_s" in p:
        xs = _sn_conv(p["conv_s"], _spade(p["norm_s"], x, seg), 1)
    dx = _sn_conv(p["conv_0"], leaky_relu(_spade(p["norm_0"], x, seg), 0.2))
    dx = _sn_conv(p["conv_1"], leaky_relu(_spade(p["norm_1"], dx, seg), 0.2))
    return xs + dx


# -- LIP encoder (hifacegan_util.py:159-215) ----------------------------------

def _avg_pool3s2_inc(x):
    """F.avg_pool2d(k=3, s=2, p=1) count_include_pad=True."""
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 2, 2, 1),
                              [(0, 0), (1, 1), (1, 1), (0, 0)])
    return s / 9.0


def _lip2d(x, logit):
    w = jnp.exp(logit)
    return _avg_pool3s2_inc(x * w) / _avg_pool3s2_inc(w)


def _lip_init(key, channels):
    k1 = jax.random.fold_in(key, 0)
    return {"logit": [
        {"w": conv2d_init(k1, 3, 3, channels, channels, bias=False)["w"]},
        {"scale": jnp.ones((channels,)), "bias": jnp.zeros((channels,))},
        None]}


def _lip(p, x):
    lg = conv2d(x, p["logit"][0]["w"], padding=1)
    lg = instance_norm(lg, p["logit"][1])
    lg = jax.nn.sigmoid(lg) * 12.0  # SoftGate COEFF
    return _lip2d(x, lg)


def lip_encoder_init(key, input_nc, ngf, n_2xdown):
    ks = jax.random.split(key, n_2xdown * 2 + 1)
    model = [{"w": conv2d_init(ks[0], 3, 3, input_nc, ngf, bias=False)["w"]},
             None, None]
    cur = 1
    for i in range(n_2xdown):
        nxt = min(cur * 2, 16)
        model.append(_lip_init(ks[2 * i + 1], ngf * cur))
        model.append(conv2d_init(ks[2 * i + 2], 3, 3, ngf * cur, ngf * nxt))
        model.append(None)
        cur = nxt
        if i < n_2xdown - 1:
            model.append(None)
    return {"model": model}


def lip_encoder(p, x, ngf, n_2xdown):
    m = p["model"]
    x = relu(instance_norm(conv2d(x, m[0]["w"], padding=1)))
    i = 3
    cur = 1
    for d in range(n_2xdown):
        x = _lip(m[i], x)
        x = conv2d(x, m[i + 1]["w"], m[i + 1]["b"], padding=1)
        x = instance_norm(x)
        i += 3
        if d < n_2xdown - 1:
            x = relu(x)
            i += 1
    return x


# -- generator ----------------------------------------------------------------

@ARCH_REGISTRY.register(name="HiFaceGAN")
class HiFaceGAN:
    SCALE_RATIO = 5

    @staticmethod
    def init(key, num_in_ch=3, num_feat=64):
        nf = num_feat
        ks = jax.random.split(key, 10)
        return {
            "lip_encoder": lip_encoder_init(ks[0], num_in_ch, nf,
                                            HiFaceGAN.SCALE_RATIO),
            "head_0": _spade_res_init(ks[1], 16 * nf, 16 * nf, num_in_ch),
            "g_middle_0": _spade_res_init(ks[2], 16 * nf, 16 * nf, num_in_ch),
            "g_middle_1": _spade_res_init(ks[3], 16 * nf, 16 * nf, num_in_ch),
            "ups": [_spade_res_init(ks[4], 16 * nf, 8 * nf, num_in_ch),
                    _spade_res_init(ks[5], 8 * nf, 4 * nf, num_in_ch),
                    _spade_res_init(ks[6], 4 * nf, 2 * nf, num_in_ch),
                    _spade_res_init(ks[7], 2 * nf, nf, num_in_ch)],
            "to_rgbs": [conv2d_init(jax.random.fold_in(ks[8], i), 3, 3, c, 3)
                        for i, c in enumerate((8 * nf, 4 * nf, 2 * nf, nf))],
        }

    @staticmethod
    def apply(params, x, num_feat=64, phase=4):
        """x: (B, H, W, 3) [0,1-ish] -> (B, H, W, 3) tanh output
        (hifacegan_arch.py:71-95 with LIP encoding :145-166)."""
        seg = x
        h = lip_encoder(params["lip_encoder"], x, num_feat,
                        HiFaceGAN.SCALE_RATIO)
        h = _spade_res(params["head_0"], h, seg)
        h = upsample_nearest_2x(h)
        h = _spade_res(params["g_middle_0"], h, seg)
        h = _spade_res(params["g_middle_1"], h, seg)
        for i in range(phase):
            h = upsample_nearest_2x(h)
            h = _spade_res(params["ups"][i], h, seg)
        rgb = params["to_rgbs"][phase - 1]
        h = conv2d(leaky_relu(h, 0.2), rgb["w"], rgb["b"], padding=1)
        return jnp.tanh(h)

    @staticmethod
    def mixed_guidance_forward(params, input_x, seg=None, n=0,
                               mode="progressive", num_feat=64, phase=4):
        """Subspace-visualization forward (hifacegan_arch.py:96-141): the
        first n SPADE stages are guided by input_x, the rest by seg
        ('progressive' AAABBB; 'one_plug' AAABAA; 'one_ablate' BBBABB)."""
        if seg is None:
            return HiFaceGAN.apply(params, input_x, num_feat, phase)
        total = 4 + phase
        if mode == "progressive":
            n = max(min(n, total), 0)
            guides = [input_x] * n + [seg] * (total - n)
        elif mode == "one_plug":
            n = max(min(n, total - 1), 0)
            guides = [seg] * total
            guides[n] = input_x
        elif mode == "one_ablate":
            if n > total - 1:
                return HiFaceGAN.apply(params, input_x, num_feat, phase)
            guides = [input_x] * total
            guides[n] = seg
        else:
            raise ValueError(f"unknown mode {mode!r}")
        h = lip_encoder(params["lip_encoder"], guides[0], num_feat,
                        HiFaceGAN.SCALE_RATIO)
        h = _spade_res(params["head_0"], h, guides[1])
        h = upsample_nearest_2x(h)
        h = _spade_res(params["g_middle_0"], h, guides[2])
        h = _spade_res(params["g_middle_1"], h, guides[3])
        for i in range(phase):
            h = upsample_nearest_2x(h)
            h = _spade_res(params["ups"][i], h, guides[4 + i])
        rgb = params["to_rgbs"][phase - 1]
        h = conv2d(leaky_relu(h, 0.2), rgb["w"], rgb["b"], padding=1)
        return jnp.tanh(h)


@ARCH_REGISTRY.register(name="HiFaceGANDiscriminator")
class HiFaceGANDiscriminator:
    """Multiscale PatchGAN with spectral-instance norm
    (hifacegan_arch.py:168-260)."""

    @staticmethod
    def _nlayer_init(key, input_nc, n_layers_d, nf0):
        ks = jax.random.split(key, n_layers_d + 1)
        layers = [{"conv": conv2d_init(ks[0], 4, 4, input_nc, nf0)}]
        nf = nf0
        for n in range(1, n_layers_d):
            nf_prev, nf = nf, min(nf * 2, 512)
            layers.append({"conv": _sn_conv_init(ks[n], 4, nf_prev, nf,
                                                 bias=False)})
        layers.append({"conv": conv2d_init(ks[-1], 4, 4, nf, 1)})
        return layers

    @staticmethod
    def init(key, num_in_ch=3, num_out_ch=3, conditional_d=True, num_d=2,
             n_layers_d=4, num_feat=64):
        input_nc = num_in_ch + (num_out_ch if conditional_d else 0)
        return {f"discriminator_{i}": HiFaceGANDiscriminator._nlayer_init(
            jax.random.fold_in(key, i), input_nc, n_layers_d, num_feat)
            for i in range(num_d)}

    @staticmethod
    def _nlayer(layers, x, n_layers_d):
        results = []
        h = x
        for n, lp in enumerate(layers):
            stride = 2 if n == 0 else (1 if n >= n_layers_d - 1 else 2)
            if n == 0:
                h = conv2d(h, lp["conv"]["w"], lp["conv"]["b"], stride=2,
                           padding=2)
                h = leaky_relu(h, 0.2)
            elif n == len(layers) - 1:
                h = conv2d(h, lp["conv"]["w"], lp["conv"]["b"], stride=1,
                           padding=2)
            else:
                w, _ = spectral_norm_weight(lp["conv"]["w"], lp["conv"]["u"])
                h = conv2d(h, w, stride=stride, padding=2)
                h = instance_norm(h)
                h = leaky_relu(h, 0.2)
            results.append(h)
        return results

    @staticmethod
    def apply(params, x, num_d=2, n_layers_d=4, keep_features=True):
        out = []
        h = x
        for i in range(num_d):
            res = HiFaceGANDiscriminator._nlayer(
                params[f"discriminator_{i}"], h, n_layers_d)
            out.append(res if keep_features else res[-1])
            # downsample between scales (avg pool 3x3 s2, no pad counting)
            ones = jnp.ones_like(h[..., :1])
            s = jax.lax.reduce_window(h, 0.0, jax.lax.add, (1, 3, 3, 1),
                                      (1, 2, 2, 1),
                                      [(0, 0), (1, 1), (1, 1), (0, 0)])
            n = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, 3, 3, 1),
                                      (1, 2, 2, 1),
                                      [(0, 0), (1, 1), (1, 1), (0, 0)])
            h = s / n
        return out
