"""Further SR archs for registry parity: RCAN (rcan_arch.py), RIDNet
(ridnet_arch.py), ECBSR (ecbsr_arch.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from comfyui_keep_tpu.ops import conv2d, conv2d_init, relu, linear
from comfyui_keep_tpu.models.sr_basic import (pixel_shuffle, _res_block_nobn,
                                              _res_block_nobn_init,
                                              _upsample_seq, _upsample_seq_init,
                                              _conv)
from comfyui_keep_tpu.utils.registry import ARCH_REGISTRY


# ---------------------------------------------------------------------------
# RCAN
# ---------------------------------------------------------------------------

def _ca_init(key, nf, squeeze=16):
    k1, k2 = jax.random.split(key)
    return {"attention": [None, conv2d_init(k1, 1, 1, nf, nf // squeeze), None,
                          conv2d_init(k2, 1, 1, nf // squeeze, nf), None]}


def _ix(p, i):
    """Index a converted Sequential that may be a list or a string-keyed dict
    (dicts appear when index 0 holds no parameters)."""
    return p[i] if isinstance(p, (list, tuple)) else p[str(i)]


def _ca(p, x):
    y = x.mean(axis=(1, 2), keepdims=True)
    a1, a3 = _ix(p["attention"], 1), _ix(p["attention"], 3)
    y = relu(conv2d(y, a1["w"], a1["b"]))
    y = jax.nn.sigmoid(conv2d(y, a3["w"], a3["b"]))
    return x * y


def _rcab_init(key, nf, squeeze):
    ks = jax.random.split(key, 3)
    return {"rcab": [conv2d_init(ks[0], 3, 3, nf, nf), None,
                     conv2d_init(ks[1], 3, 3, nf, nf), _ca_init(ks[2], nf, squeeze)]}


def _rcab(p, x, res_scale=1.0):
    h = _conv(p["rcab"][0], x, act="relu")
    h = _conv(p["rcab"][2], h)
    h = _ca(p["rcab"][3], h)
    return x + h * res_scale


@ARCH_REGISTRY.register(name="RCAN")
class RCAN:
    RGB_MEAN = (0.4488, 0.4371, 0.4040)

    @staticmethod
    def init(key, num_in_ch=3, num_out_ch=3, num_feat=64, num_group=10,
             num_block=16, squeeze_factor=16, upscale=4):
        ks = jax.random.split(key, num_group + 4)
        body = []
        for gk in ks[:num_group]:
            bks = jax.random.split(gk, num_block + 1)
            body.append({"residual_group": [_rcab_init(k, num_feat, squeeze_factor)
                                            for k in bks[:-1]],
                         "conv": conv2d_init(bks[-1], 3, 3, num_feat, num_feat)})
        return {"conv_first": conv2d_init(ks[-4], 3, 3, num_in_ch, num_feat),
                "body": body,
                "conv_after_body": conv2d_init(ks[-3], 3, 3, num_feat, num_feat),
                "upsample": _upsample_seq_init(ks[-2], upscale, num_feat),
                "conv_last": conv2d_init(ks[-1], 3, 3, num_feat, num_out_ch)}

    @staticmethod
    def apply(params, x, upscale=4, res_scale=1.0, img_range=255.0):
        mean = jnp.asarray(RCAN.RGB_MEAN, x.dtype)
        x = (x - mean) * img_range
        feat = _conv(params["conv_first"], x)
        h = feat
        for g in params["body"]:
            r = h
            for bp in g["residual_group"]:
                r = _rcab(bp, r, res_scale)
            h = h + _conv(g["conv"], r)
        h = _conv(params["conv_after_body"], h) + feat
        out = _conv(params["conv_last"], _upsample_seq(params["upsample"], h, upscale))
        return out / img_range + mean


# ---------------------------------------------------------------------------
# RIDNet
# ---------------------------------------------------------------------------

def _eam_init(key, nf):
    ks = jax.random.split(key, 9)
    return {
        "merge": {"dilation1": [conv2d_init(ks[0], 3, 3, nf, nf), None,
                                conv2d_init(ks[1], 3, 3, nf, nf), None],
                  "dilation2": [conv2d_init(ks[2], 3, 3, nf, nf), None,
                                conv2d_init(ks[3], 3, 3, nf, nf), None],
                  "aggregation": [conv2d_init(ks[4], 3, 3, 2 * nf, nf), None]},
        "block1": _res_block_nobn_init(ks[5], nf),
        "block2": {"body": [conv2d_init(ks[6], 3, 3, nf, nf), None,
                            conv2d_init(ks[7], 3, 3, nf, nf), None,
                            conv2d_init(jax.random.fold_in(ks[7], 1), 1, 1, nf, nf)]},
        "ca": _ca_init(ks[8], nf),
    }


def _eam(p, x):
    m = p["merge"]
    d1 = relu(conv2d(x, m["dilation1"][0]["w"], m["dilation1"][0]["b"], padding=1))
    d1 = relu(conv2d(d1, m["dilation1"][2]["w"], m["dilation1"][2]["b"],
                     padding=2, dilation=2))
    d2 = relu(conv2d(x, m["dilation2"][0]["w"], m["dilation2"][0]["b"],
                     padding=3, dilation=3))
    d2 = relu(conv2d(d2, m["dilation2"][2]["w"], m["dilation2"][2]["b"],
                     padding=4, dilation=4))
    agg = relu(conv2d(jnp.concatenate([d1, d2], -1), m["aggregation"][0]["w"],
                      m["aggregation"][0]["b"], padding=1))
    h = agg + x
    h = relu(_res_block_nobn(p["block1"], h))
    b = p["block2"]["body"]
    e = relu(conv2d(h, b[0]["w"], b[0]["b"], padding=1))
    e = relu(conv2d(e, b[2]["w"], b[2]["b"], padding=1))
    e = conv2d(e, b[4]["w"], b[4]["b"])
    h = relu(e + h)
    return _ca(p["ca"], h)


@ARCH_REGISTRY.register(name="RIDNet")
class RIDNet:
    RGB_MEAN = (0.4488, 0.4371, 0.4040)

    @staticmethod
    def init(key, in_channels=3, mid_channels=64, out_channels=3, num_block=4):
        ks = jax.random.split(key, num_block + 2)
        return {"head": conv2d_init(ks[0], 3, 3, in_channels, mid_channels),
                "body": [_eam_init(k, mid_channels) for k in ks[1:-1]],
                "tail": conv2d_init(ks[-1], 3, 3, mid_channels, out_channels)}

    @staticmethod
    def apply(params, x, img_range=255.0):
        # MeanShift conv pair (ridnet_arch.py:8-28): sub 255*mean, add back
        mean = jnp.asarray(RIDNet.RGB_MEAN, x.dtype) * img_range
        res = x - mean
        h = relu(_conv(params["head"], res))
        for bp in params["body"]:
            h = _eam(bp, h)
        res = _conv(params["tail"], h) + mean
        return x + res


# ---------------------------------------------------------------------------
# ECBSR (training-form branch sum == re-parameterized conv numerically)
# ---------------------------------------------------------------------------

# plain numpy, NOT device arrays: a module-level jnp.asarray initializes
# the JAX backend at import time, locking the platform before callers can
# run jax.config.update("jax_platforms", ...)
_SOBEL_X = np.asarray([[1, 0, -1], [2, 0, -2], [1, 0, -1]], np.float32)
_SOBEL_Y = _SOBEL_X.T
_LAPLACIAN = np.asarray([[0, 1, 0], [1, -4, 1], [0, 1, 0]], np.float32)


def _seqconv_init(key, kind, cin, cout, depth_multiplier=1.0):
    k1, k2, k3 = jax.random.split(key, 3)
    if kind == "conv1x1-conv3x3":
        mid = int(cout * depth_multiplier)
        return {"k0": conv2d_init(k1, 1, 1, cin, mid),
                "k1": conv2d_init(k2, 3, 3, mid, cout)}
    return {"k0": conv2d_init(k1, 1, 1, cin, cout),
            "scale": jax.random.normal(k2, (cout,)) * 1e-3,
            "bias": jax.random.normal(k3, (cout,)) * 1e-3}


def _pad_with_bias(y, b):
    """Zero-pad by 1 then overwrite the border ring with the bias value
    (ecbsr_arch.py:115-127)."""
    yp = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)))
    h, w = yp.shape[1], yp.shape[2]
    ring = jnp.zeros((h, w, 1), bool).at[0, :].set(True).at[-1, :].set(True) \
        .at[:, 0].set(True).at[:, -1].set(True)
    return jnp.where(ring, b, yp)


def _seqconv(p, x, kind):
    y0 = conv2d(x, p["k0"]["w"], p["k0"]["b"])
    y0 = _pad_with_bias(y0, p["k0"]["b"])
    if kind == "conv1x1-conv3x3":
        return conv2d(y0, p["k1"]["w"], p["k1"]["b"])
    fixed = {"conv1x1-sobelx": _SOBEL_X, "conv1x1-sobely": _SOBEL_Y,
             "conv1x1-laplacian": _LAPLACIAN}[kind]
    cout = y0.shape[-1]
    w = (fixed[:, :, None, None] * p["scale"]).astype(y0.dtype)  # (3,3,1,C)
    return conv2d(y0, w, p["bias"], groups=cout)


def _ecb_init(key, cin, cout, depth_multiplier=2.0, with_idt=False):
    ks = jax.random.split(key, 6)
    return {"conv3x3": conv2d_init(ks[0], 3, 3, cin, cout),
            "conv1x1_3x3": _seqconv_init(ks[1], "conv1x1-conv3x3", cin, cout,
                                         depth_multiplier),
            "conv1x1_sbx": _seqconv_init(ks[2], "conv1x1-sobelx", cin, cout),
            "conv1x1_sby": _seqconv_init(ks[3], "conv1x1-sobely", cin, cout),
            "conv1x1_lpl": _seqconv_init(ks[4], "conv1x1-laplacian", cin, cout),
            "act": {"prelu_w": jnp.full((cout,), 0.25)}}


def _ecb(p, x, act_type="prelu", with_idt=False):
    y = conv2d(x, p["conv3x3"]["w"], p["conv3x3"]["b"], padding=1)
    y = y + _seqconv(p["conv1x1_3x3"], x, "conv1x1-conv3x3")
    y = y + _seqconv(p["conv1x1_sbx"], x, "conv1x1-sobelx")
    y = y + _seqconv(p["conv1x1_sby"], x, "conv1x1-sobely")
    y = y + _seqconv(p["conv1x1_lpl"], x, "conv1x1-laplacian")
    if with_idt and x.shape[-1] == y.shape[-1]:
        y = y + x
    if act_type == "prelu":
        y = jnp.where(y >= 0, y, y * p["act"]["prelu_w"])
    elif act_type == "relu":
        y = relu(y)
    return y


def _seqconv_rep(p, kind):
    """Collapse a SeqConv3x3 branch to one (RK, RB) 3x3 conv
    (ecbsr_arch.py:131-155). The bias-ring padding equals a constant-b0
    field beyond the image, so zero-padded SAME conv with the folded bias
    is exact."""
    k0 = np.asarray(p["k0"]["w"])  # (1,1,cin,mid)
    b0 = np.asarray(p["k0"]["b"])
    if kind == "conv1x1-conv3x3":
        k1 = np.asarray(p["k1"]["w"])  # (3,3,mid,cout)
        b1 = np.asarray(p["k1"]["b"])
        rk = np.einsum("cm,hwmo->hwco", k0[0, 0], k1)
        rb = np.einsum("hwmo,m->o", k1, b0) + b1
        return rk, rb
    fixed = {"conv1x1-sobelx": _SOBEL_X, "conv1x1-sobely": _SOBEL_Y,
             "conv1x1-laplacian": _LAPLACIAN}[kind]
    scale = np.asarray(p["scale"])
    bias = np.asarray(p["bias"])
    # depthwise fixed kernel per output channel over the 1x1 projection
    rk = k0[0, 0][None, None] * (fixed[:, :, None, None] * scale[None, None, None])
    rb = fixed.sum() * scale * b0 + bias
    return rk, rb


def _ecb_rep(p, cin, cout, with_idt=False):
    """ECB.rep_params (ecbsr_arch.py:214-233): sum the five branch kernels
    (+ identity when with_idt)."""
    rk = np.asarray(p["conv3x3"]["w"]).copy()
    rb = np.asarray(p["conv3x3"]["b"]).copy()
    for key, kind in (("conv1x1_3x3", "conv1x1-conv3x3"),
                      ("conv1x1_sbx", "conv1x1-sobelx"),
                      ("conv1x1_sby", "conv1x1-sobely"),
                      ("conv1x1_lpl", "conv1x1-laplacian")):
        k, b = _seqconv_rep(p[key], kind)
        rk += k
        rb += b
    if with_idt and cin == cout:
        for c in range(cin):
            rk[1, 1, c, c] += 1.0
    return {"w": rk, "b": rb, "act": p["act"]}


@ARCH_REGISTRY.register(name="ECBSR")
class ECBSR:
    @staticmethod
    def init(key, num_in_ch=1, num_out_ch=1, num_block=4, num_channel=16,
             with_idt=False, act_type="prelu", scale=4):
        ks = jax.random.split(key, num_block + 2)
        backbone = [_ecb_init(ks[0], num_in_ch, num_channel, with_idt=with_idt)]
        for k in ks[1:num_block + 1]:
            backbone.append(_ecb_init(k, num_channel, num_channel, with_idt=with_idt))
        backbone.append(_ecb_init(ks[-1], num_channel,
                                  num_out_ch * scale * scale, with_idt=with_idt))
        return {"backbone": backbone}

    @staticmethod
    def apply(params, x, num_in_ch=1, scale=4, with_idt=False,
              act_type="prelu"):
        if num_in_ch > 1:
            shortcut = jnp.repeat(x, scale * scale, axis=-1)
        else:
            shortcut = jnp.tile(x, (1, 1, 1, scale * scale))
        y = x
        n = len(params["backbone"])
        for i, bp in enumerate(params["backbone"]):
            at = "linear" if i == n - 1 else act_type
            y = _ecb(bp, y, act_type=at, with_idt=with_idt)
        y = y + shortcut
        return pixel_shuffle(y, scale)

    @staticmethod
    def rep_params(params, with_idt=False):
        """Deploy-time re-parameterization (ecbsr_arch.py:131-233): each ECB's
        five branches (+identity) collapse into ONE 3x3 conv — the plain-conv
        net apply_rep runs is numerically identical to the training form."""
        reps = []
        for bp in params["backbone"]:
            cin = bp["conv3x3"]["w"].shape[2]
            cout = bp["conv3x3"]["w"].shape[3]
            reps.append(_ecb_rep(bp, cin, cout, with_idt=with_idt))
        return {"backbone": [
            {"w": jnp.asarray(r["w"]), "b": jnp.asarray(r["b"]),
             "act": r["act"]} for r in reps]}

    @staticmethod
    def apply_rep(rep, x, num_in_ch=1, scale=4, act_type="prelu"):
        """Forward through the collapsed single-conv blocks."""
        if num_in_ch > 1:
            shortcut = jnp.repeat(x, scale * scale, axis=-1)
        else:
            shortcut = jnp.tile(x, (1, 1, 1, scale * scale))
        y = x
        n = len(rep["backbone"])
        for i, bp in enumerate(rep["backbone"]):
            y = conv2d(y, bp["w"], bp["b"], padding=1)
            if i < n - 1:
                if act_type == "prelu":
                    y = jnp.where(y >= 0, y, y * bp["act"]["prelu_w"])
                elif act_type == "relu":
                    y = relu(y)
        y = y + shortcut
        return pixel_shuffle(y, scale)
