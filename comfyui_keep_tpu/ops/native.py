"""Native-op tier — TPU rebuilds of the reference's C++/CUDA extensions
(wm_basicsr/ops/: dcn, fused_act, upfirdn2d; archs/correlation.py CuPy).

On TPU the idiomatic 'native' implementation maps each op onto the MXU/VPU
through XLA primitives (im2col-gather + one matmul for DCN; lhs-dilated conv
for upfirdn2d), with jax.custom_vjp where the reference ships a hand-written
backward. Pallas kernels for the pointwise fusions live in ops/pallas_kernels.
All ops are channels-last.
"""
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# fused bias + scaled LeakyReLU (ops/fused_act, StyleGAN2)
# ---------------------------------------------------------------------------

@jax.custom_vjp
def fused_leaky_relu(x, bias, negative_slope=0.2, scale=2 ** 0.5):
    return _flr_fwd_impl(x, bias, negative_slope, scale)


def _flr_fwd_impl(x, bias, negative_slope, scale):
    h = x + bias
    return jnp.where(h >= 0, h, h * negative_slope) * scale


def _flr_fwd(x, bias, negative_slope, scale):
    h = x + bias
    out = jnp.where(h >= 0, h, h * negative_slope) * scale
    return out, (h >= 0, negative_slope, scale, bias.shape, x.ndim)


def _flr_bwd(res, g):
    pos, negative_slope, scale, bias_shape, ndim = res
    gx = jnp.where(pos, g, g * negative_slope) * scale
    # bias grad reduces over all non-channel dims (channel = trailing)
    axes = tuple(range(ndim - 1))
    gb = gx.sum(axis=axes).reshape(bias_shape)
    return gx, gb, None, None


fused_leaky_relu.defvjp(_flr_fwd, _flr_bwd)


# ---------------------------------------------------------------------------
# upfirdn2d (ops/upfirdn2d, StyleGAN2): upsample -> FIR -> downsample.
# Expressed as ONE lax conv with lhs_dilation (zero-insert upsampling),
# explicit padding and window strides — XLA lowers this directly onto the
# conv unit, which is the TPU-native fusion of the CUDA kernel.
# ---------------------------------------------------------------------------

def upfirdn2d(x, kernel, up: int = 1, down: int = 1,
              pad: Tuple[int, int] = (0, 0)):
    """x: (N, H, W, C); kernel: (kh, kw) FIR filter. pad=(pad0, pad1) applied
    to both spatial dims (reference upfirdn2d.py API)."""
    n, h, w, c = x.shape
    kh, kw = kernel.shape
    pad_y0, pad_y1 = pad[0], pad[1]
    pad_x0, pad_x1 = pad[0], pad[1]
    # depthwise conv: correlation with flipped kernel == convolution w/ kernel
    k = jnp.flip(kernel, (0, 1)).astype(x.dtype)
    k = jnp.tile(k[:, :, None, None], (1, 1, 1, c))
    # lhs_dilation produces (in-1)*up+1 samples; upfirdn zero-inserts AFTER
    # every sample (in*up) — fold the missing up-1 trailing zeros into pad1
    out = jax.lax.conv_general_dilated(
        x, k,
        window_strides=(down, down),
        padding=((pad_y0, pad_y1 + up - 1), (pad_x0, pad_x1 + up - 1)),
        lhs_dilation=(up, up),
        feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out


def make_resample_kernel(k) -> jnp.ndarray:
    """1D -> separable 2D normalized kernel (stylegan2 upfirdn helper)."""
    k = jnp.asarray(k, jnp.float32)
    if k.ndim == 1:
        k = k[None, :] * k[:, None]
    return k / k.sum()


# ---------------------------------------------------------------------------
# Deformable convolution v1/v2 (ops/dcn): bilinear-sampled im2col + matmul.
# The gather builds (N, Ho, Wo, K*K*Cin) patch tensors feeding ONE MXU
# matmul — the TPU equivalent of deformable_im2col + GEMM
# (ops/dcn/src/deform_conv_cuda_kernel.cu).
# ---------------------------------------------------------------------------

def _dcn_sample(x, offset, mask, ksize, stride, padding, dilation,
                deformable_groups):
    """Returns patches (N, Ho, Wo, kh*kw, Cin)."""
    n, h, w, cin = x.shape
    kh, kw = ksize
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1

    # base sampling locations per output position and kernel tap
    ys = jnp.arange(ho) * stride - padding
    xs = jnp.arange(wo) * stride - padding
    ky = jnp.arange(kh) * dilation
    kx = jnp.arange(kw) * dilation
    base_y = ys[:, None, None, None] + ky[None, None, :, None]  # (ho,1,kh,1)
    base_x = xs[None, :, None, None] + kx[None, None, None, :]  # (1,wo,1,kw)
    base_y = jnp.broadcast_to(base_y, (ho, wo, kh, kw)).astype(x.dtype)
    base_x = jnp.broadcast_to(base_x, (ho, wo, kh, kw)).astype(x.dtype)

    # offsets: (N, Ho, Wo, dg*2*kh*kw); channel layout per deformable group is
    # tap-major interleaved (y0, x0, y1, x1, ...) — the CUDA kernel indexes
    # data_offset at 2*(i*kw+j) / +1 (deform_conv_cuda_kernel.cu)
    off = offset.reshape(n, ho, wo, deformable_groups, kh, kw, 2)
    oy = off[..., 0]
    ox = off[..., 1]
    py = base_y[None, :, :, None] + oy  # (n, ho, wo, dg, kh, kw)
    px = base_x[None, :, :, None] + ox

    # bilinear sample with zero padding outside
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    wy = py - y0
    wx = px - x0

    cg = cin // deformable_groups
    xg = x.reshape(n, h, w, deformable_groups, cg)

    flat = xg.reshape(n, h * w, deformable_groups, cg)

    def corner(yi, xi):
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        idx = (yc * w + xc)  # (n, ho, wo, dg, kh, kw)
        idxp = idx.transpose(0, 1, 2, 4, 5, 3)  # (n, ho, wo, kh, kw, dg)
        idxf = idxp.reshape(n, -1, deformable_groups, 1)
        gathered = jnp.take_along_axis(flat, idxf, axis=1)  # (n, P, dg, cg)
        v = gathered.reshape(n, ho, wo, kh, kw, deformable_groups, cg)
        v = v.transpose(0, 1, 2, 5, 3, 4, 6)  # (n, ho, wo, dg, kh, kw, cg)
        ok = ((yi > -1) & (yi < h) & (xi > -1) & (xi < w))
        return v * ok[..., None].astype(x.dtype)

    v00 = corner(y0, x0)
    v01 = corner(y0, x0 + 1)
    v10 = corner(y0 + 1, x0)
    v11 = corner(y0 + 1, x0 + 1)
    wy = wy[..., None]
    wx = wx[..., None]
    val = (v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
           v10 * wy * (1 - wx) + v11 * wy * wx)
    if mask is not None:  # v2 modulation: (N, Ho, Wo, dg*kh*kw)
        m = mask.reshape(n, ho, wo, deformable_groups, kh, kw)
        val = val * m[..., None]
    # (n, ho, wo, dg, kh, kw, cg) -> (n, ho, wo, kh*kw, cin)
    val = val.transpose(0, 1, 2, 4, 5, 3, 6).reshape(n, ho, wo, kh * kw, cin)
    return val


def deform_conv2d(x, offset, weight, bias=None, stride=1, padding=0,
                  dilation=1, groups=1, deformable_groups=1, mask=None):
    """DCNv1 (mask=None) / DCNv2 (modulated). x: (N,H,W,Cin);
    weight: (kh,kw,Cin//groups,Cout); offset: (N,Ho,Wo,dg*2*kh*kw) in
    (y, x) tap order; mask: (N,Ho,Wo,dg*kh*kw)."""
    kh, kw = weight.shape[0], weight.shape[1]
    patches = _dcn_sample(x, offset, mask, (kh, kw), stride, padding,
                          dilation, deformable_groups)
    n, ho, wo = patches.shape[:3]
    cin = x.shape[-1]
    cout = weight.shape[-1]
    if groups == 1:
        w2 = weight.reshape(kh * kw * cin, cout)
        out = patches.reshape(n, ho, wo, kh * kw * cin) @ w2
    else:
        cgi = cin // groups
        cgo = cout // groups
        pg = patches.reshape(n, ho, wo, kh * kw, groups, cgi)
        wg = weight.reshape(kh, kw, cgi, groups, cgo)
        out = jnp.einsum("nhwkgc,kcgo->nhwgo",
                         pg, wg.reshape(kh * kw, cgi, groups, cgo))
        out = out.reshape(n, ho, wo, cout)
    if bias is not None:
        out = out + bias
    return out


def dcn_v2_pack(x, feat, params, stride=1, padding=1, dilation=1,
                deformable_groups=1, max_residue_magnitude=None):
    """DCNv2Pack (arch_util.py:205-231): offsets+mask predicted from a second
    feature map by conv_offset; offset channel layout o1,o2,mask with
    (y, x) interleaving as in the reference."""
    co = params["conv_offset"]
    from comfyui_keep_tpu.ops.conv import conv2d
    out = conv2d(feat, co["w"], co["b"], stride=stride, padding=padding)
    o1, o2, m = jnp.split(out, 3, axis=-1)
    offset = jnp.concatenate([o1, o2], axis=-1)
    if max_residue_magnitude is not None:
        offset = max_residue_magnitude * jnp.tanh(offset)
    mask = jax.nn.sigmoid(m)
    return deform_conv2d(x, offset, params["w"], params.get("b"),
                         stride=stride, padding=padding, dilation=dilation,
                         deformable_groups=deformable_groups, mask=mask)


# ---------------------------------------------------------------------------
# Correlation / cost volume (archs/correlation.py CuPy module):
# corr(f1, f2)[n, y, x, d] = <f1[n,y,x,:], f2[n,y+dy,x+dx,:]> / C
# over a (2*max_disp+1)^2 displacement window.
# ---------------------------------------------------------------------------

def correlation(f1, f2, max_displacement: int = 4):
    """f1/f2: (N, H, W, C) -> (N, H, W, (2d+1)^2), reference kernel semantics
    (zero padding outside, normalized by channel count)."""
    n, h, w, c = f1.shape
    d = max_displacement
    f2p = jnp.pad(f2, ((0, 0), (d, d), (d, d), (0, 0)))
    outs = []
    for dy in range(2 * d + 1):
        for dx in range(2 * d + 1):
            shifted = jax.lax.dynamic_slice(f2p, (0, dy, dx, 0), (n, h, w, c))
            outs.append(jnp.sum(f1 * shifted, axis=-1) / c)
    return jnp.stack(outs, axis=-1)
