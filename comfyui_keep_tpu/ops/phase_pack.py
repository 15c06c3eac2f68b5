"""Phase-packed (space-to-depth) execution of 3x3-conv stacks.

The VQGAN encoder/generator spend most of their FLOPs in 3x3 convs at the
512x512 level with only 64 output channels (vqgan_arch.py:246-343) — half
the MXU's 128 lanes idle and measured throughput is ~23 TFLOP/s on v5e.
Packing 2x2 pixel phases into channels turns each such conv into ONE 2x2
conv at 256x256 with 4x the channels (measured ~60 TFLOP/s): every 3x3
SAME conv maps *exactly* onto a 2x2 conv in phase space provided the output
packing grid is shifted one pixel relative to the input's — so a chain of
convs alternates packing parity and no high-resolution pixel interleave
ever materializes (the cost that sank the naive phase decomposition, see
docs/ROADMAP.md negative results).

Geometry. A packed tensor at parity o∈{0,1} has coarse cells covering
original rows {2i-o, 2i-o+1}; parity-0 tensors have H/2 cells (rows 0..H-1
exactly), parity-1 tensors have H/2+1 cells whose first/last half-rows are
the SAME-padding rows -1 and H and are kept ZERO (`mask_parity1`). Channel
layout is phase-major: packed channel (qy*2+qx)*C + c.

For a 3x3 SAME conv, output row 2j-o'+py reads input rows 2j-o'+py+dy-1;
with o' = 1-o every read lands in coarse cells {j-1, j} (parity 0→1, pad
coarse by 1 on each side) or {j, j+1} (parity 1→0, VALID) — one 2x2 conv
either way, with the packed kernel built by `pack_conv3x3`. Stride-2
(0,1,0,1)-padded Downsample (vqgan_arch.py:129-139) consumes a parity-1
tensor and emits an ordinary unpacked half-res map; nearest-up + conv3x3
(`Upsample`, vqgan_arch.py:142-152) consumes an unpacked map and emits a
parity-1 packed one, at 4/9 of the unpacked MACs (the nearest-duplicated
pixels are never materialized).

All products are identical to the unpacked ops — only summation order
changes — so this is numerics-preserving up to float addition order.
Weight packing runs once on the host (`numpy`) at model-prepare time, not
inside jit.
"""
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Pack / unpack
# ---------------------------------------------------------------------------

def space_to_depth(x):
    """(B, H, W, C) -> parity-0 packed (B, H/2, W/2, 4C), phase-major."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, Hc, Wc, py, px, C)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(x, parity: int = 0):
    """Inverse of space_to_depth. parity-1 tensors drop their -1/H pad rows."""
    b, hc, wc, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, hc, wc, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(b, 2 * hc, 2 * wc, c)
    if parity:
        x = x[:, 1:-1, 1:-1, :]
    return x


def mask_parity1(x, c: int):
    """Zero the half-cells of a parity-1 packed tensor that represent the
    SAME-padding rows/cols -1 and H (phase blocks are channel ranges;
    qy==0 -> blocks 0,1; qy==1 -> blocks 2,3; qx==0 -> blocks 0,2;
    qx==1 -> blocks 1,3).

    Implemented as two broadcast multiplies with tiny separable row/col
    masks — elementwise, so XLA fuses them into the producing conv/norm
    epilogue (dynamic-update-slice variants materialize the full tensor
    per update and measure ~8% slower end-to-end)."""
    hc, wc = x.shape[-3], x.shape[-2]
    dt = x.dtype
    # (Hc, 4) over (qy*2+qx) phase blocks, broadcast over the C channels
    rows = jnp.ones((hc, 4), dt).at[0, :2].set(0).at[-1, 2:].set(0)
    cols = jnp.ones((wc, 4), dt).at[0, 0::2].set(0).at[-1, 1::2].set(0)
    rows = jnp.repeat(rows, c, axis=-1)  # (Hc, 4C)
    cols = jnp.repeat(cols, c, axis=-1)
    return x * rows[:, None, :] * cols[None, :, :]


# ---------------------------------------------------------------------------
# Host-side weight packing (numpy, once per model prepare)
# ---------------------------------------------------------------------------

def pack_conv3x3(w: np.ndarray, b: Optional[np.ndarray]):
    """(3,3,Cin,Cout) SAME conv -> (2,2,4Cin,4Cout) packed kernel (+ bias
    tiled per output phase). The same kernel serves both parity directions;
    only the coarse padding differs (see `packed_conv`)."""
    w = np.asarray(w)
    cin, cout = w.shape[2], w.shape[3]
    pw = np.zeros((2, 2, 4 * cin, 4 * cout), w.dtype)
    for py in range(2):
        for px in range(2):
            for dy in range(3):
                for dx in range(3):
                    u, v = py + dy, px + dx
                    ty, tx = u // 2, v // 2
                    qy, qx = u % 2, v % 2
                    pw[ty, tx, (qy * 2 + qx) * cin:(qy * 2 + qx + 1) * cin,
                       (py * 2 + px) * cout:(py * 2 + px + 1) * cout] += w[dy, dx]
    pb = None if b is None else np.tile(np.asarray(b), 4)
    return pw, pb


def pack_upconv3x3(w: np.ndarray, b: Optional[np.ndarray]):
    """nearest-2x-up + 3x3 SAME conv -> (2,2,Cin,4Cout) packed kernel over
    the UN-upsampled input (emits a parity-1 packed tensor)."""
    w = np.asarray(w)
    cin, cout = w.shape[2], w.shape[3]
    pw = np.zeros((2, 2, cin, 4 * cout), w.dtype)
    for py in range(2):
        for px in range(2):
            for dy in range(3):
                for dx in range(3):
                    ty, tx = (py + dy) // 2, (px + dx) // 2
                    pw[ty, tx, :, (py * 2 + px) * cout:(py * 2 + px + 1) * cout] \
                        += w[dy, dx]
    pb = None if b is None else np.tile(np.asarray(b), 4)
    return pw, pb


def pack_downsample3x3(w: np.ndarray, b: Optional[np.ndarray]):
    """(0,1,0,1)-pad stride-2 3x3 conv consuming a parity-1 packed input ->
    (2,2,4Cin,Cout) kernel emitting an ordinary unpacked half-res map."""
    w = np.asarray(w)
    cin = w.shape[2]
    pw = np.zeros((2, 2, 4 * cin) + w.shape[3:], w.dtype)
    for dy in range(3):
        for dx in range(3):
            ty, tx = (dy + 1) // 2, (dx + 1) // 2
            qy, qx = (dy + 1) % 2, (dx + 1) % 2
            pw[ty, tx, (qy * 2 + qx) * cin:(qy * 2 + qx + 1) * cin] += w[dy, dx]
    return pw, (None if b is None else np.asarray(b))


# ---------------------------------------------------------------------------
# Device-side packed ops
# ---------------------------------------------------------------------------

_DN = ("NHWC", "HWIO", "NHWC")


def packed_conv(x, pw, pb, parity: int):
    """Packed 3x3-equivalent conv. parity = parity of x; output parity flips.
    Output is boundary-masked when it is parity-1."""
    pad = [(1, 1), (1, 1)] if parity == 0 else [(0, 0), (0, 0)]
    out = jax.lax.conv_general_dilated(x, pw, (1, 1), pad,
                                       dimension_numbers=_DN)
    if pb is not None:
        out = out + pb
    if parity == 0:  # output parity 1 -> zero the -1/H half-cells
        out = mask_parity1(out, pw.shape[-1] // 4)
    return out


def packed_upconv(x, pw, pb):
    """Unpacked (B, H, W, C) -> parity-1 packed (B, H+1, W+1, 4Cout):
    nearest-2x upsample + 3x3 conv, computed without materializing 2H x 2W."""
    out = jax.lax.conv_general_dilated(x, pw, (1, 1), [(1, 1), (1, 1)],
                                       dimension_numbers=_DN)
    if pb is not None:
        out = out + pb
    return mask_parity1(out, pw.shape[-1] // 4)


def packed_downsample(x, pw, pb):
    """parity-1 packed (B, Hc, Wc, 4C) -> unpacked (B, (Hc-1), (Wc-1), Cout)."""
    out = jax.lax.conv_general_dilated(x, pw, (1, 1), [(0, 0), (0, 0)],
                                       dimension_numbers=_DN)
    if pb is not None:
        out = out + pb
    return out


def packed_conv1x1(x, w, b, parity: int):
    """Per-phase 1x1 conv on a packed tensor (used by ResBlock skip
    projections). w: (1,1,Cin,Cout) unpacked."""
    bsz, hc, wc, c4 = x.shape
    cin = w.shape[2]
    cout = w.shape[3]
    out = jnp.einsum("bhwpc,cd->bhwpd", x.reshape(bsz, hc, wc, 4, cin),
                     w.reshape(cin, cout)).reshape(bsz, hc, wc, 4 * cout)
    if b is not None:
        out = out + jnp.tile(b, 4)
    if parity == 1:
        out = mask_parity1(out, cout)
    return out


def packed_group_norm(x, params, true_hw: Tuple[int, int],
                      num_groups: int = 32, eps: float = 1e-6,
                      parity: int = 0, swish_after: bool = False):
    """GroupNorm over the ORIGINAL (H, W, C) geometry of a packed tensor.

    Parity-1 pad half-cells are zeros, so per-channel f32 sums over the
    packed layout equal the true sums; stats divide by the true element
    count. After normalize (+ optional fused swish) parity-1 tensors are
    re-masked (normalizing maps pad zeros to -mean/std != 0)."""
    c4 = x.shape[-1]
    c = c4 // 4
    k = c // num_groups
    n = true_hw[0] * true_hw[1] * k
    # same B>=2 scan-body layout guard as ops/norm.py group_norm (round-5
    # bisection): keep XLA from fusing the stats reduce into the producing
    # packed conv, which flips the conv to a height-major layout at B>1
    from comfyui_keep_tpu.ops.norm import needs_scan_barrier
    if needs_scan_barrier(x):
        x = jax.lax.optimization_barrier(x)
    ct = jnp.promote_types(x.dtype, jnp.float32)  # f32 stats; exact in f64
    xf = x.astype(ct)
    s1 = jnp.sum(xf, axis=(-3, -2))                 # (..., 4C)
    s2 = jnp.sum(jnp.square(xf), axis=(-3, -2))
    # fold the 4 phase copies of each channel together
    s1 = s1.reshape(s1.shape[:-1] + (4, c)).sum(-2)
    s2 = s2.reshape(s2.shape[:-1] + (4, c)).sum(-2)
    g1 = s1.reshape(s1.shape[:-1] + (num_groups, k)).sum(-1)
    g2 = s2.reshape(s2.shape[:-1] + (num_groups, k)).sum(-1)
    mean = g1 / n
    var = g2 / n - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    scale = jnp.repeat(inv, k, axis=-1)
    shift = jnp.repeat(-mean * inv, k, axis=-1)
    if params is not None:
        gamma = params["scale"].astype(ct)
        scale = scale * gamma
        shift = shift * gamma + params["bias"].astype(ct)
    scale = jnp.tile(scale, 4)[..., None, None, :]
    shift = jnp.tile(shift, 4)[..., None, None, :]
    out = xf * scale + shift
    if swish_after:
        out = out * jax.nn.sigmoid(out)
    out = out.astype(x.dtype)
    if parity == 1:
        out = mask_parity1(out, c)
    return out


# ---------------------------------------------------------------------------
# Packed -> packed upconv (multi-level tails without depth_to_space)
# ---------------------------------------------------------------------------

# Per-dim weight-folding tables for nearest-2x-up + 3x3 SAME conv consuming a
# PARITY-1 PACKED input and emitting a PARITY-1 PACKED output at 2x res.
# Derivation (1D; output row r = 2j-1+p reads up rows r-1..r+1, up[s]=x[s//2],
# parity-1 cell i holds rows {2i-1, 2i}: odd rows phase 0, even rows phase 1):
#   even output cell j=2m   -> both source rows {x[2m-1], x[2m]} live in
#                              input cell m (1-tap conv)
#   odd  output cell j=2m+1 -> rows {x[2m], x[2m+1]} live in cells {m, m+1}
#                              (2-tap conv)
# F[tap, p, q] = length-3 coefficient vector over (w0, w1, w2).
_FOLD_EVEN = np.zeros((1, 2, 2, 3), np.float64)
_FOLD_EVEN[0, 0, 0] = (1, 1, 0)   # p0 <- (w0+w1) * phase-0 (odd row 2m-1)
_FOLD_EVEN[0, 0, 1] = (0, 0, 1)   # p0 <- w2      * phase-1 (even row 2m)
_FOLD_EVEN[0, 1, 0] = (1, 0, 0)   # p1 <- w0      * phase-0
_FOLD_EVEN[0, 1, 1] = (0, 1, 1)   # p1 <- (w1+w2) * phase-1
_FOLD_ODD = np.zeros((2, 2, 2, 3), np.float64)
_FOLD_ODD[0, 0, 1] = (1, 1, 0)    # left cell m,  p0 <- (w0+w1) * phase-1
_FOLD_ODD[0, 1, 1] = (1, 0, 0)    # left cell m,  p1 <- w0      * phase-1
_FOLD_ODD[1, 0, 0] = (0, 0, 1)    # right cell m+1, p0 <- w2      * phase-0
_FOLD_ODD[1, 1, 0] = (0, 1, 1)    # right cell m+1, p1 <- (w1+w2) * phase-0


def pack_upconv3x3_p2p(w: np.ndarray, b: Optional[np.ndarray]):
    """nearest-2x-up + 3x3 SAME conv, PARITY-1 PACKED input -> PARITY-1
    PACKED output at 2x resolution, as FOUR plane kernels (output cells split
    by row/col parity: ee (1,1), eo (1,2), oe (2,1), oo (2,2) taps on the
    coarse grid). Same MAC count as `pack_upconv3x3` (16*H^2*Cin*Cout = 4/9
    of the unpacked op) but no depth_to_space between packed levels."""
    w = np.asarray(w)
    cin, cout = w.shape[2], w.shape[3]
    tables = {"e": _FOLD_EVEN, "o": _FOLD_ODD}
    kernels = {}
    for ry in "eo":
        for rx in "eo":
            fy, fx = tables[ry], tables[rx]
            k = np.zeros((fy.shape[0], fx.shape[0], 4 * cin, 4 * cout),
                         w.dtype)
            for iy in range(fy.shape[0]):
                for ix in range(fx.shape[0]):
                    for py in range(2):
                        for px in range(2):
                            for qy in range(2):
                                for qx in range(2):
                                    coeff = np.outer(fy[iy, py, qy],
                                                     fx[ix, px, qx])
                                    if not coeff.any():
                                        continue
                                    blk = np.einsum("yx,yxio->io",
                                                    coeff, w.astype(np.float64))
                                    k[iy, ix,
                                      (qy * 2 + qx) * cin:(qy * 2 + qx + 1) * cin,
                                      (py * 2 + px) * cout:(py * 2 + px + 1) * cout] \
                                        += blk.astype(w.dtype)
            kernels[ry + rx] = k
    pb = None if b is None else np.tile(np.asarray(b), 4)
    return kernels, pb


def _interleave(a_e, a_o, axis: int):
    """Interleave n and n-1 slices -> 2n-1 (e0 o0 e1 o1 ... e_{n-1})."""
    pad = [(0, 0)] * a_o.ndim
    pad[axis] = (0, 1)
    a_o = jnp.pad(a_o, pad)
    st = jnp.stack([a_e, a_o], axis=axis + 1)
    shape = list(a_e.shape)
    n = shape[axis]
    shape[axis] = 2 * n
    out = st.reshape(shape)
    return jax.lax.slice_in_dim(out, 0, 2 * n - 1, axis=axis)


def packed_upconv_p2p(x, kernels, pb):
    """parity-1 packed (B, Hc, Wc, 4Cin) at level L -> parity-1 packed
    (B, 2Hc-1, 2Wc-1, 4Cout) at level 2L (true 2H x 2W with H = 2(Hc-1)).
    Four plane convs + coarse-grid interleave; boundary pad half-cells of the
    input must already be zero (maintained by mask_parity1 upstream)."""
    conv = lambda k: jax.lax.conv_general_dilated(
        x, k, (1, 1), [(0, 0), (0, 0)], dimension_numbers=_DN)
    ee = conv(kernels["ee"])            # (B, Hc,   Wc,   4Cout)
    eo = conv(kernels["eo"])            # (B, Hc,   Wc-1, 4Cout)
    oe = conv(kernels["oe"])            # (B, Hc-1, Wc,   4Cout)
    oo = conv(kernels["oo"])            # (B, Hc-1, Wc-1, 4Cout)
    col_e = _interleave(ee, oe, axis=1)  # (B, 2Hc-1, Wc,   .)
    col_o = _interleave(eo, oo, axis=1)  # (B, 2Hc-1, Wc-1, .)
    out = _interleave(col_e, col_o, axis=2)  # (B, 2Hc-1, 2Wc-1, .)
    if pb is not None:
        out = out + pb
    return mask_parity1(out, kernels["ee"].shape[-1] // 4)


def pack_downsample3x3_p0(w: np.ndarray, b: Optional[np.ndarray]):
    """(0,1,0,1)-pad stride-2 3x3 conv consuming a PARITY-0 packed input ->
    (2,2,4Cin,Cout) kernel emitting an ordinary unpacked half-res map.

    Derivation: out row j reads input rows {2j, 2j+1, 2j+2}; parity-0 cell i
    holds rows {2i, 2i+1} (phase = row % 2), so taps land in cells {j, j+1}:
    tap 0 <- (q0: w0, q1: w1), tap 1 <- (q0: w2). Use with coarse padding
    (0,1),(0,1) — the virtual pad cell reproduces the op's bottom/right
    zero pad."""
    w = np.asarray(w)
    cin = w.shape[2]
    pw = np.zeros((2, 2, 4 * cin) + w.shape[3:], w.dtype)
    for dy in range(3):
        for dx in range(3):
            ty, qy = (0, dy) if dy < 2 else (1, 0)
            tx, qx = (0, dx) if dx < 2 else (1, 0)
            pw[ty, tx, (qy * 2 + qx) * cin:(qy * 2 + qx + 1) * cin] += w[dy, dx]
    return pw, (None if b is None else np.asarray(b))


def packed_downsample_p0(x, pw, pb):
    """parity-0 packed (B, Hc, Wc, 4C) -> unpacked (B, Hc, Wc, Cout)."""
    out = jax.lax.conv_general_dilated(x, pw, (1, 1), [(0, 1), (0, 1)],
                                       dimension_numbers=_DN)
    if pb is not None:
        out = out + pb
    return out


def packed_instance_norm(x, true_hw: Tuple[int, int], eps: float = 1e-5,
                         parity: int = 0, relu_after: bool = False):
    """InstanceNorm2d(affine=False) over the ORIGINAL (H, W) geometry of a
    packed tensor (torch default eps=1e-5; GMFlow backbone). Per-channel
    stats fold the 4 phase copies; parity-1 pad half-cells stay zero, so
    packed sums equal the true sums (divide by the true count)."""
    c4 = x.shape[-1]
    c = c4 // 4
    n = true_hw[0] * true_hw[1]
    ct = jnp.promote_types(x.dtype, jnp.float32)
    xf = x.astype(ct)
    s1 = jnp.sum(xf, axis=(-3, -2))
    s2 = jnp.sum(jnp.square(xf), axis=(-3, -2))
    s1 = s1.reshape(s1.shape[:-1] + (4, c)).sum(-2)
    s2 = s2.reshape(s2.shape[:-1] + (4, c)).sum(-2)
    mean = s1 / n
    var = s2 / n - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    scale = jnp.tile(inv, 4)[..., None, None, :]
    shift = jnp.tile(-mean * inv, 4)[..., None, None, :]
    out = xf * scale + shift
    if relu_after:
        out = jnp.maximum(out, 0)
    out = out.astype(x.dtype)
    if parity == 1:
        out = mask_parity1(out, c)
    return out
