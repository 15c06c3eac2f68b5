"""Grid sampling / flow warping (torch F.grid_sample semantics, NHWC).

Reproduces the numerics of the reference's flow_warp (arch_util.py:113-144:
align_corners=True normalization `2*v/(size-1)-1`) and gmflow geometry
(geometry.py:55). Implemented as vectorized gathers; on TPU the 4-corner
gather + lerp fuses into one pass. flow layout is (..., H, W, 2) with
channel 0 = x (width) displacement, matching the reference.
"""
import jax.numpy as jnp


def _gather_2d(img, iy, ix):
    """img: (N, H, W, C); iy/ix: (N, Ho, Wo) int32 -> (N, Ho, Wo, C)."""
    n, h, w, c = img.shape
    flat = img.reshape(n, h * w, c)
    idx = (iy * w + ix).reshape(n, -1, 1)
    out = jnp.take_along_axis(flat, idx, axis=1)
    return out.reshape(n, iy.shape[1], iy.shape[2], c)


def grid_sample(img, grid, mode: str = "bilinear", padding_mode: str = "zeros",
                align_corners: bool = True):
    """torch.nn.functional.grid_sample for NHWC images.

    img: (N, H, W, C); grid: (N, Ho, Wo, 2), grid[..., 0]=x in [-1,1],
    grid[..., 1]=y in [-1,1].
    """
    n, h, w, c = img.shape
    # coordinate math in (at least) f32: a bf16 coordinate at x~500 is
    # quantized to ~2 px (2^-8 relative), which visibly degrades bf16
    # serving. f32 grids keep the exact reference arithmetic.
    ct = jnp.promote_types(grid.dtype, jnp.float32)
    gx, gy = grid[..., 0].astype(ct), grid[..., 1].astype(ct)
    if align_corners:
        ix = (gx + 1.0) * 0.5 * (w - 1)
        iy = (gy + 1.0) * 0.5 * (h - 1)
    else:
        ix = ((gx + 1.0) * w - 1.0) * 0.5
        iy = ((gy + 1.0) * h - 1.0) * 0.5

    if mode == "nearest":
        # torch rounds to nearest (round-half-away handled as round-half-even
        # differences are measure-zero; use floor(x+0.5) like torch's kernel)
        rx = jnp.floor(ix + 0.5).astype(jnp.int32)
        ry = jnp.floor(iy + 0.5).astype(jnp.int32)
        if padding_mode == "border":
            rx = jnp.clip(rx, 0, w - 1)
            ry = jnp.clip(ry, 0, h - 1)
            return _gather_2d(img, ry, rx)
        valid = (rx >= 0) & (rx <= w - 1) & (ry >= 0) & (ry <= h - 1)
        rx = jnp.clip(rx, 0, w - 1)
        ry = jnp.clip(ry, 0, h - 1)
        out = _gather_2d(img, ry, rx)
        return out * valid[..., None].astype(img.dtype)

    if padding_mode == "border":
        ix = jnp.clip(ix, 0.0, w - 1)
        iy = jnp.clip(iy, 0.0, h - 1)

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    wx = (ix - x0).astype(img.dtype)
    wy = (iy - y0).astype(img.dtype)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = x0i + 1
    y1i = y0i + 1

    import os
    if padding_mode == "zeros" and os.environ.get("KEEP_TPU_WARP_QUAD") != "0":
        # Fast path: ONE take_along_axis over a quad-stacked operand
        # (4 corners per row) instead of 4 per-corner gathers. TPU gathers
        # are index-rate-bound (rows of C are tiny): 4.4x faster standalone
        # at 512x512x3 (65.8 -> 14.8 ms for 19 chained warps). Inside the
        # KEEP scan the warp overlaps other work and this is neutral
        # (docs/ROADMAP.md). General lax.gather slices are 100x slower than
        # take_along_axis and are not an option. KEEP_TPU_WARP_QUAD=0
        # restores the 4-gather path for attribution.
        pad = jnp.pad(img, ((0, 0), (0, 1), (0, 1), (0, 0)))
        quad = jnp.concatenate(  # (N, H, W, 4C): [y,x] [y,x+1] [y+1,x] [y+1,x+1]
            [pad[:, :h, :w], pad[:, :h, 1:], pad[:, 1:, :w], pad[:, 1:, 1:]],
            axis=-1)
        xc = jnp.clip(x0i, 0, w - 1)
        yc = jnp.clip(y0i, 0, h - 1)
        g = _gather_2d(quad, yc, xc)  # (N, Ho, Wo, 4C)
        q = g.reshape(g.shape[:-1] + (2, 2, c))

        def corner(yi, xi, oy, ox):
            # quad element actually holding (yi, xi): offsets in {0,1} for
            # every in-range corner; out-of-range corners are masked anyway
            v = jnp.where((oy == 1)[..., None],
                          jnp.where((ox == 1)[..., None], q[..., 1, 1, :],
                                    q[..., 1, 0, :]),
                          jnp.where((ox == 1)[..., None], q[..., 0, 1, :],
                                    q[..., 0, 0, :]))
            ok = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
            return v * ok[..., None].astype(img.dtype)

        v00 = corner(y0i, x0i, y0i - yc, x0i - xc)
        v01 = corner(y0i, x1i, y0i - yc, jnp.clip(x1i, 0, w - 1) - xc)
        v10 = corner(y1i, x0i, jnp.clip(y1i, 0, h - 1) - yc, x0i - xc)
        v11 = corner(y1i, x1i, jnp.clip(y1i, 0, h - 1) - yc,
                     jnp.clip(x1i, 0, w - 1) - xc)
    else:
        def corner(yi, xi):
            yc = jnp.clip(yi, 0, h - 1)
            xc = jnp.clip(xi, 0, w - 1)
            v = _gather_2d(img, yc, xc)
            if padding_mode == "zeros":  # KEEP_TPU_WARP_QUAD=0 fallback
                ok = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
                v = v * ok[..., None].astype(img.dtype)
            return v

        v00 = corner(y0i, x0i)
        v01 = corner(y0i, x1i)
        v10 = corner(y1i, x0i)
        v11 = corner(y1i, x1i)
    wx = wx[..., None]
    wy = wy[..., None]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def resize_flow(flow, out_hw, interp_mode: str = "bilinear",
                align_corners: bool = False):
    """Resize (N, H, W, 2) flow to out_hw, rescaling displacement magnitudes
    (arch_util.py:148-182)."""
    from comfyui_keep_tpu.ops.resample import resize_bilinear
    h, w = flow.shape[1], flow.shape[2]
    ratio = jnp.asarray([out_hw[1] / w, out_hw[0] / h], flow.dtype)
    flow = flow * ratio
    return resize_bilinear(flow, out_hw, align_corners=align_corners)


def flow_warp_xy(x, fx, fy, interp_mode: str = "bilinear",
                 padding_mode: str = "zeros", align_corners: bool = True):
    """flow_warp with the flow passed as separate (N, H, W) x/y planes.

    Inside lax.scan bodies the channel-interleaved (N, H, W, 2) layout makes
    the per-step xs slice + de-interleave cost ~1.2 ms at 512x512 (lane dim
    2); dense planes slice clean. flow_warp delegates here."""
    n, h, w, _ = x.shape
    # grid math in (at least) f32 — bf16 flow upcast so the normalized grid
    # keeps sub-pixel precision (see grid_sample note); same arithmetic as
    # the reference's f32 path (arch_util.py:113-144).
    ct = jnp.promote_types(fx.dtype, jnp.float32)
    grid_y = jnp.arange(h, dtype=ct)
    grid_x = jnp.arange(w, dtype=ct)
    gy, gx = jnp.meshgrid(grid_y, grid_x, indexing="ij")
    vx = gx[None] + fx.astype(ct)
    vy = gy[None] + fy.astype(ct)
    nx = 2.0 * vx / max(w - 1, 1) - 1.0
    ny = 2.0 * vy / max(h - 1, 1) - 1.0
    grid = jnp.stack([nx, ny], axis=-1)
    return grid_sample(x, grid, mode=interp_mode, padding_mode=padding_mode,
                       align_corners=align_corners)


def flow_warp(x, flow, interp_mode: str = "bilinear", padding_mode: str = "zeros",
              align_corners: bool = True):
    """Warp (N, H, W, C) by flow (N, H, W, 2) [dx, dy] — arch_util.py:113-144."""
    return flow_warp_xy(x, flow[..., 0], flow[..., 1], interp_mode=interp_mode,
                        padding_mode=padding_mode, align_corners=align_corners)
