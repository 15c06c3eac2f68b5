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
    gx, gy = grid[..., 0], grid[..., 1]
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

    def corner(yi, xi):
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        v = _gather_2d(img, yc, xc)
        if padding_mode == "zeros":
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


def flow_warp(x, flow, interp_mode: str = "bilinear", padding_mode: str = "zeros",
              align_corners: bool = True):
    """Warp (N, H, W, C) by flow (N, H, W, 2) [dx, dy] — arch_util.py:113-144."""
    n, h, w, _ = x.shape
    grid_y = jnp.arange(h, dtype=flow.dtype)
    grid_x = jnp.arange(w, dtype=flow.dtype)
    gy, gx = jnp.meshgrid(grid_y, grid_x, indexing="ij")
    vx = gx[None] + flow[..., 0]
    vy = gy[None] + flow[..., 1]
    nx = 2.0 * vx / max(w - 1, 1) - 1.0
    ny = 2.0 * vy / max(h - 1, 1) - 1.0
    grid = jnp.stack([nx, ny], axis=-1)
    return grid_sample(x, grid, mode=interp_mode, padding_mode=padding_mode,
                       align_corners=align_corners)
