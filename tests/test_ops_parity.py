"""Torch-CPU is used as an independent numerics oracle for the op substrate.

These are the framework's analogue of the reference's only test
(wm_basicsr/metrics/test_metrics/test_psnr_ssim.py): two independent
implementations cross-checked on random inputs (SURVEY.md §4).
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from comfyui_keep_tpu import ops


def to_nhwc(t):
    return np.asarray(t.detach()).transpose(0, 2, 3, 1)


def assert_close(jax_out_nhwc, torch_out_nchw, atol=1e-5, rtol=1e-5):
    np.testing.assert_allclose(
        np.asarray(jax_out_nhwc), to_nhwc(torch_out_nchw), atol=atol, rtol=rtol)


class TestConv:
    @pytest.mark.parametrize("stride,pad,dil,groups", [
        (1, 0, 1, 1), (1, 1, 1, 1), (2, 1, 1, 1), (1, 2, 2, 1), (1, 1, 1, 2),
    ])
    def test_conv2d(self, rng, stride, pad, dil, groups):
        x = rng.standard_normal((2, 12, 14, 8), dtype=np.float32)
        w = rng.standard_normal((3, 3, 8 // groups, 16), dtype=np.float32)
        b = rng.standard_normal(16, dtype=np.float32)
        ref = F.conv2d(torch.tensor(x.transpose(0, 3, 1, 2)),
                       torch.tensor(w.transpose(3, 2, 0, 1)), torch.tensor(b),
                       stride=stride, padding=pad, dilation=dil, groups=groups)
        out = ops.conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                         stride=stride, padding=pad, dilation=dil, groups=groups)
        assert_close(out, ref, atol=1e-4)

    def test_conv2d_asymmetric_pad(self, rng):
        # vqgan Downsample: pad (0,1,0,1) then stride-2 VALID conv
        x = rng.standard_normal((1, 16, 16, 4), dtype=np.float32)
        w = rng.standard_normal((3, 3, 4, 4), dtype=np.float32)
        xp = F.pad(torch.tensor(x.transpose(0, 3, 1, 2)), (0, 1, 0, 1))
        ref = F.conv2d(xp, torch.tensor(w.transpose(3, 2, 0, 1)), stride=2)
        out = ops.conv2d(jnp.asarray(x), jnp.asarray(w), stride=2,
                         padding=[(0, 1), (0, 1)])
        assert_close(out, ref, atol=1e-4)

    def test_conv3d(self, rng):
        x = rng.standard_normal((1, 5, 8, 8, 3), dtype=np.float32)
        w = rng.standard_normal((3, 3, 3, 3, 6), dtype=np.float32)
        ref = F.conv3d(torch.tensor(x.transpose(0, 4, 1, 2, 3)),
                       torch.tensor(w.transpose(4, 3, 0, 1, 2)), padding=1)
        out = ops.conv3d(jnp.asarray(x), jnp.asarray(w), padding=1)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref).transpose(0, 2, 3, 4, 1), atol=1e-4)

    def test_linear(self, rng):
        x = rng.standard_normal((4, 10), dtype=np.float32)
        w = rng.standard_normal((10, 7), dtype=np.float32)
        b = rng.standard_normal(7, dtype=np.float32)
        ref = F.linear(torch.tensor(x), torch.tensor(w.T.copy()), torch.tensor(b))
        out = ops.linear(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
        np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-5)


class TestNorms:
    def test_group_norm(self, rng):
        x = rng.standard_normal((2, 8, 8, 64), dtype=np.float32)
        g = rng.standard_normal(64, dtype=np.float32)
        b = rng.standard_normal(64, dtype=np.float32)
        ref = F.group_norm(torch.tensor(x.transpose(0, 3, 1, 2)), 32,
                           torch.tensor(g), torch.tensor(b), eps=1e-6)
        out = ops.group_norm(jnp.asarray(x), {"scale": jnp.asarray(g), "bias": jnp.asarray(b)},
                             num_groups=32, eps=1e-6)
        assert_close(out, ref, atol=1e-5)

    def test_layer_norm(self, rng):
        x = rng.standard_normal((3, 5, 16), dtype=np.float32)
        g = rng.standard_normal(16, dtype=np.float32)
        b = rng.standard_normal(16, dtype=np.float32)
        ref = F.layer_norm(torch.tensor(x), (16,), torch.tensor(g), torch.tensor(b))
        out = ops.layer_norm(jnp.asarray(x), {"scale": jnp.asarray(g), "bias": jnp.asarray(b)})
        np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-5)

    def test_instance_norm(self, rng):
        x = rng.standard_normal((2, 8, 8, 6), dtype=np.float32)
        ref = F.instance_norm(torch.tensor(x.transpose(0, 3, 1, 2)))
        out = ops.instance_norm(jnp.asarray(x))
        assert_close(out, ref, atol=1e-5)

    def test_batch_norm_inference(self, rng):
        x = rng.standard_normal((2, 4, 4, 6), dtype=np.float32)
        g, b = rng.standard_normal(6, dtype=np.float32), rng.standard_normal(6, dtype=np.float32)
        m, v = rng.standard_normal(6, dtype=np.float32), rng.random(6, dtype=np.float32) + 0.5
        ref = F.batch_norm(torch.tensor(x.transpose(0, 3, 1, 2)), torch.tensor(m),
                           torch.tensor(v), torch.tensor(g), torch.tensor(b), training=False)
        out = ops.batch_norm(jnp.asarray(x), {"scale": jnp.asarray(g), "bias": jnp.asarray(b),
                                              "mean": jnp.asarray(m), "var": jnp.asarray(v)})
        assert_close(out, ref, atol=1e-5)


class TestResample:
    def test_nearest_2x(self, rng):
        x = rng.standard_normal((2, 5, 7, 3), dtype=np.float32)
        ref = F.interpolate(torch.tensor(x.transpose(0, 3, 1, 2)), scale_factor=2.0, mode="nearest")
        out = ops.upsample_nearest_2x(jnp.asarray(x))
        assert_close(out, ref)

    @pytest.mark.parametrize("align,out_hw", [
        (False, (20, 28)), (True, (20, 28)), (False, (3, 4)), (True, (3, 4)),
    ])
    def test_bilinear(self, rng, align, out_hw):
        x = rng.standard_normal((2, 5, 7, 3), dtype=np.float32)
        ref = F.interpolate(torch.tensor(x.transpose(0, 3, 1, 2)), size=out_hw,
                            mode="bilinear", align_corners=align)
        out = ops.resize_bilinear(jnp.asarray(x), out_hw, align_corners=align)
        assert_close(out, ref, atol=1e-5)

    def test_nearest_resize(self, rng):
        from comfyui_keep_tpu.ops.resample import resize_nearest
        x = rng.standard_normal((1, 6, 9, 2), dtype=np.float32)
        ref = F.interpolate(torch.tensor(x.transpose(0, 3, 1, 2)), size=(4, 5), mode="nearest")
        out = resize_nearest(jnp.asarray(x), (4, 5))
        assert_close(out, ref)

    def test_max_pool(self, rng):
        x = rng.standard_normal((2, 9, 9, 4), dtype=np.float32)
        ref = F.max_pool2d(torch.tensor(x.transpose(0, 3, 1, 2)), 3, 2, 1)
        out = ops.max_pool(jnp.asarray(x), 3, 2, 1)
        assert_close(out, ref)


class TestWarp:
    @pytest.mark.parametrize("mode", ["bilinear", "nearest"])
    @pytest.mark.parametrize("padding", ["zeros", "border"])
    @pytest.mark.parametrize("align", [True, False])
    def test_grid_sample(self, rng, mode, padding, align):
        x = rng.standard_normal((2, 8, 10, 3), dtype=np.float32)
        grid = (rng.random((2, 6, 7, 2), dtype=np.float32) * 2.4 - 1.2)
        ref = F.grid_sample(torch.tensor(x.transpose(0, 3, 1, 2)), torch.tensor(grid),
                            mode=mode, padding_mode=padding, align_corners=align)
        out = ops.grid_sample(jnp.asarray(x), jnp.asarray(grid), mode=mode,
                              padding_mode=padding, align_corners=align)
        assert_close(out, ref, atol=1e-5)

    def test_flow_warp(self, rng):
        x = rng.standard_normal((2, 8, 10, 3), dtype=np.float32)
        flow = rng.standard_normal((2, 8, 10, 2), dtype=np.float32) * 2
        # torch reference: replicate arch_util.flow_warp semantics directly
        h, w = 8, 10
        gy, gx = torch.meshgrid(torch.arange(h).float(), torch.arange(w).float(), indexing="ij")
        grid = torch.stack((gx, gy), 2)
        vgrid = grid + torch.tensor(flow)
        vx = 2.0 * vgrid[..., 0] / (w - 1) - 1.0
        vy = 2.0 * vgrid[..., 1] / (h - 1) - 1.0
        ref = F.grid_sample(torch.tensor(x.transpose(0, 3, 1, 2)),
                            torch.stack((vx, vy), dim=3), mode="bilinear",
                            padding_mode="zeros", align_corners=True)
        out = ops.flow_warp(jnp.asarray(x), jnp.asarray(flow))
        assert_close(out, ref, atol=1e-5)


class TestAttention:
    def test_mha_vs_torch(self, rng):
        e, heads, b, l = 32, 4, 2, 9
        mha = torch.nn.MultiheadAttention(e, heads, batch_first=True)
        x = rng.standard_normal((b, l, e), dtype=np.float32)
        with torch.no_grad():
            ref, _ = mha(torch.tensor(x), torch.tensor(x), torch.tensor(x), need_weights=False)
        sd = mha.state_dict()
        inw = sd["in_proj_weight"].numpy()
        inb = sd["in_proj_bias"].numpy()
        params = {
            "q_w": jnp.asarray(inw[:e].T), "k_w": jnp.asarray(inw[e:2 * e].T),
            "v_w": jnp.asarray(inw[2 * e:].T), "out_w": jnp.asarray(sd["out_proj.weight"].numpy().T),
            "q_b": jnp.asarray(inb[:e]), "k_b": jnp.asarray(inb[e:2 * e]),
            "v_b": jnp.asarray(inb[2 * e:]), "out_b": jnp.asarray(sd["out_proj.bias"].numpy()),
        }
        out = ops.multi_head_attention(params, jnp.asarray(x), jnp.asarray(x),
                                       jnp.asarray(x), num_heads=heads)
        np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=2e-5)

    def test_activations(self, rng):
        x = rng.standard_normal((128,), dtype=np.float32)
        t = torch.tensor(x)
        np.testing.assert_allclose(np.asarray(ops.swish(jnp.asarray(x))),
                                   F.silu(t).numpy(), atol=1e-6)
        np.testing.assert_allclose(np.asarray(ops.gelu(jnp.asarray(x))),
                                   F.gelu(t).numpy(), atol=1e-6)
        np.testing.assert_allclose(np.asarray(ops.leaky_relu(jnp.asarray(x), 0.2)),
                                   F.leaky_relu(t, 0.2).numpy(), atol=1e-6)
