"""Native-op tier tests: upfirdn2d golden vs reference native fallback,
DCN consistency checks, fused act, correlation, Pallas kernels (interpret)."""
import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests import reference_oracle as oracle
from comfyui_keep_tpu.ops import native as N
from comfyui_keep_tpu.ops import conv as C


@pytest.fixture(scope="module")
def ref_upfirdn():
    if not oracle.reference_available():
        pytest.skip("no reference")
    oracle._install_stubs()
    ops_pkg = types.ModuleType("wm_basicsr.ops")
    ops_pkg.__path__ = []
    up_pkg = types.ModuleType("wm_basicsr.ops.upfirdn2d")
    up_pkg.__path__ = []
    sys.modules.setdefault("wm_basicsr.ops", ops_pkg)
    sys.modules["wm_basicsr.ops.upfirdn2d"] = up_pkg
    return oracle._module_from_file(
        "wm_basicsr.ops.upfirdn2d.upfirdn2d",
        f"{oracle.REF_ROOT}/ops/upfirdn2d/upfirdn2d.py")


class TestUpFirDn2d:
    @pytest.mark.parametrize("up,down,pad", [(1, 1, (1, 1)), (2, 1, (2, 1)),
                                             (1, 2, (2, 2)), (2, 2, (1, 1))])
    def test_vs_reference_native(self, ref_upfirdn, rng, up, down, pad):
        x = rng.standard_normal((2, 8, 10, 3), dtype=np.float32)
        k = rng.standard_normal((4, 4), dtype=np.float32)
        ref = ref_upfirdn.upfirdn2d_native(
            torch.tensor(x.transpose(0, 3, 1, 2)), torch.tensor(k),
            up, up, down, down, pad[0], pad[1], pad[0], pad[1])
        ours = N.upfirdn2d(jnp.asarray(x), jnp.asarray(k), up=up, down=down,
                           pad=pad)
        np.testing.assert_allclose(np.asarray(ours),
                                   ref.numpy().transpose(0, 2, 3, 1),
                                   atol=1e-4, rtol=1e-4)


class TestFusedAct:
    def test_forward_and_grad(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 4, 4, 8), dtype=np.float32))
        b = jnp.asarray(rng.standard_normal(8, dtype=np.float32))
        out = N.fused_leaky_relu(x, b)
        ref = jnp.where(x + b >= 0, x + b, (x + b) * 0.2) * 2 ** 0.5
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
        # custom VJP matches autodiff of the reference expression
        g1 = jax.grad(lambda x, b: jnp.sum(N.fused_leaky_relu(x, b) ** 2),
                      argnums=(0, 1))(x, b)
        g2 = jax.grad(lambda x, b: jnp.sum(
            (jnp.where(x + b >= 0, x + b, (x + b) * 0.2) * 2 ** 0.5) ** 2),
            argnums=(0, 1))(x, b)
        for a, r in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=1e-5)


class TestDeformConv:
    def test_zero_offset_equals_conv(self, rng):
        """DCN with zero offsets and unit mask == plain convolution."""
        x = rng.standard_normal((1, 8, 8, 4), dtype=np.float32)
        w = rng.standard_normal((3, 3, 4, 6), dtype=np.float32)
        offset = np.zeros((1, 8, 8, 2 * 9), np.float32)
        out = N.deform_conv2d(jnp.asarray(x), jnp.asarray(offset),
                              jnp.asarray(w), stride=1, padding=1)
        ref = C.conv2d(jnp.asarray(x), jnp.asarray(w), padding=1)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def test_integer_offset_equals_shifted_conv(self, rng):
        """Constant (0, +1) x-offset on all taps == conv of x shifted by 1."""
        x = rng.standard_normal((1, 10, 10, 2), dtype=np.float32)
        w = rng.standard_normal((3, 3, 2, 3), dtype=np.float32)
        offset = np.zeros((1, 10, 10, 18), np.float32)
        offset[..., 1::2] = 1.0  # x-displacement (tap-interleaved y,x)
        out = N.deform_conv2d(jnp.asarray(x), jnp.asarray(offset),
                              jnp.asarray(w), padding=1)
        x_shift = np.concatenate([x[:, :, 1:], np.zeros((1, 10, 1, 2), np.float32)],
                                 axis=2)
        ref = C.conv2d(jnp.asarray(x_shift), jnp.asarray(w), padding=1)
        # interior matches exactly; zero-padding edge differs by construction
        np.testing.assert_allclose(np.asarray(out)[:, 2:-2, 2:-2],
                                   np.asarray(ref)[:, 2:-2, 2:-2], atol=1e-4)

    def test_mask_modulation(self, rng):
        x = rng.standard_normal((1, 6, 6, 2), dtype=np.float32)
        w = rng.standard_normal((3, 3, 2, 2), dtype=np.float32)
        offset = np.zeros((1, 6, 6, 18), np.float32)
        mask = np.full((1, 6, 6, 9), 0.5, np.float32)
        out = N.deform_conv2d(jnp.asarray(x), jnp.asarray(offset),
                              jnp.asarray(w), padding=1, mask=jnp.asarray(mask))
        ref = C.conv2d(jnp.asarray(x) * 0.5, jnp.asarray(w), padding=1)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def test_groups(self, rng):
        x = rng.standard_normal((1, 6, 6, 4), dtype=np.float32)
        w = rng.standard_normal((3, 3, 2, 4), dtype=np.float32)  # groups=2
        offset = np.zeros((1, 6, 6, 18), np.float32)
        out = N.deform_conv2d(jnp.asarray(x), jnp.asarray(offset),
                              jnp.asarray(w), padding=1, groups=2)
        ref = C.conv2d(jnp.asarray(x), jnp.asarray(w), padding=1, groups=2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def test_gradients_flow(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 6, 6, 2), dtype=np.float32))
        w = jnp.asarray(rng.standard_normal((3, 3, 2, 2), dtype=np.float32))
        offset = jnp.asarray(rng.standard_normal((1, 6, 6, 18), dtype=np.float32))

        def f(x, offset, w):
            return jnp.sum(N.deform_conv2d(x, offset, w, padding=1) ** 2)

        gx, go, gw = jax.grad(f, argnums=(0, 1, 2))(x, offset, w)
        assert np.isfinite(np.asarray(gx)).all()
        assert np.isfinite(np.asarray(go)).all() and np.abs(go).sum() > 0
        assert np.isfinite(np.asarray(gw)).all()


class TestCorrelation:
    def test_vs_naive(self, rng):
        f1 = rng.standard_normal((1, 6, 7, 4), dtype=np.float32)
        f2 = rng.standard_normal((1, 6, 7, 4), dtype=np.float32)
        d = 2
        out = np.asarray(N.correlation(jnp.asarray(f1), jnp.asarray(f2), d))
        # naive
        f2p = np.pad(f2, ((0, 0), (d, d), (d, d), (0, 0)))
        k = 0
        for dy in range(2 * d + 1):
            for dx in range(2 * d + 1):
                ref = (f1 * f2p[:, dy:dy + 6, dx:dx + 7]).sum(-1) / 4
                np.testing.assert_allclose(out[..., k], ref, atol=1e-5)
                k += 1


class TestPallasKernels:
    def test_vq_indices_interpret(self, rng):
        from comfyui_keep_tpu.ops.pallas_kernels import (
            vq_nearest_indices_pallas, vq_nearest_indices)
        z = jnp.asarray(rng.standard_normal((300, 32), dtype=np.float32))
        cb = jnp.asarray(rng.standard_normal((64, 32), dtype=np.float32))
        ref = vq_nearest_indices(z, cb, force_xla=True)
        got = vq_nearest_indices_pallas(z, cb, tile=128, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_fused_bias_lrelu_interpret(self, rng):
        from comfyui_keep_tpu.ops.pallas_kernels import fused_bias_lrelu_pallas
        x = jnp.asarray(rng.standard_normal((2, 5, 5, 16), dtype=np.float32))
        b = jnp.asarray(rng.standard_normal(16, dtype=np.float32))
        got = fused_bias_lrelu_pallas(x, b, interpret=True)
        ref = N.fused_leaky_relu(x, b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_flash_correlation_expectation(rng):
    """Pallas fused softmax-expectation == XLA einsum path (interpret mode)."""
    import jax
    import jax.numpy as jnp
    from comfyui_keep_tpu.ops.pallas_kernels import (
        global_correlation_expectation_pallas)
    b, l, c = 2, 128, 128
    f0 = jnp.asarray(rng.standard_normal((b, l, c), dtype=np.float32))
    f1 = jnp.asarray(rng.standard_normal((b, l, c), dtype=np.float32))
    grid = jnp.asarray(rng.random((l, 2), dtype=np.float32) * 16)
    ref = jax.nn.softmax(
        jnp.einsum("blc,bmc->blm", f0, f1) / np.sqrt(c), -1) @ grid
    out = global_correlation_expectation_pallas(f0, f1, grid, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=1e-5)


def test_mlp_fused_pallas_interpret(rng):
    """Fused transformer-MLP kernel (interpret mode) == XLA reference:
    src + layer_norm(gelu_tanh(src@W1a + msg@W1b) @ W2)."""
    import jax.numpy as jnp
    from comfyui_keep_tpu.ops.pallas_kernels import mlp_fused_pallas
    from comfyui_keep_tpu.ops.norm import layer_norm

    b, l, c, h = 2, 300, 128, 512
    src = jnp.asarray(rng.standard_normal((b, l, c), dtype=np.float32))
    msg = jnp.asarray(rng.standard_normal((b, l, c), dtype=np.float32))
    w1a = jnp.asarray(rng.standard_normal((c, h), dtype=np.float32) * 0.05)
    w1b = jnp.asarray(rng.standard_normal((c, h), dtype=np.float32) * 0.05)
    w2 = jnp.asarray(rng.standard_normal((h, c), dtype=np.float32) * 0.05)
    gamma = jnp.asarray(rng.standard_normal(c, dtype=np.float32))
    beta = jnp.asarray(rng.standard_normal(c, dtype=np.float32))

    got = mlp_fused_pallas(src, msg, w1a, w1b, w2, gamma, beta, block=128,
                           interpret=True)
    hmid = jax.nn.gelu(src @ w1a + msg @ w1b, approximate=True)
    ref = src + layer_norm(hmid @ w2, {"scale": gamma, "bias": beta})
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-3)
