"""Golden parity: StyleGAN2 generator + discriminator (native op tier)."""
import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests import reference_oracle as oracle

pytestmark = pytest.mark.skipif(not oracle.reference_available(),
                                reason="reference repo not mounted")

REF_OPS = "/root/reference/modules/deps/wm_basicsr/ops"
ARCHS = "/root/reference/modules/deps/wm_basicsr/archs"


@pytest.fixture(scope="module")
def ref_mod():
    import sys
    import types
    oracle._install_stubs_arch_util()
    # torch fallbacks for the fused_act / upfirdn2d CUDA ops
    up_mod = oracle._module_from_file(
        "wm_basicsr.ops.upfirdn2d.upfirdn2d", f"{REF_OPS}/upfirdn2d/upfirdn2d.py")
    import torch.nn.functional as F
    from torch import nn

    def upfirdn2d_native_op(x, kernel, up=1, down=1, pad=(0, 0)):
        return up_mod.upfirdn2d_native(x, kernel, up, up, down, down,
                                       pad[0], pad[1], pad[0], pad[1])

    def fused_leaky_relu(x, bias=None, negative_slope=0.2, scale=2 ** 0.5):
        if bias is not None:
            shape = [1, -1] + [1] * (x.ndim - 2)
            x = x + bias.view(*shape)
        return F.leaky_relu(x, negative_slope) * scale

    class FusedLeakyReLU(nn.Module):
        def __init__(self, channel, negative_slope=0.2, scale=2 ** 0.5):
            super().__init__()
            self.bias = nn.Parameter(torch.zeros(channel))
            self.negative_slope = negative_slope
            self.scale = scale

        def forward(self, x):
            return fused_leaky_relu(x, self.bias, self.negative_slope, self.scale)

    fa = types.ModuleType("wm_basicsr.ops.fused_act")
    fa.FusedLeakyReLU = FusedLeakyReLU
    fa.fused_leaky_relu = fused_leaky_relu
    sys.modules["wm_basicsr.ops.fused_act"] = fa
    up_pkg = types.ModuleType("wm_basicsr.ops.upfirdn2d")
    up_pkg.upfirdn2d = upfirdn2d_native_op
    sys.modules["wm_basicsr.ops.upfirdn2d"] = up_pkg
    sys.modules["wm_basicsr.ops"].fused_act = fa
    sys.modules["wm_basicsr.ops"].upfirdn2d = up_pkg
    return oracle._module_from_file("wm_basicsr.archs.stylegan2_arch",
                                    f"{ARCHS}/stylegan2_arch.py")


def test_generator_parity(ref_mod, rng):
    from comfyui_keep_tpu.models.stylegan2 import (StyleGAN2Generator,
                                                   convert_stylegan2_generator)
    torch.manual_seed(0)
    net = ref_mod.StyleGAN2Generator(out_size=32, num_style_feat=32,
                                     num_mlp=2, channel_multiplier=1,
                                     narrow=0.25).eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    tree = convert_stylegan2_generator(sd)
    z = rng.standard_normal((2, 32), dtype=np.float32)
    with torch.no_grad():
        ref_img, _ = net([torch.tensor(z)], randomize_noise=False)
    img, _ = StyleGAN2Generator.apply(tree, [jnp.asarray(z)], out_size=32,
                                      num_style_feat=32,
                                      randomize_noise=False)
    np.testing.assert_allclose(np.asarray(img),
                               ref_img.numpy().transpose(0, 2, 3, 1),
                               atol=2e-3, rtol=1e-2)


def test_discriminator_parity(ref_mod, rng):
    from comfyui_keep_tpu.models.stylegan2 import (
        StyleGAN2Discriminator, convert_stylegan2_discriminator)
    torch.manual_seed(1)
    net = ref_mod.StyleGAN2Discriminator(out_size=32, channel_multiplier=1,
                                         narrow=0.25).eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    tree = convert_stylegan2_discriminator(sd)
    x = rng.standard_normal((4, 32, 32, 3), dtype=np.float32)
    with torch.no_grad():
        ref = net(torch.tensor(x.transpose(0, 3, 1, 2)))
    ours = StyleGAN2Discriminator.apply(tree, jnp.asarray(x), out_size=32)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-3,
                               rtol=1e-2)


def test_generator_bilinear_parity(ref_mod, rng):
    import sys
    oracle._module_from_file
    mod = oracle._module_from_file(
        "wm_basicsr.archs.stylegan2_bilinear_arch",
        f"{ARCHS}/stylegan2_bilinear_arch.py")
    from comfyui_keep_tpu.models.stylegan2_bilinear import (
        StyleGAN2GeneratorBilinear)
    from comfyui_keep_tpu.models.stylegan2 import convert_stylegan2_generator
    torch.manual_seed(2)
    net = mod.StyleGAN2GeneratorBilinear(out_size=32, num_style_feat=32,
                                         num_mlp=2, channel_multiplier=1,
                                         narrow=0.25).eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    tree = convert_stylegan2_generator(sd)
    z = rng.standard_normal((1, 32), dtype=np.float32)
    with torch.no_grad():
        ref_img, _ = net([torch.tensor(z)], randomize_noise=False)
    img, _ = StyleGAN2GeneratorBilinear.apply(tree, [jnp.asarray(z)],
                                              out_size=32, num_style_feat=32,
                                              randomize_noise=False)
    np.testing.assert_allclose(np.asarray(img),
                               ref_img.numpy().transpose(0, 2, 3, 1),
                               atol=2e-3, rtol=1e-2)
