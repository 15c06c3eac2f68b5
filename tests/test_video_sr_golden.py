"""Golden parity: BasicVSR, EDVR (PCD+TSA), BasicVSR++; plus cross-validation
of the JAX deformable conv against an independent torch grid_sample oracle."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests import reference_oracle as oracle

pytestmark = pytest.mark.skipif(not oracle.reference_available(),
                                reason="reference repo not mounted")

from comfyui_keep_tpu.utils.checkpoint import convert_state_dict

ARCHS = "/root/reference/modules/deps/wm_basicsr/archs"


def _ref(fname):
    oracle._install_stubs_arch_util()
    oracle.load_ref_arch_util()
    # spynet + edvr must be importable as siblings
    oracle._module_from_file("wm_basicsr.archs.spynet_arch",
                             f"{ARCHS}/spynet_arch.py")
    oracle._module_from_file("wm_basicsr.archs.edvr_arch",
                             f"{ARCHS}/edvr_arch.py")
    if fname not in ("edvr_arch.py",):
        return oracle._module_from_file(f"wm_basicsr.archs.{fname[:-3]}",
                                        f"{ARCHS}/{fname}")
    import sys
    return sys.modules["wm_basicsr.archs.edvr_arch"]


def _tree(net, drop=("mean", "std")):
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()
          if not any(k.endswith(d) or f".{d}" in k for d in drop)}
    return convert_state_dict(sd)


def test_dcn_cross_validation(rng):
    """JAX gather+matmul DCN vs torch grid_sample oracle on random offsets."""
    from comfyui_keep_tpu.ops.native import deform_conv2d
    x = rng.standard_normal((2, 9, 11, 8), dtype=np.float32)
    w = rng.standard_normal((3, 3, 8, 6), dtype=np.float32)
    offset = rng.standard_normal((2, 9, 11, 2 * 2 * 9), dtype=np.float32)
    mask = rng.random((2, 9, 11, 2 * 9), dtype=np.float32)
    ours = deform_conv2d(jnp.asarray(x), jnp.asarray(offset), jnp.asarray(w),
                         padding=1, deformable_groups=2, mask=jnp.asarray(mask))
    ref = oracle._torch_deform_conv2d(
        torch.tensor(x.transpose(0, 3, 1, 2)),
        torch.tensor(offset.transpose(0, 3, 1, 2)),
        torch.tensor(w.transpose(3, 2, 0, 1)), None, (1, 1), (1, 1), (1, 1),
        torch.tensor(mask.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(ours),
                               ref.numpy().transpose(0, 2, 3, 1),
                               atol=1e-4, rtol=1e-3)


def test_basicvsr_parity(rng):
    mod = _ref("basicvsr_arch.py")
    from comfyui_keep_tpu.models.video_sr import BasicVSR
    torch.manual_seed(0)
    net = mod.BasicVSR(num_feat=8, num_block=1).eval()
    tree = _tree(net)
    x = rng.random((1, 3, 64, 64, 3), dtype=np.float32)
    with torch.no_grad():
        ref = net(torch.tensor(x.transpose(0, 1, 4, 2, 3)))
    ours = BasicVSR.apply(tree, jnp.asarray(x), num_feat=8)
    np.testing.assert_allclose(np.asarray(ours),
                               ref.numpy().transpose(0, 1, 3, 4, 2),
                               atol=2e-3, rtol=1e-2)


def test_edvr_parity(rng):
    mod = _ref("edvr_arch.py")
    from comfyui_keep_tpu.models.video_sr import EDVR
    torch.manual_seed(0)
    net = mod.EDVR(num_feat=8, num_frame=3, deformable_groups=2,
                   num_extract_block=1, num_reconstruct_block=1,
                   with_tsa=True).eval()
    # give the zero-init offset convs nonzero weights so DCN paths are live
    with torch.no_grad():
        for name, m in net.named_modules():
            if name.endswith("conv_offset"):
                m.weight.normal_(0, 0.05)
                m.bias.normal_(0, 0.05)
    tree = _tree(net)
    x = rng.random((1, 3, 16, 16, 3), dtype=np.float32)
    with torch.no_grad():
        ref = net(torch.tensor(x.transpose(0, 1, 4, 2, 3)))
    ours = EDVR.apply(tree, jnp.asarray(x), num_feat=8, deformable_groups=2)
    np.testing.assert_allclose(np.asarray(ours),
                               ref.numpy().transpose(0, 2, 3, 1),
                               atol=2e-3, rtol=1e-2)


def test_basicvsrpp_parity(rng):
    # requires torch.cuda.is_available() False -> reference skips alignment;
    # patch cuda check so the deform_align modules are built
    import torch.cuda
    orig = torch.cuda.is_available
    torch.cuda.is_available = lambda: True
    try:
        mod = _ref("basicvsrpp_arch.py")
        from comfyui_keep_tpu.models.video_sr import BasicVSRPlusPlus
        torch.manual_seed(0)
        net = mod.BasicVSRPlusPlus(mid_channels=8, num_blocks=1).eval()
        with torch.no_grad():
            for name, m in net.named_modules():
                if "conv_offset.6" in name and hasattr(m, "weight"):
                    m.weight.normal_(0, 0.05)
                    m.bias.normal_(0, 0.05)
        tree = _tree(net)
        x = rng.random((1, 3, 64, 64, 3), dtype=np.float32)
        with torch.no_grad():
            ref = net(torch.tensor(x.transpose(0, 1, 4, 2, 3)))
        ours = BasicVSRPlusPlus.apply(tree, jnp.asarray(x), mid_channels=8,
                                      deformable_groups=16)
        np.testing.assert_allclose(np.asarray(ours),
                                   ref.numpy().transpose(0, 1, 3, 4, 2),
                                   atol=3e-3, rtol=1e-2)
    finally:
        torch.cuda.is_available = orig


def test_iconvsr_parity(rng):
    mod = _ref("basicvsr_arch.py")
    from comfyui_keep_tpu.models.video_sr import IconVSR
    torch.manual_seed(3)
    net = mod.IconVSR(num_feat=8, num_block=1, keyframe_stride=3,
                      temporal_padding=2).eval()
    with torch.no_grad():
        for name, m in net.named_modules():
            if name.endswith("conv_offset"):
                m.weight.normal_(0, 0.05)
                m.bias.normal_(0, 0.05)
    tree = _tree(net)
    x = rng.random((1, 7, 64, 64, 3), dtype=np.float32)
    with torch.no_grad():
        ref = net(torch.tensor(x.transpose(0, 1, 4, 2, 3)))
    ours = IconVSR.apply(tree, jnp.asarray(x), num_feat=8, keyframe_stride=3)
    np.testing.assert_allclose(np.asarray(ours),
                               ref.numpy().transpose(0, 1, 3, 4, 2),
                               atol=3e-3, rtol=1e-2)
