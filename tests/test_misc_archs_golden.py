"""Golden parity: TOFlow, DUF, ResNetArcFace."""
import numpy as np
import pytest
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
    return oracle._module_from_file(f"wm_basicsr.archs.{fname[:-3]}",
                                    f"{ARCHS}/{fname}")


def test_toflow_parity(rng):
    mod = _ref("tof_arch.py")
    from comfyui_keep_tpu.models.misc_archs import TOFlow
    torch.manual_seed(0)
    net = mod.TOFlow().eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()
          if k not in ("mean", "std")}
    tree = convert_state_dict(sd)
    x = rng.random((1, 7, 32, 32, 3), dtype=np.float32)
    with torch.no_grad():
        ref = net(torch.tensor(x.transpose(0, 1, 4, 2, 3)))
    ours = TOFlow.apply(tree, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours),
                               ref.numpy().transpose(0, 2, 3, 1),
                               atol=1e-3, rtol=1e-2)


def test_duf_parity(rng):
    mod = _ref("duf_arch.py")
    from comfyui_keep_tpu.models.misc_archs import DUF
    torch.manual_seed(0)
    net = mod.DUF(scale=2, num_layer=16).eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    tree = convert_state_dict(sd)
    x = rng.random((1, 7, 8, 8, 3), dtype=np.float32)
    with torch.no_grad():
        ref = net(torch.tensor(x.transpose(0, 1, 4, 2, 3)))
    ours = DUF.apply(tree, jnp.asarray(x), scale=2, num_layer=16)
    np.testing.assert_allclose(np.asarray(ours),
                               ref.numpy().transpose(0, 2, 3, 1),
                               atol=1e-4, rtol=1e-3)


def test_arcface_parity(rng):
    mod = _ref("arcface_arch.py")
    from comfyui_keep_tpu.models.misc_archs import ResNetArcFace
    torch.manual_seed(0)
    net = mod.ResNetArcFace("IRBlock", (2, 2, 2, 2), use_se=True).eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    tree = convert_state_dict(sd)
    x = rng.random((2, 128, 128, 1), dtype=np.float32)
    with torch.no_grad():
        # reference forward `.view` breaks on this torch version — run the
        # same modules with .reshape
        h = torch.tensor(x.transpose(0, 3, 1, 2))
        h = net.prelu(net.bn1(net.conv1(h)))
        h = net.maxpool(h)
        h = net.layer4(net.layer3(net.layer2(net.layer1(h))))
        h = net.bn4(h)
        ref = net.bn5(net.fc5(h.reshape(h.size(0), -1)))
    ours = ResNetArcFace.apply(tree, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-3,
                               rtol=1e-2)


def test_inception_shapes():
    """InceptionV3 FID port: param count matches torchvision inception_v3
    conv trunk (21.82M) and block dims match BLOCK_INDEX_BY_DIM."""
    import jax
    from comfyui_keep_tpu.models.inception import InceptionV3
    p = InceptionV3.init(jax.random.PRNGKey(0))
    n = sum(x.size for x in jax.tree.leaves(p))
    assert abs(n - 21_816_224) < 500_000
    x = jnp.zeros((1, 75, 75, 3))
    outs = InceptionV3.apply(p, x, output_blocks=(0, 1, 2, 3),
                             resize_input=False)
    assert [o.shape[-1] for o in outs] == [64, 192, 768, 2048]
