"""Golden parity for the SR upscaler family + tiled inference tests."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests import reference_oracle as oracle

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(not oracle.reference_available(),
                                reason="reference repo not mounted")

from comfyui_keep_tpu.models import sr_basic
from comfyui_keep_tpu.utils.checkpoint import convert_state_dict

ARCHS = "/root/reference/modules/deps/wm_basicsr/archs"


def _ref(name, fname):
    oracle._install_stubs_arch_util()
    oracle.load_ref_arch_util()  # satisfies `from .arch_util import ...`
    return oracle._module_from_file(f"wm_basicsr.archs.{fname[:-3]}",
                                    f"{ARCHS}/{fname}")


def _to_tree(net, drop=()):
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()
          if not any(k.startswith(d) for d in drop)}
    return convert_state_dict(sd)


def test_pixel_shuffle_parity(rng):
    x = rng.standard_normal((2, 4, 6, 12), dtype=np.float32)
    ref = torch.nn.functional.pixel_shuffle(torch.tensor(x.transpose(0, 3, 1, 2)), 2)
    ours = sr_basic.pixel_shuffle(jnp.asarray(x), 2)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy().transpose(0, 2, 3, 1), atol=1e-6)
    # unshuffle inverts
    back = sr_basic.pixel_unshuffle(ours, 2)
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-6)


@pytest.mark.parametrize("scale", [4, 2])
def test_rrdbnet_parity(rng, scale):
    mod = _ref("ref_rrdbnet", "rrdbnet_arch.py")
    torch.manual_seed(0)
    net = mod.RRDBNet(3, 3, scale=scale, num_feat=16, num_block=2, num_grow_ch=8).eval()
    tree = _to_tree(net)
    x = rng.random((1, 16, 16, 3), dtype=np.float32)
    with torch.no_grad():
        ref = net(torch.tensor(x.transpose(0, 3, 1, 2)))
    ours = sr_basic.RRDBNet.apply(tree, jnp.asarray(x), scale=scale)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy().transpose(0, 2, 3, 1),
                               atol=1e-4, rtol=1e-3)


def test_srvgg_parity(rng):
    mod = _ref("ref_srvgg", "srvgg_arch.py")
    torch.manual_seed(0)
    net = mod.SRVGGNetCompact(num_feat=16, num_conv=4, upscale=4).eval()
    tree = _to_tree(net)
    # torch PReLU weight key 'body.1.weight' (1D) converts to 'scale' — remap
    body = []
    for item in tree["body"]:
        if item is not None and "scale" in item:
            body.append({"prelu_w": item["scale"]})
        else:
            body.append(item)
    x = rng.random((1, 12, 12, 3), dtype=np.float32)
    with torch.no_grad():
        ref = net(torch.tensor(x.transpose(0, 3, 1, 2)))
    ours = sr_basic.SRVGGNetCompact.apply({"body": body}, jnp.asarray(x), upscale=4)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy().transpose(0, 2, 3, 1),
                               atol=1e-4, rtol=1e-3)


def test_msrresnet_parity(rng):
    mod = _ref("ref_srresnet", "srresnet_arch.py")
    torch.manual_seed(0)
    net = mod.MSRResNet(num_feat=16, num_block=2, upscale=4).eval()
    tree = _to_tree(net)
    x = rng.random((1, 12, 12, 3), dtype=np.float32)
    with torch.no_grad():
        ref = net(torch.tensor(x.transpose(0, 3, 1, 2)))
    ours = sr_basic.MSRResNet.apply(tree, jnp.asarray(x), upscale=4)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy().transpose(0, 2, 3, 1),
                               atol=1e-4, rtol=1e-3)


def test_edsr_parity(rng):
    mod = _ref("ref_edsr", "edsr_arch.py")
    torch.manual_seed(0)
    net = mod.EDSR(3, 3, num_feat=16, num_block=2, upscale=2).eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()
          if k != "mean"}
    tree = convert_state_dict(sd)
    x = rng.random((1, 12, 12, 3), dtype=np.float32)
    with torch.no_grad():
        ref = net(torch.tensor(x.transpose(0, 3, 1, 2)))
    ours = sr_basic.EDSR.apply(tree, jnp.asarray(x), upscale=2)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy().transpose(0, 2, 3, 1),
                               atol=1e-4, rtol=1e-3)


class TestTiled:
    def test_tiled_identity_blend(self, rng):
        """Tiling an identity model reproduces the input exactly wherever the
        blend weights sum to 1 (everywhere, by construction)."""
        from comfyui_keep_tpu.pipeline.tiled import tiled_scale
        img = rng.random((40, 56, 3), dtype=np.float32)
        out = tiled_scale(img, lambda x: x, scale=1, tile=16, overlap=4)
        np.testing.assert_allclose(out, img, atol=1e-5)

    def test_tiled_upscaler_fn(self, rng):
        from comfyui_keep_tpu.pipeline.tiled import make_upscaler_fn
        params = sr_basic.SRVGGNetCompact.init(jax.random.PRNGKey(0),
                                               num_feat=16, num_conv=2, upscale=2)
        up = make_upscaler_fn(
            lambda p, x: sr_basic.SRVGGNetCompact.apply(p, x, upscale=2),
            params, scale=2, tile=16, overlap=4, jit=False)
        img = (rng.random((24, 40, 3)) * 255).astype(np.uint8)
        out = up(img)
        assert out.shape == (48, 80, 3) and out.dtype == np.uint8
