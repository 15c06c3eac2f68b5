"""Golden parity: SpyNet, discriminators, RCAN, RIDNet, ECBSR."""
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
    return oracle._module_from_file(f"wm_basicsr.archs.{fname[:-3]}",
                                    f"{ARCHS}/{fname}")


def _tree(net, drop=()):
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()
          if not any(d in k for d in drop)}
    return convert_state_dict(sd)


def test_spynet_parity(rng):
    mod = _ref("spynet_arch.py")
    from comfyui_keep_tpu.models.spynet import SpyNet
    torch.manual_seed(0)
    net = mod.SpyNet(load_path=None).eval()
    tree = _tree(net, drop=("mean", "std"))
    ref_img = rng.random((1, 64, 64, 3), dtype=np.float32)
    supp_img = rng.random((1, 64, 64, 3), dtype=np.float32)
    with torch.no_grad():
        ref = net(torch.tensor(ref_img.transpose(0, 3, 1, 2)),
                  torch.tensor(supp_img.transpose(0, 3, 1, 2)))
    ours = SpyNet.apply(tree, jnp.asarray(ref_img), jnp.asarray(supp_img))
    np.testing.assert_allclose(np.asarray(ours),
                               ref.numpy().transpose(0, 2, 3, 1),
                               atol=1e-3, rtol=1e-2)


def test_vgg_style_discriminator_parity(rng):
    mod = _ref("discriminator_arch.py")
    from comfyui_keep_tpu.models.discriminators import VGGStyleDiscriminator
    torch.manual_seed(0)
    net = mod.VGGStyleDiscriminator(3, 16, input_size=128).eval()
    tree = _tree(net)
    x = rng.random((2, 128, 128, 3), dtype=np.float32)
    with torch.no_grad():
        # net.forward's `.view` breaks on this torch version (non-contiguous);
        # run the same modules with .reshape
        f = torch.nn.functional
        feat = torch.tensor(x.transpose(0, 3, 1, 2))
        feat = f.leaky_relu(net.conv0_0(feat), 0.2)
        feat = f.leaky_relu(net.bn0_1(net.conv0_1(feat)), 0.2)
        for i in range(1, 5):
            feat = f.leaky_relu(getattr(net, f"bn{i}_0")(getattr(net, f"conv{i}_0")(feat)), 0.2)
            feat = f.leaky_relu(getattr(net, f"bn{i}_1")(getattr(net, f"conv{i}_1")(feat)), 0.2)
        feat = feat.reshape(feat.size(0), -1)
        feat = f.leaky_relu(net.linear1(feat), 0.2)
        ref = net.linear2(feat)
    ours = VGGStyleDiscriminator.apply(tree, jnp.asarray(x), num_feat=16)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-3,
                               rtol=1e-3)


def test_unet_sn_discriminator_parity(rng):
    mod = _ref("discriminator_arch.py")
    from comfyui_keep_tpu.models.discriminators import UNetDiscriminatorSN
    torch.manual_seed(0)
    net = mod.UNetDiscriminatorSN(3, num_feat=16)
    x = rng.random((1, 32, 32, 3), dtype=np.float32)
    xt = torch.tensor(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        net.train()
        for _ in range(30):  # converge power iteration
            net(xt)
        net.eval()
        ref = net(xt)
    tree = _tree(net)
    ours = UNetDiscriminatorSN.apply(tree, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours),
                               ref.numpy().transpose(0, 2, 3, 1),
                               atol=5e-3, rtol=1e-2)


def test_rcan_parity(rng):
    mod = _ref("rcan_arch.py")
    from comfyui_keep_tpu.models.sr_extra import RCAN
    torch.manual_seed(0)
    net = mod.RCAN(3, 3, num_feat=16, num_group=2, num_block=2,
                   squeeze_factor=4, upscale=2).eval()
    tree = _tree(net, drop=("mean",))
    x = rng.random((1, 12, 12, 3), dtype=np.float32)
    with torch.no_grad():
        ref = net(torch.tensor(x.transpose(0, 3, 1, 2)))
    ours = RCAN.apply(tree, jnp.asarray(x), upscale=2)
    np.testing.assert_allclose(np.asarray(ours),
                               ref.numpy().transpose(0, 2, 3, 1),
                               atol=1e-4, rtol=1e-3)


def test_ridnet_parity(rng):
    mod = _ref("ridnet_arch.py")
    from comfyui_keep_tpu.models.sr_extra import RIDNet
    torch.manual_seed(0)
    net = mod.RIDNet(3, 16, 3, num_block=2).eval()
    tree = _tree(net, drop=("sub_mean", "add_mean"))
    x = (rng.random((1, 16, 16, 3), dtype=np.float32) * 255)
    with torch.no_grad():
        ref = net(torch.tensor(x.transpose(0, 3, 1, 2)))
    ours = RIDNet.apply(tree, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours),
                               ref.numpy().transpose(0, 2, 3, 1),
                               atol=1e-3, rtol=1e-3)


def test_ecbsr_parity(rng):
    mod = _ref("ecbsr_arch.py")
    from comfyui_keep_tpu.models.sr_extra import ECBSR
    torch.manual_seed(0)
    net = mod.ECBSR(num_in_ch=3, num_out_ch=3, num_block=2, num_channel=8,
                    with_idt=False, act_type="prelu", scale=2).eval()
    net.train(False)
    # manual conversion: k0/k1/scale/bias parameter names
    tree = {"backbone": []}
    for blk in net.backbone:
        bp = {"conv3x3": {"w": blk.conv3x3.weight.detach().numpy().transpose(2, 3, 1, 0),
                          "b": blk.conv3x3.bias.detach().numpy()},
              "conv1x1_3x3": {
                  "k0": {"w": blk.conv1x1_3x3.k0.detach().numpy().transpose(2, 3, 1, 0),
                         "b": blk.conv1x1_3x3.b0.detach().numpy()},
                  "k1": {"w": blk.conv1x1_3x3.k1.detach().numpy().transpose(2, 3, 1, 0),
                         "b": blk.conv1x1_3x3.b1.detach().numpy()}}}
        for name in ("conv1x1_sbx", "conv1x1_sby", "conv1x1_lpl"):
            sub = getattr(blk, name)
            bp[name] = {"k0": {"w": sub.k0.detach().numpy().transpose(2, 3, 1, 0),
                               "b": sub.b0.detach().numpy()},
                        "scale": sub.scale.detach().numpy().reshape(-1),
                        "bias": sub.bias.detach().numpy()}
        if hasattr(blk, "act") and isinstance(blk.act, torch.nn.PReLU):
            bp["act"] = {"prelu_w": blk.act.weight.detach().numpy()}
        tree["backbone"].append(bp)
    x = rng.random((1, 10, 10, 3), dtype=np.float32)
    with torch.no_grad():
        net.train(True)  # training-mode branch-sum forward (no CUDA reparam)
        ref = net(torch.tensor(x.transpose(0, 3, 1, 2)))
    ours = ECBSR.apply(tree, jnp.asarray(x), num_in_ch=3, scale=2)
    np.testing.assert_allclose(np.asarray(ours),
                               ref.detach().numpy().transpose(0, 2, 3, 1),
                               atol=1e-4, rtol=1e-3)


def test_ecbsr_rep_params_exact(rng):
    """Deploy-time reparameterization: the collapsed single-conv net equals
    the training-form branch sum (ecbsr_arch.py:131-233), incl. with_idt."""
    from comfyui_keep_tpu.models.sr_extra import ECBSR
    import jax
    for with_idt in (False, True):
        p = ECBSR.init(jax.random.PRNGKey(0), num_in_ch=3, num_out_ch=3,
                       num_block=2, num_channel=8, with_idt=with_idt, scale=2)
        x = jnp.asarray(rng.random((2, 12, 12, 3), dtype=np.float32))
        ref = ECBSR.apply(p, x, num_in_ch=3, scale=2, with_idt=with_idt)
        rep = ECBSR.rep_params(p, with_idt=with_idt)
        got = ECBSR.apply_rep(rep, x, num_in_ch=3, scale=2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, err_msg=f"with_idt={with_idt}")
