"""Golden-value parity for the KEEP arch vs the reference torch implementation
(random weights, zero flows — GMFlow is golden-tested separately)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests import reference_oracle as oracle

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(not oracle.reference_available(),
                                reason="reference repo not mounted")

from comfyui_keep_tpu.models import keep as keep_mod
from comfyui_keep_tpu.models.keep import KEEP, convert_checkpoint

REF_KW = dict(img_size=512, cft_list=['16', '32', '64'],
              kalman_attn_head_dim=48, num_uncertainty_layers=3,
              cfa_list=['16', '32'], cfa_nhead=4, cfa_dim=256, cond=1,
              temp_reg_list=['32'])


@pytest.fixture(scope="module")
def ref_net_and_tree():
    ref = oracle.load_ref_keep()
    torch.manual_seed(0)
    net = ref.KEEP(**REF_KW).eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    tree, flownet_sd = convert_checkpoint(sd)
    return net, tree


@pytest.fixture(scope="module")
def cfg():
    return KEEP.config("KEEP")


def test_param_count_matches(ref_net_and_tree):
    net, tree = ref_net_and_tree
    ref_n = sum(p.numel() for p in net.parameters())
    ours = keep_mod.count_parameters(tree)
    assert ours == ref_n


def test_kalman_gain_parity(ref_net_and_tree, cfg, rng):
    net, tree = ref_net_and_tree
    z = rng.standard_normal((1, 3, 256, 16, 16), dtype=np.float32) * 0.5
    with torch.no_grad():
        ref_g = net.kalman_filter.calc_gain(torch.tensor(z))
    ours = keep_mod.kalman_calc_gain(tree["kalman_filter"],
                                     jnp.asarray(z.transpose(0, 1, 3, 4, 2)),
                                     n_head=cfg["n_head"])
    np.testing.assert_allclose(np.asarray(ours),
                               ref_g.numpy().transpose(0, 1, 3, 4, 2),
                               atol=2e-4, rtol=1e-3)


def test_keep_forward_with_gmflow_parity(ref_net_and_tree, cfg, rng):
    """End-to-end: real GMFlow flows feeding the KEEP recurrence, both sides."""
    import sys
    sys.path.insert(0, f"{oracle.REF_ROOT}/archs/gmflow")
    import importlib
    ref_gm_mod = importlib.import_module("gmflow.gmflow")
    from comfyui_keep_tpu.models.gmflow import (convert_gmflow_checkpoint,
                                                flow_from_clip)

    net, tree = ref_net_and_tree
    torch.manual_seed(7)
    gm = ref_gm_mod.GMFlow().eval()
    gm_tree = convert_gmflow_checkpoint(
        {k: v.detach().numpy() for k, v in gm.state_dict().items()})

    class RealFlow(torch.nn.Module):
        def forward(self, im1, im2, **kw):
            im1 = (im1 + 1) / 2 * 255
            im2 = (im2 + 1) / 2 * 255
            return gm(im1, im2, attn_splits_list=[2], corr_radius_list=[-1],
                      prop_radius_list=[-1])["flow_preds"][-1]

    old_flownet = net.flownet
    net.flownet = RealFlow()
    try:
        t = 3
        x = (rng.random((1, t, 3, 256, 256), dtype=np.float32) - 0.5)
        with torch.no_grad():
            ref_flows = net.get_flow(torch.tensor(x))
        x_jax = jnp.asarray(x.transpose(0, 1, 3, 4, 2))
        flows = flow_from_clip(gm_tree, x_jax)
        np.testing.assert_allclose(np.asarray(flows),
                                   ref_flows.numpy().transpose(0, 1, 3, 4, 2),
                                   atol=2e-2, rtol=1e-2)
    finally:
        net.flownet = old_flownet


def test_keep_forward_parity(ref_net_and_tree, cfg, rng):
    net, tree = ref_net_and_tree
    t = 3
    x = (rng.random((1, t, 3, 512, 512), dtype=np.float32) - 0.5)
    with torch.no_grad():
        ref_out = net(torch.tensor(x), need_upscale=False)
    out = KEEP.apply(tree, jnp.asarray(x.transpose(0, 1, 3, 4, 2)),
                     flows=None, detach_16=True, need_upscale=False,
                     remat=False, **cfg)
    np.testing.assert_allclose(np.asarray(out),
                               ref_out.numpy().transpose(0, 1, 3, 4, 2),
                               atol=5e-3, rtol=1e-2)
