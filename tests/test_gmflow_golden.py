"""Golden parity: our GMFlow vs the reference torch package on random weights."""
import sys

import numpy as np
import pytest
import jax.numpy as jnp

from tests import reference_oracle as oracle

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(not oracle.reference_available(),
                                reason="reference repo not mounted")

GMFLOW_PKG_DIR = f"{oracle.REF_ROOT}/archs/gmflow"


@pytest.fixture(scope="module")
def ref_gmflow():
    if GMFLOW_PKG_DIR not in sys.path:
        sys.path.insert(0, GMFLOW_PKG_DIR)
    import importlib
    return importlib.import_module("gmflow.gmflow")


@pytest.fixture(scope="module")
def nets(ref_gmflow):
    from comfyui_keep_tpu.models.gmflow import convert_gmflow_checkpoint
    torch.manual_seed(0)
    net = ref_gmflow.GMFlow().eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    tree = convert_gmflow_checkpoint(sd)
    return net, tree


def test_param_count(nets):
    import jax
    net, tree = nets
    assert sum(x.size for x in jax.tree.leaves(tree)) == \
        sum(p.numel() for p in net.parameters())


def test_backbone_parity(nets, rng):
    from comfyui_keep_tpu.models.gmflow import backbone_apply
    net, tree = nets
    x = rng.standard_normal((2, 64, 64, 3), dtype=np.float32)
    with torch.no_grad():
        ref = net.backbone(torch.tensor(x.transpose(0, 3, 1, 2)))[0]
    ours = backbone_apply(tree["backbone"], jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy().transpose(0, 2, 3, 1),
                               atol=2e-4, rtol=1e-3)


def test_full_flow_parity(nets, rng):
    from comfyui_keep_tpu.models.gmflow import GMFlow
    net, tree = nets
    img0 = rng.random((1, 64, 64, 3), dtype=np.float32) * 255
    img1 = rng.random((1, 64, 64, 3), dtype=np.float32) * 255
    with torch.no_grad():
        ref = net(torch.tensor(img0.transpose(0, 3, 1, 2)),
                  torch.tensor(img1.transpose(0, 3, 1, 2)),
                  attn_splits_list=[2], corr_radius_list=[-1],
                  prop_radius_list=[-1])["flow_preds"][-1]
    ours = GMFlow.apply(tree, jnp.asarray(img0), jnp.asarray(img1),
                        attn_splits=2, corr_radius=-1, prop_radius=-1)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy().transpose(0, 2, 3, 1),
                               atol=2e-3, rtol=1e-2)


def test_local_variants_parity(nets, rng):
    """Local correlation + local-window propagation (refinement-scale ops)."""
    from comfyui_keep_tpu.models.gmflow import GMFlow
    net, tree = nets
    img0 = rng.random((1, 32, 32, 3), dtype=np.float32) * 255
    img1 = rng.random((1, 32, 32, 3), dtype=np.float32) * 255
    with torch.no_grad():
        ref = net(torch.tensor(img0.transpose(0, 3, 1, 2)),
                  torch.tensor(img1.transpose(0, 3, 1, 2)),
                  attn_splits_list=[1], corr_radius_list=[2],
                  prop_radius_list=[1])["flow_preds"][-1]
    ours = GMFlow.apply(tree, jnp.asarray(img0), jnp.asarray(img1),
                        attn_splits=1, corr_radius=2, prop_radius=1)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy().transpose(0, 2, 3, 1),
                               atol=2e-3, rtol=1e-2)


def test_gmflow_bf16_serving_dtype(nets, rng):
    """bf16 params + inputs must flow through without dtype mismatches
    (the serving path); regression for the f32 softmax-expectation leak."""
    import jax
    from comfyui_keep_tpu.models.gmflow import GMFlow, flow_from_clip
    _, tree = nets
    bf = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), tree)
    x = jnp.asarray(rng.random((1, 3, 64, 64, 3), dtype=np.float32) - 0.5,
                    jnp.bfloat16)
    flows = flow_from_clip(bf, x)
    assert flows.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(flows, np.float32)).all()


def test_multiscale_refine_parity(ref_gmflow, rng):
    """2-scale gmflow_with_refine variant: trident backbone + residual
    refinement (gmflow.py:92-170), forward and bidirectional."""
    from comfyui_keep_tpu.models.gmflow import GMFlow, convert_gmflow_checkpoint
    torch.manual_seed(1)
    net = ref_gmflow.GMFlow(num_scales=2).eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    tree = convert_gmflow_checkpoint(sd)
    img0 = rng.random((1, 64, 64, 3), dtype=np.float32) * 255
    img1 = rng.random((1, 64, 64, 3), dtype=np.float32) * 255
    kw = dict(attn_splits_list=[2, 2], corr_radius_list=[-1, 4],
              prop_radius_list=[-1, 1])
    with torch.no_grad():
        ref = net(torch.tensor(img0.transpose(0, 3, 1, 2)),
                  torch.tensor(img1.transpose(0, 3, 1, 2)),
                  **kw)["flow_preds"][-1]
    ours = GMFlow.apply_refine(tree, jnp.asarray(img0), jnp.asarray(img1),
                               attn_splits_list=(2, 2),
                               corr_radius_list=(-1, 4),
                               prop_radius_list=(-1, 1), num_scales=2)
    # two softmax-expectation scales + a feature warp amplify f32 noise on
    # random weights; 99.7% of pixels agree to 5e-3 px, tail to ~5e-2
    # (tail widened slightly by the fused-qkv summation order)
    np.testing.assert_allclose(np.asarray(ours),
                               ref.numpy().transpose(0, 2, 3, 1),
                               atol=5e-2, rtol=1e-2)
    with torch.no_grad():
        refb = net(torch.tensor(img0.transpose(0, 3, 1, 2)),
                   torch.tensor(img1.transpose(0, 3, 1, 2)),
                   pred_bidir_flow=True, **kw)["flow_preds"][-1]
    oursb = GMFlow.apply_refine(tree, jnp.asarray(img0), jnp.asarray(img1),
                                attn_splits_list=(2, 2),
                                corr_radius_list=(-1, 4),
                                prop_radius_list=(-1, 1), num_scales=2,
                                pred_bidir_flow=True)
    # the reference reuses the transposed correlation for the backward
    # direction; we recompute it as a swapped pair — bitwise different
    # accumulation order, so the random-weight tail is looser here...
    np.testing.assert_allclose(np.asarray(oursb),
                               refb.numpy().transpose(0, 2, 3, 1),
                               atol=2e-1, rtol=5e-2)
    # ...but the backward half must EXACTLY equal our forward pass on the
    # swapped image pair (same code path)
    swapped = GMFlow.apply_refine(tree, jnp.asarray(img1), jnp.asarray(img0),
                                  attn_splits_list=(2, 2),
                                  corr_radius_list=(-1, 4),
                                  prop_radius_list=(-1, 1), num_scales=2)
    np.testing.assert_allclose(np.asarray(oursb[1:]), np.asarray(swapped),
                               atol=1e-5, rtol=1e-5)


def test_forward_backward_consistency_parity(rng):
    """Occlusion masks bit-match the reference geometry.py:96-118."""
    import sys
    if GMFLOW_PKG_DIR not in sys.path:
        sys.path.insert(0, GMFLOW_PKG_DIR)
    from gmflow import geometry as G
    from comfyui_keep_tpu.models.gmflow import (
        forward_backward_consistency_check)
    f = rng.standard_normal((2, 16, 16, 2), dtype=np.float32) * 3
    b = rng.standard_normal((2, 16, 16, 2), dtype=np.float32) * 3
    fo, bo = forward_backward_consistency_check(jnp.asarray(f),
                                                jnp.asarray(b))
    rf, rb = G.forward_backward_consistency_check(
        torch.tensor(f.transpose(0, 3, 1, 2)),
        torch.tensor(b.transpose(0, 3, 1, 2)))
    np.testing.assert_array_equal(np.asarray(fo), rf.numpy())
    np.testing.assert_array_equal(np.asarray(bo), rb.numpy())


def test_flow_from_clip_planes_exact(nets, rng):
    """planes=True returns the same flow values as the interleaved form —
    (fx, fy) == flow[..., 0/1] bit-exactly (same ops, different layout)."""
    from comfyui_keep_tpu.models.gmflow import flow_from_clip
    _, tree = nets
    x = jnp.asarray(rng.random((1, 3, 64, 64, 3), dtype=np.float32) - 0.5)
    inter = np.asarray(flow_from_clip(tree, x))
    fx, fy = flow_from_clip(tree, x, planes=True)
    np.testing.assert_array_equal(np.asarray(fx), inter[..., 0])
    np.testing.assert_array_equal(np.asarray(fy), inter[..., 1])
