"""Golden-value parity: our VQGAN vs the reference torch implementation on
random weights (SURVEY.md §4's recommended test design — module-level parity
against the PyTorch reference)."""
import numpy as np
import pytest
import jax.numpy as jnp

from tests import reference_oracle as oracle

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(not oracle.reference_available(),
                                reason="reference repo not mounted")

from comfyui_keep_tpu.models import vqgan
from comfyui_keep_tpu.utils.checkpoint import convert_state_dict, embedding_rule

CFG = dict(img_size=32, nf=32, ch_mult=(1, 2), res_blocks=1,
           attn_resolutions=(16,), codebook_size=64, emb_dim=16, beta=0.25)


@pytest.fixture(scope="module")
def ref_and_params():
    ref = oracle.load_ref_vqgan()
    torch.manual_seed(0)
    net = ref.VQAutoEncoder(img_size=CFG["img_size"], nf=CFG["nf"],
                            ch_mult=list(CFG["ch_mult"]), quantizer="nearest",
                            res_blocks=CFG["res_blocks"],
                            attn_resolutions=list(CFG["attn_resolutions"]),
                            codebook_size=CFG["codebook_size"],
                            emb_dim=CFG["emb_dim"]).eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    tree = convert_state_dict(
        sd, rules=[embedding_rule("quantize.embedding", ("quantize", "embedding"))])
    return net, tree


def test_encoder_parity(ref_and_params, rng):
    net, tree = ref_and_params
    x = rng.standard_normal((2, 32, 32, 3), dtype=np.float32)
    with torch.no_grad():
        ref_z = net.encoder(torch.tensor(x.transpose(0, 3, 1, 2)))
    enc_plan, _ = vqgan.VQAutoEncoder.make_plans(**CFG)
    z = vqgan.blocks_apply({"blocks": tree["encoder"]["blocks"]}, enc_plan,
                           jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(z), ref_z.numpy().transpose(0, 2, 3, 1),
                               atol=2e-4, rtol=1e-4)


def test_full_forward_parity(ref_and_params, rng):
    net, tree = ref_and_params
    x = rng.standard_normal((1, 32, 32, 3), dtype=np.float32)
    with torch.no_grad():
        ref_out, ref_loss, ref_stats = net(torch.tensor(x.transpose(0, 3, 1, 2)))
    out, loss, stats = vqgan.VQAutoEncoder.apply(tree, jnp.asarray(x), **CFG)
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy().transpose(0, 2, 3, 1),
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(float(loss), float(ref_loss), atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(stats["min_encoding_indices"]).reshape(-1),
        ref_stats["min_encoding_indices"].numpy().reshape(-1))


def test_codebook_lookup_parity(ref_and_params, rng):
    net, tree = ref_and_params
    idx = rng.integers(0, CFG["codebook_size"], size=(1 * 8 * 8,))
    with torch.no_grad():
        ref_feat = net.quantize.get_codebook_feat(
            torch.tensor(idx), shape=[1, 8, 8, CFG["emb_dim"]])
    feat = vqgan.vq_lookup(tree["quantize"], jnp.asarray(idx)).reshape(1, 8, 8, -1)
    np.testing.assert_allclose(np.asarray(feat),
                               ref_feat.numpy().transpose(0, 2, 3, 1), atol=1e-6)


def test_encoder_taps(ref_and_params, rng):
    """Tap features by flat block index (KEEP-arch CFT skip mechanism)."""
    _, tree = ref_and_params
    x = rng.standard_normal((1, 32, 32, 3), dtype=np.float32)
    enc_plan, _ = vqgan.VQAutoEncoder.make_plans(**CFG)
    z, taps = vqgan.blocks_apply({"blocks": tree["encoder"]["blocks"]}, enc_plan,
                                 jnp.asarray(x), tap_indices=[0, 2])
    assert set(taps) == {0, 2}
    assert taps[0].shape == (1, 32, 32, 32)


def test_discriminator3d_shape(rng):
    import jax
    p = vqgan.Discriminator3D.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.standard_normal((1, 6, 64, 64, 3), dtype=np.float32))
    out = vqgan.Discriminator3D.apply(p, x)
    assert out.shape[0] == 1 and out.ndim == 5


def test_vqgan_discriminator_parity(ref_and_params, rng):
    ref = oracle.load_ref_vqgan()
    torch.manual_seed(1)
    net = ref.VQGANDiscriminator(nc=3, ndf=16, n_layers=2).eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    tree = convert_state_dict(sd)
    x = rng.standard_normal((1, 32, 32, 3), dtype=np.float32)
    with torch.no_grad():
        ref_out = net(torch.tensor(x.transpose(0, 3, 1, 2)))
    # reference Sequential: main.0 conv, main.1 lrelu, ... → params under 'main'
    layers = [l for l in tree["main"] if l is not None and ("w" in l or "scale" in l)]
    # regroup (conv[, bn]) pairs into our layer structure
    grouped, i = [], 0
    while i < len(layers):
        entry = {"conv": layers[i]}
        if i + 1 < len(layers) and "mean" in layers[i + 1]:
            entry["bn"] = layers[i + 1]
            i += 2
        else:
            i += 1
        grouped.append(entry)
    out = vqgan.VQGANDiscriminator.apply({"layers": grouped}, jnp.asarray(x),
                                         nc=3, ndf=16, n_layers=2)
    np.testing.assert_allclose(np.asarray(out),
                               ref_out.numpy().transpose(0, 2, 3, 1), atol=1e-4,
                               rtol=1e-4)


def test_int8_acts_flag(monkeypatch):
    """KEEP_TPU_INT8_ACTS=1 (serving experiment, docs/ROADMAP.md): flag off
    is the default path bitwise; flag on stays finite and close (per-tensor
    int8 quantization noise at block boundaries)."""
    import jax
    import jax.numpy as jnp
    from comfyui_keep_tpu.models.vqgan import (encoder_plan, blocks_init,
                                               blocks_apply)
    plan = encoder_plan(3, 64, 32, (1, 2), 2, 64, (16,))
    params = blocks_init(jax.random.PRNGKey(0), plan)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    base = np.asarray(blocks_apply(params, plan, x))
    monkeypatch.setenv("KEEP_TPU_INT8_ACTS", "1")
    q = np.asarray(blocks_apply(params, plan, x))
    monkeypatch.delenv("KEEP_TPU_INT8_ACTS")
    again = np.asarray(blocks_apply(params, plan, x))
    np.testing.assert_array_equal(base, again)
    assert np.isfinite(q).all()
    rel = np.linalg.norm(q - base) / np.linalg.norm(base)
    assert 0 < rel < 0.2, rel
