"""profile_mode isolation knobs on KEEP.apply (perf triage aid).

profile_mode=None must be bit-identical to the default path; each isolation
mode must still produce finite outputs of the right shape (so the TPU
triage harness can time them).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from comfyui_keep_tpu.models.keep import KEEP

TINY = dict(img_size=64, nf=32, ch_mult=(1, 2, 2), res_blocks=2,
            attn_resolutions=(16,), codebook_size=64, emb_dim=32, dim_embd=64,
            n_head=8, n_layers=2, latent_size=256, cft_list=("32", "64"),
            cfa_list=("16",), cfa_nhead=2, cfa_dim=16, kalman_attn_head_dim=8,
            num_uncertainty_layers=1, temp_reg_list=("32",))


@pytest.fixture(scope="module")
def net():
    p = KEEP.init(jax.random.PRNGKey(0), **TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 64, 64, 3)) * 0.3
    return p, x, np.asarray(KEEP.apply(p, x, **TINY))


def test_none_is_default(net):
    p, x, base = net
    out = np.asarray(KEEP.apply(p, x, profile_mode=None, **TINY))
    np.testing.assert_array_equal(out, base)


@pytest.mark.parametrize("mode", ["no_hq", "no_transformer", "no_generator"])
def test_isolation_modes_run(net, mode):
    p, x, base = net
    out = np.asarray(KEEP.apply(p, x, profile_mode=mode, **TINY))
    assert out.shape == base.shape
    assert np.isfinite(out).all()
    # the knob must actually remove work (outputs differ from full path)
    assert not np.array_equal(out, base)


class TestCarriedState:
    def test_carry_roundtrip(self, net):
        p, x, base = net
        res, carry = KEEP.apply(p, x, return_carry=True, **TINY)
        np.testing.assert_array_equal(np.asarray(res), base)
        out_c, cfa_c = carry
        assert out_c.shape == (1, 64, 64, 3)
        assert set(cfa_c) == set(TINY["cfa_list"])
        # continuation chunk: every frame propagates from the carry
        x2 = jax.random.normal(jax.random.PRNGKey(5), (1, 2, 64, 64, 3)) * 0.3
        res2, carry2 = KEEP.apply(p, x2, carry=carry, return_carry=True, **TINY)
        assert res2.shape == (1, 2, 64, 64, 3)
        assert np.isfinite(np.asarray(res2)).all()
        # carried output differs from a cold-start restore of the same chunk
        cold = KEEP.apply(p, x2, **TINY)
        assert not np.allclose(np.asarray(res2), np.asarray(cold))

    def test_single_frame_carry_chunk(self, net):
        p, x, _ = net
        _, carry = KEEP.apply(p, x, return_carry=True, **TINY)
        x1 = jax.random.normal(jax.random.PRNGKey(7), (1, 1, 64, 64, 3)) * 0.3
        res, _ = KEEP.apply(p, x1, carry=carry, return_carry=True, **TINY)
        assert res.shape == (1, 1, 64, 64, 3)

    def test_carry_incompatible_with_profile_mode(self, net):
        p, x, _ = net
        _, carry = KEEP.apply(p, x, return_carry=True, **TINY)
        with pytest.raises(ValueError):
            KEEP.apply(p, x, carry=carry, profile_mode="no_hq", **TINY)


def test_plane_flows_equal_interleaved(net):
    """flows as an (fx, fy) tuple of planes == the (B,T-1,H,W,2) array form
    (the serving path passes planes to skip the interleave round trip)."""
    p, x, _ = net
    flows = jax.random.normal(jax.random.PRNGKey(7), (1, 2, 64, 64, 2)) * 2
    a = np.asarray(KEEP.apply(p, x, flows=flows, **TINY))
    b = np.asarray(KEEP.apply(
        p, x, flows=(flows[..., 0], flows[..., 1]), **TINY))
    np.testing.assert_array_equal(a, b)


class TestForceIndices:
    """force_indices (teacher-forcing hook used by the parity
    certification, tools/parity_report.py forced_net_compare)."""

    def test_forcing_natural_indices_is_identity(self, net):
        p, x, base = net
        out, aux = KEEP.apply(p, x, return_aux=True, **TINY)
        b, t = x.shape[:2]
        idx = jnp.argmax(aux["logits"], axis=-1).reshape(b, t, -1)
        forced = np.asarray(KEEP.apply(p, x, force_indices=idx, **TINY))
        np.testing.assert_array_equal(forced, np.asarray(out))
        np.testing.assert_array_equal(forced, base)

    def test_forcing_other_indices_changes_output(self, net):
        p, x, base = net
        out, aux = KEEP.apply(p, x, return_aux=True, **TINY)
        b, t = x.shape[:2]
        idx = jnp.argmax(aux["logits"], axis=-1).reshape(b, t, -1)
        other = (idx + 1) % TINY["codebook_size"]
        forced = np.asarray(KEEP.apply(p, x, force_indices=other, **TINY))
        assert forced.shape == base.shape
        assert np.isfinite(forced).all()
        assert not np.array_equal(forced, base)
