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
