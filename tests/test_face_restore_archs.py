"""HiFaceGAN + DFDNet smoke/shape tests (the reference nets require the
unavailable torchvision/spectral-norm runtime for golden oracles; these
verify structure, shapes and finiteness)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp


def test_hifacegan_generator(rng):
    from comfyui_keep_tpu.models.hifacegan import HiFaceGAN
    p = HiFaceGAN.init(jax.random.PRNGKey(0), num_feat=8)
    x = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
    out = HiFaceGAN.apply(p, x, num_feat=8)
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()
    assert np.abs(np.asarray(out)).max() <= 1.0  # tanh range


def test_hifacegan_discriminator(rng):
    from comfyui_keep_tpu.models.hifacegan import HiFaceGANDiscriminator
    p = HiFaceGANDiscriminator.init(jax.random.PRNGKey(0), num_feat=8,
                                    num_d=2, n_layers_d=3)
    x = jnp.asarray(rng.random((1, 64, 64, 6), dtype=np.float32))
    outs = HiFaceGANDiscriminator.apply(p, x, num_d=2, n_layers_d=3)
    assert len(outs) == 2
    assert outs[0][-1].shape[-1] == 1


def test_dfdnet_forward(rng):
    from comfyui_keep_tpu.models.dfdnet import DFDNet, FEATURE_SIZES, PARTS
    dictionary = {
        str(fs): {part: rng.standard_normal((3, 8, 8, c), dtype=np.float32) * 0.1
                  for part in PARTS}
        for fs, c in zip(FEATURE_SIZES, (128, 256, 512, 512))}
    p = DFDNet.init(jax.random.PRNGKey(0), num_feat=64, dictionary=dictionary)
    x = jnp.asarray(rng.random((1, 512, 512, 3), dtype=np.float32) - 0.5)
    locs = [np.array([[96, 96, 160, 160]]), np.array([[352, 96, 416, 160]]),
            np.array([[224, 192, 288, 288]]), np.array([[192, 352, 320, 416]])]
    out = DFDNet.apply(p, x, locs)
    assert out.shape == (1, 512, 512, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_hifacegan_mixed_guidance_forward(rng):
    """mixed_guidance_forward (hifacegan_arch.py:96-141): seg==input reduces
    to the plain forward in every mode; mode semantics hold."""
    import jax
    from comfyui_keep_tpu.models.hifacegan import HiFaceGAN
    p = HiFaceGAN.init(jax.random.PRNGKey(0), num_in_ch=3, num_feat=4)
    x = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32))
    y = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32))
    base = HiFaceGAN.apply(p, x, num_feat=4, phase=1)
    for mode in ("progressive", "one_plug", "one_ablate"):
        same = HiFaceGAN.mixed_guidance_forward(p, x, x, n=2, mode=mode,
                                                num_feat=4, phase=1)
        np.testing.assert_allclose(np.asarray(same), np.asarray(base),
                                   atol=1e-6, err_msg=mode)
    # seg=None falls back to the plain forward
    np.testing.assert_allclose(
        np.asarray(HiFaceGAN.mixed_guidance_forward(p, x, None, num_feat=4,
                                                    phase=1)),
        np.asarray(base), atol=1e-6)
    # progressive n=total == all-input guidance == plain forward on x
    total = 4 + 1
    np.testing.assert_allclose(
        np.asarray(HiFaceGAN.mixed_guidance_forward(p, x, y, n=total,
                                                    mode="progressive",
                                                    num_feat=4, phase=1)),
        np.asarray(base), atol=1e-6)
    # a mixed call actually differs from the plain forward
    mixed = HiFaceGAN.mixed_guidance_forward(p, x, y, n=2, mode="progressive",
                                             num_feat=4, phase=1)
    assert not np.allclose(np.asarray(mixed), np.asarray(base), atol=1e-4)
