"""Golden parity: SwinIR vs the reference torch implementation."""
import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests import reference_oracle as oracle

pytestmark = pytest.mark.skipif(not oracle.reference_available(),
                                reason="reference repo not mounted")

ARCHS = "/root/reference/modules/deps/wm_basicsr/archs"

CFG = dict(img_size=16, in_chans=3, embed_dim=12, depths=(2, 2),
           num_heads=(2, 2), window_size=4, mlp_ratio=2.0, upscale=2)


@pytest.fixture(scope="module")
def ref_mod():
    oracle._install_stubs_arch_util()
    oracle.load_ref_arch_util()
    return oracle._module_from_file("wm_basicsr.archs.swinir_arch",
                                    f"{ARCHS}/swinir_arch.py")


@pytest.mark.parametrize("upsampler", ["pixelshuffle", "pixelshuffledirect", ""])
def test_swinir_parity(ref_mod, rng, upsampler):
    from comfyui_keep_tpu.models.swinir import SwinIR, convert_swinir_checkpoint
    torch.manual_seed(0)
    net = ref_mod.SwinIR(upsampler=upsampler, drop_path_rate=0.0,
                         **{k: (list(v) if isinstance(v, tuple) else v)
                            for k, v in CFG.items()}).eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    tree = convert_swinir_checkpoint(sd)
    x = rng.random((1, 16, 16, 3), dtype=np.float32)
    with torch.no_grad():
        ref = net(torch.tensor(x.transpose(0, 3, 1, 2)))
    ours = SwinIR.apply(tree, jnp.asarray(x), upsampler=upsampler,
                        **{k: v for k, v in CFG.items() if k != "img_size" and k != "in_chans"},
                        in_chans=3)
    np.testing.assert_allclose(np.asarray(ours),
                               ref.numpy().transpose(0, 2, 3, 1),
                               atol=2e-4, rtol=1e-3)
