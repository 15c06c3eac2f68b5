"""Phase-packed (space-to-depth) 512-level execution: exactness vs the
plain NHWC ops (ops/phase_pack.py, models/vqgan.py packed walkers)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from comfyui_keep_tpu.ops import phase_pack as pp
from comfyui_keep_tpu.ops import conv2d, group_norm, swish, upsample_nearest_2x


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    B, H, W, C = 2, 32, 32, 8
    return rng, B, H, W, C, jnp.asarray(
        rng.standard_normal((B, H, W, C), np.float32))


def _conv_pair(rng, C, cout=None):
    cout = cout or C
    w = jnp.asarray(rng.standard_normal((3, 3, C, cout), np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal(cout, np.float32))
    return w, b


class TestPackedOps:
    def test_pack_roundtrip(self, data):
        _, _, _, _, _, x = data
        np.testing.assert_array_equal(
            pp.depth_to_space(pp.space_to_depth(x), 0), x)

    def test_conv_chain(self, data):
        rng, _, _, _, C, x = data
        w1, b1 = _conv_pair(rng, C)
        w2, b2 = _conv_pair(rng, C)
        ref = conv2d(conv2d(x, w1, b1, padding=1), w2, b2, padding=1)
        pw1, pb1 = pp.pack_conv3x3(np.asarray(w1), np.asarray(b1))
        pw2, pb2 = pp.pack_conv3x3(np.asarray(w2), np.asarray(b2))
        h = pp.packed_conv(pp.space_to_depth(x), jnp.asarray(pw1),
                           jnp.asarray(pb1), parity=0)
        h = pp.packed_conv(h, jnp.asarray(pw2), jnp.asarray(pb2), parity=1)
        np.testing.assert_allclose(pp.depth_to_space(h, 0), ref, atol=1e-5)

    def test_group_norm_swish_parity1(self, data):
        rng, _, H, W, C, x = data
        w1, b1 = _conv_pair(rng, C)
        pw1, pb1 = pp.pack_conv3x3(np.asarray(w1), np.asarray(b1))
        h1 = pp.packed_conv(pp.space_to_depth(x), jnp.asarray(pw1),
                            jnp.asarray(pb1), parity=0)
        gp = {"scale": jnp.asarray(rng.standard_normal(C, np.float32)),
              "bias": jnp.asarray(rng.standard_normal(C, np.float32))}
        ref = swish(group_norm(conv2d(x, w1, b1, padding=1), gp,
                               num_groups=4, eps=1e-6))
        got = pp.packed_group_norm(h1, gp, (H, W), num_groups=4, eps=1e-6,
                                   parity=1, swish_after=True)
        np.testing.assert_allclose(pp.depth_to_space(got, 1), ref, atol=1e-5)

    def test_upconv(self, data):
        rng, _, _, _, C, x = data
        w, b = _conv_pair(rng, C)
        ref = conv2d(upsample_nearest_2x(x), w, b, padding=1)
        pw, pb = pp.pack_upconv3x3(np.asarray(w), np.asarray(b))
        got = pp.depth_to_space(
            pp.packed_upconv(x, jnp.asarray(pw), jnp.asarray(pb)), 1)
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_downsample(self, data):
        rng, _, _, _, C, x = data
        w1, b1 = _conv_pair(rng, C)
        wd, bd = _conv_pair(rng, C)
        h_ref = conv2d(x, w1, b1, padding=1)
        ref = conv2d(h_ref, wd, bd, stride=2, padding=[(0, 1), (0, 1)])
        pw1, pb1 = pp.pack_conv3x3(np.asarray(w1), np.asarray(b1))
        pwd, pbd = pp.pack_downsample3x3(np.asarray(wd), np.asarray(bd))
        h = pp.packed_conv(pp.space_to_depth(x), jnp.asarray(pw1),
                           jnp.asarray(pb1), parity=0)
        got = pp.packed_downsample(h, jnp.asarray(pwd), jnp.asarray(pbd))
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_conv1x1_skip(self, data):
        rng, _, _, _, C, x = data
        w1, b1 = _conv_pair(rng, C)
        wsk = jnp.asarray(rng.standard_normal((1, 1, C, C + 8), np.float32) * 0.1)
        bsk = jnp.asarray(rng.standard_normal(C + 8, np.float32))
        h_ref = conv2d(x, w1, b1, padding=1)
        ref = conv2d(h_ref, wsk, bsk)
        pw1, pb1 = pp.pack_conv3x3(np.asarray(w1), np.asarray(b1))
        h = pp.packed_conv(pp.space_to_depth(x), jnp.asarray(pw1),
                           jnp.asarray(pb1), parity=0)
        got = pp.depth_to_space(pp.packed_conv1x1(h, wsk, bsk, parity=1), 1)
        np.testing.assert_allclose(got, ref, atol=1e-5)


class TestPackedPlans:
    def test_encoder_prefix(self):
        """Packed encoder prefix == plain blocks_apply, incl. a tap inside
        the packed region (the '512'-level skip)."""
        from comfyui_keep_tpu.models.vqgan import (blocks_apply, blocks_init,
                                                   encoder_plan,
                                                   phase512_prepare)
        plan = encoder_plan(3, 64, 32, (1, 2), 2, 64, (16,))
        params = blocks_init(jax.random.PRNGKey(0), plan)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
        ref, rtaps = blocks_apply(params, plan, x, tap_indices=[2, 5])
        prepared = phase512_prepare(params, plan, "encoder")
        got, gtaps = blocks_apply(prepared, plan, x, tap_indices=[2, 5])
        np.testing.assert_allclose(got, ref, atol=2e-5)
        for k in rtaps:
            np.testing.assert_allclose(gtaps[k], rtaps[k], atol=2e-5)

    def test_generator_tail(self):
        from comfyui_keep_tpu.models.vqgan import (blocks_apply, blocks_init,
                                                   generator_plan,
                                                   packed_generator_tail,
                                                   phase512_generator_start,
                                                   phase512_prepare)
        plan = generator_plan(64, 32, (1, 2), 2, 64, (16,))
        params = blocks_init(jax.random.PRNGKey(0), plan)
        z = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 32))
        ref = blocks_apply(params, plan, z)
        start = phase512_generator_start(plan)
        assert start is not None and plan[start][0] == "up"
        prepared = phase512_prepare(params, plan, "generator")
        # run the head unpacked, then the packed tail
        x = z
        from comfyui_keep_tpu.models.vqgan import _block_apply
        for j in range(start):
            x = _block_apply(plan[j], prepared["blocks"][j], x)
        got = packed_generator_tail(prepared, plan, x, start)
        np.testing.assert_allclose(got, ref, atol=2e-5)

    def test_generator_tail_multilevel(self):
        """Multi-level packed tail (up/res chains across 2-3 upsample levels)
        == plain blocks_apply. Run in f64 where the packed rewrite is exact
        to rounding (f32 through a deep random-init GN stack amplifies
        summation-order noise to ~1e-2 for packed AND unpacked alike)."""
        from comfyui_keep_tpu.models.vqgan import (
            _block_apply, blocks_apply, blocks_init, generator_plan,
            packed_generator_tail, phase_generator_start, phase512_prepare)
        jax.config.update("jax_enable_x64", True)
        try:
            plan = generator_plan(32, 32, (1, 2, 2, 4), 2, 64, (8,))
            params = blocks_init(jax.random.PRNGKey(0), plan)
            params = jax.tree.map(lambda a: a.astype(jnp.float64), params)
            z = jax.random.normal(jax.random.PRNGKey(1),
                                  (2, 8, 8, 32)).astype(jnp.float64)
            ref = blocks_apply(params, plan, z)
            for levels in (1, 2, 3):
                start = phase_generator_start(plan, (), max_levels=levels)
                assert plan[start][0] == "up"
                prepared = phase512_prepare(params, plan, "generator",
                                            gen_start=start)
                x = z
                for j in range(start):
                    x = _block_apply(plan[j], prepared["blocks"][j], x)
                got = packed_generator_tail(prepared, plan, x, start)
                np.testing.assert_allclose(got, ref, atol=1e-10)
        finally:
            jax.config.update("jax_enable_x64", False)

    def test_phase_generator_start_fuse_constraint(self):
        """Fusion taps inside the tail push the packed start past them."""
        from comfyui_keep_tpu.models.vqgan import (generator_plan,
                                                   phase_generator_start)
        plan = generator_plan(32, 32, (1, 2, 2, 4), 2, 64, (8,))
        ups = [i for i, s in enumerate(plan) if s[0] == "up"]
        assert phase_generator_start(plan, ()) == ups[0]
        # a tap at the first up's level forces the next one
        assert phase_generator_start(plan, (ups[0] + 1,)) == ups[1]
        assert phase_generator_start(plan, (len(plan) - 1,)) is None
        assert phase_generator_start(plan, (), max_levels=1) == ups[-1]

    def test_keep_prepare_smoke(self):
        """prepare_phase512 is a no-op off 512 and keeps apply() working on
        the tiny config."""
        from comfyui_keep_tpu.models.keep import KEEP
        import __graft_entry__ as ge
        cfg = dict(ge.TINY_CFG)
        params = KEEP.init(jax.random.PRNGKey(0), **cfg)
        prepared = KEEP.prepare_phase512(params, **cfg)
        assert prepared is params  # img_size != 512 -> unchanged
        s = cfg["img_size"]
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 2, s, s, 3)) * 0.3
        out = KEEP.apply(prepared, x, remat=False, **cfg)
        assert out.shape == (1, 2, s, s, 3)

    @pytest.mark.slow
    def test_keep_full_512_parity(self):
        """Full-config 512 KEEP forward: packed == unpacked (f32)."""
        from comfyui_keep_tpu.models.keep import KEEP
        cfg = KEEP.config("KEEP")
        params = KEEP.init(jax.random.PRNGKey(0), **cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 512, 512, 3)) * 0.3
        ref = KEEP.apply(params, x, remat=False, **cfg)
        prepared = KEEP.prepare_phase512(params, **cfg)
        got = KEEP.apply(prepared, x, remat=False, **cfg)
        np.testing.assert_allclose(got, ref, atol=5e-5)


class TestMultiLevelEncoder:
    def test_encoder_prefix_multilevel(self):
        """Multi-level packed encoder prefix (512+256+... levels with
        parity-0 packed deeper levels and p0 downsample kernels) == plain
        blocks_apply, taps included. f64 exactness (summation order is the
        only difference)."""
        import jax.numpy as jnp
        from comfyui_keep_tpu.models.vqgan import (
            blocks_apply, blocks_init, encoder_plan, phase_encoder_end,
            phase512_prepare)
        jax.config.update("jax_enable_x64", True)
        try:
            plan = encoder_plan(3, 32, 32, (1, 2, 2, 4), 2, 64, (8,))
            params = blocks_init(jax.random.PRNGKey(0), plan)
            params = jax.tree.map(lambda a: a.astype(jnp.float64), params)
            x = jax.random.normal(jax.random.PRNGKey(1),
                                  (2, 64, 64, 3)).astype(jnp.float64)
            tap_idx = [i for i, s in enumerate(plan) if s[0] == "res"][:4]
            ref, rtaps = blocks_apply(params, plan, x, tap_indices=tap_idx)
            for levels in (1, 2, 3):
                end = phase_encoder_end(plan, max_levels=levels)
                assert plan[end][0] == "down"
                prepared = phase512_prepare(params, plan, "encoder",
                                            enc_end=end)
                got, gtaps = blocks_apply(prepared, plan, x,
                                          tap_indices=tap_idx)
                np.testing.assert_allclose(got, ref, atol=1e-10,
                                           err_msg=f"levels={levels}")
                for k in rtaps:
                    np.testing.assert_allclose(gtaps[k], rtaps[k],
                                               atol=1e-10,
                                               err_msg=f"tap {k} lv {levels}")
        finally:
            jax.config.update("jax_enable_x64", False)

    def test_phase_encoder_end(self):
        from comfyui_keep_tpu.models.vqgan import (encoder_plan,
                                                   phase_encoder_end)
        plan = encoder_plan(3, 32, 32, (1, 2, 2, 4), 2, 64, (8,))
        downs = [i for i, s in enumerate(plan) if s[0] == "down"]
        assert phase_encoder_end(plan, 1) == downs[0]
        assert phase_encoder_end(plan, 2) == downs[1]
        # more levels than downs exist -> clamps to the last down
        assert phase_encoder_end(plan, 99) == downs[-1]


def test_gmflow_backbone_packed_layer1():
    """Packed GMFlow backbone layer1 (64-ch stride-1 res blocks with
    instance norm) == unpacked, f64 exactness."""
    import jax.numpy as jnp
    from comfyui_keep_tpu.models.gmflow import (backbone_init, backbone_apply,
                                                backbone_prepare_packed)
    jax.config.update("jax_enable_x64", True)
    try:
        p = backbone_init(jax.random.PRNGKey(0))
        p = jax.tree.map(lambda a: a.astype(jnp.float64), p)
        x = jax.random.normal(jax.random.PRNGKey(1),
                              (2, 64, 64, 3)).astype(jnp.float64)
        ref = backbone_apply(p, x)
        packed = backbone_prepare_packed(p)
        got = backbone_apply(packed, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-10)
    finally:
        jax.config.update("jax_enable_x64", False)
