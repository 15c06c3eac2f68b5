"""Pipeline/API tests on a tiny KEEP config (fast on CPU)."""
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from comfyui_keep_tpu import api
from comfyui_keep_tpu.pipeline import tracking

TINY = dict(img_size=64, nf=32, ch_mult=(1, 2, 2), res_blocks=2,
            attn_resolutions=(16,), codebook_size=64, emb_dim=32, dim_embd=64,
            n_head=8, n_layers=2, latent_size=256, cft_list=("32", "64"),
            cfa_list=("16",), cfa_nhead=2, cfa_dim=16, kalman_attn_head_dim=8,
            num_uncertainty_layers=1, temp_reg_list=())


@pytest.fixture(scope="module")
def pack():
    # random-weight pack, no flow net needed beyond zero flows: keep gmflow
    # out to exercise the flows=None path quickly
    p = api.load_models("KEEP", use_cache=False, cfg_overrides=TINY)
    p.gmflow_params = None
    return p


def test_single_image_aligned(pack, rng):
    img = (rng.random((100, 80, 3)) * 255).astype(np.uint8)
    out = api.restore_image(pack, img, final_upscale_factor=1.0, has_aligned=True)
    assert out.shape == (64, 64, 3) and out.dtype == np.uint8


def test_single_image_aligned_upscale(pack, rng):
    img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    out = api.restore_image(pack, img, final_upscale_factor=2.0, has_aligned=True)
    assert out.shape == (128, 128, 3)


def test_sequence_aligned_chunked(pack, rng):
    frames = [(rng.random((64, 64, 3)) * 255).astype(np.uint8) for _ in range(5)]
    out = api.restore_sequence(pack, frames, has_aligned_frames=True,
                               max_clip_length=3)
    assert len(out) == 5
    assert all(f.shape == (64, 64, 3) for f in out)


def test_chunk_reset_semantics(pack, rng):
    """Chunked restore must equal restoring each chunk independently
    (per-chunk state reset, keep_processor.py:263-270)."""
    proc = pack.processor()
    faces = [(rng.random((64, 64, 3)) * 255).astype(np.uint8) for _ in range(5)]
    chunked = proc.restore_face_stream(faces, max_clip_length=3)
    manual = proc.restore_face_stream(faces[:3], max_clip_length=3) + \
        proc.restore_face_stream(faces[3:], max_clip_length=3)
    for a, b in zip(chunked, manual):
        np.testing.assert_array_equal(a, b)


def test_one_frame_remainder_duplicates(pack, rng):
    """A trailing 1-frame chunk uses the duplicate-frame trick (:266-268)."""
    proc = pack.processor()
    faces = [(rng.random((64, 64, 3)) * 255).astype(np.uint8) for _ in range(4)]
    out = proc.restore_face_stream(faces, max_clip_length=3)
    assert len(out) == 4
    single = proc.restore_face_stream(faces[3:], max_clip_length=3)
    np.testing.assert_array_equal(out[3], single[0])


def test_batched_full_chunks_bitwise(pack, rng):
    """Streams with >= 2 full chunks run all full chunks as ONE program
    (whole-program lax.map by default; stage-batched KEEP.apply_chunks
    under opt-in KEEP_TPU_STAGE_BATCH=1); outputs must be BIT-equal to
    chunk-at-a-time dispatch, including with a ragged tail. (Bitwise holds
    for both paths on CPU; on TPU the stage-batched path retiles batched
    convs and is only float-accumulation-equal.)"""
    for env in (None, "1"):
        if env is None:
            os.environ.pop("KEEP_TPU_STAGE_BATCH", None)
        else:
            os.environ["KEEP_TPU_STAGE_BATCH"] = env
        try:
            proc = pack.processor()
            for n in (8, 9):  # exact multiple and ragged tail
                faces = [(rng.random((64, 64, 3)) * 255).astype(np.uint8)
                         for _ in range(n)]
                batched = proc.restore_face_stream(faces, max_clip_length=2)
                manual = []
                for s in range(0, n, 2):
                    manual.extend(proc.restore_face_stream(
                        faces[s:s + 2], max_clip_length=2))
                assert len(batched) == n
                for a, b in zip(batched, manual):
                    np.testing.assert_array_equal(a, b)
        finally:
            os.environ.pop("KEEP_TPU_STAGE_BATCH", None)


def test_apply_chunks_matches_per_chunk(rng):
    """KEEP.apply_chunks (stage-batched multi-chunk serving) equals
    stacking independent per-chunk KEEP.apply calls — the reference's
    chunk-reset semantics (keep_processor.py:263-270) — including with
    real non-zero flows."""
    import jax
    from comfyui_keep_tpu.models.keep import KEEP

    cfg = dict(TINY, codebook_size=64, n_layers=1,
               num_uncertainty_layers=1)
    params = KEEP.init(jax.random.PRNGKey(0), **cfg)
    g, t, s = 3, 4, cfg["img_size"]
    x = jax.random.normal(jax.random.PRNGKey(1), (g, t, s, s, 3)) * 0.3
    fx = jax.random.normal(jax.random.PRNGKey(2), (g, t - 1, s, s)) * 2
    fy = jax.random.normal(jax.random.PRNGKey(3), (g, t - 1, s, s)) * 2
    out_c = np.asarray(KEEP.apply_chunks(params, x, flows=(fx, fy), **cfg))
    ref = np.stack([np.asarray(KEEP.apply(
        params, x[i:i + 1], flows=(fx[i:i + 1], fy[i:i + 1]),
        remat=False, **cfg))[0] for i in range(g)])
    assert out_c.shape == ref.shape
    np.testing.assert_allclose(out_c, ref, atol=2e-5, rtol=1e-5)


def test_no_faces_returns_bg(pack, rng):
    img = (rng.random((70, 90, 3)) * 255).astype(np.uint8)
    from comfyui_keep_tpu.facelib.helper import FaceRestoreHelper
    pack.face_helper = FaceRestoreHelper(
        detector=lambda im, conf: np.zeros((0, 15), np.float32), use_parse=False)
    out = api.restore_image(pack, img, final_upscale_factor=1.0, has_aligned=False)
    np.testing.assert_array_equal(out, img)


class TestTracking:
    def test_interpolate(self):
        seq = np.array([1.0, np.nan, 3.0])
        np.testing.assert_allclose(tracking.interpolate_sequence(seq), [1, 2, 3])

    def test_track_single_face(self):
        lm = lambda cx: np.full((5, 2), cx, dtype=np.float64)
        frames = [[lm(10)], [lm(12)], [lm(14)]]
        tracks = tracking.track_faces(frames)
        assert len(tracks) == 1
        assert len(tracks[0]) == 3

    def test_track_two_faces_with_gap(self):
        # Reference semantics: a track is only matchable while present in the
        # immediately previous frame — a 1-frame dropout ends the track and
        # the reappearing face starts a NEW track (keep_processor.py:74-82).
        lm = lambda cx: np.full((5, 2), cx, dtype=np.float64)
        frames = [[lm(10), lm(200)], [lm(11)], [lm(12), lm(201)]]
        tracks = tracking.track_faces(frames)
        assert len(tracks) == 3
        b = [t for t in tracks.values() if t[0][0, 0] == 200][0]
        assert np.all(np.isnan(b[1])) and np.all(np.isnan(b[2]))
        # every track padded to full length
        assert all(len(t) == 3 for t in tracks.values())

    def test_track_distance_threshold_starts_new_track(self):
        lm = lambda cx: np.full((5, 2), cx, dtype=np.float64)
        frames = [[lm(10)], [lm(500)]]
        tracks = tracking.track_faces(frames)
        assert len(tracks) == 2

    def test_smooth_tracks(self):
        lm = lambda cx: np.full((5, 2), cx, dtype=np.float64)
        frames = [[lm(10)], [lm(20)], [lm(30)]]
        tracks = tracking.track_faces(frames)
        sm = tracking.smooth_landmark_tracks(tracks, 3)
        assert sm[0].shape == (3, 5, 2)
        assert np.all(np.isfinite(sm[0]))


class TestHelperGeometry:
    def test_similarity_matches_cv2(self, rng):
        from comfyui_keep_tpu.facelib.helper import (similarity_transform,
                                                     FFHQ_TEMPLATE_512)
        src = FFHQ_TEMPLATE_512 + rng.standard_normal((5, 2)) * 3
        ours = similarity_transform(src, FFHQ_TEMPLATE_512)
        ref = cv2.estimateAffinePartial2D(src, FFHQ_TEMPLATE_512,
                                          method=cv2.LMEDS)[0]
        # LMEDS does a robust re-weighting pass; on clean landmarks it agrees
        # with the closed-form similarity solve to ~2e-5 (≈0.01px over 512)
        np.testing.assert_allclose(ours, ref, atol=1e-3)

    def test_invert_affine_matches_cv2(self, rng):
        from comfyui_keep_tpu.facelib.helper import invert_affine
        m = np.array([[1.2, 0.3, 10.0], [-0.3, 1.2, -5.0]])
        np.testing.assert_allclose(invert_affine(m),
                                   cv2.invertAffineTransform(m), atol=1e-8)


def test_carried_chunks_stream(pack, rng):
    """carry_chunks=True: later chunks see the carried Kalman/CFA state, so
    chunk-2 output differs from a cold restart but the first chunk matches."""
    proc = pack.processor()
    faces = [(rng.random((64, 64, 3)) * 255).astype(np.uint8) for _ in range(5)]
    carried = proc.restore_face_stream(faces, max_clip_length=3,
                                       carry_chunks=True)
    reset = proc.restore_face_stream(faces, max_clip_length=3)
    assert len(carried) == 5
    for a, b in zip(carried[:3], reset[:3]):
        np.testing.assert_array_equal(a, b)
    assert any(not np.array_equal(a, b)
               for a, b in zip(carried[3:], reset[3:]))
    # 1-frame tail chunk needs no duplication hack in carried mode
    tail = proc.restore_face_stream(faces[:4], max_clip_length=3,
                                    carry_chunks=True)
    assert len(tail) == 4


def test_batch_chunks_mode_matches_mapped(pack, rng):
    """KEEP_TPU_BATCH_CHUNKS=1 (round 5: fully batched B=n_chunks program,
    scan included — viable after the GN scan-barrier fix) matches the
    default lax.map path on CPU. Batched reductions can differ in float
    accumulation order, so this asserts closeness, not bitwise."""
    faces = [(rng.random((64, 64, 3)) * 255).astype(np.uint8)
             for _ in range(8)]
    proc = pack.processor()
    base = proc.restore_face_stream(faces, max_clip_length=2)
    os.environ["KEEP_TPU_BATCH_CHUNKS"] = "1"
    try:
        proc2 = pack.processor()
        batched = proc2.restore_face_stream(faces, max_clip_length=2)
    finally:
        os.environ.pop("KEEP_TPU_BATCH_CHUNKS", None)
    assert len(batched) == 8
    # Batched-vs-mapped programs differ only in float accumulation order,
    # but with random weights a near-degenerate codebook margin can flip
    # a pick and swap a whole decoded patch (the chaos floor). So bound
    # the DISAGREEING-pixel fraction, not the max delta: nearly all
    # pixels must round identically; a stray patch flip stays small.
    diff = np.abs(np.stack(batched).astype(np.int16)
                  - np.stack(base).astype(np.int16))
    frac_off = float((diff > 1).mean())
    assert frac_off < 0.02, frac_off  # measured 0.0 on this host


def test_gn_barrier_scoped_to_batched_scan_bodies():
    """The round-5 GN layout barrier must appear in scan-body jaxprs at
    B>1 and NOWHERE else: not at B=1 (bitwise-stable serving program) and
    not in straight-line batched stages (their conv+GN fusion is a
    measured win)."""
    import jax
    import jax.numpy as jnp
    from comfyui_keep_tpu.models.keep import KEEP, _plans
    from comfyui_keep_tpu.models.vqgan import blocks_apply
    from comfyui_keep_tpu.ops.norm import batched_scan_guard

    cfg = dict(TINY)
    params = KEEP.init(jax.random.PRNGKey(0), **cfg)
    full = {**KEEP.config("KEEP"), **cfg}

    def count_barriers(jaxpr) -> int:
        n = 0
        for eqn in jaxpr.eqns:
            if eqn.primitive.name == "optimization_barrier":
                n += 1
            for v in eqn.params.values():
                if hasattr(v, "jaxpr"):
                    n += count_barriers(v.jaxpr)
                elif isinstance(v, (list, tuple)):
                    for vv in v:
                        if hasattr(vv, "jaxpr"):
                            n += count_barriers(vv.jaxpr)
        return n

    def barriers_at(b):
        x = jnp.zeros((b, 2, 64, 64, 3), jnp.float32)
        jx = jax.make_jaxpr(
            lambda p, z: KEEP.apply(p, z, remat=False, **cfg))(params, x)
        return count_barriers(jx.jaxpr)

    n1, n2 = barriers_at(1), barriers_at(2)
    assert n2 > n1, (n1, n2)  # GN barriers appear only at B>1

    # straight-line batched GN (the LQ-encoder pattern) stays barrier-free
    enc_plan, _ = _plans(full)
    xf = jnp.zeros((4, 64, 64, 3), jnp.float32)
    js = jax.make_jaxpr(
        lambda p, z: blocks_apply(p["encoder"], enc_plan, z,
                                  remat=False))(params, xf)
    assert count_barriers(js.jaxpr) == 0

    # and the guard itself is what arms it
    with batched_scan_guard():
        ja = jax.make_jaxpr(
            lambda p, z: blocks_apply(p["encoder"], enc_plan, z,
                                      remat=False))(params, xf)
    assert count_barriers(ja.jaxpr) > 0
