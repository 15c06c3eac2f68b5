"""C++ host runtime: builds with g++, matches the numpy reference paths."""
import numpy as np
import pytest

from comfyui_keep_tpu import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("g++ unavailable")
    return lib


def test_bgr_to_pm1_matches_numpy(lib, rng):
    img = (rng.random((64, 48, 3)) * 255).astype(np.uint8)
    got = native.bgr_u8_to_rgb_pm1_native(img)
    ref = (img.astype(np.float32)[..., ::-1] / 255.0 - 0.5) / 0.5
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_pm1_to_bgr_matches_numpy(lib, rng):
    x = (rng.random((32, 32, 3)).astype(np.float32) * 2.4 - 1.2)
    got = native.rgb_pm1_to_bgr_u8_native(x)
    ref = ((np.clip(x, -1, 1) + 1) / 2)[..., ::-1]
    ref = (ref * 255.0).round().astype(np.uint8)
    # lround vs banker's rounding can differ by 1 on exact .5 values
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1
    assert (got != ref).mean() < 0.01


def test_blend_tile(lib, rng):
    out = np.zeros((16, 16, 3), np.float32)
    div = np.zeros((16, 16), np.float32)
    tile = rng.random((8, 8, 3)).astype(np.float32)
    mask = rng.random((8, 8)).astype(np.float32)
    ok = native.blend_tile_native(out, div, tile, mask, 4, 2)
    assert ok
    np.testing.assert_allclose(out[4:12, 2:10], tile * mask[..., None],
                               atol=1e-6)
    np.testing.assert_allclose(div[4:12, 2:10], mask, atol=1e-6)
    assert out[:4].sum() == 0


def test_image_utils_use_native(rng):
    from comfyui_keep_tpu.utils.image import bgr_u8_to_rgb_pm1, rgb_pm1_to_bgr_u8
    img = (rng.random((20, 20, 3)) * 255).astype(np.uint8)
    x = bgr_u8_to_rgb_pm1(img)
    back = rgb_pm1_to_bgr_u8(x)
    np.testing.assert_array_equal(back, img)


class TestNativeWarpAffine:
    def test_matches_cv2(self, rng):
        cv2 = pytest.importorskip("cv2")
        from comfyui_keep_tpu.native import warp_affine_native
        if warp_affine_native(np.zeros((4, 4), np.float32),
                              np.eye(2, 3), (4, 4)) is None:
            pytest.skip("native lib unavailable")
        img = (rng.random((64, 80, 3)) * 255).astype(np.uint8)
        m = np.array([[0.9, 0.1, 3.0], [-0.08, 1.05, -2.0]])
        ref = cv2.warpAffine(img, m, (72, 60), borderValue=(135, 133, 132))
        out = warp_affine_native(img, m, (72, 60),
                                 border_value=(135, 133, 132))
        # cv2 uses 5-bit fixed-point interpolation; float path is exacter
        assert np.abs(ref.astype(int) - out.astype(int)).max() <= 1
        # float single-channel
        f = rng.random((32, 32), dtype=np.float32)
        np.testing.assert_allclose(
            warp_affine_native(f, m, (32, 32)),
            cv2.warpAffine(f, m, (32, 32)), atol=1e-4)

    def test_helper_warp_without_cv2(self, rng, monkeypatch):
        from comfyui_keep_tpu.facelib import helper
        if helper._warp_affine(np.zeros((4, 4), np.float32),
                               np.eye(2, 3), (4, 4)) is None:
            pytest.skip("native lib unavailable")
        monkeypatch.setattr(helper, "_HAVE_CV2", False)
        img = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
        m = np.array([[1.1, 0.0, -2.0], [0.0, 0.9, 1.0]])
        out = helper._warp_affine(img, m, (32, 32),
                                  border_value=(135, 133, 132))
        assert out.shape == (32, 32, 3) and out.dtype == np.uint8
