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
