"""Metric parity vs the reference implementations (the reference's own test
idea — numpy vs tensor twins agreement, SURVEY.md §4)."""
import numpy as np
import pytest
import jax.numpy as jnp

from tests import reference_oracle as oracle

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(not oracle.reference_available(),
                                reason="reference repo not mounted")

REF = "/root/reference/modules/deps/wm_basicsr"

from comfyui_keep_tpu import metrics as M
from comfyui_keep_tpu.utils import color as C
from comfyui_keep_tpu.utils.matlab import imresize


@pytest.fixture(scope="module")
def ref_mods():
    oracle._install_stubs()
    cu = oracle._module_from_file("wm_basicsr.utils.color_util", f"{REF}/utils/color_util.py")
    import sys
    sys.modules["wm_basicsr.utils"].color_util = cu
    # metric_util does `from wm_basicsr.utils import bgr2ycbcr`
    sys.modules["wm_basicsr.utils"].bgr2ycbcr = cu.bgr2ycbcr
    sys.modules["wm_basicsr.utils"].rgb2ycbcr = cu.rgb2ycbcr
    mf = oracle._module_from_file("wm_basicsr.utils.matlab_functions", f"{REF}/utils/matlab_functions.py")
    sys.modules["wm_basicsr.utils"].matlab_functions = mf
    import types
    mpkg = types.ModuleType("wm_basicsr.metrics")
    mpkg.__path__ = []
    sys.modules["wm_basicsr.metrics"] = mpkg
    mu = oracle._module_from_file("wm_basicsr.metrics.metric_util", f"{REF}/metrics/metric_util.py")
    mpkg.metric_util = mu
    ps = oracle._module_from_file("wm_basicsr.metrics.psnr_ssim", f"{REF}/metrics/psnr_ssim.py")
    nq = oracle._module_from_file("wm_basicsr.metrics.niqe", f"{REF}/metrics/niqe.py")
    return cu, mf, ps, nq


def _pair(rng, h=64, w=64):
    img = (rng.random((h, w, 3)) * 255).astype(np.float64)
    img2 = np.clip(img + rng.standard_normal((h, w, 3)) * 10, 0, 255)
    return img, img2


def test_color_parity(ref_mods, rng):
    cu = ref_mods[0]
    img = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
    np.testing.assert_allclose(C.rgb2ycbcr(img), cu.rgb2ycbcr(img), atol=1)
    np.testing.assert_allclose(C.bgr2ycbcr(img, y_only=True),
                               cu.bgr2ycbcr(img, y_only=True), atol=1)
    f = img.astype(np.float32) / 255.0
    np.testing.assert_allclose(C.rgb2ycbcr(f), cu.rgb2ycbcr(f), atol=1e-5)


def test_imresize_parity(ref_mods, rng):
    mf = ref_mods[1]
    img = rng.random((32, 40)).astype(np.float64)
    ref = mf.imresize(torch.tensor(img[:, :, None].transpose(2, 0, 1)), 0.5,
                      antialiasing=True) if hasattr(mf.imresize, "__wrapped__") else None
    # reference imresize operates on numpy (h, w, c) or tensor; use numpy path
    ref = mf.imresize(img[:, :, None], 0.5, antialiasing=True)
    ours = imresize(img[:, :, None], 0.5, antialiasing=True)
    ref = np.asarray(ref)
    if ref.shape != ours.shape and ref.shape[0] == ours.shape[2]:
        ref = ref.transpose(1, 2, 0)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


@pytest.mark.parametrize("crop,ychan", [(0, False), (4, False), (0, True)])
def test_psnr_parity(ref_mods, rng, crop, ychan):
    ps = ref_mods[2]
    img, img2 = _pair(rng)
    ref = ps.calculate_psnr(img, img2, crop_border=crop, test_y_channel=ychan)
    ours = M.calculate_psnr(img, img2, crop_border=crop, test_y_channel=ychan)
    np.testing.assert_allclose(ours, ref, rtol=1e-8)


@pytest.mark.parametrize("crop,ychan", [(0, False), (4, True)])
def test_ssim_parity(ref_mods, rng, crop, ychan):
    ps = ref_mods[2]
    img, img2 = _pair(rng)
    ref = ps.calculate_ssim(img, img2, crop_border=crop, test_y_channel=ychan)
    ours = M.calculate_ssim(img, img2, crop_border=crop, test_y_channel=ychan)
    np.testing.assert_allclose(ours, ref, rtol=1e-8)


def test_psnr_ssim_jax_twins_match_numpy(rng):
    """The reference's own cross-check design (test_psnr_ssim.py): numpy vs
    tensor implementations agree."""
    img, img2 = _pair(rng)
    pj = M.calculate_psnr_jax(jnp.asarray(img[None] / 255.0, jnp.float32),
                              jnp.asarray(img2[None] / 255.0, jnp.float32),
                              crop_border=0)
    pn = M.calculate_psnr(img, img2, crop_border=0)
    np.testing.assert_allclose(float(pj[0]), pn, rtol=1e-3)
    sj = M.calculate_ssim_jax(jnp.asarray(img[None] / 255.0, jnp.float32),
                              jnp.asarray(img2[None] / 255.0, jnp.float32),
                              crop_border=0)
    sn = M.calculate_ssim(img, img2, crop_border=0)
    np.testing.assert_allclose(float(sj[0]), sn, rtol=1e-3)


def test_niqe_parity(ref_mods, rng):
    nq = ref_mods[3]
    img = (rng.random((128, 128, 3)) * 255).astype(np.float32)
    # smooth it a bit so AGGD fits are stable
    import cv2
    img = cv2.GaussianBlur(img, (7, 7), 2)
    ref = nq.calculate_niqe(img, crop_border=0)
    ours = M.calculate_niqe(img, crop_border=0)
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_fid_known_value():
    mu = np.zeros(4)
    s = np.eye(4)
    assert M.calculate_fid(mu, s, mu, s) == pytest.approx(0.0, abs=1e-8)
    mu2 = np.ones(4)
    assert M.calculate_fid(mu, s, mu2, s) == pytest.approx(4.0, abs=1e-6)
