"""Golden parity for data/gaussian_kernels vs the reference's standalone
kernel zoo (wm_basicsr/data/gaussian_kernels.py — dead code in the
reference's own import graph, but part of the shipped framework surface).

Deterministic kernels must match to float precision; the random samplers
reproduce the reference's np.random/random draw order, so seeded runs are
compared bit-for-bit.
"""
import importlib.util
import math
import random
import sys

import numpy as np
import pytest

from comfyui_keep_tpu.data import gaussian_kernels as gk

REF_PATH = ("/root/reference/modules/deps/wm_basicsr/data/"
            "gaussian_kernels.py")


@pytest.fixture(scope="module")
def ref():
    name = "ref_gaussian_kernels"
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, REF_PATH)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


D_SKEW = [[0.4, -0.2], [0.1, 0.3]]


@pytest.mark.parametrize("fn,args", [
    ("bivariate_anisotropic_Gaussian", (21, 2.0, 4.0, -math.pi / 4)),
    ("bivariate_isotropic_Gaussian", (13, 1.7)),
    ("bivariate_generalized_Gaussian", (21, 2.0, 3.0, 0.7, 2.5)),
    ("bivariate_plateau_type1", (21, 2.0, 3.0, 0.7, 1.5)),
    ("bivariate_plateau_type1_iso", (15, 2.2, 2.0)),
    ("bivariate_skew_Gaussian", (21, 2.0, 4.0, 0.3, D_SKEW)),
    ("bivariate_skew_Gaussian_center", (21, 2.0, 4.0, 0.3, D_SKEW)),
])
def test_deterministic_kernels_match(ref, fn, args):
    ours = getattr(gk, fn)(*args)
    gold = getattr(ref, fn)(*args)
    assert ours.shape == gold.shape
    np.testing.assert_allclose(ours, gold, atol=1e-12)
    np.testing.assert_allclose(ours.sum(), 1.0, atol=1e-12)


def test_mass_center_shift_matches(ref):
    kernel = gk.bivariate_skew_Gaussian(21, 2.0, 4.0, 0.3, D_SKEW)
    np.testing.assert_allclose(gk.mass_center_shift(21, kernel),
                               ref.mass_center_shift(21, kernel), atol=1e-12)


@pytest.mark.parametrize("fn,args,kwargs", [
    ("random_bivariate_anisotropic_Gaussian",
     (21, (0.6, 5), (0.6, 5), (-math.pi, math.pi)), {}),
    ("random_bivariate_anisotropic_Gaussian",
     (21, (0.6, 5), (0.6, 5), (-math.pi, math.pi)),
     {"noise_range": (0.75, 1.25), "strict": True}),
    ("random_bivariate_isotropic_Gaussian", (21, (0.6, 5)), {}),
    ("random_bivariate_isotropic_Gaussian", (21, (0.6, 5)),
     {"strict": True}),
    ("random_bivariate_generalized_Gaussian",
     (21, (0.6, 5), (0.6, 5), (-math.pi, math.pi), (0.5, 8)),
     {"strict": True}),
    ("random_bivariate_plateau_type1",
     (21, (0.6, 5), (0.6, 5), (-math.pi / 2, math.pi / 2), (1, 4)),
     {"strict": True}),
    ("random_bivariate_plateau_type1_iso", (21, (0.6, 5), (1, 4)),
     {"strict": True}),
    ("random_bivariate_skew_Gaussian_center",
     (21, (0.6, 5), (0.6, 5), (-math.pi, math.pi)), {}),
])
def test_random_samplers_seeded_parity(ref, fn, args, kwargs):
    np.random.seed(7)
    gold = getattr(ref, fn)(*args, **kwargs)
    np.random.seed(7)
    ours = getattr(gk, fn)(*args, **kwargs)
    gold_k = gold[0] if isinstance(gold, tuple) else gold
    ours_k = ours[0] if isinstance(ours, tuple) else ours
    np.testing.assert_allclose(ours_k, gold_k, atol=1e-12)
    if isinstance(gold, tuple):  # strict mode returns the drawn params too
        for a, b in zip(ours[1:], gold[1:]):
            np.testing.assert_allclose(np.asarray(a, dtype=np.float64),
                                       np.asarray(b, dtype=np.float64))


@pytest.mark.parametrize("ktype", ["iso", "aniso", "skew", "generalized",
                                   "plateau_iso", "plateau_aniso"])
def test_random_mixed_kernels_seeded_parity(ref, ktype):
    for seed in (0, 3):
        random.seed(seed)
        np.random.seed(seed)
        gold = ref.random_mixed_kernels([ktype], [1.0], 21,
                                        noise_range=(0.8, 1.2))
        random.seed(seed)
        np.random.seed(seed)
        ours = gk.random_mixed_kernels([ktype], [1.0], 21,
                                       noise_range=(0.8, 1.2))
        np.testing.assert_allclose(ours, gold, atol=1e-12)


def test_random_mixed_kernels_unknown_type_raises():
    with pytest.raises(ValueError):
        gk.random_mixed_kernels(["nope"], [1.0], 21)
