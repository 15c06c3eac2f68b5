"""Extended blur-kernel zoo (reference wm_basicsr/data/gaussian_kernels.py,
657 LoC): skewed bivariate Gaussians (Shi et al. 2004), anisotropic /
isotropic Gaussians, generalized Gaussians and plateau-type1 kernels, plus
the `strict`-mode random samplers and this module's own `random_mixed_kernels`
dispatch (kernel type names 'iso'/'aniso'/'skew'/'generalized'/
'plateau_iso'/'plateau_aniso' — a different name set from
degradations.random_mixed_kernels).

Host-side numpy: kernels are generated on CPU data workers. The sampling
draw order matches the reference exactly (np.random globals + random.choices
for the type pick) so seeded runs reproduce its kernels bit-for-bit.
"""
import math
import random

import numpy as np
from scipy.ndimage import shift as _ndimage_shift
from scipy.stats import multivariate_normal

from .degradations import mesh_grid, pdf2, sigma_matrix2

__all__ = [
    "cdf2", "mass_center_shift",
    "bivariate_skew_Gaussian", "bivariate_skew_Gaussian_center",
    "bivariate_anisotropic_Gaussian", "bivariate_isotropic_Gaussian",
    "bivariate_generalized_Gaussian",
    "bivariate_plateau_type1", "bivariate_plateau_type1_iso",
    "random_bivariate_skew_Gaussian_center",
    "random_bivariate_anisotropic_Gaussian",
    "random_bivariate_isotropic_Gaussian",
    "random_bivariate_generalized_Gaussian",
    "random_bivariate_plateau_type1",
    "random_bivariate_plateau_type1_iso",
    "random_mixed_kernels",
]

_STD_BIVARIATE_NORMAL = multivariate_normal([0.0, 0.0], [[1.0, 0.0],
                                                          [0.0, 1.0]])


def cdf2(skew_matrix, grid):
    """Standard bivariate normal CDF evaluated on the skewed grid
    (grid @ D) — the skew factor of the Shi et al. skew-normal density."""
    return _STD_BIVARIATE_NORMAL.cdf(np.dot(grid, skew_matrix))


def bivariate_skew_Gaussian(kernel_size, sig_x, sig_y, theta, skew_matrix,
                            grid=None):
    """Normalized skew-normal kernel: pdf(Sigma) * cdf(grid @ D)."""
    if grid is None:
        grid, _, _ = mesh_grid(kernel_size)
    kernel = pdf2(sigma_matrix2(sig_x, sig_y, theta), grid) \
        * cdf2(skew_matrix, grid)
    return kernel / np.sum(kernel)


def mass_center_shift(kernel_size, kernel):
    """(delta_h, delta_w) of the kernel's center of mass from the grid
    center."""
    ax = np.arange(-kernel_size // 2 + 1.0, kernel_size // 2 + 1.0)
    return np.sum(kernel, axis=1) @ ax, np.sum(kernel, axis=0) @ ax


def bivariate_skew_Gaussian_center(kernel_size, sig_x, sig_y, theta,
                                   skew_matrix, grid=None):
    """Skew kernel re-centered on its center of mass (cubic-spline shift
    with nearest padding, matching scipy defaults the reference relies on)."""
    kernel = bivariate_skew_Gaussian(kernel_size, sig_x, sig_y, theta,
                                     skew_matrix, grid)
    delta_h, delta_w = mass_center_shift(kernel_size, kernel)
    kernel = _ndimage_shift(kernel, [-delta_h, -delta_w], mode="nearest")
    return kernel / np.sum(kernel)


def bivariate_anisotropic_Gaussian(kernel_size, sig_x, sig_y, theta,
                                   grid=None):
    if grid is None:
        grid, _, _ = mesh_grid(kernel_size)
    kernel = pdf2(sigma_matrix2(sig_x, sig_y, theta), grid)
    return kernel / np.sum(kernel)


def bivariate_isotropic_Gaussian(kernel_size, sig, grid=None):
    if grid is None:
        grid, _, _ = mesh_grid(kernel_size)
    kernel = pdf2(np.array([[sig ** 2, 0.0], [0.0, sig ** 2]]), grid)
    return kernel / np.sum(kernel)


def bivariate_generalized_Gaussian(kernel_size, sig_x, sig_y, theta, beta,
                                   grid=None):
    if grid is None:
        grid, _, _ = mesh_grid(kernel_size)
    inverse_sigma = np.linalg.inv(sigma_matrix2(sig_x, sig_y, theta))
    kernel = np.exp(-0.5 * np.power(
        np.sum(np.dot(grid, inverse_sigma) * grid, 2), beta))
    return kernel / np.sum(kernel)


def bivariate_plateau_type1(kernel_size, sig_x, sig_y, theta, beta,
                            grid=None):
    """Plateau kernel 1 / (1 + (x^T Sigma^-1 x)^beta)."""
    if grid is None:
        grid, _, _ = mesh_grid(kernel_size)
    inverse_sigma = np.linalg.inv(sigma_matrix2(sig_x, sig_y, theta))
    kernel = np.reciprocal(np.power(
        np.sum(np.dot(grid, inverse_sigma) * grid, 2), beta) + 1)
    return kernel / np.sum(kernel)


def bivariate_plateau_type1_iso(kernel_size, sig, beta, grid=None):
    if grid is None:
        grid, _, _ = mesh_grid(kernel_size)
    inverse_sigma = np.linalg.inv(np.array([[sig ** 2, 0.0],
                                            [0.0, sig ** 2]]))
    kernel = np.reciprocal(np.power(
        np.sum(np.dot(grid, inverse_sigma) * grid, 2), beta) + 1)
    return kernel / np.sum(kernel)


def _check_ranges(kernel_size, *ranges):
    assert kernel_size % 2 == 1, "Kernel size must be an odd number."
    for r in ranges:
        assert r[0] < r[1], f"invalid range {r}"


def _sample_sigmas(sigma_x_range, sigma_y_range, strict):
    sigma_x = np.random.uniform(*sigma_x_range)
    sigma_y = np.random.uniform(*sigma_y_range)
    if strict:
        # strict mode orders the pair so sigma_x is the major axis
        sigma_x, sigma_y = max(sigma_x, sigma_y), min(sigma_x, sigma_y)
    return sigma_x, sigma_y


def _apply_kernel_noise(kernel, noise_range):
    if noise_range is not None:
        assert noise_range[0] < noise_range[1], "Wrong noise range."
        kernel = kernel * np.random.uniform(*noise_range, size=kernel.shape)
    return kernel / np.sum(kernel)


def _sample_beta_bimodal(beta_range):
    # below/above-1 branches drawn with equal probability so beta=1
    # (plain Gaussian) sits at the mode boundary
    if np.random.uniform() < 0.5:
        return np.random.uniform(beta_range[0], 1)
    return np.random.uniform(1, beta_range[1])


def random_bivariate_skew_Gaussian_center(kernel_size, sigma_x_range,
                                          sigma_y_range, rotation_range,
                                          noise_range=None, strict=False):
    _check_ranges(kernel_size, sigma_x_range, sigma_y_range, rotation_range)
    sigma_x, sigma_y = _sample_sigmas(sigma_x_range, sigma_y_range, strict)
    rotation = np.random.uniform(*rotation_range)
    # skew magnitude bounded by 3/sigma_max so the re-centering shift
    # stays inside the kernel support
    thres = 3 / max(sigma_x, sigma_y)
    skew = [[np.random.uniform(-thres, thres),
             np.random.uniform(-thres, thres)],
            [np.random.uniform(-thres, thres),
             np.random.uniform(-thres, thres)]]
    kernel = bivariate_skew_Gaussian_center(kernel_size, sigma_x, sigma_y,
                                            rotation, skew)
    kernel = _apply_kernel_noise(kernel, noise_range)
    if strict:
        return kernel, sigma_x, sigma_y, rotation, skew
    return kernel


def random_bivariate_anisotropic_Gaussian(kernel_size, sigma_x_range,
                                          sigma_y_range, rotation_range,
                                          noise_range=None, strict=False):
    _check_ranges(kernel_size, sigma_x_range, sigma_y_range, rotation_range)
    sigma_x, sigma_y = _sample_sigmas(sigma_x_range, sigma_y_range, strict)
    rotation = np.random.uniform(*rotation_range)
    kernel = bivariate_anisotropic_Gaussian(kernel_size, sigma_x, sigma_y,
                                            rotation)
    kernel = _apply_kernel_noise(kernel, noise_range)
    if strict:
        return kernel, sigma_x, sigma_y, rotation
    return kernel


def random_bivariate_isotropic_Gaussian(kernel_size, sigma_range,
                                        noise_range=None, strict=False):
    _check_ranges(kernel_size, sigma_range)
    sigma = np.random.uniform(*sigma_range)
    kernel = bivariate_isotropic_Gaussian(kernel_size, sigma)
    kernel = _apply_kernel_noise(kernel, noise_range)
    if strict:
        return kernel, sigma
    return kernel


def random_bivariate_generalized_Gaussian(kernel_size, sigma_x_range,
                                          sigma_y_range, rotation_range,
                                          beta_range, noise_range=None,
                                          strict=False):
    _check_ranges(kernel_size, sigma_x_range, sigma_y_range, rotation_range)
    sigma_x, sigma_y = _sample_sigmas(sigma_x_range, sigma_y_range, strict)
    rotation = np.random.uniform(*rotation_range)
    beta = _sample_beta_bimodal(beta_range)
    kernel = bivariate_generalized_Gaussian(kernel_size, sigma_x, sigma_y,
                                            rotation, beta)
    kernel = _apply_kernel_noise(kernel, noise_range)
    if strict:
        return kernel, sigma_x, sigma_y, rotation, beta
    return kernel


def random_bivariate_plateau_type1(kernel_size, sigma_x_range, sigma_y_range,
                                   rotation_range, beta_range,
                                   noise_range=None, strict=False):
    _check_ranges(kernel_size, sigma_x_range, sigma_y_range, rotation_range)
    sigma_x, sigma_y = _sample_sigmas(sigma_x_range, sigma_y_range, strict)
    rotation = np.random.uniform(*rotation_range)
    beta = _sample_beta_bimodal(beta_range)
    kernel = bivariate_plateau_type1(kernel_size, sigma_x, sigma_y, rotation,
                                     beta)
    kernel = _apply_kernel_noise(kernel, noise_range)
    if strict:
        return kernel, sigma_x, sigma_y, rotation, beta
    return kernel


def random_bivariate_plateau_type1_iso(kernel_size, sigma_range, beta_range,
                                       noise_range=None, strict=False):
    _check_ranges(kernel_size, sigma_range)
    sigma = np.random.uniform(*sigma_range)
    beta = np.random.uniform(*beta_range)
    kernel = bivariate_plateau_type1_iso(kernel_size, sigma, beta)
    kernel = _apply_kernel_noise(kernel, noise_range)
    if strict:
        return kernel, sigma, beta
    return kernel


def random_mixed_kernels(kernel_list, kernel_prob, kernel_size=21,
                         sigma_x_range=(0.6, 5), sigma_y_range=(0.6, 5),
                         rotation_range=(-math.pi, math.pi),
                         beta_range=(0.5, 8), noise_range=None):
    """Sample one kernel type from kernel_list with kernel_prob weights.

    Types: 'iso', 'aniso', 'skew', 'generalized', 'plateau_iso',
    'plateau_aniso'. Note the reference applies multiplicative noise twice
    when noise_range is set (inside the per-type sampler AND here) — kept
    for draw-order parity.
    """
    kernel_type = random.choices(kernel_list, kernel_prob)[0]
    if kernel_type == "iso":
        kernel = random_bivariate_isotropic_Gaussian(
            kernel_size, sigma_x_range, noise_range=noise_range)
    elif kernel_type == "aniso":
        kernel = random_bivariate_anisotropic_Gaussian(
            kernel_size, sigma_x_range, sigma_y_range, rotation_range,
            noise_range=noise_range)
    elif kernel_type == "skew":
        kernel = random_bivariate_skew_Gaussian_center(
            kernel_size, sigma_x_range, sigma_y_range, rotation_range,
            noise_range=noise_range)
    elif kernel_type == "generalized":
        kernel = random_bivariate_generalized_Gaussian(
            kernel_size, sigma_x_range, sigma_y_range, rotation_range,
            beta_range, noise_range=noise_range)
    elif kernel_type == "plateau_iso":
        kernel = random_bivariate_plateau_type1_iso(
            kernel_size, sigma_x_range, beta_range, noise_range=noise_range)
    elif kernel_type == "plateau_aniso":
        kernel = random_bivariate_plateau_type1(
            kernel_size, sigma_x_range, sigma_y_range, rotation_range,
            beta_range, noise_range=noise_range)
    else:
        raise ValueError(f"unknown kernel type {kernel_type!r}")
    kernel = _apply_kernel_noise(kernel, noise_range)
    return kernel
