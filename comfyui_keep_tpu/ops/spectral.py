"""Spectral normalization (reference: archs/spectral_norm_arch.py and
Discriminator3D vqgan_arch.py:511-591).

Functional form: the power-iteration vector `u` lives in the param tree and is
threaded explicitly (no hidden buffers). Matches torch's convention of
flattening the weight to (out_dim, -1) with out_dim = axis 0 of the torch
weight; our conv weights are channels-last (..., I, O), so O is moved first.
"""
import jax.numpy as jnp


def _l2norm(v, eps=1e-12):
    return v / (jnp.linalg.norm(v) + eps)


def spectral_norm_weight(w, u, n_power_iterations: int = 1, eps: float = 1e-12):
    """Return (w / sigma, u_new). w: (..., O) channels-last; u: (O,).

    Power iteration runs on the detached weight (torch buffers u/v carry no
    gradient); sigma = u^T W v remains differentiable through W.
    """
    import jax
    wm = jnp.moveaxis(w, -1, 0).reshape(w.shape[-1], -1)  # (O, rest)
    wm_sg = jax.lax.stop_gradient(wm)
    v = None
    for _ in range(n_power_iterations):
        v = _l2norm(wm_sg.T @ u, eps)
        u = _l2norm(wm_sg @ v, eps)
    u = jax.lax.stop_gradient(u)
    v = jax.lax.stop_gradient(v)
    sigma = u @ (wm @ v)
    return w / sigma, u
