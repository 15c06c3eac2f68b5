"""Activations matching the torch versions used by the reference archs."""
import jax
import jax.numpy as jnp


def sigmoid(x):
    return jax.nn.sigmoid(x)


def swish(x):
    """x * sigmoid(x) — vqgan_arch.py:20-22 (torch.jit.script swish)."""
    return x * jax.nn.sigmoid(x)


def relu(x):
    return jnp.maximum(x, 0)


def leaky_relu(x, negative_slope: float = 0.01):
    return jnp.where(x >= 0, x, x * negative_slope)


def gelu(x, approximate=None):
    """torch F.gelu default is the exact erf form — used for f32 parity.

    approximate=None (default) is AUTO: bf16 inputs take the tanh form —
    numerically indistinguishable there (max |tanh - erf| ~ 1e-3 of the
    value vs bf16 resolution ~ 8e-3) while the erf transcendental dominates
    VPU time on large MLPs (measured ~3 ms of the 4.8 ms GMFlow-transformer
    MLP on v5e). Pass approximate=False explicitly to force erf for every
    dtype."""
    if approximate is None:
        approximate = x.dtype == jnp.bfloat16
    return jax.nn.gelu(x, approximate=approximate)


def scaled_leaky_relu(x, bias=None, negative_slope: float = 0.2, scale: float = 2 ** 0.5):
    """Reference fused_act op (ops/fused_act): bias-add + LeakyReLU * sqrt(2).

    Channels-last; bias broadcasts over the trailing dim. XLA fuses this chain
    into adjacent convs on TPU, so no hand-written kernel is needed for the
    forward; a Pallas version lives in ops/pallas for the fused backward.
    """
    if bias is not None:
        x = x + bias
    return leaky_relu(x, negative_slope) * scale
