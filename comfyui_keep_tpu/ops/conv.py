"""Convolution / linear primitives (NHWC / HWIO).

Torch-conv semantics (symmetric integer padding, stride, dilation, groups) are
reproduced on top of lax.conv_general_dilated so converted reference
checkpoints (e.g. KEEP-b76feb75.pth, reference vqgan_arch.py / keep_arch.py)
are numerically faithful, while the layout stays TPU-native channels-last.
"""
import math
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp

Padding = Union[int, str, Sequence[tuple]]


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


def conv2d(x, w, b=None, stride: Union[int, tuple] = 1, padding: Padding = 0,
           dilation: Union[int, tuple] = 1, groups: int = 1):
    """2D convolution. x: (..., H, W, Cin), w: (kh, kw, Cin//groups, Cout)."""
    batch_shape = x.shape[:-3]
    x = x.reshape((-1,) + x.shape[-3:])
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    elif isinstance(padding, str):
        pass
    else:
        padding = [tuple(p) for p in padding]
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=_pair(stride),
        padding=padding,
        rhs_dilation=_pair(dilation),
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if b is not None:
        out = out + b
    return out.reshape(batch_shape + out.shape[1:])


def conv3d(x, w, b=None, stride: Union[int, tuple] = 1, padding: Padding = 0,
           dilation: Union[int, tuple] = 1):
    """3D convolution. x: (N, D, H, W, Cin), w: (kd, kh, kw, Cin, Cout)."""
    def _triple(v):
        return (v, v, v) if isinstance(v, int) else tuple(v)
    if isinstance(padding, int):
        padding = [(padding, padding)] * 3
    elif not isinstance(padding, str):
        padding = [tuple(p) for p in padding]
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=_triple(stride),
        padding=padding,
        rhs_dilation=_triple(dilation),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    if b is not None:
        out = out + b
    return out


def linear(x, w, b=None):
    """x: (..., in), w: (in, out)."""
    out = jnp.matmul(x, w)
    if b is not None:
        out = out + b
    return out


# ---------------------------------------------------------------------------
# Initializers (torch Conv2d/Linear defaults: kaiming_uniform(a=sqrt(5)),
# bias uniform(+-1/sqrt(fan_in))) so random-init behaves like the reference.
# ---------------------------------------------------------------------------

def _kaiming_uniform(key, shape, fan_in, a=math.sqrt(5), dtype=jnp.float32):
    gain = math.sqrt(2.0 / (1 + a * a))
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound, dtype=dtype)


def conv2d_init(key, kh, kw, cin, cout, bias=True, groups=1, dtype=jnp.float32):
    wkey, bkey = jax.random.split(key)
    fan_in = kh * kw * (cin // groups)
    p = {"w": _kaiming_uniform(wkey, (kh, kw, cin // groups, cout), fan_in, dtype=dtype)}
    if bias:
        bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
        p["b"] = jax.random.uniform(bkey, (cout,), minval=-bound, maxval=bound, dtype=dtype)
    return p


def conv3d_init(key, kd, kh, kw, cin, cout, bias=True, dtype=jnp.float32):
    wkey, bkey = jax.random.split(key)
    fan_in = kd * kh * kw * cin
    p = {"w": _kaiming_uniform(wkey, (kd, kh, kw, cin, cout), fan_in, dtype=dtype)}
    if bias:
        bound = 1.0 / math.sqrt(fan_in)
        p["b"] = jax.random.uniform(bkey, (cout,), minval=-bound, maxval=bound, dtype=dtype)
    return p


def linear_init(key, din, dout, bias=True, dtype=jnp.float32):
    wkey, bkey = jax.random.split(key)
    p = {"w": _kaiming_uniform(wkey, (din, dout), din, dtype=dtype)}
    if bias:
        bound = 1.0 / math.sqrt(din)
        p["b"] = jax.random.uniform(bkey, (dout,), minval=-bound, maxval=bound, dtype=dtype)
    return p
