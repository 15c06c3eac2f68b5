"""NHWC tensor-op substrate for the framework.

All spatial ops take channels-last arrays (TPU-friendly layout; XLA tiles the
trailing dim onto the 128-lane registers and the MXU). Parameters are plain
pytrees (nested dicts of jnp arrays); every layer is a pure function
`apply(params, x, ...)` with a matching `init(key, ...)`.
"""
from comfyui_keep_tpu.ops.conv import conv2d, conv3d, linear, conv2d_init, linear_init, conv3d_init
from comfyui_keep_tpu.ops.norm import (
    group_norm, layer_norm, instance_norm, batch_norm,
    group_norm_init, layer_norm_init, batch_norm_init,
)
from comfyui_keep_tpu.ops.act import swish, leaky_relu, gelu, relu, sigmoid
from comfyui_keep_tpu.ops.resample import (
    upsample_nearest_2x, resize_bilinear, avg_pool_2x, max_pool,
)
from comfyui_keep_tpu.ops.warp import grid_sample, flow_warp, flow_warp_xy
from comfyui_keep_tpu.ops.attention import multi_head_attention, scaled_dot_product_attention
