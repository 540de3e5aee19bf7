from synthesis_in_style_tpu.ops.upfirdn2d import (
    upfirdn2d,
    make_kernel,
    upsample_2d,
    downsample_2d,
    blur_2d,
)
from synthesis_in_style_tpu.ops.fused_act import fused_leaky_relu, scaled_leaky_relu
from synthesis_in_style_tpu.ops.quant import (
    conv2d_w8a8,
    int8_conv,
    quantize_per_out_channel,
    quantize_per_sample,
)

__all__ = [
    "upfirdn2d",
    "make_kernel",
    "upsample_2d",
    "downsample_2d",
    "blur_2d",
    "fused_leaky_relu",
    "scaled_leaky_relu",
    "conv2d_w8a8",
    "int8_conv",
    "quantize_per_out_channel",
    "quantize_per_sample",
]
