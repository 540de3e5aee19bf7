from synthesis_in_style_tpu.ops.upfirdn2d import (
    upfirdn2d,
    make_kernel,
    upsample_2d,
    downsample_2d,
    blur_2d,
)
from synthesis_in_style_tpu.ops.fused_act import fused_leaky_relu, scaled_leaky_relu

__all__ = [
    "upfirdn2d",
    "make_kernel",
    "upsample_2d",
    "downsample_2d",
    "blur_2d",
    "fused_leaky_relu",
    "scaled_leaky_relu",
]
