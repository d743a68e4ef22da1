from ddmi_tpu.ops.grid_sample import grid_sample_2d, grid_sample_nchw_like
from ddmi_tpu.ops.upfirdn import (
    blur,
    downsample_2d,
    make_fir_kernel,
    upfirdn2d,
    upsample_2d,
)
from ddmi_tpu.ops.fused import fused_leaky_relu, scaled_leaky_relu

__all__ = [
    "grid_sample_2d",
    "grid_sample_nchw_like",
    "upfirdn2d",
    "make_fir_kernel",
    "blur",
    "upsample_2d",
    "downsample_2d",
    "fused_leaky_relu",
    "scaled_leaky_relu",
]
