"""FIR upsample/filter/downsample (StyleGAN2 `upfirdn2d`).

TPU-native replacement for the reference's hand-written CUDA kernel
(models/d2c_vae/op/upfirdn2d_kernel.cu, driver op/upfirdn2d.py:18-149 with a
custom double-backward).  Here the whole op is one
`lax.conv_general_dilated` call — zero-insertion upsampling maps to
`lhs_dilation`, the FIR filter is a depthwise conv, and downsampling maps to
`window_strides`; XLA fuses it and autodiff provides gradients.

Semantics match op/upfirdn2d.py::upfirdn2d_native: zero-stuff by `up`,
pad by (pad0, pad1) on both spatial dims, convolve (kernel flipped, i.e. true
convolution), stride by `down`.
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax.numpy as jnp
from jax import lax


def make_fir_kernel(k: Sequence[float]) -> jnp.ndarray:
    """1D tap list -> normalized 2D separable kernel (blocks.py:33-41)."""
    k = jnp.asarray(k, dtype=jnp.float32)
    if k.ndim == 1:
        k = k[None, :] * k[:, None]
    return k / jnp.sum(k)


def upfirdn2d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    up: int = 1,
    down: int = 1,
    pad: Tuple[int, int] = (0, 0),
) -> jnp.ndarray:
    """Apply upfirdn to NHWC input, per-channel (depthwise).

    Args:
      x: (B, H, W, C).
      kernel: (kh, kw) FIR filter.
      up/down: integer resampling factors.
      pad: (pad0, pad1) applied to both H and W (may be negative).

    Returns:
      (B, Ho, Wo, C) with Ho = (H*up + pad0 + pad1 - kh)//down + 1.
    """
    B, H, W, C = x.shape
    kh, kw = kernel.shape
    pad0, pad1 = pad

    # Depthwise: fold channels into batch so one 1-channel conv serves all.
    xx = jnp.transpose(x, (0, 3, 1, 2)).reshape(B * C, H, W, 1)
    # True convolution = correlation with the flipped kernel.
    w = jnp.flip(kernel, (0, 1)).astype(x.dtype).reshape(kh, kw, 1, 1)

    # lhs_dilation yields (H-1)*up+1 samples; torch's zero-stuffing yields
    # H*up (with up-1 trailing zeros).  Add those zeros via extra hi-padding —
    # they contribute nothing to the conv, so results are identical.
    out = lax.conv_general_dilated(
        xx,
        w,
        window_strides=(down, down),
        padding=((pad0, pad1 + up - 1), (pad0, pad1 + up - 1)),
        lhs_dilation=(up, up),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    Ho, Wo = out.shape[1], out.shape[2]
    return jnp.transpose(out.reshape(B, C, Ho, Wo), (0, 2, 3, 1))


def blur(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    pad: Tuple[int, int],
    upsample_factor: int = 1,
) -> jnp.ndarray:
    """FIR blur (blocks.py:84-99)."""
    k = kernel * (upsample_factor**2) if upsample_factor > 1 else kernel
    return upfirdn2d(x, k, up=1, down=1, pad=pad)


def upsample_2d(
    x: jnp.ndarray, kernel: jnp.ndarray, factor: int = 2
) -> jnp.ndarray:
    """FIR 2x upsample (blocks.py:44-61): kernel pre-scaled by factor^2."""
    k = kernel * (factor**2)
    p = kernel.shape[0] - factor
    pad0 = (p + 1) // 2 + factor - 1
    pad1 = p // 2
    return upfirdn2d(x, k, up=factor, down=1, pad=(pad0, pad1))


def downsample_2d(
    x: jnp.ndarray, kernel: jnp.ndarray, factor: int = 2
) -> jnp.ndarray:
    """FIR 2x downsample (blocks.py:64-81)."""
    p = kernel.shape[0] - factor
    pad0 = (p + 1) // 2
    pad1 = p // 2
    return upfirdn2d(x, kernel, up=1, down=factor, pad=(pad0, pad1))
