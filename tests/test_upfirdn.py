"""Tests for upfirdn2d against a direct numpy spec implementation
(zero-stuff -> pad -> convolve(flipped kernel) -> stride), i.e. the documented
semantics of models/d2c_vae/op/upfirdn2d.py::upfirdn2d_native."""

import numpy as np
import pytest

import jax.numpy as jnp

from ddmi_tpu.ops.upfirdn import (
    downsample_2d,
    make_fir_kernel,
    upfirdn2d,
    upsample_2d,
)


def upfirdn2d_np(x, kernel, up, down, pad):
    """Spec implementation in numpy: x (B,H,W,C)."""
    B, H, W, C = x.shape
    kh, kw = kernel.shape
    pad0, pad1 = pad
    # zero-stuff
    up_x = np.zeros((B, H * up, W * up, C), dtype=x.dtype)
    up_x[:, ::up, ::up, :] = x
    # pad (allow negative = crop)
    ph0, ph1 = max(pad0, 0), max(pad1, 0)
    up_x = np.pad(up_x, ((0, 0), (ph0, ph1), (ph0, ph1), (0, 0)))
    if pad0 < 0:
        up_x = up_x[:, -pad0:, -pad0:, :]
    if pad1 < 0:
        up_x = up_x[:, : up_x.shape[1] + pad1, : up_x.shape[2] + pad1, :]
    # convolve with flipped kernel (true convolution), then stride
    kf = kernel[::-1, ::-1]
    Hp, Wp = up_x.shape[1], up_x.shape[2]
    Ho = (Hp - kh) // down + 1
    Wo = (Wp - kw) // down + 1
    out = np.zeros((B, Ho, Wo, C), dtype=np.float64)
    for i in range(kh):
        for j in range(kw):
            out += (
                kf[i, j]
                * up_x[:, i : i + (Ho - 1) * down + 1 : down,
                       j : j + (Wo - 1) * down + 1 : down, :]
            )
    return out.astype(np.float32)


@pytest.mark.parametrize(
    "up,down,pad",
    [
        (1, 1, (1, 1)),
        (2, 1, (2, 1)),  # StyleGAN 2x upsample pads for k=4
        (1, 2, (1, 1)),  # 2x downsample
        (2, 2, (1, 2)),
        (1, 1, (0, 0)),
    ],
)
def test_upfirdn2d_matches_spec(up, down, pad, np_rng):
    x = np_rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    k = np.asarray(make_fir_kernel([1, 3, 3, 1]))
    ref = upfirdn2d_np(x, np.asarray(k), up, down, pad)
    got = upfirdn2d(jnp.asarray(x), jnp.asarray(k), up, down, pad)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5, rtol=1e-4)


def test_upsample_shape_and_dc_gain(np_rng):
    """2x FIR upsample doubles resolution and preserves the mean level
    (kernel scaled by factor^2, blocks.py:49)."""
    x = np.full((1, 8, 8, 1), 3.0, dtype=np.float32)
    k = make_fir_kernel([1, 3, 3, 1])
    y = upsample_2d(jnp.asarray(x), k, 2)
    assert y.shape == (1, 16, 16, 1)
    # interior pixels should preserve the constant value
    np.testing.assert_allclose(np.asarray(y)[:, 4:-4, 4:-4], 3.0, rtol=1e-5)


def test_downsample_shape(np_rng):
    x = np_rng.standard_normal((1, 16, 16, 2)).astype(np.float32)
    k = make_fir_kernel([1, 3, 3, 1])
    y = downsample_2d(jnp.asarray(x), k, 2)
    assert y.shape == (1, 8, 8, 2)


def test_upsample_then_downsample_recovers_constant():
    x = np.full((1, 8, 8, 1), 1.0, dtype=np.float32)
    k = make_fir_kernel([1, 3, 3, 1])
    y = downsample_2d(upsample_2d(jnp.asarray(x), k, 2), k, 2)
    np.testing.assert_allclose(np.asarray(y)[:, 2:-2, 2:-2], 1.0, rtol=1e-4)
