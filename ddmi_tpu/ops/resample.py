"""Regular-grid bilinear sampling as separable interpolation matmuls.

TPU-first reformulation of the INR decode hot path: when the sample
coordinates form a regular grid (ALL reference generation / reconstruction /
training call sites do — pixel-center grids or contiguous crops of them,
tools/ldm/image.py:228-235, general_utils.py:151-201), bilinear grid_sample
factorizes into two dense interpolation matrices applied along H and W:

    out[b, y, x, c] = sum_ij  Ry[y, i] * plane[b, i, j, c] * Rx[x, j]

Each matrix has two nonzeros per row, but at plane sizes (<=256) dense MXU
matmuls are far cheaper than XLA dynamic gathers — this removes every gather
from the sampling path.  Numerics are identical to grid_sample_2d (same
unnormalize + border clamp), verified in tests/test_resample.py.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def interp_matrix_1d(
    coords: jnp.ndarray, size: int, align_corners: bool = False,
    padding_mode: str = "border",
) -> jnp.ndarray:
    """(n, size) bilinear interpolation matrix for 1D coords in [-1, 1].

    Coordinate math always runs in fp32 — `(coords + 1) * size` at bf16 has a
    1.0 ULP near size=256, which rounds pixel indices to the wrong cell (and
    eager-vs-jit diverge under --xla_allow_excess_precision).  The returned
    matrix is cast back to the caller's dtype for the MXU matmuls."""
    out_dtype = coords.dtype
    coords = coords.astype(jnp.float32)
    if align_corners:
        px = (coords + 1.0) * 0.5 * (size - 1)
    else:
        px = ((coords + 1.0) * size - 1.0) * 0.5
    if padding_mode == "border":
        px = jnp.clip(px, 0.0, size - 1)
    elif padding_mode != "zeros":
        raise NotImplementedError(padding_mode)

    x0f = jnp.floor(px)
    w1 = px - x0f
    x0 = x0f.astype(jnp.int32)
    x1 = x0 + 1
    x0c = jnp.clip(x0, 0, size - 1)
    x1c = jnp.clip(x1, 0, size - 1)

    n = coords.shape[0]
    eye = jnp.eye(size, dtype=coords.dtype)
    m = eye[x0c] * (1.0 - w1)[:, None] + eye[x1c] * w1[:, None]
    if padding_mode == "zeros":
        in0 = ((x0 >= 0) & (x0 <= size - 1)).astype(coords.dtype)
        in1 = ((x1 >= 0) & (x1 <= size - 1)).astype(coords.dtype)
        m = eye[x0c] * ((1.0 - w1) * in0)[:, None] + eye[x1c] * (w1 * in1)[:, None]
    return m.astype(out_dtype)


def separable_grid_sample(
    plane: jnp.ndarray,
    xs: jnp.ndarray,
    ys: jnp.ndarray,
    align_corners: bool = False,
    padding_mode: str = "border",
) -> jnp.ndarray:
    """Sample NHWC plane at the outer product grid ys x xs -> (b, len(ys),
    len(xs), c).  Two MXU matmuls; exact bilinear semantics."""
    B, H, W, C = plane.shape
    ry = interp_matrix_1d(ys, H, align_corners, padding_mode)  # (Ho, H)
    rx = interp_matrix_1d(xs, W, align_corners, padding_mode)  # (Wo, W)
    out = jnp.einsum("oh,bhwc->bowc", ry, plane)
    out = jnp.einsum("pw,bowc->bopc", rx, out)
    return out


def pixel_center_lin(n: int, dtype=jnp.float32) -> jnp.ndarray:
    """1D pixel-center coordinates [-(n-1)/n, (n-1)/n] (matches
    core.coords.pixel_center_grid rows/cols)."""
    e = (n - 1) / n
    return jnp.linspace(-e, e, n, dtype=dtype)
