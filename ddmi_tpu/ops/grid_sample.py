"""Bilinear grid sampling (the INR positional-encoding hot op).

TPU-native replacement for `torch.nn.functional.grid_sample` as used by the
reference at four call sites with *different* semantics that must be preserved
for parity (SURVEY.md §7 "hard parts" #1):

  * image INR:  padding_mode='border', align_corners=False
    (utils/general_utils.py:122-123)
  * 3D / video triplane PE: padding_mode='border', align_corners=True
    (utils/general_utils.py:129-137)
  * NeRF plane sampling: align_corners=True (utils/nerf_helpers.py:391-393)

Implementation: gather-based bilinear over NHWC features.  The four corner
gathers become one `take_along_axis` over a flattened spatial axis, which XLA
lowers to efficient dynamic-gathers; gradients w.r.t. both features and
coordinates come from autodiff (the reference needed a hand-written CUDA
double-backward).  A fused Pallas multi-plane kernel lives in
`ddmi_tpu.ops.pallas.inr_decode` for the decode hot path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _unnormalize(coord: jnp.ndarray, size: int, align_corners: bool) -> jnp.ndarray:
    """Map [-1, 1] normalized coordinates to pixel indices (torch convention)."""
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def grid_sample_2d(
    feat: jnp.ndarray,
    grid: jnp.ndarray,
    align_corners: bool = False,
    padding_mode: str = "border",
) -> jnp.ndarray:
    """Sample NHWC features at normalized coordinates.

    Args:
      feat: (B, H, W, C) feature planes.
      grid: (B, N, 2) coordinates in [-1, 1], last dim ordered (x, y) with
        x indexing W and y indexing H (torch grid_sample convention).
      align_corners / padding_mode: torch-compatible semantics
        ('border' and 'zeros' supported).

    Returns:
      (B, N, C) sampled features.
    """
    B, H, W, C = feat.shape
    # index math always in fp32: bf16 coords lose whole pixels at sizes
    # >= 256 (see ops/resample.interp_matrix_1d)
    grid = grid.astype(jnp.float32)
    x = _unnormalize(grid[..., 0], W, align_corners)
    y = _unnormalize(grid[..., 1], H, align_corners)

    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1)
        y = jnp.clip(y, 0.0, H - 1)
    elif padding_mode != "zeros":
        raise NotImplementedError(padding_mode)

    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx = x - x0f  # in [0,1)
    wy = y - y0f

    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1

    if padding_mode == "zeros":
        valid = lambda xi, yi: (
            (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        )
        m00 = valid(x0, y0)
        m01 = valid(x1, y0)
        m10 = valid(x0, y1)
        m11 = valid(x1, y1)

    x0c = jnp.clip(x0, 0, W - 1)
    x1c = jnp.clip(x1, 0, W - 1)
    y0c = jnp.clip(y0, 0, H - 1)
    y1c = jnp.clip(y1, 0, H - 1)

    flat = feat.reshape(B, H * W, C)

    def gather(yi, xi):
        idx = yi * W + xi  # (B, N)
        return jnp.take_along_axis(flat, idx[..., None], axis=1)  # (B, N, C)

    v00 = gather(y0c, x0c)
    v01 = gather(y0c, x1c)
    v10 = gather(y1c, x0c)
    v11 = gather(y1c, x1c)

    if padding_mode == "zeros":
        z = jnp.zeros_like(v00)
        v00 = jnp.where(m00[..., None], v00, z)
        v01 = jnp.where(m01[..., None], v01, z)
        v10 = jnp.where(m10[..., None], v10, z)
        v11 = jnp.where(m11[..., None], v11, z)

    wx = wx[..., None].astype(feat.dtype)
    wy = wy[..., None].astype(feat.dtype)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def grid_sample_nchw_like(
    feat: jnp.ndarray,
    grid: jnp.ndarray,
    align_corners: bool = False,
    padding_mode: str = "border",
) -> jnp.ndarray:
    """Convenience wrapper with torch-shaped I/O for parity tests:
    feat (B,C,H,W), grid (B,Ho,Wo,2) -> (B,C,Ho,Wo)."""
    B, C, H, W = feat.shape
    Ho, Wo = grid.shape[1], grid.shape[2]
    out = grid_sample_2d(
        jnp.transpose(feat, (0, 2, 3, 1)),
        grid.reshape(B, Ho * Wo, 2),
        align_corners=align_corners,
        padding_mode=padding_mode,
    )
    return jnp.transpose(out.reshape(B, Ho, Wo, C), (0, 3, 1, 2))


def grid_sample_3d(
    feat: jnp.ndarray,
    grid: jnp.ndarray,
    align_corners: bool = True,
    padding_mode: str = "border",
) -> jnp.ndarray:
    """Trilinear sampling of an NDHWC volume at normalized coordinates.

    feat: (B, D, H, W, C); grid: (B, N, 3) in [-1, 1] ordered (x, y, z) with
    x indexing W, y indexing H, z indexing D (torch grid_sample convention,
    as used by the reference's sample_grid_feature,
    convocc/src/conv_onet/models/decoder.py:58-64).  Returns (B, N, C)."""
    B, D, H, W, C = feat.shape
    grid = grid.astype(jnp.float32)
    x = _unnormalize(grid[..., 0], W, align_corners)
    y = _unnormalize(grid[..., 1], H, align_corners)
    z = _unnormalize(grid[..., 2], D, align_corners)
    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1)
        y = jnp.clip(y, 0.0, H - 1)
        z = jnp.clip(z, 0.0, D - 1)
    elif padding_mode != "zeros":
        raise NotImplementedError(padding_mode)

    x0 = jnp.floor(x); y0 = jnp.floor(y); z0 = jnp.floor(z)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    wz = (z - z0)[..., None]
    x0 = x0.astype(jnp.int32); y0 = y0.astype(jnp.int32)
    z0 = z0.astype(jnp.int32)
    cl = lambda v, n: jnp.clip(v, 0, n - 1)
    flat = feat.reshape(B, D * H * W, C)

    def gather(zi, yi, xi):
        idx = (cl(zi, D) * H + cl(yi, H)) * W + cl(xi, W)
        return jnp.take_along_axis(flat, idx[..., None], axis=1)

    out = 0.0
    for dz, wz_ in ((z0, 1 - wz), (z0 + 1, wz)):
        for dy, wy_ in ((y0, 1 - wy), (y0 + 1, wy)):
            for dx, wx_ in ((x0, 1 - wx), (x0 + 1, wx)):
                w = (wz_ * wy_ * wx_).astype(feat.dtype)
                if padding_mode == "zeros":
                    valid = (
                        (dx >= 0) & (dx < W) & (dy >= 0) & (dy < H)
                        & (dz >= 0) & (dz < D)
                    )[..., None].astype(feat.dtype)
                    w = w * valid
                out = out + w * gather(dz, dy, dx)
    return out
