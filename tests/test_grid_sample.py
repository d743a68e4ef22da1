"""Parity tests for grid_sample_2d against torch.nn.functional.grid_sample
(torch CPU), covering every (align_corners, padding_mode) combination the
reference uses (utils/general_utils.py:122-137, utils/nerf_helpers.py:391)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from ddmi_tpu.ops.grid_sample import grid_sample_2d, grid_sample_nchw_like


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize("padding_mode", ["border", "zeros"])
def test_grid_sample_matches_torch(align_corners, padding_mode, np_rng):
    B, C, H, W = 2, 5, 9, 7
    Ho, Wo = 6, 4
    feat = np_rng.standard_normal((B, C, H, W)).astype(np.float32)
    # include out-of-range coords to exercise padding
    grid = (np_rng.uniform(-1.4, 1.4, (B, Ho, Wo, 2))).astype(np.float32)

    ref = F.grid_sample(
        torch.from_numpy(feat),
        torch.from_numpy(grid),
        mode="bilinear",
        padding_mode=padding_mode,
        align_corners=align_corners,
    ).numpy()

    got = grid_sample_nchw_like(
        jnp.asarray(feat),
        jnp.asarray(grid),
        align_corners=align_corners,
        padding_mode=padding_mode,
    )
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5, rtol=1e-4)


def test_grid_sample_default_matches_reference_callsite(np_rng):
    """singleplane_positional_encoding uses torch defaults:
    align_corners=False (implicit), padding border."""
    B, C, H, W = 1, 3, 16, 16
    feat = np_rng.standard_normal((B, C, H, W)).astype(np.float32)
    # pixel-center coords as built by convert_to_coord_format_2d
    n = 8
    lin = np.linspace(-(n - 1) / n, (n - 1) / n, n).astype(np.float32)
    gx, gy = np.meshgrid(lin, lin, indexing="xy")
    grid = np.stack([gx, gy], -1)[None]

    ref = F.grid_sample(
        torch.from_numpy(feat), torch.from_numpy(grid), padding_mode="border"
    ).numpy()
    got = grid_sample_nchw_like(jnp.asarray(feat), jnp.asarray(grid))
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5, rtol=1e-4)


def test_grid_sample_gradients_wrt_coords():
    """Coordinate gradients must flow (reference: mlp.py:36 requires_grad_)."""
    import jax

    feat = jnp.arange(16.0).reshape(1, 4, 4, 1)
    grid = jnp.array([[[0.1, -0.2], [0.5, 0.5]]])

    def f(g):
        return grid_sample_2d(feat, g, align_corners=True).sum()

    g = jax.grad(f)(grid)
    assert np.isfinite(np.asarray(g)).all()
    assert (np.abs(np.asarray(g)) > 0).any()


def test_grid_sample_exact_at_pixel_centers():
    feat = jnp.arange(12.0).reshape(1, 3, 4, 1)
    # align_corners=True: -1 -> pixel 0, +1 -> pixel (n-1)
    grid = jnp.array([[[-1.0, -1.0], [1.0, 1.0], [-1.0, 1.0]]])
    out = grid_sample_2d(feat, grid, align_corners=True)
    np.testing.assert_allclose(
        np.asarray(out).ravel(), [0.0, 11.0, 8.0], atol=1e-6
    )
