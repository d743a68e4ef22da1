"""Separable regular-grid sampling must be numerically identical to the
gather-based grid_sample_2d (and hence to torch) on regular grids."""

import numpy as np
import pytest

import jax.numpy as jnp

from ddmi_tpu.ops.grid_sample import grid_sample_2d
from ddmi_tpu.ops.resample import (
    interp_matrix_1d,
    pixel_center_lin,
    separable_grid_sample,
)


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize("padding_mode", ["border", "zeros"])
def test_separable_matches_gather(align_corners, padding_mode, np_rng):
    B, H, W, C = 2, 16, 12, 5
    plane = jnp.asarray(np_rng.standard_normal((B, H, W, C)).astype(np.float32))
    xs = jnp.asarray(np.linspace(-1.2, 1.2, 9).astype(np.float32))
    ys = jnp.asarray(np.linspace(-1.1, 1.05, 7).astype(np.float32))

    sep = separable_grid_sample(plane, xs, ys, align_corners, padding_mode)

    gx, gy = np.meshgrid(np.asarray(xs), np.asarray(ys), indexing="xy")
    coords = jnp.asarray(
        np.stack([gx, gy], -1).reshape(1, -1, 2).astype(np.float32)
    )
    coords = jnp.broadcast_to(coords, (B, coords.shape[1], 2))
    ref = grid_sample_2d(plane, coords, align_corners, padding_mode)
    np.testing.assert_allclose(
        np.asarray(sep).reshape(B, -1, C), np.asarray(ref), atol=1e-5, rtol=1e-5
    )


def test_interp_matrix_rows_sum_to_one_border():
    m = interp_matrix_1d(jnp.linspace(-1, 1, 11), 6, align_corners=True)
    np.testing.assert_allclose(np.asarray(m).sum(-1), 1.0, atol=1e-6)


def test_pixel_center_lin_matches_grid():
    from ddmi_tpu.core.coords import pixel_center_grid

    lin = pixel_center_lin(8)
    g = pixel_center_grid(8)
    np.testing.assert_allclose(np.asarray(g[0, 0, :, 0]), np.asarray(lin))
    np.testing.assert_allclose(np.asarray(g[0, :, 0, 1]), np.asarray(lin))


def test_inr_image_grid1d_matches_coords(np_rng):
    """The INR fast path must produce the same output as the gather path."""
    import jax

    from ddmi_tpu.core.config import MLPConfig
    from ddmi_tpu.nn.inr import INRImage

    hdbf = [
        jnp.asarray(np_rng.standard_normal((2, r, r, 16)).astype(np.float32))
        for r in (8, 16, 32)
    ]
    mlp = INRImage(MLPConfig(in_ch=2, out_ch=3, ch=64, latent_dim=16))
    lin = pixel_center_lin(12)
    gx, gy = np.meshgrid(np.asarray(lin), np.asarray(lin), indexing="xy")
    coords = jnp.asarray(np.stack([gx, gy], -1).reshape(1, -1, 2).astype(np.float32))

    params = mlp.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        coords, hdbf, 1.0,
    )
    # same noise rng => identical noise injections
    out_coords = mlp.apply(
        params, coords, hdbf, 2.0, rngs={"noise": jax.random.PRNGKey(2)}
    )
    out_grid = mlp.apply(
        params, None, hdbf, 2.0, grid_1d=(lin, lin),
        rngs={"noise": jax.random.PRNGKey(2)},
    )
    np.testing.assert_allclose(
        np.asarray(out_coords), np.asarray(out_grid), atol=2e-5, rtol=1e-4
    )
