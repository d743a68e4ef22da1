"""Parity tests for the fused VMEM NeRF-MLP kernel (ops/pallas/nerf_mlp.py)
against the flax INRNeRF it replaces on the sampling path — interpret mode
on CPU, exact layer splitting at the skip-concat boundaries."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddmi_tpu.nn.inr import INRNeRF
from ddmi_tpu.ops.pallas.nerf_mlp import fold_nerf_params, nerf_mlp_fused


@pytest.mark.parametrize(
    "depth,skips", [(6, (2, 4)), (8, (2, 4, 6)), (2, ())]
)
def test_fused_nerf_mlp_parity(depth, skips):
    in_xyz, in_dir, width = 159, 27, 256
    mlp = INRNeRF(
        depth=depth, width=width, in_channels_xyz=in_xyz,
        in_channels_dir=in_dir, skips=skips,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.normal(0, 1.0, (300, in_xyz + in_dir)).astype(np.float32)
    )
    params = mlp.init(jax.random.PRNGKey(0), x[:4])["params"]

    ref = np.asarray(mlp.apply({"params": params}, x))
    folded = fold_nerf_params(params, depth, width, in_xyz, in_dir, skips)
    out = np.asarray(nerf_mlp_fused(folded, x, block=256, interpret=True))

    assert out.shape == (300, 4)
    # bf16 weights in the kernel vs fp32 flax reference: rgb is sigmoid-
    # bounded, sigma is a linear head — both within bf16 rounding scale.
    np.testing.assert_allclose(out[:, :3], ref[:, :3], atol=0.02)
    np.testing.assert_allclose(out[:, 3], ref[:, 3], atol=0.05, rtol=0.05)


def test_fused_nerf_mlp_matches_bf16_path():
    """Tighter check against the SAME precision: flax path with bf16
    params/input (what sampling actually runs) vs the kernel."""
    in_xyz, in_dir, width, depth, skips = 159, 27, 256, 6, (2, 4)
    mlp = INRNeRF(
        depth=depth, width=width, in_channels_xyz=in_xyz,
        in_channels_dir=in_dir, skips=skips,
    )
    rng = np.random.default_rng(1)
    x = jnp.asarray(
        rng.normal(0, 1.0, (128, in_xyz + in_dir)).astype(np.float32)
    )
    params = mlp.init(jax.random.PRNGKey(0), x[:4])["params"]
    bf = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16), params
    )
    ref = np.asarray(
        mlp.apply({"params": bf}, x.astype(jnp.bfloat16)).astype(jnp.float32)
    )
    folded = fold_nerf_params(params, depth, width, in_xyz, in_dir, skips)
    out = np.asarray(nerf_mlp_fused(folded, x, block=128, interpret=True))
    np.testing.assert_allclose(out[:, :3], ref[:, :3], atol=0.02)
    np.testing.assert_allclose(out[:, 3], ref[:, 3], atol=0.06, rtol=0.06)
