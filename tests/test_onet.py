"""Standalone ConvONet (convocc conv_onet) tests: decoder conditioning,
training signal, IoU eval, mesh extraction, voxel-encoder variant, and
trilinear grid-sample parity vs torch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddmi_tpu.data.shapenet import SyntheticOccupancy
from ddmi_tpu.domains.onet import ONetPipeline


@pytest.fixture(scope="module")
def tiny_onet():
    return ONetPipeline(
        c_dim=8,
        encoder_kwargs={"hidden_dim": 16, "plane_resolution": 16,
                        "n_blocks": 2},
        decoder_kwargs={"hidden_size": 16, "n_blocks": 2},
        lr=1e-3,
    )


def _batch(i=0, b=2):
    data = SyntheticOccupancy(batch_size=b, n_points=128, n_cloud=256,
                              length=1, seed=i)
    return next(iter(data))


def test_onet_trains_and_loss_decreases(tiny_onet):
    pipe = tiny_onet
    batch = {k: jnp.asarray(v) for k, v in _batch().items()}
    state = pipe.init(jax.random.PRNGKey(0), batch)
    step = jax.jit(pipe.train_step)
    losses = []
    for i in range(30):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, (losses[0], losses[-1])


def test_onet_iou_and_mesh(tiny_onet):
    pipe = tiny_onet
    batch = {k: jnp.asarray(v) for k, v in _batch().items()}
    state = pipe.init(jax.random.PRNGKey(0), batch)
    iou = pipe.eval_iou(state.params, batch)
    assert 0.0 <= iou <= 1.0

    from ddmi_tpu.geometry.generation import MeshGenerator

    eval_fn = jax.jit(pipe.mesh_eval_fn(state.params, batch["inputs"][:1]))
    verts, tris = MeshGenerator(eval_fn, resolution0=16,
                                upsampling_steps=0).generate()
    assert verts.ndim == 2 and tris.ndim == 2


def test_onet_voxel_encoder_variant():
    pipe = ONetPipeline(
        c_dim=8,
        encoder="voxel_simple_local",
        encoder_kwargs={"plane_resolution": 16},
        decoder_kwargs={"hidden_size": 16, "n_blocks": 2},
    )
    rng = np.random.default_rng(0)
    batch = {
        "points": jnp.asarray(rng.uniform(-0.5, 0.5, (1, 64, 3)), jnp.float32),
        "inputs": jnp.asarray(
            rng.uniform(0, 1, (1, 16, 16, 16)) > 0.5, jnp.float32
        ),
        "occ": jnp.asarray(rng.uniform(0, 1, (1, 64)) > 0.5, jnp.float32),
    }
    state = pipe.init(jax.random.PRNGKey(0), batch)
    state, m = jax.jit(pipe.train_step)(state, batch)
    assert np.isfinite(float(m["loss"]))


def test_grid_sample_3d_torch_parity(np_rng):
    import torch
    import torch.nn.functional as F

    from ddmi_tpu.ops.grid_sample import grid_sample_3d

    feat = np_rng.standard_normal((2, 4, 5, 6, 3)).astype(np.float32)  # NDHWC
    grid = np_rng.uniform(-1.2, 1.2, (2, 50, 3)).astype(np.float32)

    out = grid_sample_3d(jnp.asarray(feat), jnp.asarray(grid),
                         align_corners=True, padding_mode="border")

    tf = torch.tensor(feat).permute(0, 4, 1, 2, 3)  # NCDHW
    tg = torch.tensor(grid).reshape(2, 50, 1, 1, 3)
    ref = F.grid_sample(tf, tg, align_corners=True, padding_mode="border",
                        mode="bilinear")
    ref = ref.squeeze(-1).squeeze(-1).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)
