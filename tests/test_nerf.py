"""Tiny-config tests for the NeRF domain: ray generation, compositing
algebra, triplane sampling, stage-1/stage-2 steps."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddmi_tpu.core.config import (
    Config,
    DDConfig,
    DDPMConfig,
    DataConfig,
    LossConfig,
    MLPConfig,
    ModelConfig,
    UNetConfig,
)
from ddmi_tpu.data.nerf import SyntheticNeRF
from ddmi_tpu.domains.nerf import (
    NeRFPipeline,
    get_rays,
    raw2outputs,
    sample_triplane,
)


def tiny_nerf_config():
    dd = DDConfig(
        double_z=True, z_channels=32, resolution=16, in_channels=8, out_ch=8,
        ch=32, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(),
        hdbf_resolutions=(), inter_attn_resolutions=(16,), attn_type="vanilla",
    )
    unet = UNetConfig(
        image_size=8, in_channels=24, model_channels=32, out_channels=24,
        num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
        num_head_channels=16,
    )
    ddpm = DDPMConfig(timesteps=20, image_size=8, channels=24,
                      sampling_timesteps=4, mixed_init=-6.0)
    mlp = MLPConfig(
        in_ch=3, out_ch=4, ch=32, latent_dim=8,
        extra={
            "D": 2, "W": 32, "skips": (1,), "multires": 4,
            "multires_views": 2, "N_samples": 16, "N_rand": 64,
            "white_bkgd": True,
        },
    )
    model = ModelConfig(
        embed_dim=8, use_fp16=False,
        lossconfig=LossConfig(epochs=2, warmup_epochs=1,
                              gradient_accumulate_every=1, sn_reg=True),
        ddconfig=dd, mlpconfig=mlp, unetconfig=unet, ddpmconfig=ddpm,
        extra={"pointnet": {"c_dim": 8, "hidden_dim": 32,
                            "plane_resolution": 16, "n_blocks": 2}},
    )
    return Config(model=model, data=DataConfig(domain="nerf", batch_size=1))


@pytest.fixture(scope="module")
def npipe():
    return NeRFPipeline(tiny_nerf_config())


def test_get_rays_geometry():
    pose = jnp.eye(4)
    ro, rd = get_rays(8, 8, pose)
    assert ro.shape == (8, 8, 3) and rd.shape == (8, 8, 3)
    # identity pose: origin 0, central ray ~ -z
    np.testing.assert_allclose(np.asarray(ro), 0.0)
    center = np.asarray(rd)[4, 4]
    assert center[2] < 0
    assert abs(center[0]) < 0.2 and abs(center[1]) < 0.2


def test_raw2outputs_opaque_surface():
    """A single very dense sample makes rgb = its color."""
    n, s = 4, 8
    raw = np.zeros((n, s, 4), np.float32)
    raw[..., 3] = -100.0  # transparent elsewhere (softplus -> ~0)
    raw[:, 3, :3] = [1.0, 0.5, 0.25]
    raw[:, 3, 3] = 1e8  # huge density at sample 3
    z = np.tile(np.linspace(2, 6, s), (n, 1)).astype(np.float32)
    rd = np.tile([0, 0, -1.0], (n, 1)).astype(np.float32)
    rgb, w, acc = raw2outputs(
        jnp.asarray(raw), jnp.asarray(z), jnp.asarray(rd), white_bkgd=False
    )
    np.testing.assert_allclose(np.asarray(rgb), [[1.0, 0.5, 0.25]] * n, atol=1e-4)
    np.testing.assert_allclose(np.asarray(acc), 1.0, atol=1e-5)


def test_raw2outputs_white_background():
    n, s = 2, 4
    raw = np.zeros((n, s, 4), np.float32)
    raw[..., 3] = -100.0  # fully transparent (softplus -> ~0)
    z = np.tile(np.linspace(2, 6, s), (n, 1)).astype(np.float32)
    rd = np.tile([0, 0, -1.0], (n, 1)).astype(np.float32)
    rgb, _, acc = raw2outputs(
        jnp.asarray(raw), jnp.asarray(z), jnp.asarray(rd), white_bkgd=True
    )
    np.testing.assert_allclose(np.asarray(rgb), 1.0, atol=1e-3)


def test_sample_triplane_shapes(np_rng):
    planes = {
        k: jnp.asarray(np_rng.standard_normal((1, 16, 16, 8)).astype(np.float32))
        for k in ("xy", "yz", "xz")
    }
    pts = jnp.asarray(np_rng.uniform(-3, 3, (10, 5, 3)).astype(np.float32))
    out = sample_triplane(planes, pts)
    assert out.shape == (10, 5, 24)


@pytest.mark.slow
def test_nerf_stage1_step(npipe):
    batch = {k: jnp.asarray(v) for k, v in next(iter(SyntheticNeRF())).items()}
    state = npipe.init_stage1(jax.random.PRNGKey(0), steps_per_epoch=4)
    tx = npipe.stage1_optimizer(4)
    step = jax.jit(lambda s, b, r: npipe.stage1_train_step(tx, s, b, r))
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert int(state.step) == 1
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, v)


@pytest.mark.slow
def test_nerf_stage2_step(npipe):
    batch = {k: jnp.asarray(v) for k, v in next(iter(SyntheticNeRF())).items()}
    s1 = npipe.init_stage1(jax.random.PRNGKey(0), steps_per_epoch=4)
    s2 = npipe.init_stage2(jax.random.PRNGKey(1))
    tx = npipe.stage2_optimizer()
    step = jax.jit(lambda st, p1, b, r: npipe.stage2_train_step(tx, st, p1, b, r))
    s2, aux = step(s2, s1.params, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(aux["loss"]))


@pytest.mark.slow
def test_nerf_render_image(npipe):
    batch = {k: jnp.asarray(v) for k, v in next(iter(SyntheticNeRF())).items()}
    s1 = npipe.init_stage1(jax.random.PRNGKey(0), steps_per_epoch=4)
    z, _ = npipe.encode_planes(s1.params, batch["points"], jax.random.PRNGKey(1))
    planes = npipe.decode_planes(s1.params, z)
    img = npipe.render_image(
        s1.params, planes, batch["pose"][0], 16, 16, jax.random.PRNGKey(2),
        ray_chunk=64,
    )
    assert img.shape == (16, 16, 3)
    assert np.isfinite(np.asarray(img)).all()


def test_sample_nerfs_camera_path(npipe):
    """Full generation path: DDIM latents -> decode planes -> jitted
    camera-path render (tools/ldm/nerf.py:243-275)."""
    s1 = npipe.init_stage1(jax.random.PRNGKey(0), steps_per_epoch=2)
    s2 = npipe.init_stage2(jax.random.PRNGKey(1))
    views = npipe.sample_nerfs(
        s2.ema_params, s1.params, jax.random.PRNGKey(2), batch=1,
        n_views=2, H=8, W=8,
    )
    assert views.shape == (1, 2, 8, 8, 3)
    assert np.isfinite(np.asarray(views)).all()
