"""Tiny-config tests for the occupancy domain: pointnet pooling, triplane
VAE shapes, stage-1/stage-2 steps, synthetic-data loss sanity."""

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
from ddmi_tpu.data.shapenet import SyntheticOccupancy
from ddmi_tpu.domains.occupancy import OccupancyPipeline


def tiny_occ_config():
    dd = DDConfig(
        double_z=True, z_channels=32, resolution=32, in_channels=8, out_ch=8,
        ch=32, ch_mult=(1, 2, 4), num_res_blocks=1, attn_resolutions=(),
        hdbf_resolutions=(8, 16), inter_attn_resolutions=(32, 16),
        attn_type="vanilla",
    )
    # latent res 8, z channel-concat 3*embed_dim = 24
    unet = UNetConfig(
        image_size=8, in_channels=24, model_channels=32, out_channels=24,
        num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
        num_head_channels=16,
    )
    ddpm = DDPMConfig(timesteps=20, image_size=8, channels=24,
                      sampling_timesteps=4, mixed_init=-6.0)
    model = ModelConfig(
        embed_dim=8, use_fp16=False,
        lossconfig=LossConfig(epochs=2, warmup_epochs=1,
                              gradient_accumulate_every=1, sn_reg=True),
        ddconfig=dd,
        mlpconfig=MLPConfig(in_ch=3, out_ch=1, ch=64, latent_dim=8),
        unetconfig=unet,
        ddpmconfig=ddpm,
    )
    model = ModelConfig(**{**model.__dict__, "extra": {
        "pointnet": {"c_dim": 8, "hidden_dim": 32, "plane_resolution": 32,
                     "n_blocks": 3}
    }})
    return Config(model=model, data=DataConfig(domain="occupancy", batch_size=2))


@pytest.fixture(scope="module")
def opipe():
    return OccupancyPipeline(tiny_occ_config())


def test_pointnet_planes(opipe, np_rng):
    pts = jnp.asarray(
        np_rng.uniform(-0.5, 0.5, (2, 200, 3)).astype(np.float32)
    )
    params = opipe.pointnet.init({"params": jax.random.PRNGKey(0)}, pts)
    fea = opipe.pointnet.apply(params, pts)
    assert set(fea) == {"xz", "xy", "yz"}
    for k, v in fea.items():
        assert v.shape == (2, 32, 32, 8)
        assert np.isfinite(np.asarray(v)).all()


def test_pointnet_scatter_semantics(np_rng):
    """All points in one cell -> plane nonzero only at that cell."""
    from ddmi_tpu.nn.pointnet import LocalPoolPointnet

    pn = LocalPoolPointnet(c_dim=4, hidden_dim=16, plane_resolution=8,
                           n_blocks=2)
    pts = jnp.full((1, 50, 3), 0.21)  # one location
    params = pn.init({"params": jax.random.PRNGKey(0)}, pts)
    fea = pn.apply(params, pts)
    plane = np.asarray(fea["xy"])[0]
    nonzero = np.abs(plane).sum(-1) > 0
    assert nonzero.sum() == 1


@pytest.mark.slow
def test_stage1_step_and_overfit_signal(opipe):
    data = iter(SyntheticOccupancy(2, n_points=128, n_cloud=200))
    batch = {k: jnp.asarray(v) for k, v in next(data).items()}
    state = opipe.init_stage1(jax.random.PRNGKey(0), steps_per_epoch=4)
    tx = opipe.stage1_optimizer(4)
    step = jax.jit(lambda s, b, r: opipe.stage1_train_step(tx, s, b, r))
    state, m1 = step(state, batch, jax.random.PRNGKey(1))
    for k, v in m1.items():
        assert np.isfinite(float(v)), (k, v)
    assert float(m1["bce"]) > 0


@pytest.mark.slow
def test_stage2_step_and_latent_sample(opipe):
    data = iter(SyntheticOccupancy(2, n_points=64, n_cloud=200))
    batch = {k: jnp.asarray(v) for k, v in next(data).items()}
    s1 = opipe.init_stage1(jax.random.PRNGKey(0), steps_per_epoch=4)
    s2 = opipe.init_stage2(jax.random.PRNGKey(1))
    tx = opipe.stage2_optimizer()
    step = jax.jit(lambda st, p1, b, r: opipe.stage2_train_step(tx, st, p1, b, r))
    s2, aux = step(s2, s1.params, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(aux["loss"]))

    z = jax.jit(lambda p, r: opipe.sample_latents(p, r, batch=2))(
        s2.ema_params, jax.random.PRNGKey(3)
    )
    assert z.shape == (2, 8, 8, 24)

    eval_points = opipe.decode_logits_fn(s1.params, z)
    logits = jax.jit(eval_points)(
        jnp.zeros((2, 100, 3))
    )
    assert logits.shape == (2, 100)


def test_local_voxel_encoder(np_rng):
    """LocalVoxelEncoder (convocc voxels.py): voxel grid -> triplanes (+grid),
    axis-mean projection == the reference's scatter_mean on a regular grid."""
    from ddmi_tpu.nn.pointnet import LocalVoxelEncoder

    vox = jnp.asarray(np_rng.uniform(0, 1, (2, 16, 16, 16)) > 0.7, jnp.float32)
    enc = LocalVoxelEncoder(c_dim=8, plane_resolution=16,
                            plane_type=("xz", "xy", "yz", "grid"))
    params = enc.init(jax.random.PRNGKey(0), vox)
    fea = enc.apply(params, vox)
    assert fea["xy"].shape == (2, 16, 16, 8)
    assert fea["grid"].shape == (2, 16, 16, 16, 8)
    assert np.isfinite(np.asarray(fea["xz"])).all()
    # resized plane resolution
    enc32 = LocalVoxelEncoder(c_dim=8, plane_resolution=32)
    p32 = enc32.init(jax.random.PRNGKey(0), vox)
    assert enc32.apply(p32, vox)["yz"].shape == (2, 32, 32, 8)


def test_voxel_encoder_with_unets(np_rng):
    from ddmi_tpu.nn.pointnet import LocalVoxelEncoder

    vox = jnp.asarray(np_rng.uniform(0, 1, (1, 16, 16, 16)) > 0.7, jnp.float32)
    enc = LocalVoxelEncoder(c_dim=8, plane_resolution=16, unet=True,
                            unet_depth=2, unet_start_filts=8,
                            plane_type=("xz", "xy", "yz", "grid"),
                            unet3d=True)
    params = enc.init(jax.random.PRNGKey(0), vox)
    fea = enc.apply(params, vox)
    assert fea["xy"].shape == (1, 16, 16, 8)
    assert fea["grid"].shape == (1, 16, 16, 16, 8)


def test_pointnet_unet_refinement(np_rng):
    """encoder_kwargs unet: True routes planes through a shared UNet2D."""
    from ddmi_tpu.nn.pointnet import LocalPoolPointnet

    pts = jnp.asarray(np_rng.uniform(-0.4, 0.4, (1, 128, 3)), jnp.float32)
    enc = LocalPoolPointnet(c_dim=8, hidden_dim=16, plane_resolution=16,
                            n_blocks=2, unet=True, unet_depth=2,
                            unet_start_filts=8)
    params = enc.init(jax.random.PRNGKey(0), pts)
    fea = enc.apply(params, pts)
    assert fea["xy"].shape == (1, 16, 16, 8)
    assert "unet" in params["params"]


def test_voxel_encoder_config_dispatch(tmp_path):
    """conv_config model.encoder: voxel_simple_local builds LocalVoxelEncoder
    (convocc/src/encoder/__init__.py registry dispatch)."""
    import yaml

    from ddmi_tpu.core.config import replace
    from ddmi_tpu.nn.pointnet import LocalVoxelEncoder

    conv = {
        "model": {
            "encoder": "voxel_simple_local",
            "encoder_kwargs": {"plane_resolution": 32, "kernel_size": 3,
                               "unet": True,
                               "unet_kwargs": {"depth": 2, "start_filts": 8}},
            "c_dim": 8,
        },
        "generation": {"resolution_0": 16, "upsampling_steps": 0},
    }
    p = tmp_path / "voxel.yaml"
    p.write_text(yaml.safe_dump(conv))
    cfg = tiny_occ_config()
    cfg = replace(cfg, data=replace(cfg.data, conv_config=str(p)))
    pipe = OccupancyPipeline(cfg)
    assert isinstance(pipe.pointnet, LocalVoxelEncoder)
    assert pipe.pointnet.unet and pipe.pointnet.c_dim == 8
