"""Seam tests: capabilities must be reachable from configs/CLI, not just
importable (round-1 verdict items 5/6 — GAN, MDTv2, LPIPS wiring)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddmi_tpu.core.config import (
    Config,
    DDConfig,
    DDPMConfig,
    DataConfig,
    DiTConfig,
    LossConfig,
    MLPConfig,
    ModelConfig,
    UNetConfig,
)
from ddmi_tpu.domains.image import ImagePipeline


def tiny_cfg(adversarial=False, dit=False, **loss_kw):
    dd = DDConfig(
        z_channels=32, resolution=32, in_channels=3, out_ch=16, ch=32,
        ch_mult=(1, 2, 4), num_res_blocks=1, hdbf_resolutions=(8, 16),
    )
    loss = LossConfig(
        epochs=2, warmup_epochs=1, multiscale=False,
        gradient_accumulate_every=1, sn_reg=False, adversarial=adversarial,
        **loss_kw,
    )
    model = ModelConfig(
        DiT=dit,
        embed_dim=8,
        use_fp16=False,
        lossconfig=loss,
        ddconfig=dd,
        mlpconfig=MLPConfig(in_ch=2, out_ch=3, ch=64, latent_dim=16),
        unetconfig=UNetConfig(
            image_size=8, in_channels=8, model_channels=32, out_channels=8,
            num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
            num_head_channels=16,
        ),
        ddpmconfig=DDPMConfig(timesteps=20, image_size=8, channels=8,
                              sampling_timesteps=4),
        ditconfig=DiTConfig(input_size=8, patch_size=2, in_channels=8,
                            hidden_size=32, depth=4, num_heads=4,
                            mask_ratio=0.3, decode_layer=2),
    )
    return Config(model=model, data=DataConfig(test_resolution=16, batch_size=2))


@pytest.mark.slow
def test_adversarial_stage1_step_trains_both_players(np_rng):
    """*_gan.yaml-style config exercises the GAN branch: disc state exists,
    d_loss is computed, and BOTH parameter sets move
    (reference: tools/d2c_vae/image.py:227-254)."""
    pipe = ImagePipeline(tiny_cfg(adversarial=True))
    assert pipe.gan is not None
    state = pipe.init_stage1(jax.random.PRNGKey(0), steps_per_epoch=4)
    assert state.disc_params is not None
    tx = pipe.stage1_optimizer(4)
    x = jnp.asarray(np_rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
    step = jax.jit(lambda s, xx, r: pipe.stage1_train_step(tx, s, xx, r))

    d0 = jax.device_get(state.disc_params)
    g0 = jax.device_get(state.params)
    metrics = None
    for i in range(2):
        state, metrics = step(state, x, jax.random.PRNGKey(i + 1))
    assert "d_loss" in metrics and "g_gan" in metrics
    assert np.isfinite(float(metrics["d_loss"]))
    assert np.isfinite(float(metrics["g_gan"]))

    d1 = jax.device_get(state.disc_params)
    g1 = jax.device_get(state.params)
    moved = lambda a, b: any(
        not np.allclose(x, y)
        for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
    )
    assert moved(d0, d1), "discriminator params did not update"
    assert moved(g0, g1), "generator params did not update"


def test_gan_yaml_config_reaches_adversarial_branch(tmp_path):
    """configs/d2c-vae/*_gan.yaml set lossconfig.adversarial — the pipeline
    must pick it up from the ported YAML (afhq_gan.yaml:10)."""
    from ddmi_tpu.core.config import load_config

    cfg = load_config("configs/d2c-vae/afhq_gan.yaml")
    assert cfg.model.lossconfig.adversarial
    pipe = ImagePipeline(cfg)
    assert pipe.gan is not None


@pytest.mark.slow
def test_dit_config_selects_mdt(np_rng):
    """model.DiT dispatches MDTv2 as the stage-2 denoiser
    (reference exp/stage.py:196-199)."""
    from ddmi_tpu.nn.mdt import MDTv2

    pipe = ImagePipeline(tiny_cfg(dit=True))
    assert isinstance(pipe.unet, MDTv2)
    s2 = pipe.init_stage2(jax.random.PRNGKey(0))
    s1 = pipe.init_stage1(jax.random.PRNGKey(1), steps_per_epoch=2)
    tx = pipe.stage2_optimizer()
    x = jnp.asarray(np_rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
    step = jax.jit(
        lambda s, p1, xx, r: pipe.stage2_train_step(tx, s, p1, xx, r)
    )
    s2, aux = step(s2, s1.params, x, jax.random.PRNGKey(2))
    assert np.isfinite(float(aux["loss"]))
    # sampling path (unmasked eval forward) through the DiT denoiser
    img = jax.jit(
        lambda lp, sp, r: pipe.sample_images(lp, sp, r, batch=1, resolution=16)
    )(s2.ema_params, s1.params, jax.random.PRNGKey(3))
    assert img.shape == (1, 16, 16, 3)
    assert np.isfinite(np.asarray(img)).all()


@pytest.mark.slow
def test_lpips_wired_into_stage1_metrics(np_rng):
    """CLI-built pipelines pass perceptual_fn; metrics carry nonzero lpips
    (reference always trains stage-1 image with LPIPS,
    tools/d2c_vae/image.py:61, :207)."""
    import warnings

    from ddmi_tpu.cli.main import build_perceptual

    cfg = tiny_cfg()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # random-init VGG warning expected
        pf = build_perceptual(cfg)
    pipe = ImagePipeline(cfg, perceptual_fn=pf)
    state = pipe.init_stage1(jax.random.PRNGKey(0), steps_per_epoch=2)
    tx = pipe.stage1_optimizer(2)
    x = jnp.asarray(np_rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
    state, metrics = jax.jit(
        lambda s, xx, r: pipe.stage1_train_step(tx, s, xx, r)
    )(state, x, jax.random.PRNGKey(1))
    assert float(metrics["lpips"]) != 0.0
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_video_adversarial_step(np_rng):
    """skytimelapse_gan-style config: 2D+3D discriminator pair updates."""
    import dataclasses
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_video import tiny_video_config

    from ddmi_tpu.domains.video import VideoPipeline

    cfg = tiny_video_config()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model,
            lossconfig=dataclasses.replace(
                cfg.model.lossconfig, adversarial=True, sn_reg=False
            ),
        ),
    )
    pipe = VideoPipeline(cfg)
    assert pipe.gan is not None
    state = pipe.init_stage1(jax.random.PRNGKey(0), steps_per_epoch=2)
    assert state.disc_params is not None
    tx = pipe.stage1_optimizer(2)
    x = jnp.asarray(np_rng.uniform(0, 1, (2, 4, 32, 32, 3)).astype(np.float32))
    state, metrics = jax.jit(
        lambda s, xx, r: pipe.stage1_train_step(tx, s, xx, r)
    )(state, x, jax.random.PRNGKey(1))
    assert "d_loss" in metrics
    assert np.isfinite(float(metrics["d_loss"]))


def test_convocc_config_wiring_occupancy():
    """data.conv_config loads the nested convocc YAML into pointnet +
    generation kwargs (reference convocc/src/config.py:13-58); the shipped
    shapenet configs must not depend on model.extra defaults."""
    from ddmi_tpu.core.config import load_config
    from ddmi_tpu.domains.occupancy import OccupancyPipeline

    cfg = load_config("configs/d2c-vae/shapenet.yaml")
    assert cfg.data.conv_config
    pipe = OccupancyPipeline(cfg)
    assert pipe.conv_cfg is not None
    # values from configs/convocc/pointcloud/shapenet_3plane.yaml
    assert pipe.pointnet.c_dim == 32
    assert pipe.pointnet.hidden_dim == 256
    assert pipe.pointnet.plane_resolution == 64
    assert pipe.pointnet.n_blocks == 7
    assert pipe.generation_kwargs["resolution0"] == 64
    assert pipe.generation_kwargs["upsampling_steps"] == 2
    assert pipe.generation_kwargs["threshold"] == 0.2


def test_convocc_config_wiring_nerf():
    """srn_cars configs route the model.TN block into render params."""
    from ddmi_tpu.core.config import load_config
    from ddmi_tpu.domains.nerf import NeRFPipeline

    cfg = load_config("configs/ldm/srn_cars.yaml")
    pipe = NeRFPipeline(cfg)
    assert pipe.conv_cfg is not None
    assert pipe.n_samples == 256
    assert pipe.n_rand == 5000
    assert pipe.white_bkgd is True
    assert pipe.embed_xyz.n_freqs == 10
    assert pipe.embed_dir.n_freqs == 4
    assert pipe.perturb == 1  # 'peturb' typo key preserved from reference


def test_amp_policy_stage1_trains(np_rng):
    """model.amp: stage-1 forward in bf16, fp32 master params still update
    and the loss is finite (core/amp.py policy)."""
    import dataclasses

    cfg = tiny_cfg()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, amp=True)
    )
    pipe = ImagePipeline(cfg)
    assert pipe.amp
    state = pipe.init_stage1(jax.random.PRNGKey(0), steps_per_epoch=2)
    leaves = jax.tree_util.tree_leaves(state.params)
    assert all(l.dtype == jnp.float32 for l in leaves)  # fp32 masters
    tx = pipe.stage1_optimizer(2)
    x = jnp.asarray(np_rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
    g0 = jax.device_get(state.params)
    step = jax.jit(lambda s, xx, r: pipe.stage1_train_step(tx, s, xx, r))
    metrics = None
    for i in range(2):  # warmup LR is 0 at step 0
        state, metrics = step(state, x, jax.random.PRNGKey(i + 1))
    assert np.isfinite(float(metrics["loss"]))
    g1 = jax.device_get(state.params)
    moved = any(
        not np.allclose(a, b)
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1))
    )
    assert moved
    # updated params stay fp32
    assert all(
        l.dtype == jnp.float32 for l in jax.tree_util.tree_leaves(state.params)
    )


def test_all_shipped_configs_load():
    """Every YAML under configs/{d2c-vae,ldm} parses into the typed schema."""
    import glob

    paths = sorted(glob.glob("configs/d2c-vae/*.yaml") + glob.glob("configs/ldm/*.yaml"))
    assert len(paths) >= 14
    from ddmi_tpu.core.config import load_config

    for p in paths:
        cfg = load_config(p)
        assert cfg.data.domain in ("image", "video", "occupancy", "nerf"), p


def test_tpu_native_config_wide_heads():
    """configs/ldm/celebahq_tpu.yaml = the reference port with
    num_head_channels 32 -> 128 (MXU lane-aligned) and nothing else changed;
    the UNet must build and apply under the wide-head grouping."""
    import dataclasses

    from ddmi_tpu.core.config import load_config
    from ddmi_tpu.nn.unet import UNet

    ref = load_config("configs/ldm/celebahq.yaml")
    tpu = load_config("configs/ldm/celebahq_tpu.yaml")
    assert ref.model.unetconfig.num_head_channels == 32
    assert tpu.model.unetconfig.num_head_channels == 128
    assert dataclasses.replace(
        tpu.model.unetconfig, num_head_channels=32
    ) == ref.model.unetconfig
    assert tpu.model.ddconfig == ref.model.ddconfig
    assert tpu.model.ddpmconfig == ref.model.ddpmconfig

    # tiny proxy with the same head policy: channels at every attention
    # level must be divisible by 128 just like the production config
    # (256*channel_mult at attention_resolutions 8/4/2 -> 512/1024/2048)
    uc = dataclasses.replace(
        tpu.model.unetconfig,
        image_size=8, in_channels=4, model_channels=128, out_channels=4,
        channel_mult=(1, 2), num_res_blocks=1, attention_resolutions=(4,),
    )
    unet = UNet(uc)
    x = jnp.zeros((1, 8, 8, 4))
    t = jnp.zeros((1,), jnp.int32)
    params = unet.init(jax.random.PRNGKey(0), x, t)
    out = unet.apply(params, x, t)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
