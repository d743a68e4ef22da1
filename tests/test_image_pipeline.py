"""End-to-end smoke tests for the image domain: stage-1 step, stage-2 step,
jitted sampling, and multi-device data parallelism on the virtual CPU mesh
(SURVEY.md §4 items 4-5)."""

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
from ddmi_tpu.domains.image import ImagePipeline


def tiny_config(multiscale=False):
    dd = DDConfig(
        z_channels=32, resolution=32, in_channels=3, out_ch=16, ch=32,
        ch_mult=(1, 2, 4), num_res_blocks=1, hdbf_resolutions=(8, 16),
    )
    mlp = MLPConfig(in_ch=2, out_ch=3, ch=64, latent_dim=16)
    unet = UNetConfig(
        image_size=8, in_channels=8, model_channels=32, out_channels=8,
        num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
        num_head_channels=16,
    )
    ddpm = DDPMConfig(
        timesteps=20, image_size=8, channels=8, sampling_timesteps=5,
        mixed_init=-6.0,
    )
    loss = LossConfig(
        epochs=2, warmup_epochs=1, multiscale=multiscale,
        gradient_accumulate_every=1, sn_reg=True,
    )
    model = ModelConfig(
        embed_dim=8, use_fp16=False, lossconfig=loss, ddconfig=dd,
        mlpconfig=mlp, unetconfig=unet, ddpmconfig=ddpm,
    )
    return Config(model=model, data=DataConfig(test_resolution=32, batch_size=2))


@pytest.fixture(scope="module")
def pipe():
    return ImagePipeline(tiny_config())


def test_stage1_train_step_finite_metrics(pipe, np_rng):
    # smoke only — the actual does-the-loss-DECREASE assertions live in
    # test_learning_signal.py (all domains, stage 1 + stage 2)
    state = pipe.init_stage1(jax.random.PRNGKey(0), steps_per_epoch=4)
    tx = pipe.stage1_optimizer(4)
    x = jnp.asarray(np_rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
    step = jax.jit(lambda s, xx, r: pipe.stage1_train_step(tx, s, xx, r))
    metrics = None
    for i in range(2):
        state, metrics = step(state, x, jax.random.PRNGKey(i + 1))
    assert int(state.step) == 2
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, v)
    assert float(metrics["recon"]) > 0


def test_stage1_reconstruct(pipe, np_rng):
    state = pipe.init_stage1(jax.random.PRNGKey(0), steps_per_epoch=4)
    x = jnp.asarray(np_rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
    img = pipe.reconstruct(state.params, x, resolution=16)
    assert img.shape == (2, 16, 16, 3)
    assert (np.asarray(img) >= 0).all() and (np.asarray(img) <= 1).all()


def test_stage2_train_and_sample(pipe, np_rng):
    s1 = pipe.init_stage1(jax.random.PRNGKey(0), steps_per_epoch=4)
    s2 = pipe.init_stage2(jax.random.PRNGKey(1))
    tx = pipe.stage2_optimizer()
    x = jnp.asarray(np_rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
    step = jax.jit(
        lambda st, p1, xx, r: pipe.stage2_train_step(tx, st, p1, xx, r)
    )
    s2, aux = step(s2, s1.params, x, jax.random.PRNGKey(2))
    assert np.isfinite(float(aux["loss"]))
    # mixing_logit gets gradients (mixed prediction is on)
    assert int(s2.step) == 1

    imgs = jax.jit(
        lambda lp, sp, r: pipe.sample_images(lp, sp, r, batch=2, resolution=16)
    )(s2.ema_params, s1.params, jax.random.PRNGKey(3))
    assert imgs.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(imgs)).all()


@pytest.mark.slow
def test_stage1_multiscale_branch(np_rng):
    pipe = ImagePipeline(tiny_config(multiscale=True))
    state = pipe.init_stage1(jax.random.PRNGKey(0), steps_per_epoch=4)
    tx = pipe.stage1_optimizer(4)
    # multiscale path needs >= 512 input
    x = jnp.asarray(np_rng.uniform(0, 1, (1, 512, 512, 3)).astype(np.float32))
    step = jax.jit(lambda s, xx, r: pipe.stage1_train_step(tx, s, xx, r))
    state, metrics = step(state, x, jax.random.PRNGKey(5))
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_data_parallel_stage2(pipe, np_rng):
    """DP over the 8-device CPU mesh: batch sharded on 'data', params
    replicated; grads all-reduce inside jit via XLA collectives."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ddmi_tpu.parallel.mesh import MeshSpec, make_mesh

    mesh = make_mesh(MeshSpec(data=8))
    s1 = pipe.init_stage1(jax.random.PRNGKey(0), steps_per_epoch=4)
    s2 = pipe.init_stage2(jax.random.PRNGKey(1))
    tx = pipe.stage2_optimizer()

    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P("data"))
    s1_params = jax.device_put(s1.params, repl)
    s2 = jax.device_put(s2, repl)
    x = jax.device_put(
        jnp.asarray(np_rng.uniform(0, 1, (8, 32, 32, 3)).astype(np.float32)),
        data_sh,
    )

    step = jax.jit(
        lambda st, p1, xx, r: pipe.stage2_train_step(tx, st, p1, xx, r),
        in_shardings=(repl, repl, data_sh, repl),
        out_shardings=(repl, repl),
    )
    s2b, aux = step(s2, s1_params, x, jax.device_put(jax.random.PRNGKey(2), repl))
    assert np.isfinite(float(aux["loss"]))
    # params updated identically on every device (replicated output)
    leaf = jax.tree_util.tree_leaves(s2b.params)[0]
    assert leaf.sharding.is_fully_replicated
