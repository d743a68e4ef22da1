"""Learning-signal tests: each domain's stage-1 and stage-2 losses must
actually DECREASE when overfitting a fixed tiny batch (VERDICT round-2 item
2 — a sign-flipped KL/LPIPS/recon term in any domain must fail the suite,
not just produce finite numbers).  Occupancy/ONet already have this
(test_occupancy.py, test_onet.py); these cover image, video, and NeRF.

Protocol per test: fixed batch, fixed per-step rngs, N jitted steps (one
compile, cheap replays), compare the mean of the first few losses against
the mean of the last few — robust to step-to-step sampling noise."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_image_pipeline import tiny_config as tiny_image_config
from test_nerf import tiny_nerf_config
from test_video import tiny_video_config

from ddmi_tpu.data.nerf import SyntheticNeRF


def _tune(cfg, lr=2e-3):
    """Overfit-friendly knobs: no warmup (the builders ship warmup_epochs=1,
    which would spend the whole short run ramping lr) and a higher lr."""
    object.__setattr__(cfg.model, "lr", lr)
    object.__setattr__(cfg.model.lossconfig, "warmup_epochs", 0)
    return cfg


def _run_steps(step_fn, state, n, *args, fixed_rng=False):
    """n steps; returns (state, list of per-step metric dicts).

    fixed_rng=True repeats ONE rng every step, freezing the sampled
    timesteps/noise/rays into a deterministic regression problem — the
    sharpest 'does the gradient point downhill' check (stage-2's fresh
    (t, eps) draw per step needs far more than 30 steps to visibly lower
    the expected loss, but a sign-flipped term still fails the frozen
    version immediately)."""
    history = []
    for i in range(n):
        rng = jax.random.PRNGKey(7 if fixed_rng else 100 + i)
        state, metrics = step_fn(state, *args, rng)
        history.append({k: float(v) for k, v in metrics.items()})
    return state, history


def _assert_decreases(history, key, factor, context=""):
    head = np.mean([h[key] for h in history[:3]])
    tail = np.mean([h[key] for h in history[-3:]])
    assert np.isfinite(tail), (context, key, tail)
    assert tail < factor * head, (context, key, head, tail)
    return head, tail


# --- image ------------------------------------------------------------------


@pytest.fixture(scope="module")
def image_pipe():
    from ddmi_tpu.domains.image import ImagePipeline

    return ImagePipeline(_tune(tiny_image_config()))


def test_image_stage1_loss_decreases_and_psnr_rises(image_pipe, np_rng):
    pipe = image_pipe
    x = jnp.asarray(np_rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
    state = pipe.init_stage1(jax.random.PRNGKey(0), steps_per_epoch=10_000)
    tx = pipe.stage1_optimizer(10_000)
    step = jax.jit(lambda s, xx, r: pipe.stage1_train_step(tx, s, xx, r))

    def psnr(params):
        img = np.asarray(pipe.reconstruct(params, x, resolution=32))
        mse = float(((img - np.asarray(x)) ** 2).mean())
        return -10 * np.log10(mse + 1e-12)

    p0 = psnr(state.params)
    state, hist = _run_steps(step, state, 30, x)
    _assert_decreases(hist, "recon", 0.85, "image s1")
    _assert_decreases(hist, "loss", 0.9, "image s1")
    assert psnr(state.params) > p0 + 0.5, (p0, psnr(state.params))


def _stage2_tx(pipe):
    """The pipeline's own stage-2 optimizer at an overfit-friendly lr (the
    zero-init output conv needs ~60 steps x 2e-2 AdamW to reach eps-scale
    outputs; measured: image s2 loss 0.99 -> 0.16)."""
    object.__setattr__(pipe.cfg.model, "lr", 2e-2)
    return pipe.stage2_optimizer()


def test_image_stage2_loss_decreases(image_pipe, np_rng):
    pipe = image_pipe
    x = jnp.asarray(np_rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
    s1 = pipe.init_stage1(jax.random.PRNGKey(0), steps_per_epoch=8)
    s2 = pipe.init_stage2(jax.random.PRNGKey(1))
    tx = _stage2_tx(pipe)
    step = jax.jit(
        lambda st, xx, r: pipe.stage2_train_step(tx, st, s1.params, xx, r)
    )
    s2, hist = _run_steps(step, s2, 60, x, fixed_rng=True)
    _assert_decreases(hist, "loss", 0.7, "image s2")


# --- video ------------------------------------------------------------------


@pytest.fixture(scope="module")
def video_pipe():
    from ddmi_tpu.domains.video import VideoPipeline

    return VideoPipeline(_tune(tiny_video_config()))


def test_video_stage1_loss_decreases(video_pipe, np_rng):
    pipe = video_pipe
    x = jnp.asarray(
        np_rng.uniform(0, 1, (2, 4, 32, 32, 3)).astype(np.float32)
    )
    state = pipe.init_stage1(jax.random.PRNGKey(0), steps_per_epoch=10_000)
    tx = pipe.stage1_optimizer(10_000)
    step = jax.jit(lambda s, xx, r: pipe.stage1_train_step(tx, s, xx, r))
    state, hist = _run_steps(step, state, 30, x)
    _assert_decreases(hist, "recon", 0.85, "video s1")
    _assert_decreases(hist, "loss", 0.9, "video s1")


def test_video_stage2_loss_decreases(video_pipe, np_rng):
    pipe = video_pipe
    x = jnp.asarray(
        np_rng.uniform(0, 1, (2, 4, 32, 32, 3)).astype(np.float32)
    )
    s1 = pipe.init_stage1(jax.random.PRNGKey(0), steps_per_epoch=8)
    s2 = pipe.init_stage2(jax.random.PRNGKey(1))
    tx = _stage2_tx(pipe)
    step = jax.jit(
        lambda st, xx, r: pipe.stage2_train_step(tx, st, s1.params, xx, r)
    )
    s2, hist = _run_steps(step, s2, 60, x, fixed_rng=True)
    _assert_decreases(hist, "loss", 0.7, "video s2")


# --- nerf -------------------------------------------------------------------


@pytest.fixture(scope="module")
def nerf_pipe():
    from ddmi_tpu.domains.nerf import NeRFPipeline

    return NeRFPipeline(_tune(tiny_nerf_config(), lr=1e-3))


@pytest.fixture(scope="module")
def nerf_batch():
    return {k: jnp.asarray(v) for k, v in next(iter(SyntheticNeRF())).items()}


def test_nerf_stage1_loss_decreases(nerf_pipe, nerf_batch):
    pipe = nerf_pipe
    state = pipe.init_stage1(jax.random.PRNGKey(0), steps_per_epoch=10_000)
    tx = pipe.stage1_optimizer(10_000)
    step = jax.jit(lambda s, b, r: pipe.stage1_train_step(tx, s, b, r))
    state, hist = _run_steps(step, state, 30, nerf_batch, fixed_rng=True)
    _assert_decreases(hist, "recon", 0.9, "nerf s1")
    _assert_decreases(hist, "loss", 0.95, "nerf s1")


def test_nerf_stage2_loss_decreases(nerf_pipe, nerf_batch):
    pipe = nerf_pipe
    s1 = pipe.init_stage1(jax.random.PRNGKey(0), steps_per_epoch=8)
    s2 = pipe.init_stage2(jax.random.PRNGKey(1))
    tx = _stage2_tx(pipe)
    step = jax.jit(
        lambda st, b, r: pipe.stage2_train_step(tx, st, s1.params, b, r)
    )
    s2, hist = _run_steps(step, s2, 60, nerf_batch, fixed_rng=True)
    _assert_decreases(hist, "loss", 0.7, "nerf s2")
