"""Numerical bound on the amp (bf16-compute) policy, per domain.

VERDICT round 4, item 6: amp's correctness evidence was a single finite-loss
check.  These tests bound it: one train step with `model.amp=True` vs
`amp=False` on IDENTICAL initial params, data, and rng must produce losses
within a stated relative tolerance — i.e. bf16 compute (core/amp.py: bf16
params/activations on the MXU, fp32 master params, fp32 loss reductions)
changes the loss by rounding, not by semantics.

Tolerance: bf16 keeps 8 mantissa bits (~0.4% per rounding); across a full
VAE/INR forward the observed gaps on these tiny configs are <1%, so 5% is a
loose-but-meaningful bound that will catch a dtype bug (a fp16 overflow, a
coordinate cast, a reduction in bf16) while never flaking on rounding.

These tests caught a REAL bug when first written (round 5): random draws
that followed their operand's dtype (posterior sample, StyleGAN noise
injection) produced a *different realization* in bf16 — amp was a
re-randomization, not a rounding perturbation (image-s1 loss gap 10.6%,
gradient cosine 0.84).  Fixed by drawing noise in fp32 and casting
(nn/distributions.py::sample, nn/stylegan.py::NoiseInjection — matching
the reference, whose torch.randn stays fp32 under autocast); post-fix the
image-s1 gap is 0.04% and the gradient cosine 0.994.

The reference's analogue is torch fp16 autocast + GradScaler
(tools/d2c_vae/image.py:29-33, :184); our policy deliberately differs (bf16
needs no loss scaling; reductions stay fp32) — these tests are the numeric
evidence that the policy is sound, not a parity check against torch.
"""

import dataclasses
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))

REL_TOL = 0.05


def _with_amp(cfg, amp: bool):
    return dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, amp=amp)
    )


def _assert_close(loss_fp32: float, loss_amp: float):
    assert np.isfinite(loss_fp32) and np.isfinite(loss_amp), (
        loss_fp32,
        loss_amp,
    )
    gap = abs(loss_amp - loss_fp32) / max(1.0, abs(loss_fp32))
    assert gap <= REL_TOL, (
        f"amp loss {loss_amp} vs fp32 loss {loss_fp32}: relative gap "
        f"{gap:.4f} > {REL_TOL}"
    )


def test_amp_parity_image_s1(np_rng):
    from test_wiring import tiny_cfg

    from ddmi_tpu.domains.image import ImagePipeline

    x = jnp.asarray(np_rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
    losses = {}
    for amp in (False, True):
        pipe = ImagePipeline(_with_amp(tiny_cfg(), amp))
        state = pipe.init_stage1(jax.random.PRNGKey(0), steps_per_epoch=2)
        tx = pipe.stage1_optimizer(2)
        _, m = jax.jit(lambda s, xx, r: pipe.stage1_train_step(tx, s, xx, r))(
            state, x, jax.random.PRNGKey(1)
        )
        losses[amp] = float(m["loss"])
    _assert_close(losses[False], losses[True])


def test_amp_gradient_direction_image_s1(np_rng):
    """The amp gradient must point where the fp32 gradient points: cosine
    >= 0.97 and norm ratio within 5% at identical params/data/rng.  (The
    training-quality currency for mixed precision — a loss can agree while
    gradients rot.  Measured 0.994 / 0.998 post noise-dtype fix; 0.84 /
    0.80 before it.)"""
    from test_wiring import tiny_cfg

    from ddmi_tpu.domains.image import ImagePipeline

    x = jnp.asarray(np_rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
    pipe32 = ImagePipeline(_with_amp(tiny_cfg(), False))
    pipe_a = ImagePipeline(_with_amp(tiny_cfg(), True))
    st = pipe32.init_stage1(jax.random.PRNGKey(0), steps_per_epoch=2)

    def grad_of(pipe):
        return jax.jit(
            jax.grad(
                lambda p: pipe.stage1_loss(
                    p, st.sn_state, x, jax.random.PRNGKey(1), st.step
                )[0]
            )
        )(st.params)

    def flat(tree):
        return jnp.concatenate(
            [jnp.ravel(l) for l in jax.tree_util.tree_leaves(tree)]
        )

    a, b = flat(grad_of(pipe32)), flat(grad_of(pipe_a))
    cos = float(jnp.vdot(a, b) / (jnp.linalg.norm(a) * jnp.linalg.norm(b)))
    ratio = float(jnp.linalg.norm(b) / jnp.linalg.norm(a))
    assert cos >= 0.97, f"amp gradient cosine {cos:.4f} < 0.97"
    assert 0.95 <= ratio <= 1.05, f"amp gradient norm ratio {ratio:.4f}"


def test_amp_parity_occupancy_s1():
    from test_occupancy import tiny_occ_config

    from ddmi_tpu.data.shapenet import SyntheticOccupancy
    from ddmi_tpu.domains.occupancy import OccupancyPipeline

    batch = next(iter(SyntheticOccupancy(2, n_points=64, n_cloud=128)))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    losses = {}
    for amp in (False, True):
        pipe = OccupancyPipeline(_with_amp(tiny_occ_config(), amp))
        state = pipe.init_stage1(jax.random.PRNGKey(0), steps_per_epoch=2)
        tx = pipe.stage1_optimizer(2)
        _, m = jax.jit(lambda s, b, r: pipe.stage1_train_step(tx, s, b, r))(
            state, batch, jax.random.PRNGKey(1)
        )
        losses[amp] = float(m["loss"])
    _assert_close(losses[False], losses[True])


def test_amp_parity_nerf_s1():
    from test_nerf import tiny_nerf_config

    from ddmi_tpu.data.nerf import SyntheticNeRF
    from ddmi_tpu.domains.nerf import NeRFPipeline

    batch = next(iter(SyntheticNeRF(batch_size=1)))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    losses = {}
    for amp in (False, True):
        pipe = NeRFPipeline(_with_amp(tiny_nerf_config(), amp))
        state = pipe.init_stage1(jax.random.PRNGKey(0), steps_per_epoch=2)
        tx = pipe.stage1_optimizer(2)
        _, m = jax.jit(lambda s, b, r: pipe.stage1_train_step(tx, s, b, r))(
            state, batch, jax.random.PRNGKey(1)
        )
        losses[amp] = float(m["loss"])
    _assert_close(losses[False], losses[True])


def test_amp_parity_video_s2(np_rng):
    """Stage-2: amp casts the frozen stage-1 encoder AND the TriplaneUNet
    denoiser forward (fp32 diffusion/schedule math either way)."""
    from test_video import tiny_video_config

    from ddmi_tpu.domains.video import VideoPipeline

    x = jnp.asarray(
        np_rng.uniform(0, 1, (2, 4, 32, 32, 3)).astype(np.float32)
    )
    losses = {}
    for amp in (False, True):
        pipe = VideoPipeline(_with_amp(tiny_video_config(), amp))
        s1 = pipe.init_stage1(jax.random.PRNGKey(0), steps_per_epoch=2)
        s2 = pipe.init_stage2(jax.random.PRNGKey(1))
        tx = pipe.stage2_optimizer()
        _, m = jax.jit(
            lambda s, p1, xx, r: pipe.stage2_train_step(tx, s, p1, xx, r)
        )(s2, s1.params, x, jax.random.PRNGKey(2))
        losses[amp] = float(m["loss"])
    _assert_close(losses[False], losses[True])
