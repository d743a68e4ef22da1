"""Tests for MDTv2, GAN losses, DiffAugment, FVD preprocessing."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddmi_tpu.core.config import DiTConfig
from ddmi_tpu.losses.diffaugment import diff_augment
from ddmi_tpu.losses.gan import GANLoss2D, NLayerDiscriminator, hinge_d_loss
from ddmi_tpu.nn.mdt import MDTv2, _rel_pos_index


def tiny_dit(**kw):
    base = dict(
        input_size=8, patch_size=2, in_channels=4, hidden_size=32, depth=4,
        num_heads=4, mlp_ratio=2.0, mask_ratio=None, decode_layer=2,
    )
    base.update(kw)
    return DiTConfig(**base)


def test_rel_pos_index_shape():
    idx = _rel_pos_index(4, 4)
    assert idx.shape == (16, 16)
    assert idx.max() < 7 * 7
    assert (np.diag(idx) == idx[0, 0]).all()  # same relative offset (0,0)


def test_mdt_unmasked_forward(np_rng):
    cfg = tiny_dit()
    model = MDTv2(cfg)
    x = jnp.asarray(np_rng.standard_normal((2, 8, 8, 4)).astype(np.float32))
    t = jnp.array([1, 10])
    params = model.init(jax.random.PRNGKey(0), x, t)
    out = model.apply(params, x, t)
    assert out.shape == (2, 8, 8, 4)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)  # zero-init


def test_mdt_masked_training_path(np_rng):
    cfg = tiny_dit(mask_ratio=0.3)
    model = MDTv2(cfg)
    x = jnp.asarray(np_rng.standard_normal((2, 8, 8, 4)).astype(np.float32))
    t = jnp.array([1, 10])
    params = model.init(
        jax.random.PRNGKey(0), x, t, enable_mask=True,
        rng=jax.random.PRNGKey(1),
    )
    out = model.apply(
        params, x, t, enable_mask=True, rng=jax.random.PRNGKey(2)
    )
    assert out.shape == (2, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()
    # eval path with same params
    out_eval = model.apply(params, x, t, enable_mask=False)
    assert out_eval.shape == (2, 8, 8, 4)


def test_mdt_cross_plane(np_rng):
    cfg = tiny_dit(cross_plane=True)
    model = MDTv2(cfg)
    x = jnp.asarray(np_rng.standard_normal((1, 8, 8, 12)).astype(np.float32))
    t = jnp.array([5])
    params = model.init(jax.random.PRNGKey(0), x, t)
    out = model.apply(params, x, t)
    assert out.shape == (1, 8, 8, 12)


def test_discriminator_and_gan_loss(np_rng):
    x = jnp.asarray(np_rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
    r = jnp.asarray(np_rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
    disc = NLayerDiscriminator()
    params = disc.init(jax.random.PRNGKey(0), x)
    logits, feats = disc.apply(params, x)
    assert logits.shape[0] == 2 and logits.shape[-1] == 1
    assert len(feats) == 5

    gan = GANLoss2D()
    # scale-conditioned variant: the cond channel is part of the disc input,
    # so init must see it too (reference sizes disc_in_channels accordingly)
    gparams = gan.init(jax.random.PRNGKey(1), x, r, True, cond=1.0)
    g_loss = gan.apply(gparams, x, r, True, cond=0.5)
    d_loss = gan.apply(gparams, x, r, False, cond=0.5)
    assert np.isfinite(float(g_loss)) and np.isfinite(float(d_loss))


def test_hinge_loss_values():
    real = jnp.array([2.0, 2.0])
    fake = jnp.array([-2.0, -2.0])
    assert float(hinge_d_loss(real, fake)) == 0.0  # perfectly separated
    assert float(hinge_d_loss(-real, -fake)) == pytest.approx(3.0)


def test_diff_augment_shapes(np_rng):
    x = jnp.asarray(np_rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32))
    out = diff_augment(x, jax.random.PRNGKey(0))
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
    # cutout zeroes a region
    from ddmi_tpu.losses.diffaugment import rand_cutout

    cut = rand_cutout(jnp.ones((1, 16, 16, 3)), jax.random.PRNGKey(1))
    assert float(cut.mean()) < 1.0


def test_fvd_preprocess(np_rng):
    from ddmi_tpu.evals.fvd import preprocess_video

    v = jnp.asarray(np_rng.uniform(0, 1, (1, 4, 32, 32, 3)).astype(np.float32))
    out = preprocess_video(v)
    assert out.shape == (1, 4, 224, 224, 3)
    assert float(out.min()) >= -1.001 and float(out.max()) <= 1.001
