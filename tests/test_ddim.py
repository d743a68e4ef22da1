"""Behavioral tests for the scan-based samplers and loss
(diffusion/process.py vs the algebra in ddpm.py:303-369, :409-448)."""

import numpy as np

import jax
import jax.numpy as jnp

from ddmi_tpu.diffusion.process import (
    GaussianDiffusion,
    ddim_sample,
    diffusion_loss,
    mixed_prediction,
    mixing_component,
    p_losses,
    p_sample_loop,
    sample,
)
from ddmi_tpu.diffusion.schedule import make_schedule


def _gd(**kw):
    defaults = dict(
        schedule=make_schedule("linear", 20, 0.0015, 0.0195),
        mixed_prediction=False,
        sampling_timesteps=10,
        ddim_sampling_eta=0.0,
    )
    defaults.update(kw)
    return GaussianDiffusion(**defaults)


def test_ddim_perfect_model_recovers_x0():
    """If the model returns the exact noise for x_t built from a known x0,
    DDIM with eta=0 must walk back to x0 (deterministic update algebra)."""
    gd = _gd()
    sched = gd.schedule
    x0 = jnp.full((2, 4, 4, 1), 0.7)

    def perfect_model(x, t):
        # eps consistent with x = sqrt(acp)x0 + sqrt(1-acp) eps
        acp = sched.alphas_cumprod[t].reshape(-1, 1, 1, 1)
        return (x - jnp.sqrt(acp) * x0) / jnp.sqrt(1 - acp)

    noise = jax.random.normal(jax.random.PRNGKey(0), x0.shape)
    out = ddim_sample(
        gd, perfect_model, None, x0.shape, jax.random.PRNGKey(1), noise=noise
    )
    np.testing.assert_allclose(np.asarray(out), 0.7, atol=1e-4)


def test_ddim_deterministic_given_noise():
    gd = _gd()
    model = lambda x, t: x * 0.1
    noise = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 2))
    a = ddim_sample(gd, model, None, noise.shape, jax.random.PRNGKey(1), noise=noise)
    b = ddim_sample(gd, model, None, noise.shape, jax.random.PRNGKey(2), noise=noise)
    # eta=0: no stochasticity, result depends only on init noise
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_ancestral_sampler_runs():
    gd = _gd(sampling_timesteps=20)  # == T -> ancestral path
    assert not gd.is_ddim_sampling
    model = lambda x, t: jnp.zeros_like(x)
    out = sample(gd, model, None, (2, 4, 4, 1), jax.random.PRNGKey(0))
    assert out.shape == (2, 4, 4, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_mixed_prediction_blend():
    logit = jnp.array([[[[0.0]]]])  # sigmoid -> 0.5
    out = jnp.ones((1, 2, 2, 1))
    mix = jnp.full((1, 2, 2, 1), 3.0)
    blended = mixed_prediction(out, logit, mix)
    np.testing.assert_allclose(np.asarray(blended), 2.0)  # 0.5*3 + 0.5*1

    # strongly negative logit (mixed_init=-6) ~ mixing component dominant
    blended = mixed_prediction(out, jnp.full((1, 1, 1, 1), -20.0), mix)
    np.testing.assert_allclose(np.asarray(blended), 3.0, atol=1e-6)


def test_mixing_component_value():
    gd = _gd()
    x = jnp.ones((2, 2, 2, 1))
    t = jnp.array([0, 19])
    mc = mixing_component(gd.schedule, x, t)
    s = np.asarray(gd.schedule.sqrt_one_minus_alphas_cumprod)
    np.testing.assert_allclose(np.asarray(mc)[0], s[0], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(mc)[1], s[19], rtol=1e-6)


def test_p_losses_zero_for_perfect_eps_model():
    gd = _gd()
    x0 = jax.random.normal(jax.random.PRNGKey(0), (4, 4, 4, 2))
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t = jnp.array([1, 5, 10, 19])
    loss, aux = p_losses(gd, lambda x, tt: noise, None, x0, t, noise)
    np.testing.assert_allclose(float(loss), 0.0, atol=1e-10)
    assert set(aux) == {"loss_simple", "loss_vlb", "loss"}


def test_p_losses_x0_and_v_params():
    for param in ("x0", "v"):
        gd = _gd(parameterization=param)
        x0 = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 1))
        noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
        t = jnp.array([3, 15])
        loss, _ = p_losses(gd, lambda x, tt: noise, None, x0, t, noise)
        assert np.isfinite(float(loss))


def test_diffusion_loss_with_mixing():
    gd = _gd(mixed_prediction=True)
    mixing_logit = jnp.full((1, 1, 1, 2), -6.0)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (4, 4, 4, 2))
    loss, aux = diffusion_loss(
        gd, lambda x, t: jnp.zeros_like(x), mixing_logit, x0, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(loss))


def test_x0_loss_is_weighted_eps_loss():
    """The reference's x0 'parameterization' still trains the RAW output as
    eps: p_losses maps the output through predict_start_from_noise before
    comparing to x_start (ddpm.py:420-421), and with
    x_t = sqrt_acp*x0 + sqrt(1-acp)*noise the residual is algebraically
    sqrt_recipm1_acp(t) * (raw_out - noise).  This identity is what makes the
    eps-style sampling path correct for x0-trained models (see
    _check_sampling_parameterization)."""
    gd = _gd(parameterization="x0")
    x0 = jax.random.normal(jax.random.PRNGKey(0), (3, 4, 4, 2))
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    raw_out = jax.random.normal(jax.random.PRNGKey(2), x0.shape)
    t = jnp.array([2, 9, 17])
    _, aux = p_losses(gd, lambda x, tt: raw_out, None, x0, t, noise)
    w = np.asarray(gd.schedule.sqrt_recipm1_alphas_cumprod)[np.asarray(t)]
    expected = np.mean(
        (w[:, None, None, None] * np.asarray(raw_out - noise)) ** 2,
        axis=(1, 2, 3),
    ).mean()
    np.testing.assert_allclose(float(aux["loss_simple"]), expected, rtol=1e-5)


def test_x0_sampling_matches_eps_path():
    """x0-trained models sample through the identical eps path (their raw
    output IS an eps prediction — see test above); unknown parameterizations
    refuse loudly."""
    import pytest

    model = lambda x, t: x * 0.1
    out_eps = ddim_sample(
        _gd(parameterization="eps"), model, None, (1, 4, 4, 1),
        jax.random.PRNGKey(0),
    )
    out_x0 = ddim_sample(
        _gd(parameterization="x0"), model, None, (1, 4, 4, 1),
        jax.random.PRNGKey(0),
    )
    np.testing.assert_array_equal(np.asarray(out_eps), np.asarray(out_x0))

    gd_bad = _gd(parameterization="mu")
    with pytest.raises(NotImplementedError, match="parameterization"):
        ddim_sample(gd_bad, model, None, (1, 4, 4, 1), jax.random.PRNGKey(0))
    with pytest.raises(NotImplementedError, match="parameterization"):
        p_sample_loop(gd_bad, model, None, (1, 4, 4, 1), jax.random.PRNGKey(0))


def test_samplers_jit_compile():
    gd = _gd()
    model = lambda x, t: x * 0.0

    @jax.jit
    def run(rng):
        return ddim_sample(gd, model, None, (1, 4, 4, 1), rng)

    out = run(jax.random.PRNGKey(0))
    assert out.shape == (1, 4, 4, 1)
