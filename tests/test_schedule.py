"""Unit tests for diffusion schedules — golden values against hand-computed
formulas from diffusion/ddpm.py:163-217 and torch reference math on CPU."""

import numpy as np
import pytest

from ddmi_tpu.diffusion.schedule import ddim_times, make_beta_schedule, make_schedule


def test_linear_schedule_endpoints():
    betas = make_beta_schedule("linear", 1000, linear_start=0.0015, linear_end=0.0195)
    assert betas.shape == (1000,)
    np.testing.assert_allclose(betas[0], 0.0015, rtol=1e-12)
    np.testing.assert_allclose(betas[-1], 0.0195, rtol=1e-12)
    # linear in sqrt space: sqrt(betas) is affine
    s = np.sqrt(betas)
    diffs = np.diff(s)
    np.testing.assert_allclose(diffs, diffs[0], rtol=1e-8)


def test_cosine_schedule_properties():
    betas = make_beta_schedule("cosine", 100)
    assert (betas > 0).all() and (betas <= 0.999).all()
    assert betas[-1] == pytest.approx(0.999)


@pytest.mark.parametrize("name", ["linear", "cosine", "sqrt_linear", "sqrt"])
def test_schedule_moments_identities(name):
    sched = make_schedule(name, 100, 0.0015, 0.0195)
    acp = np.asarray(sched.alphas_cumprod, dtype=np.float64)
    np.testing.assert_allclose(
        np.asarray(sched.sqrt_alphas_cumprod), np.sqrt(acp), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(sched.sqrt_one_minus_alphas_cumprod),
        np.sqrt(1 - acp),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(sched.sqrt_recipm1_alphas_cumprod),
        np.sqrt(1 / acp - 1),
        rtol=1e-4,
    )
    # posterior mean coefs sum identity: coef1*sqrt(acp_prev_ratio)... sanity:
    # q_posterior(x0=x, xt=x) has mean x at every t when x constant:
    c1 = np.asarray(sched.posterior_mean_coef1, dtype=np.float64)
    c2 = np.asarray(sched.posterior_mean_coef2, dtype=np.float64)
    betas = np.asarray(sched.betas, dtype=np.float64)
    alphas = 1 - betas
    acp_prev = np.asarray(sched.alphas_cumprod_prev, dtype=np.float64)
    np.testing.assert_allclose(
        c1, betas * np.sqrt(acp_prev) / (1 - acp), rtol=1e-4
    )
    np.testing.assert_allclose(
        c2, (1 - acp_prev) * np.sqrt(alphas) / (1 - acp), rtol=1e-4
    )


def test_lvlb_weights_eps():
    sched = make_schedule("linear", 50, 0.0015, 0.0195, parameterization="eps")
    w = np.asarray(sched.lvlb_weights)
    assert np.isfinite(w).all()
    assert w[0] == w[1]  # ddpm.py:215


def test_ddim_times_pairs():
    # matches ddpm.py:338-340 construction
    pairs = ddim_times(1000, 50)
    assert pairs.shape == (50, 2)
    assert pairs[0, 0] == 999
    assert pairs[-1, 1] == -1
    # strictly decreasing, contiguous pairing
    assert (pairs[:, 0] > pairs[:, 1]).all()
    assert (pairs[1:, 0] == pairs[:-1, 1]).all()

    # full-step DDIM degenerates to all timesteps
    pairs = ddim_times(10, 10)
    assert list(pairs[:, 0]) == list(range(9, -1, -1))


def test_q_sample_golden():
    import jax.numpy as jnp

    from ddmi_tpu.diffusion.process import q_sample

    sched = make_schedule("linear", 10, 0.1, 0.2)
    x0 = jnp.ones((2, 3, 3, 1))
    noise = jnp.full((2, 3, 3, 1), 0.5)
    t = jnp.array([0, 9])
    out = q_sample(sched, x0, t, noise)
    acp = np.asarray(sched.alphas_cumprod)
    for i, ti in enumerate([0, 9]):
        expect = np.sqrt(acp[ti]) * 1.0 + np.sqrt(1 - acp[ti]) * 0.5
        np.testing.assert_allclose(np.asarray(out)[i], expect, rtol=1e-5)


def test_predict_start_roundtrip():
    import jax
    import jax.numpy as jnp

    from ddmi_tpu.diffusion.process import predict_start_from_noise, q_sample

    sched = make_schedule("linear", 100, 0.0015, 0.0195)
    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    x0 = jax.random.normal(k1, (4, 8, 8, 2))
    noise = jax.random.normal(k2, (4, 8, 8, 2))
    t = jnp.array([0, 10, 50, 99])
    xt = q_sample(sched, x0, t, noise)
    x0_rec = predict_start_from_noise(sched, xt, t, noise)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=2e-4)
