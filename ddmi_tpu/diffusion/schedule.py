"""Noise schedules for Gaussian diffusion.

All schedule quantities are precomputed in float64 on host (numpy) and stored
as a single immutable pytree of float32 arrays — the TPU-native analogue of the
reference's registered torch buffers (diffusion/ddpm.py:163-217).  Everything
downstream indexes these arrays with traced integer timesteps inside jit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


def make_beta_schedule(
    schedule: str,
    n_timestep: int,
    linear_start: float = 1e-4,
    linear_end: float = 2e-2,
    cosine_s: float = 8e-3,
) -> np.ndarray:
    """Beta schedules matching diffusion/ddpm.py:37-59 semantics exactly
    (float64 intermediate math, same parameterizations)."""
    if schedule == "linear":
        betas = (
            np.linspace(
                linear_start**0.5, linear_end**0.5, n_timestep, dtype=np.float64
            )
            ** 2
        )
    elif schedule == "cosine":
        timesteps = (
            np.arange(n_timestep + 1, dtype=np.float64) / n_timestep + cosine_s
        )
        alphas = timesteps / (1 + cosine_s) * np.pi / 2
        alphas = np.cos(alphas) ** 2
        alphas = alphas / alphas[0]
        betas = 1 - alphas[1:] / alphas[:-1]
        betas = np.clip(betas, a_min=0, a_max=0.999)
    elif schedule == "sqrt_linear":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64)
    elif schedule == "sqrt":
        betas = (
            np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64) ** 0.5
        )
    else:
        raise ValueError(f"schedule '{schedule}' unknown.")
    return betas


class DiffusionSchedule(NamedTuple):
    """Precomputed diffusion moments; one float32 array of shape (T,) each.

    Mirrors the buffer set registered at diffusion/ddpm.py:182-216.
    """

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    lvlb_weights: jnp.ndarray

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]


def make_schedule(
    beta_schedule: str = "linear",
    timesteps: int = 1000,
    linear_start: float = 1e-4,
    linear_end: float = 2e-2,
    cosine_s: float = 8e-3,
    v_posterior: float = 0.0,
    parameterization: str = "eps",
    given_betas: np.ndarray | None = None,
) -> DiffusionSchedule:
    betas = (
        np.asarray(given_betas, dtype=np.float64)
        if given_betas is not None
        else make_beta_schedule(
            beta_schedule, timesteps, linear_start, linear_end, cosine_s
        )
    )
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])

    posterior_variance = (1 - v_posterior) * betas * (
        1.0 - alphas_cumprod_prev
    ) / (1.0 - alphas_cumprod) + v_posterior * betas

    if parameterization == "eps":
        # posterior_variance[0] == 0; index 0 is overwritten below (ddpm.py:215)
        with np.errstate(divide="ignore"):
            lvlb_weights = betas**2 / (
                2 * posterior_variance * alphas * (1 - alphas_cumprod)
            )
    elif parameterization in ("x0", "v"):
        # NB: reproduces the reference's (buggy-looking but shipped) expression
        # `0.5 * sqrt(acp) / (2. * 1 - acp)` at ddpm.py:209-211.
        lvlb_weights = 0.5 * np.sqrt(alphas_cumprod) / (2.0 * 1 - alphas_cumprod)
    else:
        raise NotImplementedError(parameterization)
    lvlb_weights = np.asarray(lvlb_weights)
    lvlb_weights[0] = lvlb_weights[1]
    assert not np.isnan(lvlb_weights).any()

    f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
    return DiffusionSchedule(
        betas=f32(betas),
        alphas_cumprod=f32(alphas_cumprod),
        alphas_cumprod_prev=f32(alphas_cumprod_prev),
        sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
        log_one_minus_alphas_cumprod=f32(np.log(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod - 1)),
        posterior_variance=f32(posterior_variance),
        posterior_log_variance_clipped=f32(
            np.log(np.maximum(posterior_variance, 1e-20))
        ),
        posterior_mean_coef1=f32(
            betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        ),
        posterior_mean_coef2=f32(
            (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
        ),
        lvlb_weights=f32(lvlb_weights),
    )


def ddim_times(num_timesteps: int, sampling_timesteps: int) -> np.ndarray:
    """DDIM (time, time_next) pairs, matching ddpm.py:338-340: descending pairs
    from linspace(-1, T-1, S+1).  Returns int32 array of shape (S, 2)."""
    times = np.linspace(-1, num_timesteps - 1, sampling_timesteps + 1)
    times = list(reversed(times.astype(int).tolist()))
    pairs = np.array(list(zip(times[:-1], times[1:])), dtype=np.int32)
    return pairs
