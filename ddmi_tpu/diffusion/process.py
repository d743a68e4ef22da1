"""Gaussian diffusion process: q/p transitions, training losses, and samplers.

TPU-native redesign of the reference DDPM class (diffusion/ddpm.py:76-477):

  * Everything here is a *pure function* of (schedule, params, rng, data); the
    denoiser is passed in as a callable `model_fn(x, t) -> out` closure.
  * The ancestral and DDIM sampling loops are `lax.scan`s over precomputed
    timestep arrays — one compiled program instead of the reference's Python
    for-loops with tqdm (ddpm.py:293, :348).
  * "Mixed prediction" (learned per-channel blend of the model output with
    sqrt(1-acp)*x_t, ddpm.py:152-161, :469-477) is a parameter `mixing_logit`
    threaded explicitly.
  * The data-dependent `time_next < 0` branch of DDIM (ddpm.py:353-355)
    becomes a static-shape `jnp.where` select.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ddmi_tpu.diffusion.schedule import DiffusionSchedule, ddim_times, make_schedule
from ddmi_tpu.ops.pallas import attention as vmem_attn

ModelFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def extract(a: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Index a (T,) schedule array with per-sample timesteps t (b,), broadcast
    to an ndim-dimensional batch shape (reference extract_into_tensor,
    ddpm.py:61-64)."""
    out = a[t]
    return out.reshape(out.shape[0], *((1,) * (ndim - 1)))


def q_sample(
    sched: DiffusionSchedule, x_start: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray
) -> jnp.ndarray:
    """Forward diffusion q(x_t | x_0) sample (ddpm.py:383-386)."""
    nd = x_start.ndim
    return (
        extract(sched.sqrt_alphas_cumprod, t, nd) * x_start
        + extract(sched.sqrt_one_minus_alphas_cumprod, t, nd) * noise
    )


def predict_start_from_noise(sched, x_t, t, noise):
    nd = x_t.ndim
    return (
        extract(sched.sqrt_recip_alphas_cumprod, t, nd) * x_t
        - extract(sched.sqrt_recipm1_alphas_cumprod, t, nd) * noise
    )


def predict_noise_from_start(sched, x_t, t, x0):
    nd = x_t.ndim
    return (
        extract(sched.sqrt_recip_alphas_cumprod, t, nd) * x_t - x0
    ) / extract(sched.sqrt_recipm1_alphas_cumprod, t, nd)


def get_velocity(sched, sample, noise, t):
    """Reference's (nonstandard) velocity: sqrt(acp)*noise - sqrt(1-acp)*sample
    (ddpm.py:219-221)."""
    nd = sample.ndim
    return (
        extract(sched.sqrt_alphas_cumprod, t, nd) * noise
        - extract(sched.sqrt_one_minus_alphas_cumprod, t, nd) * sample
    )


def q_posterior(sched, x_start, x_t, t):
    nd = x_t.ndim
    mean = (
        extract(sched.posterior_mean_coef1, t, nd) * x_start
        + extract(sched.posterior_mean_coef2, t, nd) * x_t
    )
    var = extract(sched.posterior_variance, t, nd)
    log_var = extract(sched.posterior_log_variance_clipped, t, nd)
    return mean, var, log_var


def mixing_component(sched, x_noisy, t):
    """sqrt(1-acp_t) * x_t (ddpm.py:476-477)."""
    return extract(sched.sqrt_one_minus_alphas_cumprod, t, x_noisy.ndim) * x_noisy


def mixed_prediction(
    model_out: jnp.ndarray,
    mixing_logit: Optional[jnp.ndarray],
    mix_comp: jnp.ndarray,
) -> jnp.ndarray:
    """coeff = sigmoid(logit); (1-coeff)*mix + coeff*out (ddpm.py:469-474).

    mixing_logit broadcasts over batch/space; reference stores (1,C,1,1) NCHW —
    here it is (1,1,1,C) for NHWC planes or (1,1,C) for token layouts."""
    if mixing_logit is None:
        return model_out
    coeff = jax.nn.sigmoid(mixing_logit)
    return (1 - coeff) * mix_comp + coeff * model_out


@dataclasses.dataclass(frozen=True)
class GaussianDiffusion:
    """Static diffusion configuration + schedule bundle.

    Construct once per run; all methods are jit-safe pure functions."""

    schedule: DiffusionSchedule
    parameterization: str = "eps"
    loss_type: str = "l2"
    mixed_prediction: bool = True
    sampling_timesteps: int = 50
    ddim_sampling_eta: float = 0.0
    original_elbo_weight: float = 0.0
    l_simple_weight: float = 1.0
    clip_denoised: bool = False
    w: float = 1.0  # CFG guidance weight

    @classmethod
    def from_config(cls, c) -> "GaussianDiffusion":
        sched = make_schedule(
            beta_schedule=c.beta_schedule,
            timesteps=c.timesteps,
            linear_start=c.linear_start,
            linear_end=c.linear_end,
            cosine_s=c.cosine_s,
            v_posterior=c.v_posterior,
            parameterization=c.parameterization,
        )
        return cls(
            schedule=sched,
            parameterization=c.parameterization,
            loss_type=c.loss_type,
            mixed_prediction=c.mixed_prediction,
            sampling_timesteps=c.sampling_timesteps,
            ddim_sampling_eta=c.ddim_sampling_eta,
            original_elbo_weight=c.original_elbo_weight,
            l_simple_weight=c.l_simple_weight,
            clip_denoised=c.clip_denoised,
            w=c.w,
        )

    @property
    def num_timesteps(self) -> int:
        return self.schedule.num_timesteps

    @property
    def is_ddim_sampling(self) -> bool:
        return self.sampling_timesteps < self.num_timesteps


def _model_out_mixed(gd, model_fn, mixing_logit, x, t):
    out = model_fn(x, t)
    if gd.mixed_prediction:
        out = mixed_prediction(out, mixing_logit, mixing_component(gd.schedule, x, t))
    return out


def p_losses(
    gd: GaussianDiffusion,
    model_fn: ModelFn,
    mixing_logit: Optional[jnp.ndarray],
    x_start: jnp.ndarray,
    t: jnp.ndarray,
    noise: jnp.ndarray,
) -> Tuple[jnp.ndarray, dict]:
    """Training loss (ddpm.py:409-448): per-sample MSE/L1 + lvlb weighting."""
    sched = gd.schedule
    x_noisy = q_sample(sched, x_start, t, noise)
    model_out = _model_out_mixed(gd, model_fn, mixing_logit, x_noisy, t)

    if gd.parameterization == "eps":
        target = noise
    elif gd.parameterization == "x0":
        target = x_start
        model_out = predict_start_from_noise(sched, x_noisy, t, model_out)
    elif gd.parameterization == "v":
        target = get_velocity(sched, x_start, noise, t)
        model_out = get_velocity(sched, x_start, model_out, t)
    else:
        raise NotImplementedError(gd.parameterization)

    err = model_out - target
    reduce_axes = tuple(range(1, err.ndim))
    if gd.loss_type == "l2":
        per_sample = jnp.mean(err**2, axis=reduce_axes)
    elif gd.loss_type == "l1":
        per_sample = jnp.mean(jnp.abs(err), axis=reduce_axes)
    else:
        raise NotImplementedError(gd.loss_type)

    loss_simple = per_sample.mean() * gd.l_simple_weight
    loss_vlb = (sched.lvlb_weights[t] * per_sample).mean()
    loss = loss_simple + gd.original_elbo_weight * loss_vlb
    return loss, {"loss_simple": loss_simple, "loss_vlb": loss_vlb, "loss": loss}


def diffusion_loss(
    gd: GaussianDiffusion,
    model_fn: ModelFn,
    mixing_logit: Optional[jnp.ndarray],
    x_start: jnp.ndarray,
    rng: jax.Array,
) -> Tuple[jnp.ndarray, dict]:
    """Sample t ~ U[0,T) and noise, then p_losses (ddpm.py:450-454)."""
    rng_t, rng_n = jax.random.split(rng)
    t = jax.random.randint(rng_t, (x_start.shape[0],), 0, gd.num_timesteps)
    noise = jax.random.normal(rng_n, x_start.shape, x_start.dtype)
    return p_losses(gd, model_fn, mixing_logit, x_start, t, noise)


def _check_sampling_parameterization(gd: GaussianDiffusion) -> None:
    """Every reference parameterization trains the RAW model output as an
    eps-prediction, so the eps-style sampling path below is correct for all
    three — a subtlety worth spelling out because the reference's
    `if parameterization == 'eps' or 'v'` (ddpm.py:319) is always true and
    looks like a bug (SURVEY §2.12):

      * eps: target = noise, raw output compared directly (ddpm.py:418).
      * x0:  target = x_start but the raw output is first mapped through
        predict_start_from_noise (ddpm.py:420-421), i.e. interpreted as
        noise; the residual reduces to
        sqrt_recipm1_acp(t) * (raw_out - noise) — an SNR-weighted eps loss
        (tested: tests/test_ddim.py::test_x0_loss_is_weighted_eps_loss).
      * v:   both target and raw output are mapped through get_velocity
        (ddpm.py:423-424), residual = sqrt_acp(t) * (raw_out - noise) —
        again a weighted eps loss.

    So the "dead" x0 sampling branch (whose commented-out
    predict_noise_from_start would have been WRONG for such models) is
    unreachable but also unnecessary; treating the raw output as eps at
    sampling time matches how every parameterization was trained.  Only
    truly unknown strings are refused."""
    if gd.parameterization not in ("eps", "x0", "v"):
        raise NotImplementedError(
            f"unknown parameterization={gd.parameterization!r} "
            f"(expected eps, x0, or v; diffusion/ddpm.py:409-427)"
        )


def model_predictions(
    gd: GaussianDiffusion,
    model_fn: ModelFn,
    mixing_logit: Optional[jnp.ndarray],
    x: jnp.ndarray,
    t: jnp.ndarray,
    cond_model_fn: Optional[ModelFn] = None,
    clip_x_start: bool = False,
):
    """eps-hat and x0-hat with optional classifier-free guidance
    (ddpm.py:303-332).  `model_fn` is the unconditional branch; when
    `cond_model_fn` is given the output is (1+w)*cond - w*uncond with the
    mixing blend applied to each branch (ddpm.py:310-317)."""
    uncond_out = _model_out_mixed(gd, model_fn, mixing_logit, x, t)
    if cond_model_fn is not None:
        cond_out = _model_out_mixed(gd, cond_model_fn, mixing_logit, x, t)
        model_output = (1 + gd.w) * cond_out - gd.w * uncond_out
    else:
        model_output = uncond_out

    # Sampling treats the model output as eps (ddpm.py:319-332).  Correct for
    # ALL reference parameterizations — their losses train the raw output as
    # an eps-prediction; see _check_sampling_parameterization for the
    # derivation (and why the reference's always-true
    # `== 'eps' or 'v'` is unreachable-but-harmless, SURVEY §2.12).
    _check_sampling_parameterization(gd)
    pred_noise = model_output
    x_start = predict_start_from_noise(gd.schedule, x, t, pred_noise)
    if clip_x_start:
        x_start = jnp.clip(x_start, -1.0, 1.0)
    return pred_noise, x_start


def _ddim_update(sched, eta, img, pred_noise, x_start, time, time_next, rng):
    """One DDIM x_t -> x_{t-1} update given the model's predictions
    (ddpm.py:350-368) — shared by ddim_sample and the encoder-reuse scan."""
    alpha = sched.alphas_cumprod[time]
    # clamp the (unused when time_next<0) index so gather stays in-bounds
    alpha_next = sched.alphas_cumprod[jnp.maximum(time_next, 0)]
    sigma = eta * jnp.sqrt(
        (1 - alpha / alpha_next) * (1 - alpha_next) / (1 - alpha)
    )
    c = jnp.sqrt(jnp.maximum(1 - alpha_next - sigma**2, 0.0))

    img_next = x_start * jnp.sqrt(alpha_next) + c * pred_noise
    if eta != 0.0:
        # sigma is a traced value, so the PRNG below would survive DCE
        # even when eta == 0 — gate it statically (the default DDIM
        # protocol is deterministic, ddim_sampling_eta: 0)
        rng, rng_noise = jax.random.split(rng)
        step_noise = jax.random.normal(rng_noise, img.shape, img.dtype)
        img_next = img_next + sigma * step_noise
    # final step (time_next < 0): return x_start (ddpm.py:353-355)
    img_next = jnp.where(time_next < 0, x_start, img_next)
    return img_next, rng


def ddim_sample(
    gd: GaussianDiffusion,
    model_fn: ModelFn,
    mixing_logit: Optional[jnp.ndarray],
    shape: Tuple[int, ...],
    rng: jax.Array,
    noise: Optional[jnp.ndarray] = None,
    cond_model_fn: Optional[ModelFn] = None,
) -> jnp.ndarray:
    """DDIM sampler as a single lax.scan over (time, time_next) pairs
    (ddpm.py:334-369)."""
    sched = gd.schedule
    eta = gd.ddim_sampling_eta
    pairs = jnp.asarray(ddim_times(gd.num_timesteps, gd.sampling_timesteps))

    rng, rng_init = jax.random.split(rng)
    img = jax.random.normal(rng_init, shape) if noise is None else noise
    batch = shape[0]

    def step(carry, pair):
        img, rng = carry
        time, time_next = pair[0], pair[1]
        t_vec = jnp.full((batch,), time, dtype=jnp.int32)
        pred_noise, x_start = model_predictions(
            gd, model_fn, mixing_logit, img, t_vec,
            cond_model_fn=cond_model_fn, clip_x_start=gd.clip_denoised,
        )
        img_next, rng = _ddim_update(
            sched, eta, img, pred_noise, x_start, time, time_next, rng
        )
        return (img_next, rng), None

    # Trace the sampler body in inference mode: AttentionBlocks select the
    # single-pass VMEM kernel (ops/pallas/attention.py) instead of the
    # flash kernel whose streamed backward only matters under grad.
    with vmem_attn.inference_mode():
        (img, _), _ = jax.lax.scan(step, (img, rng), pairs)
    return img


def ddim_sample_encoder_reuse(
    gd: GaussianDiffusion,
    full_fn,
    reuse_fn,
    mixing_logit: Optional[jnp.ndarray],
    shape: Tuple[int, ...],
    rng: jax.Array,
    reuse: int,
    noise: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """DDIM with encoder propagation (arXiv:2312.09608 "Faster Diffusion"):
    every `reuse`-th step runs the full denoiser and caches its down-path
    features; the following reuse-1 steps skip the encoder and re-run only
    the middle/up path on the cached features under the current timestep
    embedding.  The DDIM update itself still consumes the current x_t each
    step, so the trajectory tracks the sample — the cache is an
    approximation of slowly-varying encoder features, NOT a frozen output.

    `full_fn(x, t) -> (model_out, cache)`; `reuse_fn(x, t, cache) ->
    model_out`.  reuse=1 degenerates to exactly `ddim_sample` (tested).
    An NFE not divisible by `reuse` runs the remainder as full steps.

    This is a documented opt-in approximation (it changes samples); the
    reference protocol / headline bench default to reuse=1."""
    if reuse < 1:
        raise ValueError(f"reuse must be >= 1, got {reuse}")
    sched = gd.schedule
    eta = gd.ddim_sampling_eta
    all_pairs = jnp.asarray(ddim_times(gd.num_timesteps, gd.sampling_timesteps))
    n = all_pairs.shape[0]
    n_groups = n // reuse
    grouped = all_pairs[: n_groups * reuse].reshape(n_groups, reuse, 2)
    tail = all_pairs[n_groups * reuse:]

    rng, rng_init = jax.random.split(rng)
    img = jax.random.normal(rng_init, shape) if noise is None else noise
    batch = shape[0]

    def one(img, rng, time, time_next, fn):
        t_vec = jnp.full((batch,), time, dtype=jnp.int32)
        pred_noise, x_start = model_predictions(
            gd, fn, mixing_logit, img, t_vec, clip_x_start=gd.clip_denoised
        )
        return _ddim_update(
            sched, eta, img, pred_noise, x_start, time, time_next, rng
        )

    def group_step(carry, pairs):
        img, rng = carry
        cache_box = []

        def key_fn(x, tv):
            out, cache = full_fn(x, tv)
            cache_box.append(cache)
            return out

        img, rng = one(img, rng, pairs[0, 0], pairs[0, 1], key_fn)
        cache = cache_box[0]
        for j in range(1, reuse):  # static unroll within the scan body
            img, rng = one(
                img, rng, pairs[j, 0], pairs[j, 1],
                lambda x, tv: reuse_fn(x, tv, cache),
            )
        return (img, rng), None

    with vmem_attn.inference_mode():
        (img, rng), _ = jax.lax.scan(group_step, (img, rng), grouped)
        for j in range(tail.shape[0]):  # NFE % reuse leftovers: full steps
            img, rng = one(
                img, rng, tail[j, 0], tail[j, 1],
                lambda x, tv: full_fn(x, tv)[0],
            )
    return img


def ddim_sample_unet(
    gd: GaussianDiffusion,
    unet,
    unet_params,
    mixing_logit: Optional[jnp.ndarray],
    shape: Tuple[int, ...],
    rng: jax.Array,
    noise: Optional[jnp.ndarray] = None,
    encoder_reuse: int = 1,
) -> jnp.ndarray:
    """DDIM sampling for a nn/unet.py-style module, dispatching to the
    encoder-propagation scan when encoder_reuse > 1 (the module must
    support cache/return_cache — image/occupancy/NeRF all share that UNet;
    the video UNet_Triplane does not and keeps the exact path)."""
    if encoder_reuse > 1:
        full_fn = lambda x, t: unet.apply(
            {"params": unet_params}, x, t, return_cache=True
        )
        reuse_fn = lambda x, t, c: unet.apply(
            {"params": unet_params}, x, t, cache=c
        )
        return ddim_sample_encoder_reuse(
            gd, full_fn, reuse_fn, mixing_logit, shape, rng, encoder_reuse,
            noise=noise,
        )
    model_fn = lambda x, t: unet.apply({"params": unet_params}, x, t)
    return ddim_sample(gd, model_fn, mixing_logit, shape, rng, noise=noise)


def p_sample_loop(
    gd: GaussianDiffusion,
    model_fn: ModelFn,
    mixing_logit: Optional[jnp.ndarray],
    shape: Tuple[int, ...],
    rng: jax.Array,
    noise: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Ancestral sampler as a lax.scan over t = T-1..0 (ddpm.py:283-300)."""
    _check_sampling_parameterization(gd)
    sched = gd.schedule
    rng, rng_init = jax.random.split(rng)
    img = jax.random.normal(rng_init, shape) if noise is None else noise
    batch = shape[0]
    ts = jnp.arange(gd.num_timesteps - 1, -1, -1, dtype=jnp.int32)

    def step(carry, t):
        img, rng = carry
        t_vec = jnp.full((batch,), t, dtype=jnp.int32)
        model_out = _model_out_mixed(gd, model_fn, mixing_logit, img, t_vec)
        x_recon = predict_start_from_noise(sched, img, t_vec, model_out)
        if gd.clip_denoised:
            x_recon = jnp.clip(x_recon, -1.0, 1.0)
        mean, _, log_var = q_posterior(sched, x_recon, img, t_vec)
        rng, rng_noise = jax.random.split(rng)
        z = jax.random.normal(rng_noise, img.shape, img.dtype)
        nonzero = (t > 0).astype(img.dtype)
        img_next = mean + nonzero * jnp.exp(0.5 * log_var) * z
        return (img_next, rng), None

    with vmem_attn.inference_mode():
        (img, _), _ = jax.lax.scan(step, (img, rng), ts)
    return img


def sample(
    gd: GaussianDiffusion,
    model_fn: ModelFn,
    mixing_logit: Optional[jnp.ndarray],
    shape: Tuple[int, ...],
    rng: jax.Array,
    noise: Optional[jnp.ndarray] = None,
    cond_model_fn: Optional[ModelFn] = None,
) -> jnp.ndarray:
    """DDIM when sampling_timesteps < T else ancestral (ddpm.py:371-381)."""
    if gd.is_ddim_sampling:
        return ddim_sample(
            gd, model_fn, mixing_logit, shape, rng, noise, cond_model_fn
        )
    return p_sample_loop(gd, model_fn, mixing_logit, shape, rng, noise)
