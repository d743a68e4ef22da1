"""Video domain: D2C-VAE stage-1 and triplane-LDM stage-2 pipelines.

TPU-native redesign of tools/d2c_vae/video.py + tools/ldm/video.py.  Latent
token layout [xy | xt | yt] is pinned in nn/video_vae.py; the stage-2
denoiser is the TriplaneUNet over that token sequence.  Everything jits;
video tensors are NTHWC in [0,1] at the pipeline boundary.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ddmi_tpu.core.config import Config
from ddmi_tpu.core.coords import linear_kl_coeff, symmetrize, unsymmetrize
from ddmi_tpu.core.ema import ema_update
from ddmi_tpu.core.sn_reg import init_sn_state, norm_scale_loss, spectral_norm_loss
from ddmi_tpu.diffusion.process import (
    GaussianDiffusion,
    ddim_sample,
    ddim_sample_unet,
    diffusion_loss,
)
from ddmi_tpu.domains.image import Stage1State, Stage2State
from ddmi_tpu.nn.inr import INRVideo
from ddmi_tpu.nn.unet_triplane import TriplaneUNet
from ddmi_tpu.nn.video_vae import VideoAutoencoder, _cat_planes
from ddmi_tpu.ops.resample import pixel_center_lin


def video_axes(t: int, h: int, w: int):
    """Pixel-center coordinate axes [-(n-1)/n, (n-1)/n] for the video INR.

    The reference passes exactly these endpoints to
    convert_to_coord_format_3d at train AND eval time
    (tools/d2c_vae/video.py:167: hstart=-255/256 for 256 pixels,
    tstart=-15/16 for 16 frames; same in tools/ldm/video.py:207-210) — NOT
    the function's [-1,1] defaults.  The golden video test
    (tests/test_golden_video.py) asserts this convention against the actual
    reference modules.

    INTENTIONAL divergence from the reference's generate() path: at
    tools/ldm/video.py:217 the reference passes an asymmetric
    wend=255/test_resolution (apparent upstream typo — every train/eval
    call site uses the symmetric ±(n-1)/n above, and the two agree only at
    test_resolution=256).  We use the symmetric convention at ALL
    resolutions, so bit-parity with the reference's generate() output holds
    at 256 but silently diverges at any other test_resolution — that is
    the typo reproducing, not a bug here."""
    return {"axes": (pixel_center_lin(t), pixel_center_lin(h),
                     pixel_center_lin(w)), "hw": (h, w)}


@dataclasses.dataclass
class VideoPipeline:
    cfg: Config
    perceptual_fn: Optional[Callable] = None

    def __post_init__(self):
        m = self.cfg.model
        self.frames = self.cfg.data.frames
        self.vae = VideoAutoencoder(
            m.ddconfig, embed_dim=m.embed_dim, frames=self.frames
        )
        self.mlp = INRVideo(m.mlpconfig)
        dtype = jnp.bfloat16 if m.use_fp16 else jnp.float32
        u = m.unetconfig
        if not u.plane_sizes:
            r = m.ddconfig.resolution // 8
            u = dataclasses.replace(
                u, plane_sizes=((r, r), (self.frames, r), (self.frames, r))
            )
        self.unet = TriplaneUNet(u, dtype=dtype)
        self.gd = GaussianDiffusion.from_config(m.ddpmconfig)
        self.lc = m.lossconfig
        self.res = m.ddconfig.resolution
        r = m.ddconfig.resolution // 8
        self.n_latent_tokens = r * r + 2 * self.frames * r
        if self.lc.adversarial:
            from ddmi_tpu.losses.gan import GANLoss3D

            self.gan = GANLoss3D(disc_weight=self.lc.disc_weight)
        else:
            self.gan = None

    # ---------------------------------------------------------------- stage 1

    def init_stage1(self, rng, steps_per_epoch: int = 1000) -> Stage1State:
        m = self.cfg.model
        r1, r2, r3 = jax.random.split(rng, 3)
        x = jnp.zeros((1, self.frames, self.res, self.res, 3))
        vae_params = self.vae.init({"params": r1}, x, r2)["params"]
        hdbf = self._dummy_hdbf(1)
        coords = video_axes(self.frames, self.res, self.res)
        mlp_params = self.mlp.init({"params": r3}, coords, hdbf)["params"]
        params = {"vae": vae_params, "mlp": mlp_params}
        self._stage1_total_iters = steps_per_epoch * self.lc.epochs
        tx = self.stage1_optimizer(steps_per_epoch)
        disc_params = disc_opt_state = None
        if self.gan is not None:
            dummy = jnp.zeros((1, 4, 32, 32, 3))
            disc_params = self.gan.init(
                jax.random.PRNGKey(11), dummy, dummy, False
            )["params"]
            disc_opt_state = self.disc_optimizer().init(disc_params)
        return Stage1State(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            sn_state=init_sn_state(params["vae"], jax.random.PRNGKey(7)),
            disc_params=disc_params,
            disc_opt_state=disc_opt_state,
        )

    def _dummy_hdbf(self, b):
        c = self.cfg.model.ddconfig
        num_res = len(c.ch_mult)
        curr = c.resolution // 2 ** (num_res - 1)
        xy, yt, xt = [], [], []
        for _ in reversed(range(num_res)):
            if curr in c.hdbf_resolutions:
                xy.append(jnp.zeros((b, curr, curr, c.out_ch)))
                yt.append(jnp.zeros((b, self.frames, curr, c.out_ch)))
                xt.append(jnp.zeros((b, self.frames, curr, c.out_ch)))
            curr *= 2
        xy.append(jnp.zeros((b, c.resolution, c.resolution, c.out_ch)))
        yt.append(jnp.zeros((b, self.frames, c.resolution, c.out_ch)))
        xt.append(jnp.zeros((b, self.frames, c.resolution, c.out_ch)))
        return (xy, yt, xt)

    def init_stage1_params(self, rng):
        """Params-only stage-1 init (no optimizer/SN/disc state) — for
        sampling/bench/serving.  The INR init runs on a tiny coordinate set:
        its params are token-count independent, and the full (t, res, res)
        voxel grid would make init itself a memory-heavy forward."""
        r1, r2, r3 = jax.random.split(rng, 3)
        x = jnp.zeros((1, self.frames, self.res, self.res, 3))
        vae_params = self.vae.init({"params": r1}, x, r2)["params"]
        hdbf = self._dummy_hdbf(1)
        small = {"axes": (jnp.linspace(-1, 1, 2), jnp.linspace(-1, 1, 4),
                          jnp.linspace(-1, 1, 4))}
        mlp_params = self.mlp.init({"params": r3}, small, hdbf)["params"]
        return {"vae": vae_params, "mlp": mlp_params}

    def init_stage2_params(self, rng):
        """Params-only stage-2 init (no EMA copy / optimizer state)."""
        m = self.cfg.model
        r1, _ = jax.random.split(rng)
        x = jnp.zeros((1, self.n_latent_tokens, m.ddpmconfig.channels))
        unet_params = self.unet.init(
            {"params": r1}, x, jnp.zeros((1,), jnp.int32)
        )["params"]
        return {
            "unet": unet_params,
            "mixing_logit": jnp.full(
                (1, 1, m.ddpmconfig.channels), m.ddpmconfig.mixed_init,
                jnp.float32,
            ),
        }

    def stage1_optimizer(self, steps_per_epoch: int):
        lc = self.lc
        accum = max(1, lc.gradient_accumulate_every)
        total = steps_per_epoch * lc.epochs // accum
        warmup = steps_per_epoch * lc.warmup_epochs // accum
        sched = (
            optax.warmup_cosine_decay_schedule(
                0.0, self.cfg.model.lr, max(warmup, 1), max(total, 2)
            )
            if lc.lr_scheduler
            else self.cfg.model.lr
        )
        tx = optax.adamw(sched, weight_decay=0.0)
        if accum > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=accum)
        return tx

    @property
    def perceptual_params(self):
        """Frozen LPIPS params, or None (see image.py::perceptual_params)."""
        return getattr(self.perceptual_fn, "params", None)

    def stage1_loss(self, params, sn_state, x, rng, step,
                    perceptual_params=None):
        """Full-clip L1 recon + per-frame LPIPS + summed triplane KL + SN-reg
        (tools/d2c_vae/video.py:190-242)."""
        from ddmi_tpu.core.amp import compute_cast, f32

        lc = self.lc
        rng_post, rng_frame = jax.random.split(rng)
        x = symmetrize(x)  # (b, t, h, w, 3)
        b, t = x.shape[0], x.shape[1]

        # bf16 compute region when model.amp (core/amp.py); coords fp32
        amp = bool(self.cfg.model.amp)
        p_vae = compute_cast(params["vae"], amp)
        p_mlp = compute_cast(params["mlp"], amp)

        (hdbf, posts) = self.vae.apply(
            {"params": p_vae}, compute_cast(x, amp), rng_post,
            sample_posterior=True, deterministic=True,
        )
        # Render the clip frame-by-frame with remat: one full-voxel INR call
        # holds (t*res^2)-token activations for backward — multi-GB at
        # production scale (16f x 256^2 OOM'd a 16 GB v5e).  Per-frame
        # recompute bounds it to res^2 tokens; token order matches the
        # single-call video_axes path (t-major).
        ys = pixel_center_lin(self.res)
        ts = pixel_center_lin(t)

        def render_frame(t1):
            coords = {"axes": (t1.reshape(1), ys, ys)}
            return self.mlp.apply({"params": p_mlp}, coords, hdbf)

        out_tok = jax.lax.map(jax.checkpoint(render_frame), ts)  # (t,b,hw,c)
        output = f32(out_tok).transpose(1, 0, 2, 3).reshape(
            b, t, self.res, self.res, -1
        )

        recon = jnp.abs(output - x).sum(axis=(1, 2, 3, 4)).mean()
        kld = sum(f32(p.kl()) for p in posts).mean()
        total_iters = jnp.maximum(getattr(self, "_stage1_total_iters", 100_000), 1)
        if lc.kl_anneal:
            kl_coeff = linear_kl_coeff(
                step, lc.kl_anneal_portion * total_iters,
                lc.kl_const_portion * total_iters,
                lc.kl_const_coeff, lc.kl_max_coeff,
            )
        else:
            kl_coeff = jnp.float32(lc.kl_max_coeff)
        loss = recon + kl_coeff * kld

        if self.perceptual_fn is not None:
            fi = jax.random.randint(rng_frame, (b,), 0, t)
            sel = lambda v: jnp.take_along_axis(
                v, fi.reshape(b, 1, 1, 1, 1), axis=1
            ).squeeze(1)
            if perceptual_params is not None:
                p_loss = self.perceptual_fn.apply(
                    perceptual_params, sel(x), sel(output)
                ).mean()
            else:  # legacy closure path (embeds constants; tests only)
                p_loss = self.perceptual_fn(sel(x), sel(output)).mean()
            loss = loss + lc.perceptual_weight * p_loss
        else:
            p_loss = jnp.float32(0.0)

        new_sn = sn_state
        sn = jnp.float32(0.0)
        if lc.sn_reg:
            sn, new_sn = spectral_norm_loss(params["vae"], sn_state)
            sn = sn + norm_scale_loss(params["vae"])
            if lc.sn_reg_weight_decay_anneal:
                wdn = jnp.exp(
                    (1 - kl_coeff) * jnp.log(lc.sn_reg_weight_decay_init)
                    + kl_coeff * jnp.log(lc.sn_reg_weight_decay)
                )
            else:
                wdn = lc.sn_reg_weight_decay
            loss = loss + sn * wdn

        metrics = {"loss": loss, "recon": recon, "kl": kld,
                   "kl_coeff": kl_coeff, "lpips": p_loss, "sn": sn}
        return loss, (metrics, new_sn, (x, output))

    def disc_optimizer(self) -> optax.GradientTransformation:
        """AdamW(lr, betas=(0.5, 0.9)) for the 2D+3D PatchGAN pair
        (tools/d2c_vae/video.py disc optimizer)."""
        return optax.adamw(self.cfg.model.lr, b1=0.5, b2=0.9, weight_decay=0.0)

    def stage1_train_step(self, tx, state: Stage1State, x, rng,
                          perceptual_params=None):
        if self.gan is None:
            (_, (metrics, sn_state, _)), grads = jax.value_and_grad(
                self.stage1_loss, has_aux=True
            )(state.params, state.sn_state, x, rng, state.step,
              perceptual_params)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return (
                state.replace(step=state.step + 1, params=params,
                              opt_state=opt_state, sn_state=sn_state),
                metrics,
            )
        return self._stage1_adv_train_step(tx, state, x, rng,
                                           perceptual_params)

    def _stage1_adv_train_step(self, tx, state: Stage1State, x, rng,
                               perceptual_params=None):
        """Fused G+D update with the 2D(per-frame)+3D discriminator pair
        (losses/gan.py GANLoss3D; reference alternates optimizers,
        tools/d2c_vae/video.py — see image.py._stage1_adv_train_step for the
        simultaneous-step rationale)."""
        rng, rng_f = jax.random.split(rng)
        b, t = x.shape[0], x.shape[1]
        frame_idx = jax.random.randint(rng_f, (b,), 0, t)

        def g_loss_fn(params, disc_params):
            base, (metrics, sn_state, (target, output)) = self.stage1_loss(
                params, state.sn_state, x, rng, state.step, perceptual_params
            )
            g_gan = self.gan.apply(
                {"params": disc_params}, target, output, True, frame_idx
            )
            return base + g_gan, (
                dict(metrics, g_gan=g_gan), sn_state, (target, output)
            )

        (_, (metrics, sn_state, (target, output))), g_grads = (
            jax.value_and_grad(g_loss_fn, has_aux=True)(
                state.params, state.disc_params
            )
        )

        def d_loss_fn(disc_params):
            return self.gan.apply(
                {"params": disc_params},
                target,
                jax.lax.stop_gradient(output),
                False,
                frame_idx,
            )

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.disc_params)
        d_tx = self.disc_optimizer()
        d_updates, disc_opt_state = d_tx.update(
            d_grads, state.disc_opt_state, state.disc_params
        )
        disc_params = optax.apply_updates(state.disc_params, d_updates)
        updates, opt_state = tx.update(g_grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            state.replace(
                step=state.step + 1,
                params=params,
                opt_state=opt_state,
                sn_state=sn_state,
                disc_params=disc_params,
                disc_opt_state=disc_opt_state,
            ),
            dict(metrics, d_loss=d_loss),
        )

    def reconstruct(self, params, x, rng=None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        xs = symmetrize(x)
        b, t = xs.shape[0], xs.shape[1]
        hdbf, _ = self.vae.apply(
            {"params": params["vae"]}, xs, rng, sample_posterior=True
        )
        coords = video_axes(t, self.res, self.res)
        out = self.mlp.apply({"params": params["mlp"]}, coords, hdbf)
        vid = out.reshape(b, t, self.res, self.res, -1)
        return unsymmetrize(jnp.clip(vid, -1, 1))

    # ---------------------------------------------------------------- stage 2

    def init_stage2(self, rng, steps_per_epoch: int = 1000) -> Stage2State:
        m = self.cfg.model
        r1, _ = jax.random.split(rng)
        x = jnp.zeros((1, self.n_latent_tokens, m.ddpmconfig.channels))
        unet_params = self.unet.init(
            {"params": r1}, x, jnp.zeros((1,), jnp.int32)
        )["params"]
        params = {
            "unet": unet_params,
            # token-layout mixing logit (1, 1, C) — reference video branch
            # (ddpm.py:157-159)
            "mixing_logit": jnp.full(
                (1, 1, m.ddpmconfig.channels), m.ddpmconfig.mixed_init, jnp.float32
            ),
        }
        tx = self.stage2_optimizer()
        return Stage2State(
            step=jnp.zeros((), jnp.int32),
            params=params,
            ema_params=jax.tree_util.tree_map(jnp.copy, params),
            opt_state=tx.init(params),
        )

    def stage2_optimizer(self):
        from ddmi_tpu.core.optim import stage2_adamw

        return stage2_adamw(self.cfg)

    def encode_latents(self, stage1_params, x, rng):
        """Frozen encode -> sampled [xy|xt|yt] tokens, stop-grad
        (tools/ldm/video.py:142-154).  Runs bf16 under model.amp (frozen —
        no gradient precision concern); tokens return fp32 so the diffusion
        math stays exact."""
        from ddmi_tpu.core.amp import compute_cast, f32

        amp = bool(self.cfg.model.amp)
        xs = compute_cast(symmetrize(x), amp)
        posts = self.vae.apply(
            {"params": compute_cast(stage1_params["vae"], amp)},
            xs, method=self.vae.encode,
        )
        r1, r2, r3 = jax.random.split(rng, 3)
        xy, yt, xt = (
            posts[0].sample(r1), posts[1].sample(r2), posts[2].sample(r3)
        )
        return jax.lax.stop_gradient(f32(_cat_planes(xy, xt, yt)))

    def stage2_loss(self, params, stage1_params, x, rng):
        from ddmi_tpu.core.amp import amp_denoiser

        rng_enc, rng_diff = jax.random.split(rng)
        z = self.encode_latents(stage1_params, x, rng_enc)
        # bf16 denoiser forward / fp32 diffusion math (core/amp.py)
        model_fn = amp_denoiser(
            lambda p, xt_, t: self.unet.apply({"params": p}, xt_, t),
            params["unet"], bool(self.cfg.model.amp),
        )
        return diffusion_loss(self.gd, model_fn, params["mixing_logit"], z, rng_diff)

    def stage2_train_step(self, tx, state: Stage2State, stage1_params, x, rng):
        (_, aux), grads = jax.value_and_grad(self.stage2_loss, has_aux=True)(
            state.params, stage1_params, x, rng
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema_params = ema_update(
            state.ema_params, params, state.step,
            beta=self.lc.ema_decay, update_every=self.lc.ema_update_every,
        )
        return (
            state.replace(step=state.step + 1, params=params,
                          ema_params=ema_params, opt_state=opt_state),
            aux,
        )

    # --------------------------------------------------------------- sampling

    def sample_videos(self, ldm_params, stage1_params, rng, batch: int,
                      noise=None):
        """DDIM over latent tokens + triplane decode + voxel INR render, one
        jittable program (tools/ldm/video.py eval path).

        The WHOLE program is a no-grad sampling trace, so it runs under
        inference_mode — the decoder's 73k/20k-token AttnBlock1DExpand
        cross-plane attentions (36% of generation time, BASELINE.md video
        decomposition) route through the Pallas flash tier, not just the
        DDIM scan's attentions (which ddim_sample_unet gates internally)."""
        from ddmi_tpu.ops.pallas import attention as vmem_attn

        with vmem_attn.inference_mode():
            return self._sample_videos_body(
                ldm_params, stage1_params, rng, batch, noise
            )

    def _sample_videos_body(self, ldm_params, stage1_params, rng, batch,
                            noise):
        m = self.cfg.model
        shape = (batch, self.n_latent_tokens, m.ddpmconfig.channels)
        z = ddim_sample_unet(
            self.gd, self.unet, ldm_params["unet"], ldm_params["mixing_logit"],
            shape, rng, noise=noise,
            encoder_reuse=int(m.ddpmconfig.extra.get("encoder_reuse", 1)),
        )
        hdbf = self.vae.apply(
            {"params": stage1_params["vae"]}, z, method=self.vae.decode
        )
        # render frame-by-frame with lax.map: the full voxel token set
        # (t*res^2, e.g. 1M tokens at 256^2 x 16f) would hold every MLP
        # activation live at once (same chunking rationale as
        # ImagePipeline._render_grid)
        ys = pixel_center_lin(self.res)
        ts = pixel_center_lin(self.frames)

        def render_frame(t1):
            coords = {"axes": (t1.reshape(1), ys, ys),
                      "hw": (self.res, self.res)}
            out = self.mlp.apply({"params": stage1_params["mlp"]}, coords, hdbf)
            return out  # (b, res*res, c)

        out = jax.lax.map(render_frame, ts)  # (t, b, res*res, c)
        vid = jnp.moveaxis(out, 0, 1).reshape(
            batch, self.frames, self.res, self.res, -1
        )
        return unsymmetrize(jnp.clip(vid, -1, 1))
