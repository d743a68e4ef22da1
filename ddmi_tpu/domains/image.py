"""Image domain: D2C-VAE stage-1 and LDM stage-2 pipelines.

TPU-native redesign of tools/d2c_vae/image.py + tools/ldm/image.py: the eight
near-duplicate reference Trainer classes collapse into pure train-step
functions over explicit state pytrees; the generic loop lives in
ddmi_tpu.core.trainer.  Everything here jits: multiscale augmentation is
lax.switch (core/coords.py), sampling is a lax.scan DDIM + decoder + INR
render in ONE compiled program (the reference runs a Python loop then
separate decode/render kernels, tools/ldm/image.py:226-249).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ddmi_tpu.core.config import Config
from ddmi_tpu.core.coords import (
    get_scale_injection,
    linear_kl_coeff,
    multiscale_image_transform,
    pixel_center_grid,
    resize_antialias,
    symmetrize,
    unsymmetrize,
)
from ddmi_tpu.core.ema import ema_update
from ddmi_tpu.core.sn_reg import (
    init_sn_state,
    norm_scale_loss,
    spectral_norm_loss,
)
from ddmi_tpu.diffusion.process import (
    GaussianDiffusion,
    ddim_sample,
    ddim_sample_unet,
    diffusion_loss,
)
from ddmi_tpu.ops.resample import pixel_center_lin
from ddmi_tpu.nn.inr import INRImage
from ddmi_tpu.nn.unet import UNet
from ddmi_tpu.nn.vae import Autoencoder


class Stage1State(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any          # {'vae': ..., 'mlp': ...}
    opt_state: Any
    sn_state: Any
    # adversarial variants only (lossconfig.adversarial; reference
    # tools/d2c_vae/image.py:82-89 keeps a second AdamW for the PatchGAN)
    disc_params: Any = None
    disc_opt_state: Any = None


class Stage2State(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any          # {'unet': ..., 'mixing_logit': ...}
    ema_params: Any
    opt_state: Any


@dataclasses.dataclass
class ImagePipeline:
    """Model bundle + pure train/sample functions for the image domain."""

    cfg: Config
    perceptual_fn: Optional[Callable] = None  # (target, output)->(b,) LPIPS

    def __post_init__(self):
        m = self.cfg.model
        self.vae = Autoencoder(m.ddconfig, embed_dim=m.embed_dim)
        self.mlp = INRImage(m.mlpconfig)
        dtype = jnp.bfloat16 if m.use_fp16 else jnp.float32
        # model.DiT selects the MDTv2 denoiser (reference exp/stage.py:196-199)
        if m.DiT:
            from ddmi_tpu.nn.mdt import MDTv2

            self.unet = MDTv2(m.ditconfig)
            self.is_dit = True
        else:
            self.unet = UNet(m.unetconfig, dtype=dtype)
            self.is_dit = False
        self.gd = GaussianDiffusion.from_config(m.ddpmconfig)
        self.lc = m.lossconfig
        self.anchor = m.ddconfig.resolution  # 256
        # model.amp: bf16 compute for the stage-1 VAE/INR forward (fp32
        # master params + fp32 loss reductions, core/amp.py) — the reference
        # runs the same region under accelerator.autocast()
        self.amp = bool(m.amp)
        # Fused Pallas render (ops/pallas/inr_decode.py): 2.6-3.5x faster than
        # the XLA matmul path on TPU (ops/pallas/BENCH.md); opt out with
        # model.extra["fused_render"] = False.
        self.use_fused_render = bool(
            m.extra.get("fused_render", jax.default_backend() == "tpu")
        ) if isinstance(m.extra, dict) else jax.default_backend() == "tpu"
        if self.lc.adversarial:
            from ddmi_tpu.losses.gan import GANLoss2D

            self.gan = GANLoss2D(disc_weight=self.lc.disc_weight)
            # DiffAugment policy for disc inputs (losses/diffaugment.py);
            # opt-in via lossconfig.extra (reference imports it but the main
            # path leaves it off, SURVEY.md §2.5)
            self.diffaug_policy = self.lc.extra.get("diffaugment", "")
        else:
            self.gan = None

    # ---------------------------------------------------------------- stage 1

    def init_stage1_params(self, rng: jax.Array):
        """Params-only stage-1 init (no optimizer/SN state) — the sampling /
        eval path needs just these (bench.py, Trainer.generate)."""
        m = self.cfg.model
        r1, r2, r3, r4 = jax.random.split(rng, 4)
        res = self.anchor
        x = jnp.zeros((1, res, res, m.ddconfig.in_channels))
        coords = pixel_center_grid(res).reshape(1, res * res, 2)
        hdbf_shapes = self._hdbf_shapes(1)
        vae_params = self.vae.init({"params": r1}, x, r2)
        mlp_params = self.mlp.init(
            {"params": r3, "noise": r4},
            coords,
            [jnp.zeros(s) for s in hdbf_shapes],
            1.0,
        )
        return {"vae": vae_params["params"], "mlp": mlp_params["params"]}

    def init_stage1(self, rng: jax.Array, steps_per_epoch: int = 1000) -> Stage1State:
        params = self.init_stage1_params(rng)
        sn_state = init_sn_state(params["vae"], jax.random.PRNGKey(7))
        disc_params = disc_opt_state = None
        if self.gan is not None:
            dummy = jnp.zeros((1, 64, 64, self.cfg.model.ddconfig.in_channels))
            disc_params = self.gan.init(
                jax.random.PRNGKey(11), dummy, dummy, False, 1.0
            )["params"]
            disc_opt_state = self.disc_optimizer().init(disc_params)
        self._stage1_total_iters = steps_per_epoch * self.lc.epochs
        tx = self.stage1_optimizer(steps_per_epoch)
        return Stage1State(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            sn_state=sn_state,
            disc_params=disc_params,
            disc_opt_state=disc_opt_state,
        )

    def _hdbf_shapes(self, b: int):
        c = self.cfg.model.ddconfig
        shapes = []
        num_res = len(c.ch_mult)
        curr = c.resolution // 2 ** (num_res - 1)
        for _ in reversed(range(num_res)):
            if curr in c.hdbf_resolutions:
                shapes.append((b, curr, curr, c.out_ch))
            curr *= 2
        shapes.append((b, c.resolution, c.resolution, c.out_ch))
        return shapes

    def stage1_optimizer(self, steps_per_epoch: int) -> optax.GradientTransformation:
        """AdamW + linear warmup + cosine decay + grad accumulation
        (reference: tools/d2c_vae/image.py:61-88, :165-171)."""
        lc = self.lc
        accum = max(1, lc.gradient_accumulate_every)
        total = steps_per_epoch * lc.epochs // accum
        warmup = steps_per_epoch * lc.warmup_epochs // accum
        if lc.lr_scheduler:
            sched = optax.warmup_cosine_decay_schedule(
                0.0, self.cfg.model.lr, max(warmup, 1), max(total, 2)
            )
        else:
            sched = optax.linear_schedule(
                0.0, self.cfg.model.lr, max(warmup, 1)
            )
        tx = optax.adamw(sched, weight_decay=0.0)
        if accum > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=accum)
        return tx

    @property
    def perceptual_params(self):
        """Frozen LPIPS params, or None.  Thread these through jit call
        boundaries as an argument (evals/lpips.py::PerceptualLoss — a
        closed-over VGG embeds 59 MB of constants into the program)."""
        return getattr(self.perceptual_fn, "params", None)

    def stage1_loss(self, params, sn_state, x, rng, step,
                    perceptual_params=None):
        """Multiscale recon + KL(annealed) + LPIPS + SN-reg
        (tools/d2c_vae/image.py:177-233)."""
        from ddmi_tpu.core.amp import compute_cast, f32

        lc = self.lc
        rng_ms, rng_post, rng_noise = jax.random.split(rng, 3)
        x = symmetrize(x)
        target, coords, scale, y = multiscale_image_transform(
            x, rng_ms, self.anchor, lc.multiscale
        )
        b, res = target.shape[0], target.shape[1]

        # bf16 compute region (fp32 master params; coords stay fp32)
        p_vae = compute_cast(params["vae"], self.amp)
        p_mlp = compute_cast(params["mlp"], self.amp)
        y = compute_cast(y, self.amp)

        posterior = self.vae.apply(
            {"params": p_vae}, y, method=self.vae.encode
        )
        z = posterior.sample(rng_post)
        hdbf = self.vae.apply(
            {"params": p_vae}, z, method=self.vae.decode
        )
        out_tok = self.mlp.apply(
            {"params": p_mlp},
            coords.reshape(1, res * res, 2),
            hdbf,
            scale,
            rngs={"noise": rng_noise},
        )
        output = f32(out_tok).reshape(b, res, res, -1)

        kld = f32(posterior.kl()).mean()
        total_iters = jnp.maximum(getattr(self, "_stage1_total_iters", 100_000), 1)
        if lc.kl_anneal:
            kl_coeff = linear_kl_coeff(
                step,
                lc.kl_anneal_portion * total_iters,
                lc.kl_const_portion * total_iters,
                lc.kl_const_coeff,
                lc.kl_max_coeff,
            )
        else:
            kl_coeff = jnp.float32(lc.kl_max_coeff)

        recon = jnp.abs(output - target).sum(axis=(1, 2, 3)).mean()
        loss = recon + kl_coeff * kld

        if self.perceptual_fn is not None:
            if perceptual_params is not None:
                p_loss = self.perceptual_fn.apply(
                    perceptual_params, target, output
                ).mean()
            else:  # legacy closure path (embeds constants; tests only)
                p_loss = self.perceptual_fn(target, output).mean()
            loss = loss + lc.perceptual_weight * p_loss
        else:
            p_loss = jnp.float32(0.0)

        new_sn_state = sn_state
        sn = jnp.float32(0.0)
        if lc.sn_reg:
            sn, new_sn_state = spectral_norm_loss(params["vae"], sn_state)
            sn = sn + norm_scale_loss(params["vae"])
            if lc.sn_reg_weight_decay_anneal:
                wdn = jnp.exp(
                    (1.0 - kl_coeff) * jnp.log(lc.sn_reg_weight_decay_init)
                    + kl_coeff * jnp.log(lc.sn_reg_weight_decay)
                )
            else:
                wdn = lc.sn_reg_weight_decay
            loss = loss + sn * wdn

        metrics = {
            "loss": loss,
            "recon": recon,
            "kl": kld,
            "kl_coeff": kl_coeff,
            "lpips": p_loss,
            "sn": sn,
        }
        return loss, (metrics, new_sn_state, (target, output, scale))

    def disc_optimizer(self) -> optax.GradientTransformation:
        """AdamW(lr, betas=(0.5, 0.9)) for the PatchGAN
        (tools/d2c_vae/image.py:84-87)."""
        return optax.adamw(self.cfg.model.lr, b1=0.5, b2=0.9, weight_decay=0.0)

    def _augment_for_disc(self, x, rng):
        if not self.diffaug_policy:
            return x
        from ddmi_tpu.losses.diffaugment import diff_augment

        return diff_augment(x, rng, policy=self.diffaug_policy)

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
                state.replace(
                    step=state.step + 1,
                    params=params,
                    opt_state=opt_state,
                    sn_state=sn_state,
                ),
                metrics,
            )
        return self._stage1_adv_train_step(tx, state, x, rng,
                                           perceptual_params)

    def _stage1_adv_train_step(self, tx, state: Stage1State, x, rng,
                               perceptual_params=None):
        """Adversarial stage-1 step: generator (VAE+MLP) and discriminator
        update fused in one compiled program sharing the recon forward.

        The reference alternates whole accumulation windows between the two
        AdamW optimizers (tools/d2c_vae/image.py:241-254 optimizer_idx
        flip-flop); under jit we instead take both gradients every step from
        the same forward — the standard simultaneous-GAN formulation (each
        player still only differentiates its own loss; stop_gradients match
        the reference's)."""
        rng, rng_aug = jax.random.split(rng)

        def g_loss_fn(params, disc_params):
            base, (metrics, sn_state, (target, output, scale)) = self.stage1_loss(
                params, state.sn_state, x, rng, state.step, perceptual_params
            )
            g_gan = self.gan.apply(
                {"params": disc_params},
                self._augment_for_disc(target, rng_aug),
                self._augment_for_disc(output, rng_aug),
                True,
                scale,
            )
            metrics = dict(metrics, g_gan=g_gan)
            return base + g_gan, (metrics, sn_state, (target, output, scale))

        (_, (metrics, sn_state, (target, output, scale))), g_grads = (
            jax.value_and_grad(g_loss_fn, has_aux=True)(
                state.params, state.disc_params
            )
        )

        def d_loss_fn(disc_params):
            return self.gan.apply(
                {"params": disc_params},
                self._augment_for_disc(target, rng_aug),
                self._augment_for_disc(jax.lax.stop_gradient(output), rng_aug),
                False,
                scale,
            )

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.disc_params)
        d_tx = self.disc_optimizer()
        d_updates, disc_opt_state = d_tx.update(
            d_grads, state.disc_opt_state, state.disc_params
        )
        disc_params = optax.apply_updates(state.disc_params, d_updates)

        updates, opt_state = tx.update(g_grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics, d_loss=d_loss)
        return (
            state.replace(
                step=state.step + 1,
                params=params,
                opt_state=opt_state,
                sn_state=sn_state,
                disc_params=disc_params,
                disc_opt_state=disc_opt_state,
            ),
            metrics,
        )

    def reconstruct(self, params, x, resolution: Optional[int] = None, rng=None):
        """Deterministic reconstruction at arbitrary resolution (rFID path,
        evals/eval.py:77-131: posterior.sample -> decode -> render)."""
        res = resolution or self.anchor
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        rng_post, rng_noise = jax.random.split(rng)
        y = jnp.clip(resize_antialias(symmetrize(x), self.anchor), -1, 1)
        posterior = self.vae.apply({"params": params["vae"]}, y, method=self.vae.encode)
        z = posterior.sample(rng_post)
        hdbf = self.vae.apply({"params": params["vae"]}, z, method=self.vae.decode)
        si = get_scale_injection(res, self.anchor)
        out = self._render_grid(params["mlp"], hdbf, res, si, rng_noise)
        img = out.reshape(x.shape[0], res, res, -1)
        return unsymmetrize(jnp.clip(img, -1, 1))

    # ---------------------------------------------------------------- stage 2

    def init_stage2_params(self, rng: jax.Array):
        """Params-only stage-2 init (no EMA copy / optimizer state)."""
        m = self.cfg.model
        r1, r2 = jax.random.split(rng)
        # diffusion-space shape comes from ddpmconfig (valid for both the
        # UNet and the MDTv2 denoiser)
        d = m.ddpmconfig
        x = jnp.zeros((1, d.image_size, d.image_size, d.channels))
        t0 = jnp.zeros((1,), jnp.int32)
        if self.is_dit and m.ditconfig.mask_ratio is not None:
            # init through the masked path so the side-interpolater params
            # (mask_token / sideblock) exist for training
            unet_params = self.unet.init(
                {"params": r1}, x, t0, enable_mask=True,
                rng=jax.random.PRNGKey(0),
            )
        else:
            unet_params = self.unet.init({"params": r1}, x, t0)
        return {
            "unet": unet_params["params"],
            "mixing_logit": jnp.full(
                (1, 1, 1, m.ddpmconfig.channels),
                m.ddpmconfig.mixed_init,
                jnp.float32,
            ),
        }

    def init_stage2(self, rng: jax.Array, steps_per_epoch: int = 1000) -> Stage2State:
        params = self.init_stage2_params(rng)
        tx = self.stage2_optimizer()
        return Stage2State(
            step=jnp.zeros((), jnp.int32),
            params=params,
            ema_params=jax.tree_util.tree_map(jnp.copy, params),
            opt_state=tx.init(params),
        )

    def stage2_optimizer(self) -> optax.GradientTransformation:
        """AdamW(lr, wd=0) + grad accumulation (tools/ldm/image.py:61)."""
        from ddmi_tpu.core.optim import stage2_adamw

        return stage2_adamw(self.cfg)

    def encode_latents(self, stage1_params, x, rng):
        """Frozen stage-1 encode (tools/ldm/image.py:152-158): resize-256,
        posterior sample, stop_gradient.  Runs bf16 under model.amp (frozen —
        no gradient precision concern)."""
        from ddmi_tpu.core.amp import compute_cast, f32

        y = jnp.clip(resize_antialias(symmetrize(x), self.anchor), -1, 1)
        posterior = self.vae.apply(
            {"params": compute_cast(stage1_params["vae"], self.amp)},
            compute_cast(y, self.amp),
            method=self.vae.encode,
        )
        return jax.lax.stop_gradient(f32(posterior.sample(rng)))

    def stage2_loss(self, params, stage1_params, x, rng):
        from ddmi_tpu.core.amp import amp_denoiser

        rng_enc, rng_diff, rng_mask = jax.random.split(rng, 3)
        z = self.encode_latents(stage1_params, x, rng_enc)
        # model.amp: denoiser forward in bf16, diffusion math fp32
        # (core/amp.py::amp_denoiser; reference autocasts the whole step,
        # tools/ldm/image.py:152)
        if self.is_dit and self.cfg.model.ditconfig.mask_ratio is not None:
            # MDTv2 masked training (maskedtransformer.py:395-422)
            model_fn = amp_denoiser(
                lambda p, xt, t: self.unet.apply(
                    {"params": p}, xt, t, enable_mask=True, rng=rng_mask,
                ),
                params["unet"], self.amp,
            )
        else:
            model_fn = amp_denoiser(
                lambda p, xt, t: self.unet.apply({"params": p}, xt, t),
                params["unet"], self.amp,
            )
        loss, aux = diffusion_loss(
            self.gd, model_fn, params["mixing_logit"], z, rng_diff
        )
        return loss, aux

    def stage2_train_step(self, tx, state: Stage2State, stage1_params, x, rng):
        (_, aux), grads = jax.value_and_grad(self.stage2_loss, has_aux=True)(
            state.params, stage1_params, x, rng
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema_params = ema_update(
            state.ema_params,
            params,
            state.step,
            beta=self.lc.ema_decay,
            update_every=self.lc.ema_update_every,
        )
        return (
            state.replace(
                step=state.step + 1,
                params=params,
                ema_params=ema_params,
                opt_state=opt_state,
            ),
            aux,
        )

    # --------------------------------------------------------------- sampling

    def _render_grid(
        self, mlp_params, hdbf, res: int, si, rng, chunk_tokens: int = 1 << 15
    ):
        """Tiled INR render at a regular res x res grid: lax.map over row
        chunks bounds peak memory (the whole 256^2+ token set would otherwise
        hold ~10 activation tensors live at once; chunking replaces the
        reference's host-side netchunk loops, SURVEY.md §5).

        On TPU the fused Pallas kernel takes over (use_fused_render): the
        whole styled MLP runs from VMEM per token tile — 2.6-3.5x faster
        (ops/pallas/BENCH.md)."""
        if self.use_fused_render:
            from ddmi_tpu.ops.pallas import render_tokens_fused

            c = self.cfg.model.mlpconfig
            seed = jax.random.randint(rng, (), 0, jnp.iinfo(jnp.int32).max)
            return render_tokens_fused(
                mlp_params, hdbf, res, si, seed,
                ch=c.ch, in_ch=c.in_ch, out_ch=c.out_ch,
            )
        lin = pixel_center_lin(res).astype(hdbf[0].dtype)
        rows_per = max(1, min(res, chunk_tokens // res))
        while res % rows_per:
            rows_per -= 1
        n_chunks = res // rows_per
        ys_chunks = lin.reshape(n_chunks, rows_per)
        rngs = jax.random.split(rng, n_chunks)

        def render(args):
            ys, r = args
            out = self.mlp.apply(
                {"params": mlp_params}, None, hdbf, si, grid_1d=(lin, ys),
                rngs={"noise": r},
            )
            return out  # (b, rows_per*res, c)

        out = jax.lax.map(render, (ys_chunks, rngs))
        b = out.shape[1]
        out = jnp.moveaxis(out, 0, 1).reshape(b, res * res, -1)
        return out

    def sample_images(
        self,
        ldm_params,
        stage1_params,
        rng: jax.Array,
        batch: int,
        resolution: Optional[int] = None,
        noise: Optional[jnp.ndarray] = None,
    ):
        """DDIM scan + HDBF decode + INR render, one jittable program
        (replaces tools/ldm/image.py:226-249 + ddpm.py:334-369)."""
        m = self.cfg.model
        res = resolution or self.cfg.data.test_resolution
        u = m.ddpmconfig
        shape = (batch, u.image_size, u.image_size, u.channels)
        rng_s, rng_noise = jax.random.split(rng)

        # encoder_reuse > 1: opt-in turbo sampling (arXiv:2312.09608) — skip
        # the UNet down path on reuse-1 of every `reuse` steps.  Changes
        # samples; never the default.  See diffusion/process.py.
        reuse = int(u.extra.get("encoder_reuse", 1))
        if reuse > 1 and self.is_dit:
            raise ValueError(
                "encoder_reuse needs the UNet down/up split; the MDTv2 "
                "(model.DiT) denoiser does not support it"
            )
        z = ddim_sample_unet(
            self.gd, self.unet, ldm_params["unet"], ldm_params["mixing_logit"],
            shape, rng_s, noise=noise, encoder_reuse=reuse,
        )
        # Run the decode+render leg in the stage-1 params' dtype (bf16 when the
        # caller casts params for sampling — flax promotion rules then keep the
        # whole conv/MXU path in bf16).
        p_dtype = jax.tree_util.tree_leaves(stage1_params["vae"])[0].dtype
        hdbf = self.vae.apply(
            {"params": stage1_params["vae"]}, z.astype(p_dtype), method=self.vae.decode
        )
        si = get_scale_injection(res, self.anchor)
        out = self._render_grid(stage1_params["mlp"], hdbf, res, si, rng_noise)
        img = out.reshape(batch, res, res, -1)
        return unsymmetrize(jnp.clip(img, -1.0, 1.0))
