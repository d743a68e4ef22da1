"""3D occupancy domain: PointNet -> triplane D2C-VAE -> MLP3D, and latent
diffusion over channel-concat triplane latents.

TPU-native redesign of tools/d2c_vae/occupancy.py + tools/ldm/occupancy.py:
stage-1 trains pointnet+VAE+INR3D with BCE occupancy loss at 2048 query
points; stage-2 diffuses z = channel-concat [xy|xz|yz] plane latents
(tools/ldm/occupancy.py:164-166, sample shape (b, 3*embed, 16, 16)).
Mesh extraction (MISE + marching cubes) lives in ddmi_tpu.geometry."""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ddmi_tpu.core.config import Config
from ddmi_tpu.core.coords import linear_kl_coeff
from ddmi_tpu.core.ema import ema_update
from ddmi_tpu.core.sn_reg import init_sn_state, norm_scale_loss, spectral_norm_loss
from ddmi_tpu.diffusion.process import (
    GaussianDiffusion,
    ddim_sample,
    ddim_sample_unet,
    diffusion_loss,
)
from ddmi_tpu.domains.image import Stage1State, Stage2State
from ddmi_tpu.nn.inr import INR3D
from ddmi_tpu.nn.pointnet import LocalPoolPointnet
from ddmi_tpu.nn.triplane_vae import TriplaneAutoencoder
from ddmi_tpu.nn.unet import UNet


@dataclasses.dataclass
class OccupancyPipeline:
    cfg: Config

    def __post_init__(self):
        m = self.cfg.model
        # Encoder/generation kwargs come from the nested convocc YAML tree
        # referenced by data.conv_config (reference convocc/src/config.py:13-58
        # via configs/ldm/shapenet.yaml:80); model.extra["pointnet"] remains a
        # config-free override for tests.
        self.conv_cfg = None
        self.generation_kwargs = {}
        if self.cfg.data.conv_config:
            from ddmi_tpu.core.convocc_config import (
                encoder_name,
                generation_kwargs,
                load_convocc_config,
                pointnet_kwargs,
                voxel_encoder_kwargs,
            )

            self.conv_cfg = load_convocc_config(self.cfg.data.conv_config)
            self.generation_kwargs = generation_kwargs(self.conv_cfg)
            if encoder_name(self.conv_cfg) == "voxel_simple_local":
                from ddmi_tpu.nn.pointnet import LocalVoxelEncoder

                self.pointnet = LocalVoxelEncoder(
                    **voxel_encoder_kwargs(self.conv_cfg)
                )
            else:
                self.pointnet = LocalPoolPointnet(
                    **pointnet_kwargs(self.conv_cfg)
                )
        else:
            enc = m.extra.get("pointnet", {}) if isinstance(m.extra, dict) else {}
            self.pointnet = LocalPoolPointnet(
                c_dim=enc.get("c_dim", m.ddconfig.in_channels),
                hidden_dim=enc.get("hidden_dim", 256),
                plane_resolution=enc.get(
                    "plane_resolution", m.ddconfig.resolution
                ),
                n_blocks=enc.get("n_blocks", 7),
            )
        self.vae = TriplaneAutoencoder(m.ddconfig, embed_dim=m.embed_dim)
        self.mlp = INR3D(m.mlpconfig)
        dtype = jnp.bfloat16 if m.use_fp16 else jnp.float32
        self.unet = UNet(m.unetconfig, dtype=dtype)
        self.gd = GaussianDiffusion.from_config(m.ddpmconfig)
        self.lc = m.lossconfig
        # model.amp: bf16 compute for the stage-1 VAE/MLP3D forward (fp32
        # master params + fp32 loss reductions, core/amp.py) — the reference
        # trains every domain under Accelerate fp16 autocast
        # (tools/d2c_vae/occupancy.py:37-39).  The pointnet stays fp32: its
        # coordinate2index scatter needs exact coordinates and it is a small
        # share of the step.
        self.amp = bool(m.amp)
        self.latent_res = m.ddconfig.resolution // 2 ** (len(m.ddconfig.ch_mult) - 1)

    # ---------------------------------------------------------------- stage 1

    def init_stage1(self, rng, steps_per_epoch: int = 1000) -> Stage1State:
        m = self.cfg.model
        r1, r2, r3, r4 = jax.random.split(rng, 4)
        pts = jnp.zeros((1, 64, 3))
        pn_params = self.pointnet.init({"params": r1}, pts)["params"]
        planes = tuple(
            jnp.zeros((1, m.ddconfig.resolution, m.ddconfig.resolution,
                       m.ddconfig.in_channels))
            for _ in range(3)
        )
        vae_params = self.vae.init({"params": r2}, planes, r3)["params"]
        pyr = lambda: [
            jnp.zeros((1, r, r, m.ddconfig.out_ch))
            for r in sorted(m.ddconfig.hdbf_resolutions) + [m.ddconfig.resolution]
        ]
        mlp_params = self.mlp.init(
            {"params": r4}, jnp.zeros((1, 8, 3)), (pyr(), pyr(), pyr())
        )["params"]
        params = {"pointnet": pn_params, "vae": vae_params, "mlp": mlp_params}
        self._stage1_total_iters = steps_per_epoch * self.lc.epochs
        tx = self.stage1_optimizer(steps_per_epoch)
        return Stage1State(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            sn_state=init_sn_state(params["vae"], jax.random.PRNGKey(7)),
        )

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

    def _encode_decode(self, params, cloud, rng):
        fea = self.pointnet.apply({"params": params["pointnet"]}, cloud)
        # run the VAE in its params' dtype (bf16 under model.amp — flax
        # promotion would silently bounce back to fp32 on fp32 activations)
        p_dtype = jax.tree_util.tree_leaves(params["vae"])[0].dtype
        planes = (fea["xy"].astype(p_dtype), fea["yz"].astype(p_dtype),
                  fea["xz"].astype(p_dtype))
        pyramids, posts = self.vae.apply(
            {"params": params["vae"]}, planes, rng, sample_posterior=True
        )
        return pyramids, posts

    def stage1_loss(self, params, sn_state, batch, rng, step):
        """BCE(query occupancies) + annealed KL + SN-reg
        (tools/d2c_vae/occupancy.py:loss assembly)."""
        lc = self.lc
        cloud = batch["inputs"]      # (b, 3000, 3) noisy surface points
        points = batch["points"]     # (b, 2048, 3) query points
        occ = batch["occ"]           # (b, 2048) in {0,1}

        from ddmi_tpu.core.amp import compute_cast, f32

        # bf16 compute region (fp32 master params; query coords stay fp32)
        p_cast = dict(
            params,
            vae=compute_cast(params["vae"], self.amp),
            mlp=compute_cast(params["mlp"], self.amp),
        )
        pyramids, posts = self._encode_decode(p_cast, cloud, rng)
        logits = self.mlp.apply({"params": p_cast["mlp"]}, points, pyramids)
        bce = optax.sigmoid_binary_cross_entropy(
            f32(logits), occ
        ).sum(-1).mean()

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
        loss = bce + kl_coeff * kld

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

        metrics = {"loss": loss, "bce": bce, "kl": kld,
                   "kl_coeff": kl_coeff, "sn": sn}
        return loss, (metrics, new_sn)

    def stage1_train_step(self, tx, state: Stage1State, batch, rng):
        (_, (metrics, sn_state)), grads = jax.value_and_grad(
            self.stage1_loss, has_aux=True
        )(state.params, state.sn_state, batch, rng, state.step)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            state.replace(step=state.step + 1, params=params,
                          opt_state=opt_state, sn_state=sn_state),
            metrics,
        )

    def occupancy_logits(self, params, cloud, query_points, rng):
        """Encode a point cloud and evaluate occupancy logits at query points
        (the eval_points path of mesh generation)."""
        pyramids, _ = self._encode_decode(params, cloud, rng)
        return self.mlp.apply({"params": params["mlp"]}, query_points, pyramids)

    # ---------------------------------------------------------------- stage 2

    def init_stage2(self, rng, steps_per_epoch: int = 1000) -> Stage2State:
        m = self.cfg.model
        r1, _ = jax.random.split(rng)
        r = self.latent_res
        x = jnp.zeros((1, r, r, m.unetconfig.in_channels))
        unet_params = self.unet.init(
            {"params": r1}, x, jnp.zeros((1,), jnp.int32)
        )["params"]
        params = {
            "unet": unet_params,
            "mixing_logit": jnp.full(
                (1, 1, 1, m.ddpmconfig.channels), m.ddpmconfig.mixed_init,
                jnp.float32,
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

    def encode_latents(self, stage1_params, cloud, rng):
        """z = channel-concat sampled plane latents [xy|xz|yz]
        (tools/ldm/occupancy.py:164-166).  Frozen encoder runs bf16 under
        model.amp; tokens return fp32 for exact diffusion math."""
        from ddmi_tpu.core.amp import compute_cast, f32

        amp = bool(self.cfg.model.amp)
        p1 = compute_cast(stage1_params, amp)
        fea = self.pointnet.apply({"params": p1["pointnet"]}, cloud)
        posts = self.vae.apply(
            {"params": p1["vae"]},
            (compute_cast(fea["xy"], amp), compute_cast(fea["yz"], amp),
             compute_cast(fea["xz"], amp)),
            method=self.vae.encode,
        )
        r1, r2, r3 = jax.random.split(rng, 3)
        xy, yz, xz = posts[0].sample(r1), posts[1].sample(r2), posts[2].sample(r3)
        return jax.lax.stop_gradient(f32(jnp.concatenate([xy, xz, yz], axis=-1)))

    def stage2_loss(self, params, stage1_params, batch, rng):
        from ddmi_tpu.core.amp import amp_denoiser

        rng_enc, rng_diff = jax.random.split(rng)
        z = self.encode_latents(stage1_params, batch["inputs"], rng_enc)
        # bf16 denoiser forward / fp32 diffusion math (core/amp.py)
        model_fn = amp_denoiser(
            lambda p, xt, t: self.unet.apply({"params": p}, xt, t),
            params["unet"], bool(self.cfg.model.amp),
        )
        return diffusion_loss(self.gd, model_fn, params["mixing_logit"], z, rng_diff)

    def stage2_train_step(self, tx, state: Stage2State, stage1_params, batch, rng):
        (_, aux), grads = jax.value_and_grad(self.stage2_loss, has_aux=True)(
            state.params, stage1_params, batch, rng
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

    def sample_latents(self, ldm_params, rng, batch: int, noise=None):
        """DDIM sample z (b, r, r, 3*embed) (tools/ldm/occupancy.py:215)."""
        m = self.cfg.model
        r = self.latent_res
        shape = (batch, r, r, m.ddpmconfig.channels)
        return ddim_sample_unet(
            self.gd, self.unet, ldm_params["unet"], ldm_params["mixing_logit"],
            shape, rng, noise=noise,
            encoder_reuse=int(m.ddpmconfig.extra.get("encoder_reuse", 1)),
        )

    def decode_pyramids(self, stage1_params, z):
        """Latent z (b, r, r, 3*embed) -> HDBF triplane pyramids (jittable;
        the VAE decode half of convocc generation.py:79-82)."""
        return self.vae.apply(
            {"params": stage1_params["vae"]}, z, method=self.vae.decode
        )

    def logits_from_pyramids(self, stage1_params, points, pyramids):
        """Query occupancy logits at points (b, n, 3) given decoded pyramids
        (jittable; the eval_points half of convocc generation.py:123-144).
        Split from decode_pyramids so serving can compile each ONCE and
        reuse across samples instead of re-tracing per mesh."""
        return self.mlp.apply(
            {"params": stage1_params["mlp"]}, points, pyramids
        )

    def decode_logits_fn(self, stage1_params, z):
        """Return a jittable fn(points (b,n,3)) -> logits for mesh extraction
        (convocc generation.py eval_points equivalent)."""
        pyramids = self.decode_pyramids(stage1_params, z)

        def eval_points(points):
            return self.logits_from_pyramids(stage1_params, points, pyramids)

        return eval_points
