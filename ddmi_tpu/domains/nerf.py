"""NeRF domain: point cloud -> triplane VAE -> volume-rendered rays.

TPU-native redesign of tools/d2c_vae/nerf.py + tools/ldm/nerf.py +
utils/nerf_helpers.py: the reference's chunked host loops (batchify_rays,
netchunk=40000) become one jitted render over the ray batch (lax.map tiles
only at image-render time); stratified sampling, triplane feature lookup
(pts/3.5, align_corners=True border — nerf_helpers.py:388-397), frequency
embeddings, and alpha compositing (raw2outputs :487-530) are pure jnp.

Latent packing quirk preserved: the stage-1 trainer concatenates
[xy | yz | xz] while Autoencoder3D.decode unpacks [xy | xz | yz]
(tools/d2c_vae/nerf.py:199 vs autoencoder_unet.py:907-916) — the planes swap
roles through the latent and training adapts.  We pack in decode order
([xy | xz | yz]) and document the deviation."""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, Dict, Optional, Tuple

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
from ddmi_tpu.nn.inr import FreqEmbedding, INRNeRF
from ddmi_tpu.nn.pointnet import LocalPoolPointnet
from ddmi_tpu.nn.triplane_vae import TriplaneAutoencoder
from ddmi_tpu.nn.unet import UNet
from ddmi_tpu.ops.pallas import attention as vmem_attn
from ddmi_tpu.ops.grid_sample import grid_sample_2d

# srn-cars camera intrinsics (tools/d2c_vae/nerf.py:174-177)
FOV = 0.6911112070083618
NEAR, FAR = 2.0, 6.0


def intrinsics(H: int, W: int) -> Tuple[float, float, float]:
    focal = 0.5 * W / math.tan(0.5 * FOV)
    return focal, 0.5 * W, 0.5 * H


def get_rays(H: int, W: int, c2w: jnp.ndarray):
    """Pixel rays in world frame (nerf_helpers.py:134-143): dirs =
    ((i-cx)/f, -(j-cy)/f, -1) rotated by c2w.  Returns (H,W,3) origins/dirs."""
    focal, cx, cy = intrinsics(H, W)
    i, j = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                        jnp.arange(H, dtype=jnp.float32), indexing="xy")
    dirs = jnp.stack(
        [(i - cx) / focal, -(j - cy) / focal, -jnp.ones_like(i)], -1
    )
    rays_d = jnp.einsum("hwc,rc->hwr", dirs, c2w[:3, :3])
    rays_o = jnp.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def sample_triplane(planes: Dict[str, jnp.ndarray], pts: jnp.ndarray):
    """Triplane features at 3D points: pts (n, s, 3) world -> (n, s, 3c).
    Planes NHWC with batch 1; coords = pts/3.5 per reference
    (nerf_helpers.py:388-397: xy <- pts[:, :2], yz <- pts[:, 1:],
    xz <- pts[:, [0,2]])."""
    p = (pts / 3.5).reshape(1, -1, 3)
    feats = []
    for key, sel in (("xy", (0, 1)), ("yz", (1, 2)), ("xz", (0, 2))):
        coords = p[..., list(sel)]
        feats.append(
            grid_sample_2d(planes[key], coords, align_corners=True,
                           padding_mode="border")
        )
    out = jnp.concatenate(feats, -1)
    return out.reshape(*pts.shape[:-1], -1)


def raw2outputs(raw, z_vals, rays_d, white_bkgd: bool):
    """Alpha compositing (nerf_helpers.py:487-530): softplus density."""
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], -1
    )
    dists = dists * jnp.linalg.norm(rays_d[..., None, :], axis=-1)
    rgb = raw[..., :3]
    alpha = 1.0 - jnp.exp(-jax.nn.softplus(raw[..., 3]) * dists)
    trans = jnp.cumprod(
        jnp.concatenate(
            [jnp.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], -1
        ),
        axis=-1,
    )[..., :-1]
    weights = alpha * trans
    rgb_map = jnp.sum(weights[..., None] * rgb, -2)
    acc_map = jnp.sum(weights, -1)
    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])
    return rgb_map, weights, acc_map


@dataclasses.dataclass
class NeRFPipeline:
    cfg: Config

    def __post_init__(self):
        m = self.cfg.model
        # pointnet + render kwargs from the nested convocc YAML
        # (data.conv_config -> convocc/src/config.py:13-58 inherit_from tree,
        # model.TN block of srncars_nerf_3plane.yaml); model.extra /
        # mlpconfig.extra remain config-free overrides for tests.
        self.conv_cfg = None
        tn = {}
        if self.cfg.data.conv_config:
            from ddmi_tpu.core.convocc_config import (
                load_convocc_config,
                nerf_kwargs,
                pointnet_kwargs,
            )

            self.conv_cfg = load_convocc_config(self.cfg.data.conv_config)
            pk = pointnet_kwargs(self.conv_cfg)
            tn = nerf_kwargs(self.conv_cfg)
        else:
            enc = m.extra.get("pointnet", {}) if isinstance(m.extra, dict) else {}
            pk = {
                "c_dim": enc.get("c_dim", m.ddconfig.in_channels),
                "hidden_dim": enc.get("hidden_dim", 256),
                "plane_resolution": enc.get(
                    "plane_resolution", m.ddconfig.resolution
                ),
                "n_blocks": enc.get("n_blocks", 7),
            }
        self.pointnet = LocalPoolPointnet(**pk)
        self.vae = TriplaneAutoencoder(m.ddconfig, embed_dim=m.embed_dim)
        mc = m.mlpconfig.extra if isinstance(m.mlpconfig.extra, dict) else {}
        multires = tn.get("multires", mc.get("multires", 10))
        multires_views = tn.get("multires_views", mc.get("multires_views", 4))
        self.embed_xyz = FreqEmbedding(multires)
        self.embed_dir = FreqEmbedding(multires_views)
        latent_dim = 3 * m.ddconfig.out_ch
        in_xyz = latent_dim + 3 * (2 * multires + 1)
        self.mlp = INRNeRF(
            depth=mc.get("D", 6),
            width=mc.get("W", 256),
            in_channels_xyz=in_xyz,
            in_channels_dir=3 * (2 * multires_views + 1),
            skips=tuple(mc.get("skips", (2, 4))),
        )
        dtype = jnp.bfloat16 if m.use_fp16 else jnp.float32
        self.unet = UNet(m.unetconfig, dtype=dtype)
        self.gd = GaussianDiffusion.from_config(m.ddpmconfig)
        self.lc = m.lossconfig
        # model.amp: bf16 compute for the stage-1 VAE/INR forward (fp32
        # master params + fp32 loss reductions, core/amp.py) — the reference
        # trains under Accelerate fp16 autocast (tools/d2c_vae/nerf.py:41-43).
        # Pointnet stays fp32 (coordinate2index scatter); ray/coordinate math
        # and alpha compositing stay fp32 inside render_rays.
        self.amp = bool(m.amp)
        self.n_samples = tn.get("N_samples", mc.get("N_samples", 256))
        self.n_rand = tn.get("N_rand", mc.get("N_rand", 5000))
        self.white_bkgd = tn.get("white_bkgd", mc.get("white_bkgd", True))
        self.perturb = tn.get("perturb", mc.get("perturb", 1.0))
        self.latent_res = m.ddconfig.resolution // 2 ** (len(m.ddconfig.ch_mult) - 1)
        self.img_res = self.cfg.data.extra.get("resolution", 128) \
            if isinstance(self.cfg.data.extra, dict) else 128

    # ----------------------------------------------------------- render core

    def _fused_mlp_gate(self) -> bool:
        """Fused VMEM NeRF-MLP dispatch (ops/pallas/nerf_mlp.py): TPU,
        forward-only traces, kernel-supported width.

        OPT-IN (DDMI_FUSED_NERF=1), default OFF: the round-5 on-chip A/B
        measured the kernel LOSING to XLA's pipeline — 121.8 ms vs 83.6 ms
        per 4096-ray tile, block-size invariant (1024/2048/3072), i.e.
        bound by its own serial per-block matmul chain; XLA overlaps the
        layer matmuls across the tile better than the VMEM-residency model
        predicted (the 117% cost-analysis HBM figure was an upper bound
        that real fusion already beat).  Full table in BASELINE.md.  Kept
        as measured groundwork: a future version needs cross-block matmul
        pipelining (grid-level double buffering of h), not more VMEM."""
        import os as _os

        from ddmi_tpu.ops.platform import on_tpu as _on_tpu

        return (
            bool(_os.environ.get("DDMI_FUSED_NERF"))
            and _on_tpu()
            and vmem_attn.is_inference()
            and self.mlp.width == 256
        )

    def _fold_for_sampling(self, mlp_params):
        """FoldedNeRF weights when the fused path is active, else None.
        Callers that tile rays (render_image's lax.map) fold ONCE out here
        instead of per tile inside the map body."""
        if not self._fused_mlp_gate():
            return None
        from ddmi_tpu.ops.pallas.nerf_mlp import fold_nerf_params

        return fold_nerf_params(
            mlp_params, self.mlp.depth, self.mlp.width,
            self.mlp.in_channels_xyz, self.mlp.in_channels_dir,
            self.mlp.skips,
        )

    def render_rays(
        self, mlp_params, planes, rays_o, rays_d, rng,
        perturb: Optional[float] = None, folded=None,
    ):
        """rays_o/d (n, 3) -> rgb (n, 3)."""
        n = rays_o.shape[0]
        perturb = self.perturb if perturb is None else perturb
        t = jnp.linspace(0.0, 1.0, self.n_samples)
        z = NEAR * (1 - t) + FAR * t
        z = jnp.broadcast_to(z, (n, self.n_samples))
        if perturb > 0:
            mids = 0.5 * (z[..., 1:] + z[..., :-1])
            upper = jnp.concatenate([mids, z[..., -1:]], -1)
            lower = jnp.concatenate([z[..., :1], mids], -1)
            z = lower + (upper - lower) * jax.random.uniform(rng, z.shape)

        pts = rays_o[:, None] + rays_d[:, None] * z[..., None]  # (n, s, 3)
        feat = sample_triplane(planes, pts)  # (n, s, 3c)
        viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

        e_xyz = self.embed_xyz(pts)
        e_dir = jnp.broadcast_to(
            self.embed_dir(viewdirs)[:, None],
            (n, self.n_samples, 3 * (2 * self.embed_dir.n_freqs + 1)),
        )
        # MLP compute in the params' dtype (bf16 when the caller casts params
        # for sampling — same promotion discipline as the image render,
        # domains/image.py::sample_images).  Coordinates, frequency args and
        # the alpha compositing stay fp32: bf16's 8 mantissa bits would
        # quantize grid coords and transmittance products.
        p_dtype = jax.tree_util.tree_leaves(mlp_params)[0].dtype
        x = jnp.concatenate([feat, e_xyz, e_dir], -1).astype(p_dtype)
        # Sampling/eval on TPU: run the WHOLE INRNeRF out of VMEM per point
        # tile (ops/pallas/nerf_mlp.py) — XLA runs it as ~11 HBM-round-trip
        # matmuls and the render tile sits at the HBM wall (117% of
        # cost-analysis bytes, BASELINE.md round-5 NeRF decomposition).
        # Forward-only kernel, so gated on inference_mode like the VMEM
        # attention; DDMI_NO_FUSED_NERF flips the on-chip A/B.
        if folded is None and self._fused_mlp_gate():
            folded = self._fold_for_sampling(mlp_params)
        if folded is not None:
            from ddmi_tpu.ops.pallas.nerf_mlp import nerf_mlp_fused

            raw = nerf_mlp_fused(
                folded, x.reshape(n * self.n_samples, -1)
            ).reshape(n, self.n_samples, 4)
        else:
            raw = self.mlp.apply({"params": mlp_params}, x).astype(
                jnp.float32
            )
        rgb, _, _ = raw2outputs(raw, z, rays_d, self.white_bkgd)
        return rgb

    def decode_planes(self, stage1_params, z):
        """z (b, r, r, 3*embed) -> dict of fine planes (the NeRF path uses
        the single decoded plane per axis — hdbf_resolutions is empty in
        srn_cars.yaml, so each pyramid has one level)."""
        p_dtype = jax.tree_util.tree_leaves(stage1_params["vae"])[0].dtype
        pyr_xy, pyr_yz, pyr_xz = self.vae.apply(
            {"params": stage1_params["vae"]}, z.astype(p_dtype),
            method=self.vae.decode,
        )
        return {"xy": pyr_xy[0], "yz": pyr_yz[0], "xz": pyr_xz[0]}

    def encode_planes(self, params, cloud, rng):
        fea = self.pointnet.apply({"params": params["pointnet"]}, cloud)
        # run the VAE in its params' dtype (bf16 under model.amp — flax
        # promotion would silently bounce back to fp32 on fp32 activations)
        p_dtype = jax.tree_util.tree_leaves(params["vae"])[0].dtype
        posts = self.vae.apply(
            {"params": params["vae"]},
            (fea["xy"].astype(p_dtype), fea["yz"].astype(p_dtype),
             fea["xz"].astype(p_dtype)),
            method=self.vae.encode,
        )
        r1, r2, r3 = jax.random.split(rng, 3)
        xy, yz, xz = posts[0].sample(r1), posts[1].sample(r2), posts[2].sample(r3)
        # pack in Autoencoder3D.decode slice order [xy | xz | yz]
        z = jnp.concatenate([xy, xz, yz], axis=-1)
        return z, posts

    # ---------------------------------------------------------------- stage 1

    def init_stage1(self, rng, steps_per_epoch: int = 1000) -> Stage1State:
        m = self.cfg.model
        r1, r2, r3, r4 = jax.random.split(rng, 4)
        cloud = jnp.zeros((1, 64, 6))
        pn_params = self.pointnet.init({"params": r1}, cloud)["params"]
        planes = tuple(
            jnp.zeros((1, m.ddconfig.resolution, m.ddconfig.resolution,
                       m.ddconfig.in_channels))
            for _ in range(3)
        )
        vae_params = self.vae.init({"params": r2}, planes, r3)["params"]
        in_dim = self.mlp.in_channels_xyz + self.mlp.in_channels_dir
        mlp_params = self.mlp.init({"params": r4}, jnp.zeros((8, in_dim)))[
            "params"
        ]
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

    def stage1_loss(self, params, sn_state, batch, rng, step):
        """20*sum|rgb - target| over sampled rays + KL + SN
        (tools/d2c_vae/nerf.py:215-238)."""
        from ddmi_tpu.core.amp import compute_cast, f32

        lc = self.lc
        rng_enc, rng_scene = jax.random.split(rng)
        cloud = batch["points"]       # (b, n, 6)
        image = batch["image"]        # (b, H, W, 3) target views in [0,1]
        pose = batch["pose"]          # (b, 4, 4)
        b = cloud.shape[0]

        # bf16 compute region (fp32 master params; rays/compositing fp32)
        p_cast = dict(
            params,
            vae=compute_cast(params["vae"], self.amp),
            mlp=compute_cast(params["mlp"], self.amp),
        )
        z, posts = self.encode_planes(p_cast, cloud, rng_enc)
        planes = self.decode_planes({"vae": p_cast["vae"]}, z)

        H, W = image.shape[1:3]

        # vmap the ray-sampled render per scene: each scene draws its own
        # rays from its own pose (the reference trains at batch 1/GPU,
        # tools/d2c_vae/nerf.py:184-192 + srn_cars.yaml batch_size 1; here
        # batching is the TPU-native way to fill the chip)
        def per_scene(planes_1, image_1, pose_1, rng_1):
            rng_pix, rng_ray = jax.random.split(rng_1)
            planes_1 = jax.tree_util.tree_map(lambda a: a[None], planes_1)
            rays_o, rays_d = get_rays(H, W, pose_1)
            idx = jax.random.choice(
                rng_pix, H * W, (self.n_rand,), replace=False
            )
            ro = rays_o.reshape(-1, 3)[idx]
            rd = rays_d.reshape(-1, 3)[idx]
            target = image_1.reshape(-1, 3)[idx]
            rgb = self.render_rays(p_cast["mlp"], planes_1, ro, rd, rng_ray)
            return 20.0 * jnp.sum(jnp.abs(rgb - target))

        recon = jax.vmap(per_scene)(
            planes, image, pose, jax.random.split(rng_scene, b)
        ).mean()

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

    # ---------------------------------------------------------------- stage 2

    def init_stage2(self, rng, steps_per_epoch: int = 1000) -> Stage2State:
        m = self.cfg.model
        r = self.latent_res
        x = jnp.zeros((1, r, r, m.unetconfig.in_channels))
        unet_params = self.unet.init(
            {"params": rng}, x, jnp.zeros((1,), jnp.int32)
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

    def stage2_loss(self, params, stage1_params, batch, rng):
        from ddmi_tpu.core.amp import amp_denoiser, compute_cast, f32

        rng_enc, rng_diff = jax.random.split(rng)
        # frozen stage-1 encode in bf16 under model.amp (encode_planes runs
        # in the params' dtype); fp32 tokens for exact diffusion math
        z, _ = self.encode_planes(
            compute_cast(stage1_params, self.amp), batch["points"], rng_enc
        )
        z = jax.lax.stop_gradient(f32(z))
        # bf16 denoiser forward / fp32 diffusion math (core/amp.py)
        model_fn = amp_denoiser(
            lambda p, xt, t: self.unet.apply({"params": p}, xt, t),
            params["unet"], self.amp,
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

    def render_image(self, stage1_params, planes, pose, H, W, rng,
                     ray_chunk: int = 4096):
        """Full-image render, lax.map over ray tiles (replaces batchify_rays
        host chunking, nerf_helpers.py:281-293)."""
        rays_o, rays_d = get_rays(H, W, pose)
        ro = rays_o.reshape(-1, 3)
        rd = rays_d.reshape(-1, 3)
        n = ro.shape[0]
        pad = (-n) % ray_chunk
        ro = jnp.pad(ro, ((0, pad), (0, 0)))
        rd = jnp.pad(rd, ((0, pad), (0, 0)))
        chunks = (n + pad) // ray_chunk
        rngs = jax.random.split(rng, chunks)
        # fold the fused-kernel weights ONCE per image, not per map tile
        folded = self._fold_for_sampling(stage1_params["mlp"])

        def render(args):
            o, d, r = args
            return self.render_rays(
                stage1_params["mlp"], planes, o, d, r, perturb=0.0,
                folded=folded,
            )

        rgb = jax.lax.map(
            render,
            (ro.reshape(chunks, ray_chunk, 3), rd.reshape(chunks, ray_chunk, 3),
             rngs),
        ).reshape(-1, 3)[:n]
        return rgb.reshape(H, W, 3)

    def spherical_poses(self, n_views: int, radius: float = 1.3,
                        elevation: float = -0.3):
        """Camera path for generation (tools/ldm/nerf.py:243-275 spherical
        trajectory)."""
        import numpy as np

        poses = []
        for theta in np.linspace(0, 2 * np.pi, n_views, endpoint=False):
            cam_pos = np.array(
                [radius * np.cos(theta),
                 radius * np.sin(theta),
                 -radius * elevation]
            )
            forward = -cam_pos / np.linalg.norm(cam_pos)
            up = np.array([0.0, 0.0, 1.0])
            right = np.cross(forward, up)
            right /= np.linalg.norm(right)
            up2 = np.cross(right, forward)
            c2w = np.eye(4)
            c2w[:3, 0] = right
            c2w[:3, 1] = up2
            c2w[:3, 2] = -forward
            c2w[:3, 3] = cam_pos
            poses.append(c2w)
        return jnp.asarray(np.stack(poses), jnp.float32)

    def sample_latents(self, ldm_params, rng, batch: int, noise=None):
        """DDIM sample z (b, r, r, 3*embed) (tools/ldm/nerf.py:239-241)."""
        m = self.cfg.model
        r = self.latent_res
        shape = (batch, r, r, m.ddpmconfig.channels)
        return ddim_sample_unet(
            self.gd, self.unet, ldm_params["unet"], ldm_params["mixing_logit"],
            shape, rng, noise=noise,
            encoder_reuse=int(m.ddpmconfig.extra.get("encoder_reuse", 1)),
        )

    def render_camera_path(self, stage1_params, z1, rng, poses,
                           H: int, W: int):
        """ONE jittable program per scene: decode planes + lax.map over the
        camera path (the reference loops host-side per view,
        tools/ldm/nerf.py:243-275).  z1 (1, r, r, C) -> (views, H, W, 3).

        Stable method (not a per-call closure) so callers can
        `jax.jit(pipe.render_camera_path, static_argnums=(4, 5))` ONCE and
        hit the trace cache across requests — the serving layer does."""
        # generation is a forward-only trace: enables the fused VMEM NeRF
        # MLP in render_rays (and any inference-only attention tiers)
        with vmem_attn.inference_mode():
            planes = self.decode_planes(stage1_params, z1)

            def one(pose):
                return self.render_image(
                    stage1_params, planes, pose, H, W, rng
                )

            return jax.lax.map(one, poses)

    def sample_nerfs(self, ldm_params, stage1_params, rng, batch: int,
                     n_views: int = 8, H: int = 128, W: int = 128,
                     noise=None):
        """DDIM sample latents -> decode planes -> render a camera path.
        `noise` optionally fixes the initial diffusion noise (b, r, r, C)
        for deterministic serving."""
        rng_s, rng_r = jax.random.split(rng)
        z = self.sample_latents(ldm_params, rng_s, batch, noise=noise)
        poses = self.spherical_poses(n_views)
        render = jax.jit(self.render_camera_path, static_argnums=(4, 5))
        out = [
            render(stage1_params, z[b : b + 1], rng_r, poses, H, W)
            for b in range(batch)
        ]
        return jnp.stack(out)  # (batch, views, H, W, 3)
