"""Quantify the sample drift of encoder-reuse turbo sampling (opt-in).

`encoder_reuse=K` (arXiv:2312.09608 encoder propagation) skips the UNet
down path on K-1 of every K DDIM steps, reusing cached encoder features.
It buys throughput (+16% at K=2, measured, BASELINE.md) but CHANGES the
samples.  This harness puts a number on "changes": same-seed exact (K=1)
vs turbo (K in {2,3,4}) at NFE in {50,100,200}, reporting

  * latent MSE            — drift of the DDIM endpoint z
  * pixel MSE / PSNR      — drift of the rendered 256^2 image
  * inception feat dist   — mean per-sample L2 between pool3 features

PROXY CAVEAT (labeled in the output): no trained DDMI weights or
pretrained Inception weights exist in this environment (zero egress), so
both the denoiser and the feature net are RANDOM-INIT.  Same-seed drift
between two trajectories of the *same* model is still well-defined and
the speed side of the trade-off is exact; absolute quality deltas (FID)
on trained weights will differ and should be re-measured by a user with
real checkpoints (the same script works: point it at converted params).

Protocol notes: batch 8 (bench.py default), fixed init noise shared by
every run at a given NFE, fixed render rng — the ONLY varied factor is K.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from ddmi_tpu.core.config import load_config
from ddmi_tpu.diffusion.process import ddim_sample_unet
from ddmi_tpu.domains.image import ImagePipeline
from ddmi_tpu.evals.inception import InceptionV3

BATCH = 8
RESOLUTION = 256
NFES = (50, 100, 200)
KS = (1, 2, 3, 4)


def _bf16(tree):
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, tree
    )


def main():
    cfg = load_config("configs/ldm/celebahq.yaml")
    pipe = ImagePipeline(cfg)
    u = cfg.model.ddpmconfig
    shape = (BATCH, u.image_size, u.image_size, u.channels)

    s1 = pipe.init_stage1_params(jax.random.PRNGKey(0))
    s2 = pipe.init_stage2_params(jax.random.PRNGKey(1))

    # Two proxy fixes, both needed for drift to be measurable at all
    # (measured: without them exact and turbo samples are BIT-IDENTICAL
    # at every K — the only nonzero rows were 1-ULP bf16 render
    # nondeterminism):
    #   1. The ADM UNet zero-inits conv_out + every ResBlock/attn output
    #      projection (nn/unet.py:80,138,343), so at init the denoiser is
    #      EXACTLY the zero function and encoder features cannot affect
    #      the output.  Perturb all params with small gaussian noise to
    #      make it a nontrivial random function.
    #   2. mixed-prediction blend: out = c*model + (1-c)*sqrt(1-abar)*x_t
    #      with c = sigmoid(mixing_logit).  At the INIT value (-6) the
    #      model contributes 0.25%; trained models learn a model-dominant
    #      blend, so force +6 (c = 99.75%) — the worst case for drift,
    #      hence an upper-bound-flavored proxy.
    def _perturb(tree, key, scale=0.05):
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        keys = jax.random.split(key, len(leaves))
        return jax.tree_util.tree_unflatten(treedef, [
            l + scale * jax.random.normal(k, l.shape, l.dtype)
            for l, k in zip(leaves, keys)
        ])

    ldm = {
        "unet": _bf16(_perturb(s2["unet"], jax.random.PRNGKey(99))),
        "mixing_logit": jnp.full_like(s2["mixing_logit"], 6.0),
    }
    s1p = _bf16(s1)
    jax.block_until_ready((ldm, s1p))
    del s1, s2

    # Random-init Inception feature net (PROXY — see module docstring).
    incep = InceptionV3()
    ip = incep.init(jax.random.PRNGKey(7), jnp.zeros((1, 299, 299, 3)))[
        "params"
    ]

    # params always passed as jit ARGUMENTS — closing over them captures
    # ~2 GB of weights as compile-time constants and stalls lowering
    def _feats(p, img):  # img in [0,1]; net resizes+normalizes internally
        pool, _ = incep.apply({"params": p}, img)
        return pool

    feats_j = jax.jit(_feats)

    def _render(sp, z):
        hdbf = pipe.vae.apply(
            {"params": sp["vae"]}, z.astype(jnp.bfloat16),
            method=pipe.vae.decode,
        )
        from ddmi_tpu.core.coords import get_scale_injection, unsymmetrize

        si = get_scale_injection(RESOLUTION, pipe.anchor)
        out = pipe._render_grid(
            sp["mlp"], hdbf, RESOLUTION, si, jax.random.PRNGKey(11)
        )
        img = out.reshape(BATCH, RESOLUTION, RESOLUTION, -1)
        return unsymmetrize(jnp.clip(img, -1.0, 1.0))

    render = jax.jit(_render)

    rows = []
    for nfe in NFES:
        object.__setattr__(cfg.model.ddpmconfig, "sampling_timesteps", nfe)
        pipe_n = ImagePipeline(cfg)
        noise = jax.random.normal(jax.random.PRNGKey(42), shape)
        ref_img = ref_feat = ref_z = None
        for k in KS:
            fn = jax.jit(
                lambda lp, nz, r, _k=k, _p=pipe_n: ddim_sample_unet(
                    _p.gd, _p.unet, lp["unet"], lp["mixing_logit"],
                    shape, r, noise=nz, encoder_reuse=_k,
                )
            )
            z = fn(ldm, noise, jax.random.PRNGKey(5))  # compile + warmup
            float(z.mean())
            t0 = time.perf_counter()
            z = fn(ldm, noise, jax.random.PRNGKey(5))
            float(z.mean())
            dt = time.perf_counter() - t0
            img = render(s1p, z)
            f = feats_j(ip, img)
            if k == 1:
                ref_z, ref_img, ref_feat = z, img, f
                row = dict(nfe=nfe, k=1, scan_s=round(dt, 3))
            else:
                lat_mse = float(jnp.mean((z - ref_z) ** 2))
                px_mse = float(jnp.mean((img - ref_img) ** 2))
                psnr = float(-10.0 * jnp.log10(jnp.maximum(px_mse, 1e-12)))
                fd = float(
                    jnp.mean(jnp.linalg.norm(f - ref_feat, axis=-1))
                )
                row = dict(
                    nfe=nfe, k=k, scan_s=round(dt, 3),
                    latent_mse=round(lat_mse, 6),
                    pixel_mse=round(px_mse, 6),
                    psnr_vs_exact_db=round(psnr, 2),
                    incep_feat_l2=round(fd, 4),
                )
            base = next(r for r in rows if r["nfe"] == nfe and r["k"] == 1) \
                if k > 1 else row
            row["speedup_vs_exact"] = round(base["scan_s"] / row["scan_s"], 3)
            rows.append(row)
            print(json.dumps(row), flush=True)

    print(json.dumps({
        "bench": "turbo drift (encoder_reuse), RANDOM-INIT PROXY — "
                 "re-run with trained weights for absolute quality",
        "batch": BATCH, "resolution": RESOLUTION, "rows": rows,
    }))


if __name__ == "__main__":
    main()
