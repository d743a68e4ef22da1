"""Secondary benchmark: video generation throughput on one chip.

The reference's video headline protocol is FVD over 16-frame 256^2
SkyTimelapse clips sampled at NFE=200 (configs/ldm/skytimelapse.yaml:73,
evals/eval.py:254-345).  This measures that full generation path — DDIM scan
over [xy|xt|yt] latent tokens through the triplane UNet (cross-plane 1D
attention after every block) + shared-weight VideoDecoder + per-frame voxel
INR render — as one jitted program.

Same discipline as bench.py: params-only init, bf16 weights, persistent
compile cache, host-materializing readback timing.  Prints ONE JSON line
(bench.py remains the driver headline; this is the measured video record
for BASELINE.md).
"""

import json
import os
import time

import jax
import jax.numpy as jnp

_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from ddmi_tpu.core.config import load_config
from ddmi_tpu.domains.video import VideoPipeline

NFE = 200  # reference FVD protocol (configs/ldm/skytimelapse.yaml:73)

# Analytic A100 baseline: dual-wall model shared with bench_3d.py — FLOP
# wall (30-40% torch-eager MFU band over our measured FLOPs) vs kernel-
# launch wall (the reference's Python DDIM loop serializes NFE x 2838
# measured aten dispatches per TriplaneUNet forward, refops.json).  See
# bench_baseline.py for the derivation and generosity direction.
from bench_baseline import baseline_fields, flops_per_item, load_refops
# DDMI_VIDEO_BATCH: A/B the sampling batch.  2 is the record batch every
# round-2/3 number was measured at; other batches are labeled non-protocol
# in the JSON (same comparability rule as bench.py's DDMI_BENCH_BATCH).
BATCH = int(os.environ.get("DDMI_VIDEO_BATCH", "2"))
FRAMES = 16


def _bf16(tree):
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, tree
    )


def main():
    cfg = load_config("configs/ldm/skytimelapse.yaml")
    object.__setattr__(cfg.model.ddpmconfig, "sampling_timesteps", NFE)
    # DDMI_ENCODER_REUSE=k: A/B the turbo sampler (non-protocol; labeled)
    reuse = int(os.environ.get("DDMI_ENCODER_REUSE", "1"))
    if reuse > 1:
        cfg.model.ddpmconfig.extra["encoder_reuse"] = reuse
    pipe = VideoPipeline(cfg)

    s1 = pipe.init_stage1_params(jax.random.PRNGKey(0))
    s2 = pipe.init_stage2_params(jax.random.PRNGKey(1))
    ldm_params = {"unet": _bf16(s2["unet"]), "mixing_logit": s2["mixing_logit"]}
    s1_params = _bf16(s1)
    jax.block_until_ready((ldm_params, s1_params))
    del s1, s2

    sample = jax.jit(
        lambda lp, sp, r: pipe.sample_videos(lp, sp, r, batch=BATCH)
    )
    flops_per_video = flops_per_item(
        sample.lower(ldm_params, s1_params, jax.random.PRNGKey(2)).compile(),
        BATCH,
    )
    # XLA cost analysis counts the DDIM scan body ONCE (bench_baseline.py):
    # add the other NFE-1 TriplaneUNet forwards.  The 15 uncounted
    # render_frame map iterations (~1% of time) are left out — generous to
    # the reference.
    from bench_baseline import flops_of

    unet_fwd = flops_of(
        lambda p, x, t: pipe.unet.apply({"params": p}, x, t),
        ldm_params["unet"],
        jax.ShapeDtypeStruct(
            (BATCH, pipe.n_latent_tokens, cfg.model.ddpmconfig.channels),
            jnp.float32,
        ),
        jax.ShapeDtypeStruct((BATCH,), jnp.int32),
    )
    if flops_per_video and unet_fwd:
        flops_per_video += (NFE - 1) * unet_fwd / BATCH
    # Reference eager dispatches per video: the NFE-step Python DDIM loop's
    # TriplaneUNet forwards (batch-shared launches); the one decode + render
    # pass is excluded from the floor (generous to the reference).
    unet_ops = load_refops().get("video_unet_fwd")
    eager_ops = NFE * unet_ops / BATCH if unet_ops else None

    out = sample(ldm_params, s1_params, jax.random.PRNGKey(2))
    float(out.mean())  # host readback: compile + warmup fully complete

    iters = 2
    t0 = time.perf_counter()
    for i in range(iters):
        out = sample(ldm_params, s1_params, jax.random.PRNGKey(3 + i))
    float(out.mean())
    dt = time.perf_counter() - t0

    videos_per_sec = (iters * BATCH) / dt
    print(
        json.dumps(
            {
                "metric": f"videos/sec/chip, {FRAMES}f 256^2 gen, NFE={NFE}"
                + (f", encoder_reuse={reuse} (turbo, non-protocol)"
                   if reuse > 1 else "")
                + (f", batch={BATCH} (non-protocol)" if BATCH != 2 else ""),
                "value": round(videos_per_sec, 4),
                "unit": "videos/sec/chip",
                "frames_per_sec": round(videos_per_sec * FRAMES, 2),
                "batch": BATCH,
                **baseline_fields(videos_per_sec, flops_per_video,
                                  eager_ops=eager_ops),
            }
        )
    )


if __name__ == "__main__":
    main()
