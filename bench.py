"""Headline benchmark: samples/sec/chip for 256x256 image generation at
NFE=100 (BASELINE.md north star).

Runs the full generation path — DDIM scan (100 steps of the 1.01B-param ADM
UNet at 64x64x64 latents) + HDBF decode + INR render to 256^2 — as ONE jitted
program on the real TPU chip, and prints one JSON line.

Memory discipline (the round-1 run OOM'd): only *params* are materialized —
no optimizer state, no EMA copy (bench samples from a single param set, which
is what the reference's EMA sampling path holds in memory too,
tools/ldm/image.py:219-249).  Params are cast to bfloat16 before the jitted
sample call, halving HBM weight traffic and keeping every matmul/conv on the
MXU in bf16; the DDIM carry stays fp32 for stability (the UNet casts its
input at conv_in).

vs_baseline: ratio against an ANALYTIC ESTIMATE of the reference PyTorch
pipeline on A100 — the reference repo publishes no throughput numbers
(BASELINE.md), so the constant below is derived from FLOP counts and typical
torch-eager diffusion MFU; it is labeled as an estimate in the output.
"""

import json
import os
import time

import jax
import jax.numpy as jnp

# Persistent compilation cache: the NFE=100 sample program is large (~100
# unrolled-scan UNet bodies to trace through once); caching makes re-runs of
# the bench start sampling in seconds instead of minutes.
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from ddmi_tpu.core.config import load_config
from ddmi_tpu.domains.image import ImagePipeline

# Analytic A100 baseline for the reference pipeline at NFE=100:
#   UNet fwd @ 64x64x64, model_channels=256, mult (1,2,4,8), 2 res blocks:
#   396 GFLOP/sample (analytic conv+attn count; XLA cost analysis of the
#   compiled program reports 372) -> 100 NFE = 39.6 TFLOP/sample.  A100
#   fp16 dense peak 312 TFLOP/s; torch-eager diffusion UNets typically
#   sustain 30-40% -> 94-125 TFLOP/s -> 2.4-3.2 samples/s for the scan;
#   the reference's eager decode + grid_sample + styled-MLP render at 256^2
#   adds ~10-20% -> ~2.1-2.9 samples/s.  Point estimate: 2.5.
#   (An earlier revision of this header used a ~700 GFLOP/sample guess,
#   giving a flattering 1.45; corrected after measuring the real FLOPs.)
BASELINE_A100_SAMPLES_PER_SEC = 2.5  # analytic estimate, see above

# The BASELINE.json north star is ">=2x A100 sampling throughput ... on
# v5e-8": a pod-level target.  Generation shards the batch over the mesh's
# data axis with zero collectives (core/trainer.py::_sample_jit, DP-tested),
# so pod throughput is 8x the per-chip number measured here; the pod target
# in per-chip terms is (2 * 2.5) / 8.
TARGET_POD_2X_A100_PER_CHIP = 2 * BASELINE_A100_SAMPLES_PER_SEC / 8  # 0.625
# Per-chip context (measured derivation in BASELINE.md "Roofline" section):
# one v5e has 0.63x an A100's bf16 peak (197 vs 312 TFLOP/s) and this
# workload is compute-bound (37.2 TFLOP/sample DDIM scan), so 2x A100 on ONE
# chip (5.0/s) would need >3x the reference's MFU and exceeds the chip's own
# 100%-MFU bound of 5.3/s less attention's hd=32 MXU-lane cap (~4.4/s
# architecture ceiling).  The honest per-chip stretch target is the measured
# architecture ceiling band, not "2x A100":
TARGET_SAMPLES_PER_SEC = 2.9  # floor: top of the A100 uncertainty range
TARGET_CEILING_BAND = (3.7, 4.4)  # measured architecture ceiling (BASELINE.md)

NFE = 100
# Batch is a free protocol choice for a throughput metric (the reference's
# generate() also batches, tools/ldm/image.py:240); default from the measured
# single-chip sweep (see BASELINE.md), overridable for A/B sweeps.
BATCH = int(os.environ.get("DDMI_BENCH_BATCH", "8"))
RESOLUTION = 256


def _bf16(tree):
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, tree
    )


def main():
    # DDMI_BENCH_CONFIG: A/B alternative architectures (e.g. the measured
    # from-scratch TPU config configs/ldm/celebahq_tpu.yaml with
    # num_head_channels=128).  Non-default configs are labeled in the metric
    # name; the headline/protocol default stays the 1:1 reference port.
    cfg_path = os.environ.get("DDMI_BENCH_CONFIG", "configs/ldm/celebahq.yaml")
    cfg = load_config(cfg_path)
    # NFE=100 per the bench protocol (config ships 50)
    object.__setattr__(cfg.model.ddpmconfig, "sampling_timesteps", NFE)
    # Opt-in A/B: DDMI_ENCODER_REUSE=k measures the turbo sampler
    # (arXiv:2312.09608 encoder propagation).  It changes samples, so a
    # turbo run is labeled in the metric name and never the default.
    reuse = int(os.environ.get("DDMI_ENCODER_REUSE", "1"))
    if reuse > 1:
        cfg.model.ddpmconfig.extra["encoder_reuse"] = reuse
    pipe = ImagePipeline(cfg)

    # Params-only init (no EMA / optimizer state), then cast to bf16 and drop
    # the fp32 originals before anything big compiles.
    s1 = pipe.init_stage1_params(jax.random.PRNGKey(0))
    s2 = pipe.init_stage2_params(jax.random.PRNGKey(1))
    ldm_params = {"unet": _bf16(s2["unet"]), "mixing_logit": s2["mixing_logit"]}
    s1_params = _bf16(s1)
    jax.block_until_ready((ldm_params, s1_params))
    del s1, s2

    sample = jax.jit(
        lambda lp, sp, r: pipe.sample_images(
            lp, sp, r, batch=BATCH, resolution=RESOLUTION
        )
    )

    # compile + warmup.  Timing via a host-materializing readback, NOT
    # block_until_ready: on the tunneled axon platform block_until_ready can
    # return before device completion (see ops/pallas/BENCH.md caveat); a
    # float() readback cannot.
    out = sample(ldm_params, s1_params, jax.random.PRNGKey(2))
    float(out.mean())

    iters = 3
    t0 = time.perf_counter()
    for i in range(iters):
        out = sample(ldm_params, s1_params, jax.random.PRNGKey(3 + i))
    float(out.mean())
    dt = time.perf_counter() - t0

    n_chips = max(1, len(jax.devices()))
    samples_per_sec_per_chip = (iters * BATCH) / dt / n_chips
    print(
        json.dumps(
            {
                "metric": f"samples/sec/chip, {RESOLUTION}^2 image gen, NFE={NFE}"
                + (f", encoder_reuse={reuse} (turbo, non-protocol)" if reuse > 1 else "")
                + (f", batch={BATCH} (non-protocol)" if BATCH != 8 else "")
                + (f", config={cfg_path} (non-protocol)"
                   if cfg_path != "configs/ldm/celebahq.yaml" else ""),
                "value": round(samples_per_sec_per_chip, 4),
                "unit": "samples/sec/chip",
                "batch": BATCH,
                "vs_baseline": round(
                    samples_per_sec_per_chip / BASELINE_A100_SAMPLES_PER_SEC, 4
                ),
                "baseline": "analytic A100 estimate 2.5 samples/s, range "
                "2.1-2.9 (reference publishes no throughput; derivation in "
                "bench.py header)",
                "target": TARGET_SAMPLES_PER_SEC,
                "target_met": bool(
                    samples_per_sec_per_chip >= TARGET_SAMPLES_PER_SEC
                ),
                "north_star_v5e8_pod": {
                    "target_samples_per_sec": 2 * BASELINE_A100_SAMPLES_PER_SEC,
                    "projected_pod_samples_per_sec": round(
                        8 * samples_per_sec_per_chip, 2
                    ),
                    "met": bool(
                        samples_per_sec_per_chip >= TARGET_POD_2X_A100_PER_CHIP
                    ),
                    "note": "PROJECTION from the per-chip measurement (one "
                    "real chip): DP generation over the mesh data axis. "
                    "Evidence: bench_dp_scaling.py measured the compiled "
                    "sharded program at n=1/2/4/8 virtual devices — ZERO "
                    "collectives in the HLO at every n and per-device wall "
                    "within [0.98,1.28]x of perfect CPU-mesh linearity "
                    "(BASELINE.md 'DP scaling curve'); this validates "
                    "program structure, NOT ICI bandwidth",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
