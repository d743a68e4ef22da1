"""Head-dim sweep for the denoiser's attention at sampling time.

The reference pins `num_head_channels: 32` (configs/ldm/celebahq.yaml via
openaimodel.py num_head_channels) — on TPU that head_dim uses 32 of 128 MXU
lanes in both attention matmuls, the single architecture cap on the headline
bench (BASELINE.md "Roofline": ceiling band 3.7-4.4 samples/s/chip).

Splitting the SAME qkv/proj weights into fewer, wider heads changes zero
parameters — only the per-head subspace grouping — so for training FROM
SCRATCH on TPU, `num_head_channels: 128` is a candidate free throughput win
(converted reference checkpoints must keep 32: the grouping is baked into
the trained weights).  This sweep measures the sampling-trace UNet step at
head_dim 32/64/128 so the recommendation in docs/SCALING.md is a number,
not a guess.

Timing per the axon rule: loop + host-materializing readback.
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
from ddmi_tpu.domains.image import ImagePipeline
from ddmi_tpu.ops.pallas import attention as vmem_attn

BATCH = 8
SCAN_STEPS = 20


def _bf16(tree):
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, tree
    )


def _time(fn, *args, iters=10):
    out = fn(*args)
    float(jnp.asarray(out).reshape(-1)[0].astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.asarray(out).reshape(-1)[0].astype(jnp.float32))
    return (time.perf_counter() - t0) / iters


def main():
    results = {}
    for hd in (32, 64, 128):
        cfg = load_config("configs/ldm/celebahq.yaml")
        object.__setattr__(cfg.model.unetconfig, "num_head_channels", hd)
        pipe = ImagePipeline(cfg)
        u = cfg.model.ddpmconfig
        params = _bf16(pipe.init_stage2_params(jax.random.PRNGKey(1))["unet"])
        jax.block_until_ready(params)
        shape = (BATCH, u.image_size, u.image_size, u.channels)
        x = jnp.zeros(shape, jnp.float32)
        t = jnp.zeros((BATCH,), jnp.int32)

        # sampling-trace forward: inference_mode selects the fused kernels
        def fwd(p, x, t):
            with vmem_attn.inference_mode():
                return pipe.unet.apply({"params": p}, x, t)

        def scan(p, x):
            with vmem_attn.inference_mode():
                def body(c, tt):
                    tv = jnp.full((BATCH,), tt, jnp.int32)
                    return pipe.unet.apply({"params": p}, c, tv), ()

                out, _ = jax.lax.scan(
                    body, x, jnp.arange(SCAN_STEPS, dtype=jnp.int32)
                )
                return out

        dt_fwd = _time(jax.jit(fwd), params, x, t)
        dt_scan = _time(jax.jit(scan), params, x, iters=3)
        results[f"hd{hd}"] = {
            "unet_fwd_ms": round(dt_fwd * 1e3, 2),
            "scan_step_ms": round(dt_scan / SCAN_STEPS * 1e3, 2),
        }
        print(f"hd={hd}: {results[f'hd{hd}']}", flush=True)
        del params, pipe

    base = results["hd32"]["scan_step_ms"]
    for k, v in results.items():
        v["speedup_vs_hd32"] = round(base / v["scan_step_ms"], 3)
    print(json.dumps({"batch": BATCH, "scan_steps": SCAN_STEPS, **results}))


if __name__ == "__main__":
    main()
