"""Perf decomposition of the headline bench: times the DDIM scan and the
decode+render legs separately, and prints XLA cost-analysis FLOPs + HBM
bytes for the compiled programs — the measured roofline inputs for
BASELINE.md (VERDICT r1 item 4).

Timing via host-materializing readback (block_until_ready is unreliable on
the tunneled axon platform — see ops/pallas/BENCH.md)."""

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
from ddmi_tpu.diffusion.process import ddim_sample
from ddmi_tpu.domains.image import ImagePipeline

NFE = 100
BATCH = 8
RESOLUTION = 256


def _bf16(tree):
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, tree
    )


def _time(fn, *args, iters=3):
    out = fn(*args)
    float(jnp.asarray(out).reshape(-1)[0].astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.asarray(out).reshape(-1)[0].astype(jnp.float32))
    return (time.perf_counter() - t0) / iters


def _cost(fn, *args):
    c = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    return {
        "gflops": round(c.get("flops", 0) / 1e9, 1),
        "hbm_gb": round(c.get("bytes accessed", 0) / 2**30, 3),
    }


def main():
    cfg = load_config("configs/ldm/celebahq.yaml")
    object.__setattr__(cfg.model.ddpmconfig, "sampling_timesteps", NFE)
    pipe = ImagePipeline(cfg)
    u = cfg.model.ddpmconfig

    s1 = pipe.init_stage1_params(jax.random.PRNGKey(0))
    s2 = pipe.init_stage2_params(jax.random.PRNGKey(1))
    ldm = {"unet": _bf16(s2["unet"]), "mixing_logit": s2["mixing_logit"]}
    s1p = _bf16(s1)
    jax.block_until_ready((ldm, s1p))
    del s1, s2

    shape = (BATCH, u.image_size, u.image_size, u.channels)

    # 1) one UNet forward (the scan body)
    def unet_step(lp, x, t):
        return pipe.unet.apply({"params": lp["unet"]}, x, t)

    x = jnp.zeros(shape, jnp.float32)
    t = jnp.zeros((BATCH,), jnp.int32)
    unet_j = jax.jit(unet_step)
    dt_unet = _time(unet_j, ldm, x, t)
    cost_unet = _cost(unet_step, ldm, x, t)

    # 2) full DDIM scan -> latents
    def scan_only(lp, r):
        model_fn = lambda xt, tt: pipe.unet.apply({"params": lp["unet"]}, xt, tt)
        return ddim_sample(pipe.gd, model_fn, lp["mixing_logit"], shape, r)

    scan_j = jax.jit(scan_only)
    dt_scan = _time(scan_j, ldm, jax.random.PRNGKey(2))

    # 3) decode + render given latents
    def decode_render(sp, z, r):
        p_dtype = jax.tree_util.tree_leaves(sp["vae"])[0].dtype
        hdbf = pipe.vae.apply(
            {"params": sp["vae"]}, z.astype(p_dtype), method=pipe.vae.decode
        )
        from ddmi_tpu.core.coords import get_scale_injection

        si = get_scale_injection(RESOLUTION, pipe.anchor)
        out = pipe._render_grid(sp["mlp"], hdbf, RESOLUTION, si, r)
        return out.reshape(BATCH, RESOLUTION, RESOLUTION, -1)

    z = jnp.zeros(shape, jnp.float32)
    dec_j = jax.jit(decode_render)
    dt_dec = _time(dec_j, s1p, z, jax.random.PRNGKey(3))
    cost_dec = _cost(decode_render, s1p, z, jax.random.PRNGKey(3))

    # 4) full pipeline (the bench program)
    full_j = jax.jit(
        lambda lp, sp, r: pipe.sample_images(
            lp, sp, r, batch=BATCH, resolution=RESOLUTION
        )
    )
    dt_full = _time(full_j, ldm, s1p, jax.random.PRNGKey(4))

    peak_tflops = 197.0  # v5e bf16 dense peak
    unet_tflops = cost_unet["gflops"] / 1e3
    print(json.dumps({
        "unet_fwd_ms": round(dt_unet * 1e3, 2),
        "unet_cost": cost_unet,
        "unet_mfu": round(unet_tflops / dt_unet / peak_tflops, 3),
        "ddim_scan_s": round(dt_scan, 3),
        "scan_per_step_ms": round(dt_scan / NFE * 1e3, 2),
        "decode_render_ms": round(dt_dec * 1e3, 1),
        "decode_cost": cost_dec,
        "full_s": round(dt_full, 3),
        "samples_per_s": round(BATCH / dt_full, 3),
        "batch": BATCH,
    }))


if __name__ == "__main__":
    main()
