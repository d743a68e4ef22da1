"""Decompose the video-generation benchmark: where do the 2.5 s/video go?

bench_video.py measures the full jitted program (DDIM scan @ NFE=200 over
triplane latent tokens -> VideoDecoder -> per-frame voxel INR render).
This times the two phases separately at the same shapes so optimization
effort lands where the time is:

  * scan   — 200 TriplaneUNet forwards (2048 tokens, cross-plane attention
             after every block, configs/ldm/skytimelapse.yaml)
  * tail   — VideoDecoder (incl. the ~73k-token AttnBlock1DExpand
             cross-plane attentions, nn/video_vae.py) + 16x 256^2 renders

Same discipline as bench.py: params-only init, bf16, persistent cache,
host-materializing readback.  Prints one JSON line.
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
from ddmi_tpu.diffusion.process import ddim_sample_unet
from ddmi_tpu.domains.video import VideoPipeline

NFE = 200
BATCH = 2


def _bf16(tree):
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, tree
    )


def _readback(out):
    # outputs may be pytrees (the decoder returns a multi-res HDBF pyramid)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.reshape(-1)[0].astype(jnp.float32))


def _time(fn, args, iters):
    # trace/compile under inference_mode, matching sample_videos (the
    # production program wraps scan+decode+render in one no-grad trace,
    # domains/video.py::sample_videos) — the Pallas attention tiers are
    # trace-time gated
    from ddmi_tpu.ops.pallas import attention as vmem_attn

    with vmem_attn.inference_mode():
        _readback(fn(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _readback(out)
        return (time.perf_counter() - t0) / iters


def main():
    cfg = load_config("configs/ldm/skytimelapse.yaml")
    object.__setattr__(cfg.model.ddpmconfig, "sampling_timesteps", NFE)
    pipe = VideoPipeline(cfg)
    m = cfg.model
    shape = (BATCH, pipe.n_latent_tokens, m.ddpmconfig.channels)

    s1 = pipe.init_stage1_params(jax.random.PRNGKey(0))
    s2 = pipe.init_stage2_params(jax.random.PRNGKey(1))
    ldm = {"unet": _bf16(s2["unet"]), "mixing_logit": s2["mixing_logit"]}
    s1p = _bf16(s1)
    jax.block_until_ready((ldm, s1p))
    del s1, s2

    scan = jax.jit(lambda lp, r: ddim_sample_unet(
        pipe.gd, pipe.unet, lp["unet"], lp["mixing_logit"], shape, r))

    def _tail(sp, z):
        hdbf = pipe.vae.apply({"params": sp["vae"]}, z, method=pipe.vae.decode)
        ys = jnp.linspace(-1.0, 1.0, pipe.res)
        ts = jnp.linspace(-1.0, 1.0, pipe.frames)

        def render_frame(t1):
            coords = {"axes": (t1.reshape(1), ys, ys),
                      "hw": (pipe.res, pipe.res)}
            return pipe.mlp.apply({"params": sp["mlp"]}, coords, hdbf)

        return jax.lax.map(render_frame, ts)

    tail = jax.jit(_tail)

    z = scan(ldm, jax.random.PRNGKey(2))
    scan_s = _time(scan, (ldm, jax.random.PRNGKey(3)), iters=2)
    tail_s = _time(tail, (s1p, z), iters=3)

    # decode alone (the 73k-token expand attentions live here)
    decode = jax.jit(lambda sp, zz: pipe.vae.apply(
        {"params": sp["vae"]}, zz, method=pipe.vae.decode))
    dec_s = _time(decode, (s1p, z), iters=3)

    total = scan_s + tail_s
    print(json.dumps({
        "bench": "video gen decomposition (skytimelapse, NFE=200, batch 2)",
        "scan_s": round(scan_s, 3),
        "scan_ms_per_unet_fwd": round(1e3 * scan_s / NFE, 3),
        "tail_s": round(tail_s, 3),
        "decode_s_within_tail": round(dec_s, 3),
        "render_s_within_tail": round(tail_s - dec_s, 3),
        "scan_frac": round(scan_s / total, 3),
        "videos_per_sec_implied": round(BATCH / total, 4),
    }))


if __name__ == "__main__":
    main()
