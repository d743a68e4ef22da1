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
BATCH = int(os.environ.get("DDMI_VIDEO_BATCH", "2"))

# v5e single-chip peaks (public spec), same constants as bench_train.py
PEAK_FLOPS = 197e12
PEAK_HBM = 819e9


def _cost(compiled):
    try:
        ca = compiled.cost_analysis()
    except Exception:
        return None, None
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    if not ca:
        return None, None
    return ca.get("flops"), ca.get("bytes accessed")


def _bf16(tree):
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, tree
    )


def _readback(out):
    # outputs may be pytrees (the decoder returns a multi-res HDBF pyramid)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.reshape(-1)[0].astype(jnp.float32))


def _time(fn, args, iters):
    _readback(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _readback(out)
    return (time.perf_counter() - t0) / iters


def main():
    # ONE inference_mode around everything: every jit below traces exactly
    # once, with the Pallas attention tiers gated the way the production
    # sample_videos program gates them (domains/video.py).  (A prior
    # revision entered inference_mode only inside _time, so the first
    # warm-up call compiled each program a second time in training mode —
    # the 200-step scan compile alone is ~25 min on the tunneled compiler.)
    from ddmi_tpu.ops.pallas import attention as vmem_attn

    with vmem_attn.inference_mode():
        _main()


def _main():
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

    # -------- TriplaneUNet forward roofline (round-3 VERDICT item 5) -----
    # One denoiser forward at exactly the scan's shape: fp32 carry input
    # (the UNet casts at conv_in, same as the image bench), bf16 params.
    x = jax.random.normal(jax.random.PRNGKey(7), shape, jnp.float32)
    t = jnp.full((BATCH,), NFE // 2, jnp.int32)
    fwd = jax.jit(lambda p, xx, tt: pipe.unet.apply({"params": p}, xx, tt))
    fwd_flops, fwd_bytes = _cost(fwd.lower(ldm["unet"], x, t).compile())
    fwd_s = _time(fwd, (ldm["unet"], x, t), iters=20)
    fwd_rec = {"ms": round(1e3 * fwd_s, 3)}
    sol_fwd_s = None
    if fwd_flops and fwd_bytes:
        fwd_rec.update({
            "gflop": round(fwd_flops / 1e9, 2),
            "hbm_gb": round(fwd_bytes / 1e9, 3),
            "mfu_pct": round(100 * fwd_flops / fwd_s / PEAK_FLOPS, 1),
            "hbm_util_pct": round(100 * fwd_bytes / fwd_s / PEAK_HBM, 1),
        })
        # speed-of-light per forward: whichever wall (MXU or HBM) binds
        sol_fwd_s = max(fwd_flops / PEAK_FLOPS, fwd_bytes / PEAK_HBM)
        fwd_rec["sol_ms"] = round(1e3 * sol_fwd_s, 3)
        fwd_rec["bound"] = (
            "compute" if fwd_flops / PEAK_FLOPS >= fwd_bytes / PEAK_HBM
            else "hbm-bandwidth"
        )

    # tail speed-of-light from its own cost analysis
    tail_flops, tail_bytes = _cost(tail.lower(s1p, z).compile())
    sol_tail_s = (
        max(tail_flops / PEAK_FLOPS, tail_bytes / PEAK_HBM)
        if tail_flops and tail_bytes else None
    )

    total = scan_s + tail_s
    rec = {
        "bench": f"video gen decomposition (skytimelapse, NFE={NFE}, "
        f"batch {BATCH})",
        "scan_s": round(scan_s, 3),
        "scan_ms_per_unet_fwd": round(1e3 * scan_s / NFE, 3),
        "tail_s": round(tail_s, 3),
        "decode_s_within_tail": round(dec_s, 3),
        "render_s_within_tail": round(tail_s - dec_s, 3),
        "scan_frac": round(scan_s / total, 3),
        "videos_per_sec_implied": round(BATCH / total, 4),
        "unet_fwd": fwd_rec,
    }
    if sol_fwd_s and sol_tail_s:
        # Ceiling band for videos/s/chip, same spirit as image's 3.7-4.4:
        # upper = hard speed-of-light (every op at the binding wall's peak);
        # lower = scan forwards at the image bench's measured best sustained
        # MFU/HBM fraction for mixed conv+attention programs (~61%,
        # BASELINE.md "Roofline") with the tail at the same fraction.
        sol_total = NFE * sol_fwd_s + sol_tail_s
        band_lo = BATCH / (sol_total / 0.61)
        band_hi = BATCH / sol_total
        rec["ceiling_videos_per_sec"] = {
            "speed_of_light": round(band_hi, 3),
            "at_61pct_sustained": round(band_lo, 3),
            "note": "SoL from XLA cost analysis (max of MXU and HBM walls "
            "per phase); 61% = best sustained fraction measured for the "
            "image pipeline's mixed conv+attn program (BASELINE.md)",
        }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
