"""Where do the NeRF scene's seconds go?  (round-5 follow-up to the
bench_3d.py verdict: 23.2 scenes/min at ~8% MFU on a program whose FLOPs
are mostly MXU-friendly MLP matmuls.)

Phases timed as separate jitted programs at the exact protocol shapes
(configs/ldm/srn_cars.yaml, NFE=200, 8 views @ 128^2, bf16 params):

  1. DDIM latent scan (NFE UNet forwards)
  2. triplane decode (VAE decoder)
  3. ONE view render via the production lax.map tiles  (x8 = scene render)
  4. one 4096-ray tile: full render_rays
  5. the same tile with grid_sample replaced by a broadcast constant
     (isolates the triplane gather)
  6. the same tile with the MLP replaced by a 1-matmul stub
     (isolates the MLP)

Each phase reports ms + XLA cost-analysis FLOPs/bytes where available.
DDMI_NERF_RAY_CHUNK sweeps the tile size for phase 3/4 (default 4096).
Prints one JSON line per phase.
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
from ddmi_tpu.domains.nerf import NeRFPipeline, get_rays, raw2outputs, sample_triplane

RAY_CHUNK = int(os.environ.get("DDMI_NERF_RAY_CHUNK", "4096"))
VIEW_RES = 128
ITERS = 4


def _bf16(tree):
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, tree
    )


def _time(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / ITERS


def _cost(fn, *args):
    try:
        ca = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        return ca.get("flops"), ca.get("bytes accessed")
    except Exception:
        return None, None


def _report(name, dt, flops=None, hbm=None, extra=None):
    rec = {"metric": f"nerf-decompose/{name}", "ms": round(1000 * dt, 2)}
    if flops:
        rec["tflop"] = round(flops / 1e12, 3)
        rec["mfu_pct"] = round(100 * flops / dt / 197e12, 1)
    if hbm:
        rec["hbm_gb"] = round(hbm / 1e9, 2)
        rec["hbm_util_pct"] = round(100 * hbm / dt / 819e9, 1)
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)


def main():
    cfg = load_config("configs/ldm/srn_cars.yaml")
    object.__setattr__(cfg.model, "use_fp16", True)
    pipe = NeRFPipeline(cfg)
    s1_params = _bf16(pipe.init_stage1(jax.random.PRNGKey(0), 10).params)
    s2 = pipe.init_stage2(jax.random.PRNGKey(1), 10).params
    s2_params = {"unet": _bf16(s2["unet"]), "mixing_logit": s2["mixing_logit"]}
    nfe = cfg.model.ddpmconfig.sampling_timesteps
    n_scenes = 2

    # 1. DDIM scan
    scan = jax.jit(lambda lp, r: pipe.sample_latents(lp, r, n_scenes))
    dt = _time(scan, s2_params, jax.random.PRNGKey(2))
    fl, hb = _cost(
        lambda lp, r: pipe.sample_latents(lp, r, n_scenes),
        s2_params, jax.random.PRNGKey(2),
    )
    # scan body counted once by cost_analysis; report raw
    _report(f"ddim-scan (NFE={nfe}, batch={n_scenes})", dt, fl, hb,
            {"note": "cost_analysis counts scan body once"})
    z = scan(s2_params, jax.random.PRNGKey(2))

    # 2. decode planes
    dec = jax.jit(lambda p, zz: pipe.decode_planes(p, zz[:1]))
    dt = _time(dec, s1_params, z)
    fl, hb = _cost(lambda p, zz: pipe.decode_planes(p, zz[:1]), s1_params, z)
    _report("decode-planes (1 scene)", dt, fl, hb)
    planes = dec(s1_params, z)

    # 3. one full view at the production tile size
    pose = jnp.eye(4)

    def one_view(mp, pl, rng):
        ro, rd = get_rays(VIEW_RES, VIEW_RES, pose)
        ro = ro.reshape(-1, 3)
        rd = rd.reshape(-1, 3)
        n = ro.shape[0]
        chunks = n // RAY_CHUNK
        rgb = jax.lax.map(
            lambda a: pipe.render_rays(mp, pl, a[0], a[1], rng, perturb=0.0),
            (ro.reshape(chunks, RAY_CHUNK, 3), rd.reshape(chunks, RAY_CHUNK, 3)),
        )
        return rgb

    mp = s1_params["mlp"]
    dt = _time(jax.jit(one_view), mp, planes, jax.random.PRNGKey(3))
    fl, hb = _cost(one_view, mp, planes, jax.random.PRNGKey(3))
    _report(
        f"one-view {VIEW_RES}^2 (tile={RAY_CHUNK})", dt, fl, hb,
        {"note": "lax.map body counted once by cost_analysis",
         "scene_est_s": round(8 * dt, 3)},
    )

    # 4/5/6. one tile: full vs no-gather vs no-mlp
    ro = jnp.zeros((RAY_CHUNK, 3))
    rd = jnp.concatenate(
        [jnp.zeros((RAY_CHUNK, 2)), -jnp.ones((RAY_CHUNK, 1))], -1
    )

    tile_full = jax.jit(
        lambda m, p, o, d: pipe.render_rays(m, p, o, d, jax.random.PRNGKey(0),
                                            perturb=0.0)
    )
    # DDMI_NERF_DEC_INFER=1: trace the tile under inference_mode so the
    # fused VMEM NeRF-MLP kernel dispatches (ops/pallas/nerf_mlp.py) —
    # kernel-level A/B without the full bench_3d compile.
    if os.environ.get("DDMI_NERF_DEC_INFER"):
        from ddmi_tpu.ops.pallas import attention as vmem_attn

        with vmem_attn.inference_mode():
            dt = _time(tile_full, mp, planes, ro, rd)
        _report(
            f"tile-full-FUSED ({RAY_CHUNK} rays x {pipe.n_samples}, "
            f"block={os.environ.get('DDMI_NERF_FUSED_BLOCK', '4096')})", dt
        )
        return
    dt = _time(tile_full, mp, planes, ro, rd)
    fl, hb = _cost(
        lambda m, p, o, d: pipe.render_rays(m, p, o, d, jax.random.PRNGKey(0),
                                            perturb=0.0),
        mp, planes, ro, rd,
    )
    _report(f"tile-full ({RAY_CHUNK} rays x {pipe.n_samples})", dt, fl, hb)

    c3 = 3 * cfg.model.ddconfig.out_ch

    def tile_nogather(m, p, o, d):
        n = o.shape[0]
        t = jnp.linspace(0.0, 1.0, pipe.n_samples)
        z_ = 2.0 * (1 - t) + 6.0 * t
        z_ = jnp.broadcast_to(z_, (n, pipe.n_samples))
        pts = o[:, None] + d[:, None] * z_[..., None]
        feat = jnp.broadcast_to(
            jnp.mean(p["xy"], axis=(0, 1, 2)),  # (c,) cheap plane read
            (*pts.shape[:-1], c3 // 3),
        )
        feat = jnp.concatenate([feat] * 3, -1)
        viewdirs = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        e_xyz = pipe.embed_xyz(pts)
        e_dir = jnp.broadcast_to(
            pipe.embed_dir(viewdirs)[:, None],
            (n, pipe.n_samples, 3 * (2 * pipe.embed_dir.n_freqs + 1)),
        )
        p_dtype = jax.tree_util.tree_leaves(m)[0].dtype
        x = jnp.concatenate([feat, e_xyz, e_dir], -1).astype(p_dtype)
        raw = pipe.mlp.apply({"params": m}, x).astype(jnp.float32)
        rgb, _, _ = raw2outputs(raw, z_, d, pipe.white_bkgd)
        return rgb

    dt = _time(jax.jit(tile_nogather), mp, planes, ro, rd)
    _report("tile-NO-gather (broadcast feat)", dt)

    def tile_nomlp(m, p, o, d):
        n = o.shape[0]
        t = jnp.linspace(0.0, 1.0, pipe.n_samples)
        z_ = 2.0 * (1 - t) + 6.0 * t
        z_ = jnp.broadcast_to(z_, (n, pipe.n_samples))
        pts = o[:, None] + d[:, None] * z_[..., None]
        feat = sample_triplane(p, pts)
        p_dtype = jax.tree_util.tree_leaves(m)[0].dtype
        w = jnp.ones((feat.shape[-1], 4), p_dtype)  # 1-matmul stub
        raw = (feat.astype(p_dtype) @ w).astype(jnp.float32)
        rgb, _, _ = raw2outputs(raw, z_, d, pipe.white_bkgd)
        return rgb

    dt = _time(jax.jit(tile_nomlp), mp, planes, ro, rd)
    _report("tile-NO-mlp (gather + 1 matmul)", dt)


if __name__ == "__main__":
    main()
