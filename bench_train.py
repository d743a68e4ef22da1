"""Training-step throughput + roofline at production config shapes, one chip.

Times the jitted train step for the cells that fit a single v5e (see
docs/SCALING.md for the celebahq stage-2 exception): stage-1 image
(512-source multiscale + LPIPS), stage-1+2 video, stage-1+2 occupancy,
stage-1+2 NeRF.  For every cell it also pulls XLA `cost_analysis()` off the
compiled executable and reports TFLOP/step, HBM GB/step, MFU and HBM
utilisation against the v5e peaks — the same roofline treatment
BASELINE.md gives sampling (round-3 VERDICT item 1).

Knobs:
  DDMI_BENCH_CELLS=image-s1,video-s1   run a subset
  DDMI_BENCH_DECOMPOSE=1               image-s1 ablation: full / no-lpips /
                                       no-multiscale / no-snreg / fwd-only
Prints one JSON line per cell; host-materializing readback timing."""

import dataclasses
import json
import os
import time

import jax
import jax.numpy as jnp

_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from ddmi_tpu.cli.main import build_dataset, build_pipeline
from ddmi_tpu.core.config import load_config

CELLS = [
    ("d2c-vae", "configs/d2c-vae/celebahq.yaml", "image-s1"),
    # image s2 at the afhq/celebahq-256 ADM-UNet shape (64^2x64 latents,
    # 256 model channels — the bench.py flagship denoiser); celebahq's
    # 1.01B variant needs fsdp: 2 (docs/SCALING.md) and is covered by
    # tests/test_production_fsdp.py instead
    ("ldm", "configs/ldm/afhq.yaml", "image-s2"),
    ("d2c-vae", "configs/d2c-vae/skytimelapse.yaml", "video-s1"),
    ("ldm", "configs/ldm/skytimelapse.yaml", "video-s2"),
    ("d2c-vae", "configs/d2c-vae/shapenet.yaml", "occupancy-s1"),
    ("ldm", "configs/ldm/shapenet.yaml", "occupancy-s2"),
    ("d2c-vae", "configs/d2c-vae/srn_cars.yaml", "nerf-s1"),
    ("ldm", "configs/ldm/srn_cars.yaml", "nerf-s2"),
]

ITERS = 10

# v5e single-chip peaks (public spec: 197 bf16 TFLOPS, 819 GB/s HBM).
PEAK_FLOPS = float(os.environ.get("DDMI_PEAK_TFLOPS", "197")) * 1e12
PEAK_HBM = float(os.environ.get("DDMI_PEAK_HBM_GBS", "819")) * 1e9


def _cost(compiled):
    """flops / bytes from XLA cost analysis (dict on new JAX, list on old)."""
    try:
        ca = compiled.cost_analysis()
    except Exception:
        return None, None
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    if not ca:
        return None, None
    return ca.get("flops"), ca.get("bytes accessed")


def _time_step(run, state, warm_key=1):
    state, metrics = run(state, warm_key)  # compile + warmup
    float(jax.device_get(jax.tree_util.tree_leaves(metrics)[0]))
    t0 = time.perf_counter()
    for i in range(ITERS):
        state, metrics = run(state, 2 + i)
    float(jax.device_get(jax.tree_util.tree_leaves(metrics)[0]))
    return (time.perf_counter() - t0) / ITERS


def _report(name, bs, dt, flops, hbm_bytes, extra=None):
    rec = {
        "metric": f"train step, {name}, batch {bs}",
        "step_ms": round(1000 * dt, 1),
        "samples_per_sec": round(bs / dt, 2),
    }
    if flops:
        rec["tflop_per_step"] = round(flops / 1e12, 3)
        rec["mfu_pct"] = round(100 * flops / dt / PEAK_FLOPS, 1)
    if hbm_bytes:
        rec["hbm_gb_per_step"] = round(hbm_bytes / 1e9, 2)
        rec["hbm_util_pct"] = round(100 * hbm_bytes / dt / PEAK_HBM, 1)
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)


def _setup(exp, path, mutate_loss=None, perceptual=Ellipsis):
    cfg = load_config(path)
    object.__setattr__(cfg, "exp", exp)
    object.__setattr__(cfg.data, "dataset", "synthetic")
    # DDMI_REMAT=enc|dec|all: rerun VAE ResnetBlock internals on the
    # backward instead of saving activations (nn/vae.py::_res_block) —
    # the round-5 image-s1 "reshape the work" A/B lever.
    remat = os.environ.get("DDMI_REMAT", "")
    if remat:
        cfg.model.ddconfig.extra["remat"] = remat
    # DDMI_BENCH_BATCH: batch-size override for the round-5 s1 batch sweep
    # (non-default batches are visible in the printed "batch" field).
    bs = os.environ.get("DDMI_BENCH_BATCH", "")
    if bs:
        object.__setattr__(cfg.data, "batch_size", int(bs))
    if mutate_loss:
        lc = dataclasses.replace(cfg.model.lossconfig, **mutate_loss)
        object.__setattr__(cfg.model, "lossconfig", lc)
    if perceptual is Ellipsis:
        pipe = build_pipeline(cfg)
    else:
        # direct construction to control perceptual_fn (image s1 ablations)
        from ddmi_tpu.domains.image import ImagePipeline

        pipe = ImagePipeline(cfg, perceptual_fn=perceptual)
    batch = jax.tree_util.tree_map(jnp.asarray, next(iter(build_dataset(cfg))))
    return cfg, pipe, batch


def bench(exp, path, name):
    cfg, pipe, batch = _setup(exp, path)
    bs = jax.tree_util.tree_leaves(batch)[0].shape[0]
    rng = jax.random.PRNGKey(0)
    if exp == "d2c-vae":
        state = pipe.init_stage1(rng, steps_per_epoch=10)
        tx = pipe.stage1_optimizer(10)
        # LPIPS params as a jit ARG, not a closure (evals/lpips.py)
        pp = getattr(pipe, "perceptual_params", None)
        fn = lambda s, x, r, pp: pipe.stage1_train_step(
            tx, s, x, r, **({} if pp is None else {"perceptual_params": pp})
        )
        step = jax.jit(fn, donate_argnums=(0,))
        run = lambda s, i: step(s, batch, jax.random.PRNGKey(i), pp)
        lowered = jax.jit(fn).lower(state, batch, rng, pp)
    else:
        s1_params = pipe.init_stage1(rng, steps_per_epoch=10).params
        state = pipe.init_stage2(rng, steps_per_epoch=10)
        tx = pipe.stage2_optimizer()
        fn = lambda s, p1, x, r: pipe.stage2_train_step(tx, s, p1, x, r)
        step = jax.jit(fn, donate_argnums=(0,))
        run = lambda s, i: step(s, s1_params, batch, jax.random.PRNGKey(i))
        lowered = jax.jit(fn).lower(state, s1_params, batch, rng)

    flops, hbm = _cost(lowered.compile())
    dt = _time_step(run, state)
    _report(name, bs, dt, flops, hbm)


def decompose_image_s1():
    """Where do image-s1's milliseconds go?  Ablate one term at a time at the
    production config (each variant is its own compiled program)."""
    from ddmi_tpu.cli.main import build_perceptual

    path = os.environ.get(
        "DDMI_BENCH_S1_CONFIG", "configs/d2c-vae/celebahq.yaml"
    )
    base_cfg = load_config(path)
    object.__setattr__(base_cfg, "exp", "d2c-vae")
    lpips = build_perceptual(base_cfg)

    variants = [
        ("full", {}, lpips, False),
        ("no-lpips", {}, None, False),
        ("no-multiscale", {"multiscale": False}, lpips, False),
        ("no-snreg", {"sn_reg": False}, lpips, False),
        ("fwd-only", {}, lpips, True),
    ]
    for vname, mut, perc, fwd_only in variants:
        cfg, pipe, batch = _setup("d2c-vae", path, mutate_loss=mut,
                                  perceptual=perc)
        bs = jax.tree_util.tree_leaves(batch)[0].shape[0]
        state = pipe.init_stage1(jax.random.PRNGKey(0), steps_per_epoch=10)
        tx = pipe.stage1_optimizer(10)
        pp = getattr(pipe, "perceptual_params", None)
        if fwd_only:
            fn = lambda s, x, r, pp: (
                s, pipe.stage1_loss(s.params, s.sn_state, x, r, s.step,
                                    pp)[0]
            )
            donate = ()
        else:
            fn = lambda s, x, r, pp: pipe.stage1_train_step(
                tx, s, x, r, perceptual_params=pp
            )
            donate = (0,)
        step = jax.jit(fn, donate_argnums=donate)
        run = lambda s, i: step(s, batch, jax.random.PRNGKey(i), pp)
        flops, hbm = _cost(
            jax.jit(fn).lower(state, batch, jax.random.PRNGKey(0), pp).compile()
        )
        dt = _time_step(run, state)
        _report(f"image-s1/{vname}", bs, dt, flops, hbm)
        import gc

        gc.collect()


if __name__ == "__main__":
    import gc

    if os.environ.get("DDMI_BENCH_DECOMPOSE"):
        decompose_image_s1()
        raise SystemExit(0)

    only = os.environ.get("DDMI_BENCH_CELLS")
    only = set(only.split(",")) if only else None
    for exp, path, name in CELLS:
        if only and name not in only:
            continue
        try:
            bench(exp, path, name)
            gc.collect()  # free the previous cell's device buffers
        except Exception as e:
            print(json.dumps({"metric": f"train step FAILED", "cell": name,
                              "error": f"{type(e).__name__}: {str(e)[:200]}"}),
                  flush=True)
