"""Training-step throughput at production config shapes, one chip.

Times the jitted train step for the cells that fit a single v5e (see
docs/SCALING.md for the celebahq stage-2 exception): stage-1 image
(512-multiscale + LPIPS), stage-1+2 video, stage-1+2 occupancy, stage-1+2
NeRF.  Compiles are served from the persistent cache (the production-matrix
probes populated it).  Prints one JSON line per cell; host-materializing
readback timing."""

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
    ("ldm", "configs/ldm/skytimelapse.yaml", "video-s2"),
    ("d2c-vae", "configs/d2c-vae/shapenet.yaml", "occupancy-s1"),
    ("ldm", "configs/ldm/shapenet.yaml", "occupancy-s2"),
    ("d2c-vae", "configs/d2c-vae/srn_cars.yaml", "nerf-s1"),
    ("ldm", "configs/ldm/srn_cars.yaml", "nerf-s2"),
]

ITERS = 10


def bench(exp, path, name):
    cfg = load_config(path)
    object.__setattr__(cfg, "exp", exp)
    object.__setattr__(cfg.data, "dataset", "synthetic")
    pipe = build_pipeline(cfg)
    batch = jax.tree_util.tree_map(jnp.asarray, next(iter(build_dataset(cfg))))
    bs = jax.tree_util.tree_leaves(batch)[0].shape[0]
    rng = jax.random.PRNGKey(0)
    if exp == "d2c-vae":
        state = pipe.init_stage1(rng, steps_per_epoch=10)
        tx = pipe.stage1_optimizer(10)
        step = jax.jit(lambda s, x, r: pipe.stage1_train_step(tx, s, x, r),
                       donate_argnums=(0,))
        run = lambda s, i: step(s, batch, jax.random.PRNGKey(i))
    else:
        s1_params = pipe.init_stage1(rng, steps_per_epoch=10).params
        state = pipe.init_stage2(rng, steps_per_epoch=10)
        tx = pipe.stage2_optimizer()
        step = jax.jit(
            lambda s, p1, x, r: pipe.stage2_train_step(tx, s, p1, x, r),
            donate_argnums=(0,),
        )
        run = lambda s, i: step(s, s1_params, batch, jax.random.PRNGKey(i))

    state, metrics = run(state, 1)  # compile + warmup
    float(jax.device_get(metrics["loss"]))
    t0 = time.perf_counter()
    for i in range(ITERS):
        state, metrics = run(state, 2 + i)
    float(jax.device_get(metrics["loss"]))
    dt = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "metric": f"train step, {name}, batch {bs}",
                "step_ms": round(1000 * dt / ITERS, 1),
                "samples_per_sec": round(ITERS * bs / dt, 2),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    import gc

    for exp, path, name in CELLS:
        try:
            bench(exp, path, name)
            gc.collect()  # free the previous cell's device buffers
        except Exception as e:
            print(json.dumps({"metric": f"train step FAILED", "cell": name,
                              "error": f"{type(e).__name__}: {str(e)[:200]}"}),
                  flush=True)
