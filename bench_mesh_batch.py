"""A/B: serial vs batched-lockstep MISE mesh extraction (meshes/hour).

The reference's MMD/COV protocol extracts 5000 meshes ONE AT A TIME
(tools/ldm/occupancy.py:204-219 + convocc generation.py:99-115).
`geometry/generation.py::generate_meshes_batched` advances G octrees in
lockstep and batches their query points into one device call per round.
This harness measures both paths on the same fields and projects the
5000-mesh protocol wall time.

FIELD SPARSITY: random-init weights give a noise occupancy field that
degenerates MISE to dense-grid (the 44 s/mesh worst case in BASELINE.md)
— NOT what trained models produce.  Here every device evaluation runs the
REAL shapenet-size decode+MLP3D program (true device cost), but the field
VALUES handed to the octree are an analytic sphere (trained-quality
sparsity: one closed surface per mesh).  Labeled in the output.
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
from ddmi_tpu.domains.occupancy import OccupancyPipeline
from ddmi_tpu.geometry.generation import MeshGenerator, generate_meshes_batched

GROUP = 8
PROTOCOL_N = 5000


def main():
    cfg = load_config("configs/ldm/shapenet.yaml")
    pipe = OccupancyPipeline(cfg)
    s1p = pipe.init_stage1(jax.random.PRNGKey(0), 10).params
    r = pipe.latent_res
    z = jax.random.normal(
        jax.random.PRNGKey(1), (GROUP, r, r, cfg.model.ddpmconfig.channels)
    )
    pyr = jax.jit(pipe.decode_pyramids)(s1p, z)
    eval_group = jax.jit(
        lambda pyramids, pts: pipe.logits_from_pyramids(s1p, pts, pyramids)
    )
    radii = np.linspace(0.25, 0.40, GROUP)
    gk = dict(getattr(pipe, "generation_kwargs", {}))
    gk.pop("refinement_step", None)
    bs = 100_000

    def sphere(pts, rad):
        return 20.0 * (rad - np.linalg.norm(pts, axis=-1))

    def group_fn(pts):  # (GROUP, bs, 3): real device eval, analytic values
        lg = np.asarray(eval_group(pyr, jnp.asarray(pts, jnp.float32)))
        return lg * 0.0 + np.stack(
            [sphere(pts[i], radii[i]) for i in range(GROUP)]
        )

    # honest serial baseline: its own (1, bs, 3) program over one mesh's
    # pyramids — exactly what the old per-mesh trainer loop ran
    eval_single = jax.jit(
        lambda pyramids, pts: pipe.logits_from_pyramids(s1p, pts, pyramids)
    )

    def single_fn(i):
        pyr_i = jax.tree_util.tree_map(lambda a: a[i : i + 1], pyr)

        def f(pts):  # (1, n, 3) — MeshGenerator pads to bs already
            lg = np.asarray(
                eval_single(pyr_i, jnp.asarray(pts, jnp.float32))
            )[0]
            return (lg * 0.0 + sphere(pts[0], radii[i]))[None]

        return f

    # warmup compiles (both programs) before any timing
    group_fn(np.zeros((GROUP, bs, 3), np.float32))
    single_fn(0)(np.zeros((1, bs, 3), np.float32))

    t0 = time.perf_counter()
    batched = generate_meshes_batched(
        group_fn, GROUP, points_batch_size=bs, **gk
    )
    t_batched = time.perf_counter() - t0

    t0 = time.perf_counter()
    serial = []
    for i in range(GROUP):
        serial.append(
            MeshGenerator(single_fn(i), points_batch_size=bs, **gk).generate()
        )
    t_serial = time.perf_counter() - t0

    for (v1, t1), (v2, t2) in zip(batched, serial):
        assert len(t1) == len(t2), "batched/serial meshes diverged"

    per_b, per_s = t_batched / GROUP, t_serial / GROUP
    print(json.dumps({
        "metric": "batched vs serial MISE-256 extraction "
                  "(real shapenet device eval cost, sphere-sparsity fields)",
        "group": GROUP,
        "serial_s_per_mesh": round(per_s, 2),
        "batched_s_per_mesh": round(per_b, 2),
        "speedup": round(per_s / per_b, 2),
        "meshes_per_hour_serial": round(3600 / per_s, 1),
        "meshes_per_hour_batched": round(3600 / per_b, 1),
        "protocol_5000_hours_serial": round(PROTOCOL_N * per_s / 3600, 2),
        "protocol_5000_hours_batched": round(PROTOCOL_N * per_b / 3600, 2),
        "mean_triangles": int(np.mean([len(t) for _, t in batched])),
    }))


if __name__ == "__main__":
    main()
