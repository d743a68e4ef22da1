"""Gradient-based mesh vertex refinement (geometry/generation.py::refine_mesh
vs /root/reference/convocc/src/conv_onet/generation.py:256-318)."""

import numpy as np

import jax.numpy as jnp

from ddmi_tpu.core.convocc_config import generation_kwargs
from ddmi_tpu.geometry.generation import MeshGenerator, refine_mesh

R0 = 0.35
SLOPE = 20.0


def sphere_logits(pts):
    """Analytic occupancy field: positive inside the radius-R0 sphere;
    sigmoid == 0.5 exactly on the surface.  (1, n, 3) -> (1, n)."""
    r = jnp.linalg.norm(pts, axis=-1)
    return SLOPE * (R0 - r)


def _surface_error(verts):
    return float(np.abs(np.linalg.norm(verts, axis=1) - R0).mean())


def test_refine_drops_error_to_analytic_surface():
    """Refinement must pull a degraded mesh back onto the analytic sphere
    (VERDICT round-2 item 3 'done' criterion).  The 16^3 extraction of this
    exactly-linear-in-r field is already near-perfect (~1e-3 vertex error),
    so degrade it with 0.02-sigma vertex noise first; refinement recovers
    ~9x of that error (measured: 0.0168 -> 0.0019 in 100 steps)."""
    gen = MeshGenerator(
        sphere_logits, threshold=0.5, resolution0=16, upsampling_steps=0
    )
    verts, tris = gen.generate()
    assert len(verts) > 0
    rng = np.random.default_rng(0)
    pert = (verts + 0.02 * rng.standard_normal(verts.shape)).astype(np.float32)
    err0 = _surface_error(pert)
    refined = refine_mesh(
        pert, tris, sphere_logits, threshold=0.5, steps=100, lr=1e-3
    )
    err1 = _surface_error(refined)
    assert refined.shape == pert.shape
    assert np.isfinite(refined).all()
    assert err1 < 0.3 * err0, (err0, err1)


def test_refinement_step_wired_through_generator():
    """MeshGenerator(refinement_step>0) refines in-place after extraction
    (reference generation.py:219-222): topology untouched, vertices stay on
    the surface (within the face-point sampling noise floor ~2e-3)."""
    base = MeshGenerator(
        sphere_logits, threshold=0.5, resolution0=16, upsampling_steps=0
    )
    v0, t0 = base.generate()
    ref = MeshGenerator(
        sphere_logits, threshold=0.5, resolution0=16, upsampling_steps=0,
        refinement_step=50, refinement_lr=1e-3,
    )
    v1, t1 = ref.generate()
    np.testing.assert_array_equal(t0, t1)  # topology untouched
    assert v1.shape == v0.shape
    assert float(np.abs(v1 - v0).max()) > 0  # it actually moved vertices
    assert _surface_error(v1) < 4e-3


def test_refine_noop_cases():
    empty = np.zeros((0, 3), np.float32)
    out = refine_mesh(empty, np.zeros((0, 3), np.int64), sphere_logits)
    assert out.shape == (0, 3)
    v = np.array([[0.1, 0.0, 0.0]], np.float32)
    out = refine_mesh(v, np.zeros((0, 3), np.int64), sphere_logits, steps=5)
    np.testing.assert_array_equal(out, v)


def test_generation_kwargs_parses_refinement_step():
    kw = generation_kwargs(
        {"generation": {"refinement_step": 7}, "test": {"threshold": 0.4}}
    )
    assert kw["refinement_step"] == 7
    assert kw["threshold"] == 0.4
    # reference default.yaml:49 -> 0 when absent
    assert generation_kwargs({})["refinement_step"] == 0


def test_refine_runner_cached_across_meshes():
    """The jitted refinement scan must be built ONCE per (logits_fn, steps,
    lr) and reused across meshes — per-mesh state rides in via `ctx` as jit
    arguments (ADVICE r3 medium: a fresh jit per call made compile time
    dominate protocol-scale refinement)."""
    from ddmi_tpu.geometry.generation import _refine_runner

    def shifted_logits(pts, center):
        r = jnp.linalg.norm(pts - center, axis=-1)
        return SLOPE * (R0 - r)

    gen = MeshGenerator(
        sphere_logits, threshold=0.5, resolution0=16, upsampling_steps=0
    )
    verts, tris = gen.generate()
    before = _refine_runner.cache_info().currsize
    outs = []
    for cx in (0.0, 0.05):  # two "meshes": different ctx, same callable
        center = jnp.array([cx, 0.0, 0.0])
        outs.append(refine_mesh(
            verts, tris, shifted_logits, ctx=(center,),
            threshold=0.5, steps=10, lr=1e-3,
        ))
    after = _refine_runner.cache_info().currsize
    assert after - before <= 1  # one runner serves both meshes
    # ctx actually flows through: different centers give different verts
    assert float(np.abs(outs[0] - outs[1]).max()) > 0
