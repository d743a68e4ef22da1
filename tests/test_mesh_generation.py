"""Tests for the mesh generation driver and 3D metrics on analytic shapes."""

import numpy as np
import pytest

from ddmi_tpu.geometry.generation import MeshGenerator, sample_surface_points
from ddmi_tpu.evals.metrics_3d import (
    chamfer_matrix,
    eval_mesh,
    mmd_cov_1nna,
    normalize_unit_sphere,
)


def sphere_logits(radius=0.3, steepness=40.0):
    def eval_points(p):
        # p (1, n, 3) -> logits (1, n): positive inside
        d = np.linalg.norm(p, axis=-1)
        return steepness * (radius - d)

    return eval_points


@pytest.mark.parametrize("steps", [0, 2])
def test_mesh_generator_sphere(steps):
    gen = MeshGenerator(
        sphere_logits(0.3),
        resolution0=32 if steps == 0 else 16,
        upsampling_steps=steps,
        points_batch_size=10_000,
    )
    verts, tris = gen.generate()
    assert len(verts) > 50
    r = np.linalg.norm(verts, axis=1)
    # surface sits where logits cross log(t/(1-t)) = -1.386 (threshold 0.2,
    # generation.py:84), i.e. radius 0.3 + 1.386/40
    expect = 0.3 + np.log(0.8 / 0.2) / 40.0
    np.testing.assert_allclose(r.mean(), expect, atol=0.01)
    assert r.std() < 0.005


def test_mesh_generator_simplify():
    gen = MeshGenerator(
        sphere_logits(0.3), resolution0=32, upsampling_steps=0,
        simplify_nfaces=200,
    )
    verts, tris = gen.generate()
    assert len(tris) <= 400  # decimated (approximate target)


def test_sample_surface_points():
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], float)
    tris = np.array([[0, 1, 2]])
    pts = sample_surface_points(verts, tris, 500)
    assert pts.shape == (500, 3)
    np.testing.assert_allclose(pts[:, 2], 0, atol=1e-12)
    assert (pts[:, 0] + pts[:, 1] <= 1 + 1e-9).all()


def test_chamfer_matrix_identity(np_rng):
    a = np_rng.standard_normal((4, 64, 3)).astype(np.float32)
    d = chamfer_matrix(a, a)
    np.testing.assert_allclose(np.diag(d), 0, atol=1e-5)
    assert (d >= -1e-6).all()


def test_mmd_cov_same_sets(np_rng):
    a = np_rng.standard_normal((6, 64, 3)).astype(np.float32)
    m = mmd_cov_1nna(a, a.copy())
    assert m["mmd"] == pytest.approx(0.0, abs=1e-5)
    assert m["cov"] == 1.0


def test_eval_mesh_sphere():
    from ddmi_tpu import geometry

    # build a sphere mesh
    n = 33
    lin = np.arange(n) / (n - 1)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    vals = 0.35 - np.sqrt((x - 0.5) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2)
    verts, tris = geometry.marching_cubes(vals, 0.0)
    verts = verts / (n - 1)  # to [0,1]

    rng = np.random.default_rng(0)
    # dense gt sampling so chamfer reflects surface error, not gt spacing
    d = rng.standard_normal((40_000, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pc_gt = 0.5 + 0.35 * d  # exact sphere surface
    pts_iou = rng.uniform(0, 1, (5000, 3))
    occ_gt = (np.linalg.norm(pts_iou - 0.5, axis=1) < 0.35).astype(np.float32)

    m = eval_mesh(verts, tris, pc_gt, pts_iou, occ_gt, n_surface=20_000)
    assert m["chamfer_l1"] < 0.01
    assert m["iou"] > 0.9
    assert m["fscore"] > 0.8
