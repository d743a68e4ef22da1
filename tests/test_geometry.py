"""Tests for the native C++ geometry library against analytic ground truth
(spheres/boxes) — the semantics specified by convocc/src/utils/lib*
(SURVEY.md §4 item 6)."""

import numpy as np
import pytest

from ddmi_tpu import geometry


def sphere_grid(n: int, r: float = 0.35, c=(0.5, 0.5, 0.5)):
    """Occupancy-logit-like field: positive inside sphere."""
    lin = (np.arange(n) + 0.0) / (n - 1)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    return r - np.sqrt((x - c[0]) ** 2 + (y - c[1]) ** 2 + (z - c[2]) ** 2)


def mesh_area(verts, tris):
    a = verts[tris[:, 1]] - verts[tris[:, 0]]
    b = verts[tris[:, 2]] - verts[tris[:, 0]]
    return 0.5 * np.linalg.norm(np.cross(a, b), axis=1).sum()


def mesh_volume(verts, tris):
    v0, v1, v2 = (verts[tris[:, i]] for i in range(3))
    return np.abs(np.einsum("ij,ij->i", v0, np.cross(v1, v2)).sum() / 6.0)


def test_marching_cubes_sphere():
    n = 33
    vals = sphere_grid(n)
    # our convention: surface at iso where field crosses 0
    verts, tris = geometry.marching_cubes(vals, 0.0)
    assert len(verts) > 100 and len(tris) > 100
    # vertices lie near the sphere of radius 0.35*(n-1) around center
    c = (n - 1) / 2
    r = np.linalg.norm(verts - c, axis=1) / (n - 1)
    np.testing.assert_allclose(r.mean(), 0.35, atol=0.01)
    assert r.std() < 0.01
    # surface area ~ 4 pi r^2 (in grid units)
    area = mesh_area(verts, tris) / (n - 1) ** 2
    np.testing.assert_allclose(area, 4 * np.pi * 0.35**2, rtol=0.05)
    # volume ~ 4/3 pi r^3
    vol = mesh_volume(verts - c, tris) / (n - 1) ** 3
    np.testing.assert_allclose(vol, 4 / 3 * np.pi * 0.35**3, rtol=0.05)


def test_marching_cubes_empty():
    vals = -np.ones((8, 8, 8))
    verts, tris = geometry.marching_cubes(vals, 0.0)
    assert len(verts) == 0 and len(tris) == 0


def test_mise_refines_near_surface():
    mise = geometry.MISE(8, 2, 0.0)  # final res 32
    f = lambda p: 0.35 - np.linalg.norm(p / mise.res_final - 0.5, axis=1)
    total_evals = 0
    while True:
        pts = mise.query()
        if len(pts) == 0:
            break
        total_evals += len(pts)
        mise.update(pts, f(pts.astype(np.float64)))
    dense = mise.to_dense()
    assert dense.shape == (33, 33, 33)
    # adaptive: far fewer evaluations than the dense grid
    assert total_evals < 33**3 * 0.6
    # values correct at evaluated sign changes: extract surface and check
    verts, tris = geometry.marching_cubes(dense, 0.0)
    r = np.linalg.norm(verts / 32 - 0.5, axis=1)
    np.testing.assert_allclose(r.mean(), 0.35, atol=0.02)


def test_simplify_reduces_triangles():
    vals = sphere_grid(25)
    verts, tris = geometry.marching_cubes(vals, 0.0)
    target = len(tris) // 4
    sv, st = geometry.simplify_mesh(verts, tris, target)
    assert len(st) <= len(tris)
    assert len(st) >= 4
    # surface stays near the sphere
    c = 12.0
    r = np.linalg.norm(sv - c, axis=1) / 24
    np.testing.assert_allclose(r.mean(), 0.35, atol=0.05)


def test_kdtree_matches_bruteforce(np_rng):
    pts = np_rng.standard_normal((500, 3))
    q = np_rng.standard_normal((100, 3))
    tree = geometry.KDTree(pts)
    dist, idx = tree.query(q)
    d2 = ((q[:, None] - pts[None]) ** 2).sum(-1)
    np.testing.assert_array_equal(idx, d2.argmin(1))
    np.testing.assert_allclose(dist, np.sqrt(d2.min(1)), rtol=1e-10)


def test_points_in_mesh_sphere():
    vals = sphere_grid(33)
    verts, tris = geometry.marching_cubes(vals, 0.0)
    verts = verts / 32.0  # to [0,1]
    rng = np.random.default_rng(0)
    pts = rng.uniform(0.1, 0.9, (2000, 3))
    inside = geometry.check_mesh_contains(verts, tris, pts)
    truth = np.linalg.norm(pts - 0.5, axis=1) < 0.35
    agree = (inside == truth).mean()
    assert agree > 0.98


def test_voxelize_sphere():
    vals = sphere_grid(33)
    verts, tris = geometry.marching_cubes(vals, 0.0)
    occ = geometry.voxelize_mesh(verts / 32.0, tris, 24)
    frac = occ.mean()
    expect = 4 / 3 * np.pi * 0.35**3
    np.testing.assert_allclose(frac, expect, rtol=0.15)
