"""Geometry parity + reentrancy (round-1 verdict item 8): prove the
marching-tetrahedra deviation from the reference's marching cubes does not
move mesh metrics, and that the native API is safe to interleave."""

import ctypes

import numpy as np
import pytest

from ddmi_tpu import geometry


def _sphere_grid(n: int, r: float = 0.35):
    """Occupancy logits of a centered sphere on the [-0.5,0.5] corner grid."""
    lin = np.linspace(-0.5, 0.5, n)
    X, Y, Z = np.meshgrid(lin, lin, lin, indexing="ij")
    d = r - np.sqrt(X**2 + Y**2 + Z**2)
    return 40.0 * d  # steep logits around the surface


def test_marching_cubes_reentrant_interleaved():
    """Two extractions may be in flight at once (handle-based API — the
    round-1 implementation kept a single global result)."""
    L = geometry.lib()
    a = np.ascontiguousarray(_sphere_grid(24), np.float64)
    b = np.ascontiguousarray(_sphere_grid(24, r=0.2), np.float64)
    nva, nta = ctypes.c_int64(), ctypes.c_int64()
    nvb, ntb = ctypes.c_int64(), ctypes.c_int64()
    fp = lambda x: x.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    ip = lambda x: x.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    ha = L.marching_cubes_run(fp(a), 24, 24, 24, 0.0,
                              ctypes.byref(nva), ctypes.byref(nta))
    hb = L.marching_cubes_run(fp(b), 24, 24, 24, 0.0,
                              ctypes.byref(nvb), ctypes.byref(ntb))
    va = np.empty((nva.value, 3)); ta = np.empty((nta.value, 3), np.int64)
    vb = np.empty((nvb.value, 3)); tb = np.empty((ntb.value, 3), np.int64)
    assert L.marching_cubes_get(ha, fp(va), ip(ta)) == 0
    assert L.marching_cubes_get(hb, fp(vb), ip(tb)) == 0
    # larger sphere has larger vertex radius
    ra = np.linalg.norm(va - va.mean(0), axis=1).mean()
    rb = np.linalg.norm(vb - vb.mean(0), axis=1).mean()
    assert ra > rb


def _mesh_volume(verts, tris):
    v = verts[tris]
    return abs(np.einsum("ij,ij->i", v[:, 0], np.cross(v[:, 1], v[:, 2])).sum() / 6)


def test_sphere_volume_and_area_parity():
    """Marching-tetra output of an analytic sphere matches the analytic
    volume/area within 1%/2% at res 96 — the tessellation deviation from the
    reference's marching cubes cannot move volume-derived metrics
    (MMD/COV/IoU)."""
    n, r = 96, 0.35
    vals = _sphere_grid(n, r)
    verts, tris = geometry.marching_cubes(vals, 0.0)
    verts = verts / (n - 1) - 0.5  # grid -> world
    vol = _mesh_volume(verts, tris)
    assert abs(vol - 4 / 3 * np.pi * r**3) / (4 / 3 * np.pi * r**3) < 0.01
    tv = verts[tris]
    area = 0.5 * np.linalg.norm(
        np.cross(tv[:, 1] - tv[:, 0], tv[:, 2] - tv[:, 0]), axis=1
    ).sum()
    assert abs(area - 4 * np.pi * r**2) / (4 * np.pi * r**2) < 0.02


def test_voxelize_extract_iou_roundtrip():
    """voxelize -> marching cubes -> point-in-mesh IoU >= 0.99 at res 128
    (verdict item 8 'done' criterion)."""
    res = 128
    # analytic sphere occupancy -> extract a mesh
    vals = _sphere_grid(res)
    verts, tris = geometry.marching_cubes(vals, 0.0)
    verts = verts / (res - 1) - 0.5

    # sample points, compare point-in-mesh vs analytic inside test
    rng = np.random.default_rng(0)
    pts = rng.uniform(-0.5, 0.5, (20000, 3))
    inside_mesh = geometry.check_mesh_contains(verts, tris, pts)
    inside_true = np.linalg.norm(pts, axis=1) <= 0.35
    inter = np.logical_and(inside_mesh, inside_true).sum()
    union = np.logical_or(inside_mesh, inside_true).sum()
    assert inter / union >= 0.99, inter / union


def test_vertex_convention_matches_reference_world_coords():
    """MeshGenerator's grid->world transform reproduces the reference's
    0.5-shift + padding-ring convention (convocc generation.py:160-168): an
    analytic sphere of radius r comes out with vertices at radius r."""
    from ddmi_tpu.geometry.generation import MeshGenerator

    r = 0.3

    def eval_fn(pts):  # (1, n, 3) -> (1, n) logits
        return 40.0 * (r - np.linalg.norm(pts[0], axis=-1))[None]

    gen = MeshGenerator(eval_fn, threshold=0.5, resolution0=64,
                        upsampling_steps=0, padding=0.1)
    verts, tris = gen.generate()
    assert len(verts) > 100
    radii = np.linalg.norm(verts, axis=1)
    np.testing.assert_allclose(radii.mean(), r, rtol=0.01)
    assert radii.std() < 0.01  # tight sphere, no systematic half-cell shift


def test_simplify_reentrant_and_preserves_volume():
    n, r = 64, 0.35
    vals = _sphere_grid(n, r)
    verts, tris = geometry.marching_cubes(vals, 0.0)
    verts = verts / (n - 1) - 0.5
    s1 = geometry.simplify_mesh(verts, tris, 800)
    s2 = geometry.simplify_mesh(verts, tris, 800)
    assert np.allclose(s1[0], s2[0])
    assert len(s1[1]) <= 1.2 * 800
    v0 = _mesh_volume(verts, tris)
    v1 = _mesh_volume(s1[0], s1[1])
    assert abs(v1 - v0) / v0 < 0.05  # quadric decimation shrinks slightly
