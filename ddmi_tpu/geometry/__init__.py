"""Native geometry library bindings (ctypes over the C++ core).

Host-side CPU geometry for the 3D occupancy path — the TPU-era equivalents of
convocc/src/utils/lib* (SURVEY.md §2.7).  The shared library is built from
src/geometry.cpp on first import (g++ -O3) and cached next to the source."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "src", "geometry.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "src", "libddmi_geometry.so")

_lib = None


def _build() -> None:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB]
    subprocess.run(cmd, check=True, capture_output=True)


def lib() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_LIB)) or (
        os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
    ):
        _build()
    L = ctypes.CDLL(_LIB)
    i64 = ctypes.c_int64
    f64p = ctypes.POINTER(ctypes.c_double)
    i64p = ctypes.POINTER(i64)
    u8p = ctypes.POINTER(ctypes.c_uint8)

    L.marching_cubes_run.restype = i64  # opaque result handle
    L.marching_cubes_run.argtypes = [f64p, i64, i64, i64, ctypes.c_double,
                                     i64p, i64p]
    L.marching_cubes_get.restype = i64
    L.marching_cubes_get.argtypes = [i64, f64p, i64p]
    L.mise_create.restype = i64
    L.mise_create.argtypes = [i64, i64, ctypes.c_double]
    L.mise_destroy.argtypes = [i64]
    L.mise_query.restype = i64
    L.mise_query.argtypes = [i64, i64p, i64]
    L.mise_update.argtypes = [i64, i64p, f64p, i64]
    L.mise_to_dense.argtypes = [i64, f64p]
    L.mesh_simplify_run.restype = i64  # opaque result handle
    L.mesh_simplify_run.argtypes = [f64p, i64, i64p, i64, i64,
                                    ctypes.c_double, i64p, i64p]
    L.mesh_simplify_get.restype = i64
    L.mesh_simplify_get.argtypes = [i64, f64p, i64p]
    L.kdtree_build.restype = i64
    L.kdtree_build.argtypes = [f64p, i64]
    L.kdtree_query.argtypes = [i64, f64p, i64, f64p, i64p]
    L.kdtree_destroy.argtypes = [i64]
    L.points_in_mesh.restype = i64
    L.points_in_mesh.argtypes = [f64p, i64, i64p, i64, f64p, i64, u8p]
    L.voxelize_mesh.restype = i64
    L.voxelize_mesh.argtypes = [f64p, i64, i64p, i64, i64, u8p]
    _lib = L
    return L


def _f64(a):
    return np.ascontiguousarray(a, np.float64)


def _i64(a):
    return np.ascontiguousarray(a, np.int64)


def _fp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _ip(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def marching_cubes(values: np.ndarray, iso: float) -> Tuple[np.ndarray, np.ndarray]:
    """Iso-surface of a dense (nx,ny,nz) grid -> (vertices (v,3) in grid
    coords, triangles (t,3) int64).  API mirrors libmcubes
    (convocc/src/utils/libmcubes/__init__.py:1-12); triangulation is marching
    tetrahedra (same surface, different tessellation)."""
    L = lib()
    v = _f64(values)
    nv, nt = ctypes.c_int64(), ctypes.c_int64()
    handle = L.marching_cubes_run(
        _fp(v), v.shape[0], v.shape[1], v.shape[2], float(iso),
        ctypes.byref(nv), ctypes.byref(nt),
    )
    verts = np.empty((max(nv.value, 1), 3), np.float64)
    tris = np.empty((max(nt.value, 1), 3), np.int64)
    L.marching_cubes_get(handle, _fp(verts), _ip(tris))
    return verts[: nv.value], tris[: nt.value]


class MISE:
    """Multiresolution iso-surface point proposal (libmise API:
    query() -> (n,3) int grid coords, update(points, values), to_dense())."""

    def __init__(self, resolution0: int, upsampling_steps: int, threshold: float):
        self._L = lib()
        self._h = self._L.mise_create(resolution0, upsampling_steps, threshold)
        self.res_final = resolution0 * (2**upsampling_steps)
        self._max = (self.res_final + 1) ** 3

    def query(self) -> np.ndarray:
        buf = np.empty((self._max, 3), np.int64)
        n = self._L.mise_query(self._h, _ip(buf), self._max)
        return buf[:n].copy()

    def update(self, points: np.ndarray, values: np.ndarray) -> None:
        p = _i64(points)
        v = _f64(values)
        self._L.mise_update(self._h, _ip(p), _fp(v), p.shape[0])

    def to_dense(self) -> np.ndarray:
        n = self.res_final + 1
        out = np.empty((n, n, n), np.float64)
        self._L.mise_to_dense(self._h, _fp(out))
        return out

    def __del__(self):
        try:
            self._L.mise_destroy(self._h)
        except Exception:
            pass


def simplify_mesh(
    vertices: np.ndarray, faces: np.ndarray, f_target: int,
    aggressiveness: float = 7.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Quadric edge-collapse decimation (libsimplify API)."""
    L = lib()
    v = _f64(vertices)
    t = _i64(faces)
    nv, nt = ctypes.c_int64(), ctypes.c_int64()
    handle = L.mesh_simplify_run(
        _fp(v), v.shape[0], _ip(t), t.shape[0], int(f_target),
        float(aggressiveness), ctypes.byref(nv), ctypes.byref(nt),
    )
    verts = np.empty((max(nv.value, 1), 3), np.float64)
    tris = np.empty((max(nt.value, 1), 3), np.int64)
    L.mesh_simplify_get(handle, _fp(verts), _ip(tris))
    return verts[: nv.value], tris[: nt.value]


class KDTree:
    """3D nearest-neighbour (libkdtree API subset: query -> (dist, idx))."""

    def __init__(self, points: np.ndarray):
        self._L = lib()
        self._pts = _f64(points)
        self._h = self._L.kdtree_build(_fp(self._pts), self._pts.shape[0])

    def query(self, q: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        q = _f64(q)
        dist = np.empty(q.shape[0], np.float64)
        idx = np.empty(q.shape[0], np.int64)
        self._L.kdtree_query(self._h, _fp(q), q.shape[0], _fp(dist), _ip(idx))
        return dist, idx

    def __del__(self):
        try:
            self._L.kdtree_destroy(self._h)
        except Exception:
            pass


def check_mesh_contains(
    vertices: np.ndarray, faces: np.ndarray, points: np.ndarray
) -> np.ndarray:
    """Point-in-mesh via z-ray parity (libmesh inside_mesh API)."""
    L = lib()
    v = _f64(vertices)
    t = _i64(faces)
    q = _f64(points)
    out = np.empty(q.shape[0], np.uint8)
    L.points_in_mesh(
        _fp(v), v.shape[0], _ip(t), t.shape[0], _fp(q), q.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out.astype(bool)


def voxelize_mesh(
    vertices: np.ndarray, faces: np.ndarray, resolution: int
) -> np.ndarray:
    """Mesh -> (res,res,res) bool occupancy, vertices in [0,1]^3
    (libvoxelize API)."""
    L = lib()
    v = _f64(vertices)
    t = _i64(faces)
    out = np.empty(resolution**3, np.uint8)
    L.voxelize_mesh(
        _fp(v), v.shape[0], _ip(t), t.shape[0], resolution,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out.reshape(resolution, resolution, resolution).astype(bool)
