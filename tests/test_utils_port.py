"""Tests for the convocc utils ports (mesh IO, ICP, visualization) and the
PointNet++ encoder (convocc/src/{utils,encoder} parity, SURVEY §2.6)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ddmi_tpu.utils import (
    best_fit_transform,
    export_pointcloud,
    icp,
    load_pointcloud,
    read_off,
    visualize_data,
    visualize_pointcloud,
    visualize_voxels,
    write_off,
)


# ---------------------------------------------------------------- mesh IO
@pytest.mark.parametrize("as_text", [True, False])
def test_pointcloud_ply_roundtrip(tmp_path, as_text):
    pts = np.random.RandomState(0).randn(257, 3).astype(np.float32)
    path = str(tmp_path / "pc.ply")
    export_pointcloud(pts, path, as_text=as_text)
    back = load_pointcloud(path)
    tol = 1e-4 if as_text else 0.0  # ascii writes %g (6 significant digits)
    np.testing.assert_allclose(back, pts, atol=tol, rtol=tol)


def test_off_roundtrip(tmp_path):
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    tris = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]])
    path = str(tmp_path / "m.off")
    write_off(path, verts, tris)
    v, f = read_off(path)
    np.testing.assert_allclose(np.asarray(v), verts)
    assert all(face[0] == 3 for face in f)
    np.testing.assert_array_equal(np.asarray(f)[:, 1:], tris)


def test_off_modelnet_quirk(tmp_path):
    """'OFF' and the counts sharing line 1 (the ModelNet bug the reference
    handles, convocc/src/utils/io.py:44-57)."""
    path = str(tmp_path / "quirk.off")
    with open(path, "w") as fh:
        fh.write("OFF3 1 0\n0 0 0\n1 0 0\n0 1 0\n3 0 1 2\n")
    v, f = read_off(path)
    assert len(v) == 3 and f[0] == [3, 0, 1, 2]


def test_off_rejects_non_triangle(tmp_path):
    path = str(tmp_path / "quad.off")
    with open(path, "w") as fh:
        fh.write("OFF\n4 1 0\n0 0 0\n1 0 0\n1 1 0\n0 1 0\n4 0 1 2 3\n")
    with pytest.raises(ValueError):
        read_off(path)


# ------------------------------------------------------------------- ICP
def _random_rigid(rs):
    q = rs.randn(4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    R = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])
    return R, rs.randn(3) * 0.1


def test_best_fit_transform_exact():
    rs = np.random.RandomState(1)
    A = rs.randn(100, 3)
    R, t = _random_rigid(rs)
    B = A @ R.T + t
    T, R_est, t_est = best_fit_transform(A, B)
    np.testing.assert_allclose(R_est, R, atol=1e-8)
    np.testing.assert_allclose(t_est, t, atol=1e-8)
    hom = np.concatenate([A, np.ones((100, 1))], 1)
    np.testing.assert_allclose((T @ hom.T).T[:, :3], B, atol=1e-8)


def test_icp_recovers_small_pose():
    rs = np.random.RandomState(2)
    A = rs.rand(400, 3)
    # small perturbation (ICP needs a decent init; identity suffices here)
    theta = 0.05
    R = np.array([
        [np.cos(theta), -np.sin(theta), 0],
        [np.sin(theta), np.cos(theta), 0],
        [0, 0, 1],
    ])
    B = A @ R.T + np.array([0.02, -0.01, 0.03])
    T, dist, n_iter = icp(A, B, max_iterations=50, tolerance=1e-9)
    hom = np.concatenate([A, np.ones((len(A), 1))], 1)
    aligned = (T @ hom.T).T[:, :3]
    assert np.abs(aligned - B).max() < 1e-3
    assert n_iter < 50


# ----------------------------------------------------------- visualization
def test_visualize_outputs_png(tmp_path):
    vox = np.zeros((6, 6, 6), bool)
    vox[2:4, 2:4, 2:4] = True
    p1 = str(tmp_path / "vox.png")
    visualize_voxels(vox, out_file=p1)
    pts = np.random.RandomState(0).rand(64, 3) - 0.5
    p2 = str(tmp_path / "pc.png")
    visualize_pointcloud(pts, normals=pts * 0.1, out_file=p2)
    p3 = str(tmp_path / "img.png")
    visualize_data(np.random.RandomState(1).rand(3, 8, 8), "img", p3)
    visualize_data(None, None, "ignored")  # no-op path
    import os

    for p in (p1, p2, p3):
        assert os.path.getsize(p) > 100
    with pytest.raises(ValueError):
        visualize_data(vox, "bogus", p1)


# ------------------------------------------------------------- PointNet++
from ddmi_tpu.nn.pointnetpp import (  # noqa: E402
    PointNetPlusPlus,
    farthest_point_sample,
    index_points,
    query_ball_point,
    square_distance,
)


def _fps_numpy(xyz, npoint):
    """Greedy FPS reference (start at index 0, ties -> lowest argmax)."""
    n = xyz.shape[0]
    mind = np.full(n, np.inf)
    far = 0
    out = []
    for _ in range(npoint):
        out.append(far)
        mind = np.minimum(mind, ((xyz - xyz[far]) ** 2).sum(-1))
        far = int(np.argmax(mind))
    return np.asarray(out)


def test_fps_matches_numpy_reference():
    rs = np.random.RandomState(3)
    xyz = rs.randn(2, 50, 3).astype(np.float32)
    got = np.asarray(farthest_point_sample(jnp.asarray(xyz), 8))
    for b in range(2):
        np.testing.assert_array_equal(got[b], _fps_numpy(xyz[b], 8))


def test_fps_spreads_points():
    """On a uniform grid, FPS must pick well-separated points."""
    g = np.stack(np.meshgrid(*[np.linspace(0, 1, 4)] * 3), -1).reshape(1, -1, 3)
    idx = np.asarray(farthest_point_sample(jnp.asarray(g, jnp.float32), 8))[0]
    sel = g[0, idx]
    d = np.sqrt(((sel[:, None] - sel[None]) ** 2).sum(-1))
    np.fill_diagonal(d, np.inf)
    assert d.min() > 0.6  # corners-ish of the unit cube


def test_query_ball_point_semantics():
    """In-radius lowest indices first; short groups padded with the first
    member; never an out-of-radius index."""
    xyz = jnp.asarray(
        [[[0, 0, 0], [0.1, 0, 0], [5, 5, 5], [0, 0.3, 0]]], jnp.float32
    )
    new_xyz = jnp.asarray([[[0, 0, 0]]], jnp.float32)
    idx = np.asarray(query_ball_point(0.5, 3, xyz, new_xyz))[0, 0]
    np.testing.assert_array_equal(idx, [0, 1, 3])
    idx2 = np.asarray(query_ball_point(0.15, 3, xyz, new_xyz))[0, 0]
    np.testing.assert_array_equal(idx2, [0, 1, 0])  # padded with first member


def test_index_points_gather():
    rs = np.random.RandomState(4)
    pts = rs.randn(2, 10, 5).astype(np.float32)
    idx = rs.randint(0, 10, size=(2, 3, 4))
    got = np.asarray(index_points(jnp.asarray(pts), jnp.asarray(idx)))
    want = np.stack([pts[b][idx[b]] for b in range(2)])
    np.testing.assert_allclose(got, want)


def test_square_distance():
    rs = np.random.RandomState(5)
    a = rs.randn(1, 6, 3).astype(np.float32)
    b = rs.randn(1, 4, 3).astype(np.float32)
    got = np.asarray(square_distance(jnp.asarray(a), jnp.asarray(b)))
    want = ((a[:, :, None] - b[:, None]) ** 2).sum(-1)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_pointnetpp_forward_jits():
    model = PointNetPlusPlus(c_dim=32)
    xyz = jax.random.uniform(jax.random.PRNGKey(0), (2, 600, 3))
    params = model.init(jax.random.PRNGKey(1), xyz)["params"]
    out_xyz, feats = jax.jit(
        lambda p, x: model.apply({"params": p}, x)
    )(params, xyz)
    assert out_xyz.shape == (2, 600, 3)
    assert feats.shape == (2, 600, 32)
    assert bool(jnp.isfinite(feats).all())
