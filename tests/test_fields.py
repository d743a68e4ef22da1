"""Field API tests (reference convocc/src/data/fields.py + transforms.py).

Synthetic model directories; every field loads, crops, masks, and indexes
per the reference semantics (fields.py / common.py line citations in the
module under test)."""

import os

import numpy as np
import pytest

from ddmi_tpu.data.binvox import BinvoxModel, write_voxels
from ddmi_tpu.data.fields import (
    IndexField,
    PartialPointCloudField,
    PatchPointCloudField,
    PatchPointsField,
    PointCloudField,
    PointcloudNoise,
    PointsField,
    SubsamplePointcloud,
    SubsamplePoints,
    VoxelsField,
    compose,
    coord2index,
    normalize_coord,
)


@pytest.fixture()
def model_dir(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.uniform(-0.5, 0.5, (500, 3)).astype(np.float32)
    occ = (np.linalg.norm(pts, axis=-1) < 0.3).astype(np.float32)
    np.savez(tmp_path / "points.npz", points=pts, occupancies=occ)
    # packed variant, float16 points
    np.savez(
        tmp_path / "points_packed.npz",
        points=pts.astype(np.float16),
        occupancies=np.packbits(occ.astype(bool)),
    )
    pc = rng.uniform(-0.5, 0.5, (400, 3)).astype(np.float32)
    nrm = rng.standard_normal((400, 3)).astype(np.float32)
    np.savez(tmp_path / "pointcloud.npz", points=pc, normals=nrm)
    vox = np.zeros((8, 8, 8), bool)
    vox[2:6, 2:6, 2:6] = True
    with open(tmp_path / "model.binvox", "wb") as f:
        write_voxels(f, BinvoxModel(vox))
    return str(tmp_path), pts, occ, pc, nrm, vox


def test_index_field():
    assert IndexField().load("/nowhere", 7, 0) == 7
    assert IndexField().check_complete([])


def test_points_field(model_dir):
    path, pts, occ, *_ = model_dir
    data = PointsField("points.npz").load(path, 0, 0)
    np.testing.assert_allclose(data[None], pts)
    np.testing.assert_allclose(data["occ"], occ)


def test_points_field_unpackbits_and_f16_tiebreak(model_dir):
    path, pts, occ, *_ = model_dir
    rng = np.random.default_rng(1)
    data = PointsField("points_packed.npz", unpackbits=True).load(
        path, 0, 0, rng=rng)
    assert data["occ"].shape == (500,)
    np.testing.assert_array_equal(data["occ"], occ)
    # float16 points get the 1e-4 symmetry-breaking jitter (fields.py:67-70)
    assert data[None].dtype == np.float32
    assert not np.array_equal(data[None], pts.astype(np.float16).astype(
        np.float32))
    np.testing.assert_allclose(
        data[None], pts.astype(np.float16).astype(np.float32), atol=1e-2)


def test_subsample_points_int_and_stratified(model_dir):
    path, *_ = model_dir
    rng = np.random.default_rng(2)
    f = PointsField("points.npz", transform=SubsamplePoints(64))
    data = f.load(path, 0, 0, rng=rng)
    assert data[None].shape == (64, 3) and data["occ"].shape == (64,)
    f2 = PointsField("points.npz", transform=SubsamplePoints((32, 16)))
    d2 = f2.load(path, 0, 0, rng=rng)
    assert d2[None].shape == (48, 3)
    np.testing.assert_array_equal(d2["occ"][:32], 0.0)
    np.testing.assert_array_equal(d2["occ"][32:], 1.0)
    assert 0.0 < float(d2["volume"]) < 1.0


def test_pointcloud_field_with_transforms(model_dir):
    path, _, _, pc, nrm, _ = model_dir
    rng = np.random.default_rng(3)
    tf = compose(SubsamplePointcloud(100), PointcloudNoise(0.005))
    data = PointCloudField("pointcloud.npz", transform=tf).load(
        path, 0, 0, rng=rng)
    assert data[None].shape == (100, 3) and data["normals"].shape == (100, 3)
    # noise is small
    assert np.abs(data[None]).max() < 0.6
    assert PointCloudField("pointcloud.npz").check_complete(
        ["pointcloud.npz"])
    assert not PointCloudField("pointcloud.npz").check_complete(["x"])


def test_voxels_field(model_dir):
    path, *_, vox = model_dir
    out = VoxelsField("model.binvox").load(path, 0, 0)
    assert out.dtype == np.float32
    np.testing.assert_array_equal(out, vox.astype(np.float32))


def test_normalize_coord_and_coord2index():
    vol = (np.array([-1.0, -1.0, -1.0]), np.array([1.0, 1.0, 1.0]))
    p = np.array([[-1.0, 0.0, 1.0], [1.0, -1.0, 0.0]], np.float32)
    n_xz = normalize_coord(p, vol, plane="xz")
    np.testing.assert_allclose(n_xz, [[0.0, 1.0], [1.0, 0.5]])
    n_grid = normalize_coord(p, vol, plane="grid")
    np.testing.assert_allclose(n_grid, [[0.0, 0.5, 1.0], [1.0, 0.0, 0.5]])
    idx = coord2index(p, vol, reso=4, plane="xy")
    # (0.0, 0.5) -> cell (0, 2) -> 0 + 4*2 = 8 ; (1.0, 0.0) -> (4, 0) -> 4
    np.testing.assert_array_equal(idx, [[8, 4]])
    # 3D overflow clamps to reso**3 (common.py:338-340)
    big = np.array([[1.0, 1.0, 1.0]], np.float32)
    assert coord2index(big, vol, reso=4, plane="grid")[0, 0] <= 4**3


def test_patch_points_field_crop_and_normalized(model_dir):
    path, pts, occ, *_ = model_dir
    vol = {
        "query_vol": (np.array([-0.25] * 3), np.array([0.25] * 3)),
        "input_vol": (np.array([-0.5] * 3), np.array([0.5] * 3)),
        "plane_type": ["xz", "xy"],
    }
    data = PatchPointsField("points.npz").load(path, 0, vol)
    inside = np.all((pts >= -0.25) & (pts <= 0.25), axis=-1)
    assert data[None].shape == (inside.sum(), 3)
    np.testing.assert_array_equal(data["occ"], occ[inside])
    for key in ("xz", "xy"):
        pn = data["normalized"][key]
        assert pn.shape == (inside.sum(), 2)
        assert pn.min() >= 0.0 and pn.max() <= 1.0


def test_patch_pointcloud_field_mask_and_indices(model_dir):
    path, _, _, pc, _, _ = model_dir
    vol = {
        "input_vol": (np.array([-0.3] * 3), np.array([0.3] * 3)),
        "plane_type": ["xz", "grid"],
        "reso": 8,
    }
    data = PatchPointCloudField("pointcloud.npz").load(path, 0, vol)
    outside = ~np.all((pc >= -0.3) & (pc <= 0.3), axis=-1)
    np.testing.assert_array_equal(data["mask"], outside)
    # masked points zeroed (fields.py:245)
    np.testing.assert_array_equal(data[None][outside], 0.0)
    # overflow bucket indices for masked points (fields.py:252-255)
    np.testing.assert_array_equal(data["ind"]["xz"][0, outside], 8**2)
    np.testing.assert_array_equal(data["ind"]["grid"][0, outside], 8**3)
    in_plane = data["ind"]["xz"][0, ~outside]
    assert (in_plane >= 0).all() and (in_plane < 8**2).all()


def test_partial_pointcloud_field(model_dir):
    path, _, _, pc, _, _ = model_dir
    rng = np.random.default_rng(4)
    data = PartialPointCloudField(
        "pointcloud.npz", part_ratio=0.5).load(path, 0, 0, rng=rng)
    n = data[None].shape[0]
    assert 0 < n <= pc.shape[0]
    assert data["normals"].shape == (n, 3)
    # the crop is a contiguous slab from each side's min (fields.py:362-365)
    kept = data[None]
    assert kept.shape[0] < pc.shape[0]  # part_ratio=0.5 nearly surely crops
