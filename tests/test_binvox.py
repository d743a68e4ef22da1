"""Binvox reader/writer + voxel-IoU protocol (VoxelsField equivalent;
reference: convocc/src/utils/binvox_rw.py, convocc/src/data/fields.py:153-183,
conv_onet/training.py:95-111)."""

import io
import os

import numpy as np
import pytest

from ddmi_tpu.data.binvox import (
    BinvoxModel,
    read_voxels,
    voxel_center_points,
    write_voxels,
)


def _sphere_grid(d=32, r=0.35):
    pts = voxel_center_points((d, d, d)).reshape(d, d, d, 3)
    return (np.linalg.norm(pts, axis=-1) <= r)


def test_binvox_roundtrip_dense():
    grid = _sphere_grid(32)
    m = BinvoxModel(grid, translate=(-0.5, -0.5, -0.5), scale=1.0)
    buf = io.BytesIO()
    write_voxels(buf, m)
    buf.seek(0)
    m2 = read_voxels(buf)
    assert m2.dims == (32, 32, 32)
    assert m2.translate == (-0.5, -0.5, -0.5)
    assert m2.scale == 1.0
    np.testing.assert_array_equal(m2.data, grid)


def test_binvox_roundtrip_long_runs():
    """All-empty and all-full grids exercise the 255-run-length chunking."""
    for fill in (False, True):
        grid = np.full((16, 16, 16), fill, dtype=bool)
        buf = io.BytesIO()
        write_voxels(buf, BinvoxModel(grid))
        buf.seek(0)
        np.testing.assert_array_equal(read_voxels(buf).data, grid)


def test_binvox_scan_order_is_xzy():
    """The file payload scans x-z-y (binvox_rw.py:133-141): a single voxel at
    (x,y,z)=(0,1,0) in a 2^3 grid lands at flat offset 1 (y is fastest)."""
    grid = np.zeros((2, 2, 2), dtype=bool)
    grid[0, 1, 0] = True
    buf = io.BytesIO()
    write_voxels(buf, BinvoxModel(grid))
    raw = buf.getvalue()
    payload = raw[raw.index(b"data\n") + 5:]
    vals, runs = payload[0::2], payload[1::2]
    flat = np.repeat(np.frombuffer(bytes(vals), np.uint8),
                     np.frombuffer(bytes(runs), np.uint8)).astype(bool)
    expected = np.zeros(8, dtype=bool)
    expected[1] = True  # x=0, z=0, y=1 -> offset x*4 + z*2 + y = 1
    np.testing.assert_array_equal(flat, expected)


def test_binvox_rejects_garbage():
    with pytest.raises(IOError):
        read_voxels(io.BytesIO(b"not a voxel file"))


def test_voxel_center_points_convention():
    """Cell centers of [-0.5, 0.5]^3 — first point at -0.5 + 1/(2D), matching
    make_3d_grid((-0.5 + 1/64,)*3, ...) for D=32 (conv_onet/training.py:98)."""
    pts = voxel_center_points((32, 32, 32))
    assert pts.shape == (32 ** 3, 3)
    np.testing.assert_allclose(pts[0], [-0.5 + 1 / 64] * 3, atol=1e-7)
    np.testing.assert_allclose(pts[-1], [0.5 - 1 / 64] * 3, atol=1e-7)
    # raster order: z fastest (x-y-z ij meshgrid)
    np.testing.assert_allclose(pts[1] - pts[0], [0, 0, 1 / 32], atol=1e-7)


def test_voxel_iou_analytic_sphere():
    """A perfect analytic occupancy function scores IoU 1.0 against the
    voxelization of the same sphere; a wrong-radius one scores lower."""
    from ddmi_tpu.evals.metrics_3d import voxel_iou

    gt = _sphere_grid(32, r=0.35).astype(np.float32)

    def logits(r):
        return lambda pts: 50.0 * (r - np.linalg.norm(pts, axis=-1))

    assert voxel_iou(logits(0.35), gt) == pytest.approx(1.0)
    assert voxel_iou(logits(0.25), gt) < 0.6


def test_shapenet_dataset_loads_voxels(tmp_path):
    """ShapeNetOccupancyDataset(voxels_file=...) adds a (b, D, D, D) 'voxels'
    key read from per-model binvox files."""
    from ddmi_tpu.data.shapenet import ShapeNetOccupancyDataset

    rng = np.random.default_rng(0)
    root = tmp_path / "shapenet"
    for m in ("m0", "m1"):
        d = root / "02691156" / m
        os.makedirs(d)
        np.savez(
            d / "points.npz",
            points=rng.uniform(-0.5, 0.5, (512, 3)).astype(np.float32),
            occupancies=np.packbits(rng.integers(0, 2, 512).astype(np.uint8)),
        )
        np.savez(
            d / "pointcloud.npz",
            points=rng.uniform(-0.5, 0.5, (1024, 3)).astype(np.float32),
        )
        write_voxels(str(d / "model.binvox"), BinvoxModel(_sphere_grid(16)))
    (root / "02691156" / "test.lst").write_text("m0\nm1\n")

    ds = ShapeNetOccupancyDataset(
        str(root), batch_size=2, split="test", points_subsample=128,
        pointcloud_n=256, voxels_file="model.binvox",
    )
    batch = next(iter(ds))
    assert batch["voxels"].shape == (2, 16, 16, 16)
    assert batch["voxels"].dtype == np.float32
    assert batch["points"].shape == (2, 128, 3)
