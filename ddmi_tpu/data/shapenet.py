"""ShapeNet occupancy dataset (ONet layout).

TPU-native replacement for convocc/src/data/{core,fields,transforms}.py:
category dirs with <split>.lst files; per-model points.npz (points float16/32
+ packed occupancies) and pointcloud.npz; subsampling + noise transforms
(SubsamplePoints 2048, SubsamplePointcloud 3000, PointcloudNoise 0.005)."""

from __future__ import annotations

import os
import queue
import threading
from typing import Dict, Iterator, List, Optional

import numpy as np


class ShapeNetOccupancyDataset:
    """Yields dict batches: inputs (b,3000,3), points (b,2048,3), occ (b,2048)."""

    def __init__(
        self,
        root: str,
        batch_size: int,
        split: str = "train",
        categories: Optional[List[str]] = None,
        points_subsample: int = 2048,
        pointcloud_n: int = 3000,
        pointcloud_noise: float = 0.005,
        shuffle: bool = True,
        seed: int = 0,
        num_processes: int = 1,
        process_index: int = 0,
        prefetch: int = 2,
        voxels_file: Optional[str] = None,
    ):
        self.root = root
        if categories is None:
            categories = sorted(
                d for d in os.listdir(root)
                if os.path.isdir(os.path.join(root, d))
            )
        self.models: List[str] = []
        for c in categories:
            lst = os.path.join(root, c, f"{split}.lst")
            if os.path.exists(lst):
                with open(lst) as f:
                    names = [l.strip() for l in f if l.strip()]
            else:
                names = sorted(
                    d for d in os.listdir(os.path.join(root, c))
                    if os.path.isdir(os.path.join(root, c, d))
                )
            self.models += [os.path.join(root, c, m) for m in names]
        self.models = self.models[process_index::num_processes]
        if not self.models:
            raise FileNotFoundError(f"no models under {root}")
        self.batch_size = batch_size
        self.points_subsample = points_subsample
        self.pointcloud_n = pointcloud_n
        self.pointcloud_noise = pointcloud_noise
        self.shuffle = shuffle
        self.seed = seed
        self.prefetch = prefetch
        self.voxels_file = voxels_file
        self._epoch = 0

    def __len__(self):
        return max(1, len(self.models) // self.batch_size)

    def _load_model(self, path: str, rng: np.random.Generator) -> Dict:
        pts_file = np.load(os.path.join(path, "points.npz"))
        points = pts_file["points"].astype(np.float32)
        occ = np.unpackbits(pts_file["occupancies"])[: points.shape[0]]
        # break grid-aligned ties like PointsField (fields.py:128-131)
        if points.dtype == np.float16:
            points = points.astype(np.float32)
            points += 1e-4 * rng.standard_normal(points.shape).astype(np.float32)
        idx = rng.integers(0, points.shape[0], self.points_subsample)
        points = points[idx]
        occ = occ[idx].astype(np.float32)

        pc_file = np.load(os.path.join(path, "pointcloud.npz"))
        cloud = pc_file["points"].astype(np.float32)
        idx = rng.integers(0, cloud.shape[0], self.pointcloud_n)
        cloud = cloud[idx]
        cloud += self.pointcloud_noise * rng.standard_normal(cloud.shape).astype(
            np.float32
        )
        item = {"points": points, "occ": occ, "inputs": cloud}
        if self.voxels_file is not None:
            # GT voxel grid for the iou_voxels protocol
            # (VoxelsField, convocc/src/data/fields.py:153-183)
            from ddmi_tpu.data.binvox import read_voxels

            item["voxels"] = read_voxels(
                os.path.join(path, self.voxels_file)
            ).data.astype(np.float32)
        return item

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def worker():
            rng = np.random.default_rng(self.seed + self._epoch)
            order = np.arange(len(self.models))
            if self.shuffle:
                rng.shuffle(order)
            try:
                bs = self.batch_size
                for i in range(0, len(order) - bs + 1, bs):
                    items = [
                        self._load_model(self.models[k], rng)
                        for k in order[i : i + bs]
                    ]
                    q.put({
                        k: np.stack([it[k] for it in items]) for k in items[0]
                    })
            finally:
                q.put(sentinel)

        threading.Thread(target=worker, daemon=True).start()
        self._epoch += 1
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item


class SyntheticOccupancy:
    """Random-ellipsoid occupancy batches for tests: analytically consistent
    (inputs = noisy surface samples, occ = inside test)."""

    def __init__(self, batch_size: int, n_points: int = 2048,
                 n_cloud: int = 3000, length: int = 8, seed: int = 0):
        self.batch_size = batch_size
        self.n_points = n_points
        self.n_cloud = n_cloud
        self.length = length
        self.seed = seed

    def __len__(self):
        return self.length

    def __iter__(self):
        for i in range(self.length):
            rng = np.random.default_rng(self.seed * 6007 + i)
            b = self.batch_size
            radii = rng.uniform(0.15, 0.4, (b, 1, 3)).astype(np.float32)
            # surface cloud
            d = rng.standard_normal((b, self.n_cloud, 3)).astype(np.float32)
            d /= np.linalg.norm(d, axis=-1, keepdims=True)
            cloud = d * radii + 0.005 * rng.standard_normal(
                (b, self.n_cloud, 3)
            ).astype(np.float32)
            # query points + occupancy
            pts = rng.uniform(-0.5, 0.5, (b, self.n_points, 3)).astype(np.float32)
            occ = (np.sum((pts / radii) ** 2, -1) <= 1.0).astype(np.float32)
            yield {"points": pts, "occ": occ, "inputs": cloud}
