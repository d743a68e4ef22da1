"""NeRF ShapeNet (srn-cars) dataset.

TPU-native replacement for utils/nerf_dataset.py:34-121: per-object .npz
with images (n_views, H, W, C), cam_poses (n_views, 4, 4), data (N, 6)
point cloud (xyz + rgb); 80% train split by sorted order (the reference uses
a pandas 80% sample; we use a deterministic prefix split)."""

from __future__ import annotations

import os
import queue
import threading
from typing import Dict, Iterator, List

import numpy as np


class NeRFShapeNetDataset:
    """Yields dicts: points (b,n,6), image (b,H,W,3) one random view,
    pose (b,4,4)."""

    def __init__(
        self,
        root: str,
        batch_size: int = 1,
        train: bool = True,
        pointcloud_n: int = 3000,
        pointcloud_noise: float = 0.005,
        shuffle: bool = True,
        seed: int = 0,
        num_processes: int = 1,
        process_index: int = 0,
        prefetch: int = 2,
    ):
        files = sorted(
            os.path.join(root, f) for f in os.listdir(root) if f.endswith(".npz")
        )
        if not files:
            raise FileNotFoundError(f"no .npz objects under {root}")
        cut = int(0.8 * len(files))
        files = files[:cut] if train else files[cut:]
        self.files = files[process_index::num_processes]
        self.batch_size = batch_size
        self.pointcloud_n = pointcloud_n
        self.pointcloud_noise = pointcloud_noise
        self.shuffle = shuffle
        self.seed = seed
        self.prefetch = prefetch
        self._epoch = 0

    def __len__(self):
        return max(1, len(self.files) // self.batch_size)

    def _load(self, path: str, rng: np.random.Generator) -> Dict:
        d = np.load(path)
        images = d["images"]  # (v, H, W, C)
        poses = d["cam_poses"]  # (v, 4, 4)
        pts = d["data"].astype(np.float32)  # (N, 6)
        idx = rng.integers(0, pts.shape[0], self.pointcloud_n)
        cloud = pts[idx]
        cloud[:, :3] += self.pointcloud_noise * rng.standard_normal(
            (self.pointcloud_n, 3)
        ).astype(np.float32)
        v = rng.integers(0, images.shape[0])
        img = images[v].astype(np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        return {
            "points": cloud,
            "image": img[..., :3],
            "pose": poses[v].astype(np.float32),
        }

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def worker():
            rng = np.random.default_rng(self.seed + self._epoch)
            order = np.arange(len(self.files))
            if self.shuffle:
                rng.shuffle(order)
            try:
                bs = self.batch_size
                for i in range(0, len(order) - bs + 1, bs):
                    items = [
                        self._load(self.files[k], rng) for k in order[i : i + bs]
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


class SyntheticNeRF:
    """Random colored-sphere scenes with consistent ray/point geometry."""

    def __init__(self, batch_size: int = 1, n_points: int = 500,
                 resolution: int = 32, length: int = 4, seed: int = 0):
        self.batch_size = batch_size
        self.n_points = n_points
        self.resolution = resolution
        self.length = length
        self.seed = seed

    def __len__(self):
        return self.length

    def __iter__(self):
        from ddmi_tpu.domains.nerf import FOV

        for i in range(self.length):
            rng = np.random.default_rng(self.seed * 3571 + i)
            b = self.batch_size
            r = self.resolution
            pts_list, img_list, pose_list = [], [], []
            for _ in range(b):
                d = rng.standard_normal((self.n_points, 3))
                d /= np.linalg.norm(d, axis=1, keepdims=True)
                xyz = (0.8 * d).astype(np.float32)
                rgb = ((d + 1) / 2).astype(np.float32)
                pts_list.append(np.concatenate([xyz, rgb], -1))
                img_list.append(
                    rng.uniform(0, 1, (r, r, 3)).astype(np.float32)
                )
                pose = np.eye(4, dtype=np.float32)
                pose[2, 3] = 4.0  # camera at z=4 looking at origin
                pose_list.append(pose)
            yield {
                "points": np.stack(pts_list),
                "image": np.stack(img_list),
                "pose": np.stack(pose_list),
            }
