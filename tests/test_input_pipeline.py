"""Loader worker-pool tests: the parallel decode path (workers > 1) must
yield a bit-identical sample stream to the serial path — RNG draws (flip
coins, temporal-crop offsets) are hoisted out of the pool (data/
image_folder.py, data/video.py)."""

import numpy as np
import pytest

from ddmi_tpu.data.image_folder import ImageFolderDataset
from ddmi_tpu.data.video import VideoFrameFolderDataset


@pytest.fixture(scope="module")
def image_root(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("imgs")
    (root / "cls0").mkdir()
    rng = np.random.default_rng(0)
    for i in range(7):
        arr = (255 * rng.random((32, 32, 3))).astype(np.uint8)
        Image.fromarray(arr).save(root / "cls0" / f"{i}.png")
    return str(root)


@pytest.fixture(scope="module")
def video_root(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("clips")
    rng = np.random.default_rng(1)
    for c in range(4):
        d = root / f"clip{c}"
        d.mkdir()
        for f in range(10):
            arr = (255 * rng.random((24, 24, 3))).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{f:03d}.png")
    return str(root)


def _take(ds, n):
    out = []
    it = iter(ds)
    for _ in range(n):
        out.append(next(it))
    return out


def test_image_workers_stream_identical(image_root):
    a = ImageFolderDataset(image_root, 3, resolution=16, seed=5, workers=1)
    b = ImageFolderDataset(image_root, 3, resolution=16, seed=5, workers=4)
    for x, y in zip(_take(a, 2), _take(b, 2)):
        np.testing.assert_array_equal(x, y)
        assert x.shape == (3, 16, 16, 3) and x.dtype == np.float32


def test_video_workers_stream_identical(video_root):
    a = VideoFrameFolderDataset(video_root, 2, frames=6, resolution=16,
                                seed=5, workers=1)
    b = VideoFrameFolderDataset(video_root, 2, frames=6, resolution=16,
                                seed=5, workers=4)
    for x, y in zip(_take(a, 2), _take(b, 2)):
        np.testing.assert_array_equal(x, y)
        assert x.shape == (2, 6, 16, 16, 3) and x.dtype == np.float32
