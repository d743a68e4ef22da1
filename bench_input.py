"""Host input-pipeline throughput vs device consumption (VERDICT r3 item 7).

The device-side train benches (bench_train.py) run on `dataset: synthetic`;
this bench answers the question they leave open: can the HOST feed the chip
at the measured step rates?  It writes a real on-disk dataset (512**2 JPEGs
for image, 256**2 frame-folder clips for video — the production formats the
reference trains from, exp/stage.py:26-40), then measures the actual loader
classes (data/image_folder.py, data/video.py) end to end: listdir + PIL
decode + LANCZOS resize + flip/crop + batch stack + prefetch queue.

Prints one JSON line per (domain, workers) with host samples/s, the measured
device demand (BASELINE.md "Training roofline"), and headroom = host/device.
Headroom > 1 means the host is not the bottleneck at that worker count; the
per-core number extrapolates to production hosts (this box has
os.cpu_count() cores).

Knobs: DDMI_INPUT_ROOT (default /tmp/ddmi_input_bench), DDMI_INPUT_IMAGES
(default 240), DDMI_INPUT_CLIPS (default 12)."""

import json
import os
import time

import numpy as np

ROOT = os.environ.get("DDMI_INPUT_ROOT", "/tmp/ddmi_input_bench")
N_IMAGES = int(os.environ.get("DDMI_INPUT_IMAGES", "240"))
N_CLIPS = int(os.environ.get("DDMI_INPUT_CLIPS", "12"))
FRAMES_PER_CLIP = 48  # > frames=16 so the temporal crop path is exercised

# Measured device-side demand, one v5e chip (bench_train.py; BASELINE.md
# "Training roofline" table keeps these current).
DEVICE_DEMAND = {
    "image-s1": float(os.environ.get("DDMI_DEMAND_IMAGE", "13.1")),  # samples/s
    "video-s1": float(os.environ.get("DDMI_DEMAND_VIDEO", "7.4")),   # clips/s
}


def _natural_image(rng, res):
    """Smooth low-frequency content + mild noise: JPEG entropy comparable to
    photos (pure noise decodes unrealistically slowly)."""
    low = rng.random((res // 16, res // 16, 3)).astype(np.float32)
    img = np.kron(low, np.ones((16, 16, 1), np.float32))
    img += 0.08 * rng.random((res, res, 3)).astype(np.float32)
    return (255 * np.clip(img, 0, 1)).astype(np.uint8)


def make_dataset():
    from PIL import Image

    img_dir = os.path.join(ROOT, "image", "cls0")
    vid_root = os.path.join(ROOT, "video")
    rng = np.random.default_rng(0)
    if not os.path.isdir(img_dir) or len(os.listdir(img_dir)) < N_IMAGES:
        os.makedirs(img_dir, exist_ok=True)
        for i in range(N_IMAGES):
            Image.fromarray(_natural_image(rng, 512)).save(
                os.path.join(img_dir, f"{i:05d}.jpg"), quality=92
            )
    for c in range(N_CLIPS):
        clip = os.path.join(vid_root, f"clip{c:03d}")
        if os.path.isdir(clip) and len(os.listdir(clip)) >= FRAMES_PER_CLIP:
            continue
        os.makedirs(clip, exist_ok=True)
        base = _natural_image(rng, 256).astype(np.int16)
        for f in range(FRAMES_PER_CLIP):
            frame = np.clip(base + rng.integers(-6, 7, base.shape), 0, 255)
            Image.fromarray(frame.astype(np.uint8)).save(
                os.path.join(clip, f"{f:04d}.jpg"), quality=92
            )


def _measure(ds, unit_per_batch, min_seconds=8.0):
    n, t0 = 0, time.perf_counter()
    while time.perf_counter() - t0 < min_seconds:
        for b in ds:
            n += unit_per_batch(b)
            if time.perf_counter() - t0 >= min_seconds:
                break
    return n / (time.perf_counter() - t0)


def bench_image(workers):
    from ddmi_tpu.data.image_folder import ImageFolderDataset

    ds = ImageFolderDataset(
        os.path.join(ROOT, "image"), batch_size=10, resolution=512,
        workers=workers,
    )
    rate = _measure(ds, lambda b: b.shape[0])
    demand = DEVICE_DEMAND["image-s1"]
    print(json.dumps({
        "metric": f"input pipeline, image 512^2 jpeg, workers {workers}",
        "host_samples_per_sec": round(rate, 1),
        "device_demand_per_sec": demand,
        "headroom": round(rate / demand, 2),
        "host_bound": rate < demand,
        "cores": os.cpu_count(),
    }), flush=True)


def bench_video(workers):
    from ddmi_tpu.data.video import VideoFrameFolderDataset

    ds = VideoFrameFolderDataset(
        os.path.join(ROOT, "video"), batch_size=2, frames=16, resolution=256,
        workers=workers,
    )
    rate = _measure(ds, lambda b: b.shape[0])
    demand = DEVICE_DEMAND["video-s1"]
    print(json.dumps({
        "metric": f"input pipeline, video 16x256^2 frames, workers {workers}",
        "host_clips_per_sec": round(rate, 2),
        "device_demand_per_sec": demand,
        "headroom": round(rate / demand, 2),
        "host_bound": rate < demand,
        "cores": os.cpu_count(),
    }), flush=True)


if __name__ == "__main__":
    make_dataset()
    for w in (1, 4):
        bench_image(w)
    for w in (1, 4):
        bench_video(w)
