"""CLI entry: `python -m ddmi_tpu.cli.main --exp {d2c-vae,ldm} --configs <yaml>`.

Same public surface as the reference CLI (main.py:54-65) with the same YAML
schema; `data.mode` in {train, eval, gen} selects behavior (exp/stage.py:318).
Multi-host boot is env-gated, NOT automatic: set JAX_COORDINATOR_ADDRESS /
JAX_NUM_PROCESSES / JAX_PROCESS_ID (or run under a TPU pod runtime, which is
auto-detected) and `main()` calls `jax.distributed.initialize` before any
device work — the SPMD analogue of the reference's
`accelerate launch --multi_gpu --num_processes=4` (README.md:91).  See
ddmi_tpu/parallel/distributed.py and docs/SCALING.md."""

from __future__ import annotations

import argparse

import jax

from ddmi_tpu.core.config import load_config


def build_dataset(cfg, train: bool = True):
    from ddmi_tpu.data import ImageFolderDataset, SyntheticImages

    d = cfg.data
    root = d.data_dir if train else d.test_data_dir
    # stage-1 multiscale training needs 2x-anchor inputs (random-crop pyramid,
    # core/coords.py multiscale_image_transform; reference trains CelebA-HQ at
    # 512 for anchor 256, tools/d2c_vae/image.py:96-118); otherwise anchor res.
    anchor = cfg.model.ddconfig.resolution
    train_res = 2 * anchor if cfg.model.lossconfig.multiscale else anchor
    if d.dataset == "synthetic":
        bs = d.batch_size if train else d.test_batch_size
        if d.domain == "video":
            from ddmi_tpu.data.video import SyntheticVideos

            return SyntheticVideos(bs, frames=d.frames, resolution=anchor)
        if d.domain == "occupancy":
            from ddmi_tpu.data.shapenet import SyntheticOccupancy

            return SyntheticOccupancy(bs)
        if d.domain == "nerf":
            from ddmi_tpu.data.nerf import SyntheticNeRF

            return SyntheticNeRF(bs, resolution=d.test_resolution)
        return SyntheticImages(bs, resolution=train_res if train else anchor)
    if cfg.data.domain == "image":
        return ImageFolderDataset(
            root,
            d.batch_size if train else d.test_batch_size,
            resolution=train_res if train else anchor,
            random_flip=train,
            num_processes=jax.process_count(),
            process_index=jax.process_index(),
            workers=d.num_workers,
        )
    if cfg.data.domain == "video":
        from ddmi_tpu.data.video import make_video_dataset

        return make_video_dataset(
            d.dataset if d.dataset != "folder" else "sky",
            root, d.batch_size if train else d.test_batch_size,
            frames=d.frames, resolution=anchor,
            workers=d.num_workers,
        )
    if cfg.data.domain == "occupancy":
        from ddmi_tpu.data.shapenet import ShapeNetOccupancyDataset

        # sampling params from the nested convocc YAML when configured
        # (convocc data block: pointcloud_n/noise/points_subsample)
        ds_kw = {}
        if d.conv_config:
            from ddmi_tpu.core.convocc_config import load_convocc_config

            cc = (load_convocc_config(d.conv_config).get("data") or {})
            ds_kw = {
                "points_subsample": cc.get("points_subsample", 2048),
                "pointcloud_n": cc.get("pointcloud_n", 3000),
                "pointcloud_noise": cc.get("pointcloud_noise", 0.005),
                "categories": cc.get("classes"),
            }
            # GT voxels for the iou_voxels eval protocol (VoxelsField;
            # only loaded for the test split — eval-time metric)
            if not train and cc.get("voxels_file"):
                ds_kw["voxels_file"] = cc["voxels_file"]
        return ShapeNetOccupancyDataset(
            root, d.batch_size, split="train" if train else "test", **ds_kw
        )
    if cfg.data.domain == "nerf":
        from ddmi_tpu.data.nerf import NeRFShapeNetDataset

        return NeRFShapeNetDataset(root, d.batch_size, train=train)
    raise NotImplementedError(cfg.data.domain)


def build_perceptual(cfg):
    """LPIPS perceptual_fn for stage-1 image/video training — the reference
    ALWAYS trains those with LPIPS (tools/d2c_vae/image.py:61, :207).  Loads
    converted torch VGG16+lin weights from data.extra.lpips_pth when present
    (the reference downloads them at runtime; this environment has no
    egress), else falls back to a random-init VGG feature distance with a
    loud warning."""
    import os
    import warnings

    import jax as _jax
    import jax.numpy as jnp

    from ddmi_tpu.evals.lpips import LPIPS, load_torch_weights

    # model.amp runs the VGG trunk in bf16 (reference parity: LPIPS trains
    # under fp16 autocast, tools/d2c_vae/image.py:184); reductions stay
    # fp32 inside LPIPS.  DDMI_LPIPS_FP32=1 forces fp32 for on-chip A/Bs.
    amp = bool(cfg.model.amp) and not os.environ.get("DDMI_LPIPS_FP32")
    model = LPIPS(dtype=jnp.bfloat16 if amp else jnp.float32)
    pth = cfg.data.extra.get("lpips_pth")
    if pth and os.path.exists(pth):
        import numpy as np

        state = dict(np.load(pth, allow_pickle=True).item()) if pth.endswith(
            ".npy"
        ) else __import__("torch").load(pth, map_location="cpu")
        params = load_torch_weights(state, state)
    else:
        warnings.warn(
            "LPIPS weights not found (data.extra.lpips_pth); using random-init "
            "VGG features — training still regularizes on perceptual structure "
            "but values are not comparable to the reference's LPIPS"
        )
        x = jnp.zeros((1, 64, 64, 3))
        params = model.init(_jax.random.PRNGKey(0), x, x)["params"]

    from ddmi_tpu.evals.lpips import PerceptualLoss

    return PerceptualLoss(
        lambda p, target, output: model.apply({"params": p}, target, output),
        params,
    )


def build_pipeline(cfg):
    perceptual = None
    if cfg.exp == "d2c-vae" and cfg.data.domain in ("image", "video"):
        perceptual = build_perceptual(cfg)
    if cfg.data.domain == "image":
        from ddmi_tpu.domains.image import ImagePipeline

        return ImagePipeline(cfg, perceptual_fn=perceptual)
    if cfg.data.domain == "video":
        from ddmi_tpu.domains.video import VideoPipeline

        return VideoPipeline(cfg, perceptual_fn=perceptual)
    if cfg.data.domain == "occupancy":
        from ddmi_tpu.domains.occupancy import OccupancyPipeline

        return OccupancyPipeline(cfg)
    if cfg.data.domain == "nerf":
        from ddmi_tpu.domains.nerf import NeRFPipeline

        return NeRFPipeline(cfg)
    raise NotImplementedError(cfg.data.domain)


def main(argv=None):
    p = argparse.ArgumentParser("ddmi_tpu")
    p.add_argument("--exp", choices=["d2c-vae", "ldm"], required=True)
    p.add_argument("--configs", required=True)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args(argv)

    # Multi-host boot (must precede backend/device use; no-op single-process).
    from ddmi_tpu.parallel.distributed import maybe_initialize

    maybe_initialize()

    cfg = load_config(args.configs, exp=args.exp, seed=args.seed)

    from ddmi_tpu.core.trainer import Trainer

    pipe = build_pipeline(cfg)
    mode = cfg.data.mode

    if mode == "gen":
        trainer = Trainer(cfg, pipe, build_dataset(cfg, train=False))
        trainer.generate()
        return

    if mode == "eval":
        trainer = Trainer(cfg, pipe, build_dataset(cfg, train=False))
        trainer.evaluate(args.exp)
        return

    train_data = build_dataset(cfg, train=True)
    try:
        test_data = build_dataset(cfg, train=False)
    except (FileNotFoundError, NotImplementedError):
        test_data = None
    trainer = Trainer(cfg, pipe, train_data, test_data)

    if args.exp == "d2c-vae":
        trainer.train_stage1(resume=cfg.model.resume)
    else:
        # params only: keeping the full Stage1State referenced would pin the
        # stage-1 optimizer/SN buffers in HBM for the whole stage-2 run
        trainer.train_stage2(
            trainer.load_stage1_params(), resume=cfg.model.resume
        )


if __name__ == "__main__":
    main()
