"""FID protocol tools.

1. `precompute`: walk an image folder, extract InceptionV3 pool features on
   TPU, save (mu, sigma) statistics to an .npz — port of the reference's
   evals/fid/precompute_fid_statistics.py (compute_statistics_of_generator +
   save_statistics).
2. `preprocess`: symmetrize -> bilinear-resize -> [0,255] uint8 re-dump of an
   image folder — port of utils/preprocess_image.py prepare_image (the
   reference's FID input normalization).

Usage:
  python -m ddmi_tpu.cli.precompute_fid precompute --data <folder> \
      --out fid_stats.npz [--size 256] [--max-samples 50000] \
      [--inception-weights converted.npz]
  python -m ddmi_tpu.cli.precompute_fid preprocess --data <in> --out <folder> \
      --size 256
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def _iter_images(root: str, batch: int, size: int):
    import jax.image
    import jax.numpy as jnp
    from PIL import Image

    exts = {".png", ".jpg", ".jpeg", ".webp"}
    files = sorted(
        os.path.join(dp, f)
        for dp, _, fs in os.walk(root)
        for f in fs
        if os.path.splitext(f)[1].lower() in exts
    )
    buf = []
    for f in files:
        im = Image.open(f).convert("RGB")
        buf.append(np.asarray(im, np.float32) / 255.0)
        if len(buf) == batch:
            x = jnp.stack([
                jax.image.resize(jnp.asarray(b), (size, size, 3), "bilinear")
                for b in buf
            ])
            yield x
            buf = []
    if buf:
        import jax.numpy as jnp

        x = jnp.stack([
            jax.image.resize(jnp.asarray(b), (size, size, 3), "bilinear")
            for b in buf
        ])
        yield x


def precompute(args):
    import jax

    from ddmi_tpu.evals.fid import FIDScorer, activation_statistics
    from ddmi_tpu.evals.inception import InceptionV3

    model = InceptionV3()
    if args.inception_weights and os.path.exists(args.inception_weights):
        params = dict(np.load(args.inception_weights, allow_pickle=True))[
            "params"
        ].item()
    else:
        print(
            "WARNING: no converted InceptionV3 weights "
            "(--inception-weights); statistics use a random-init network "
            "and are NOT comparable to published FID numbers"
        )
        params = model.init(
            jax.random.PRNGKey(0), np.zeros((1, args.size, args.size, 3))
        )["params"]

    scorer = FIDScorer(params, batch_size=args.batch_size)
    feats = []
    n = 0
    for batch in _iter_images(args.data, args.batch_size, args.size):
        feats.append(scorer.features([batch]))
        n += batch.shape[0]
        if args.max_samples and n >= args.max_samples:
            break
    mu, sigma = activation_statistics(np.concatenate(feats)[: args.max_samples])
    np.savez(args.out, mu=mu, sigma=sigma)
    print(f"saved FID statistics for {n} images -> {args.out}")


def preprocess(args):
    from PIL import Image

    exts = {".png", ".jpg", ".jpeg", ".webp"}
    os.makedirs(args.out, exist_ok=True)
    n = 0
    for dp, _, fs in os.walk(args.data):
        for f in sorted(fs):
            if os.path.splitext(f)[1].lower() not in exts:
                continue
            im = Image.open(os.path.join(dp, f)).convert("RGB")
            # reference prepare_image: symmetrize -> bilinear -> [0,255]
            arr = (np.asarray(im, np.float32) - 127.5) / 127.5
            im2 = Image.fromarray(
                np.clip((arr + 1) * 127.5, 0, 255).astype(np.uint8)
            ).resize((args.size, args.size), Image.BILINEAR)
            im2.save(os.path.join(args.out, f"{n:08d}.png"))
            n += 1
    print(f"preprocessed {n} images -> {args.out}")


def main(argv=None):
    p = argparse.ArgumentParser("ddmi_tpu.precompute_fid")
    sub = p.add_subparsers(dest="cmd", required=True)
    pc = sub.add_parser("precompute")
    pc.add_argument("--data", required=True)
    pc.add_argument("--out", required=True)
    pc.add_argument("--size", type=int, default=256)
    pc.add_argument("--batch-size", type=int, default=64)
    pc.add_argument("--max-samples", type=int, default=50000)
    pc.add_argument("--inception-weights", default=None)
    pp = sub.add_parser("preprocess")
    pp.add_argument("--data", required=True)
    pp.add_argument("--out", required=True)
    pp.add_argument("--size", type=int, default=256)
    args = p.parse_args(argv)
    if args.cmd == "precompute":
        precompute(args)
    else:
        preprocess(args)


if __name__ == "__main__":
    main()
