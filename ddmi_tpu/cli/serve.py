"""Serve a trained DDMI model over HTTP with request micro-batching.

Usage:
  python -m ddmi_tpu.cli.serve --configs configs/ldm/celebahq.yaml \
      [--port 8500] [--batch 8] [--resolution 256] [--no-warmup]

Loads the stage-1/stage-2 Orbax checkpoints from the config's
`data.save_pth` (trained here or migrated via cli/convert_reference_ckpt),
compiles the DDIM+decode+render sampler once for a fixed batch/resolution,
and coalesces concurrent requests into full device batches.  See
ddmi_tpu/serve/server.py for the API.
"""

from __future__ import annotations

import argparse

from ddmi_tpu.core.config import load_config
from ddmi_tpu.serve import SamplerService, serve_http


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--configs", required=True)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8500)
    ap.add_argument("--batch", type=int, default=8,
                    help="compiled service batch (requests are coalesced)")
    ap.add_argument("--resolution", type=int, default=None,
                    help="render resolution (default: data.test_resolution)")
    ap.add_argument("--linger-ms", type=float, default=20.0)
    ap.add_argument("--no-warmup", action="store_true")
    ap.add_argument("--no-ema", action="store_true",
                    help="serve raw params instead of the EMA copy")
    ap.add_argument("--n-views", type=int, default=8,
                    help="nerf: camera-path views per scene")
    ap.add_argument("--mesh-resolution0", type=int, default=None,
                    help="occupancy: MISE base grid resolution")
    ap.add_argument("--mesh-upsampling", type=int, default=None,
                    help="occupancy: MISE octree refinement steps")
    ap.add_argument("--turbo", type=int, default=1, metavar="K",
                    help="image: encoder-propagation sampling — run the "
                    "UNet down path only every K-th DDIM step "
                    "(arXiv:2312.09608).  K>1 trades sample exactness for "
                    "throughput; default 1 = reference-exact sampling")
    args = ap.parse_args(argv)

    mesh_kwargs = {}
    if args.mesh_resolution0 is not None:
        mesh_kwargs["resolution0"] = args.mesh_resolution0
    if args.mesh_upsampling is not None:
        mesh_kwargs["upsampling_steps"] = args.mesh_upsampling

    cfg = load_config(args.configs)
    if args.turbo > 1:
        cfg.model.ddpmconfig.extra["encoder_reuse"] = args.turbo
        print(f"turbo sampling: encoder reuse every {args.turbo} steps "
              "(non-exact, arXiv:2312.09608)")
    service = SamplerService(
        cfg, service_batch=args.batch, resolution=args.resolution,
        linger_ms=args.linger_ms, use_ema=not args.no_ema,
        n_views=args.n_views, mesh_kwargs=mesh_kwargs or None,
    )
    if not args.no_warmup:
        print("warming up (compiles the sampler once)...")
        service.warmup()
    serve_http(service, host=args.host, port=args.port)


if __name__ == "__main__":
    main()
