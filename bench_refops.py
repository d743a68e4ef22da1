"""Count the reference's eager per-forward op dispatches (CPU, no TPU).

The per-domain analytic A100 baselines (bench.py / bench_3d.py /
bench_video.py) model the reference's throughput as FLOPs sustained at a
torch-eager MFU band.  That FLOP wall is the binding constraint for the
big-tensor image path, but the occupancy/NeRF/video DDIM scans run tiny
tensors (16x16 latents, 2048-token planes) through a Python for-loop
(/root/reference/diffusion/ddpm.py:348) — there, eager PyTorch is bound by
per-op dispatch/launch overhead, not FLOPs, and a flat MFU band wildly
overestimates what an A100 could do.

This tool imports the ACTUAL reference denoisers (same stub shims as
tests/test_golden_reference.py), runs one forward at the protocol shape on
CPU under torch.profiler, and counts dispatched aten ops — every one of
which is >=1 CUDA kernel launch in eager GPU execution.  Results are cached
to refops.json; the bench harnesses combine them with the FLOP wall:

    ref_time_per_fwd = max(flops / (A100_peak * MFU), n_ops * LAUNCH_US)

LAUNCH_US is deliberately small (generous to the reference): measured eager
dispatch overhead is ~5-20 us/op incl. Python; we band it 2-5 us with a 3 us
point (CUDA launch alone is ~2 us; the reference uses no CUDA graphs).

Run: python bench_refops.py   (writes refops.json, prints one JSON line)
"""

import json
import os
import sys
import types

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "refops.json")


def _install_stubs():
    """CPU shims for the reference's CUDA/absent deps (mirrors
    tests/test_golden_reference.py's fixture; xformers import is try-guarded
    upstream so only torchvision / imageio / the op package need stubs)."""
    import torch
    import torch.nn.functional as F
    from torch import nn

    def fused_leaky_relu(x, bias, negative_slope=0.2, scale=2 ** 0.5):
        return F.leaky_relu(
            x + bias.view(1, -1, *([1] * (x.ndim - 2))), negative_slope
        ) * scale

    class FusedLeakyReLU(nn.Module):
        def __init__(self, channel, negative_slope=0.2, scale=2 ** 0.5):
            super().__init__()
            self.bias = nn.Parameter(torch.zeros(channel))
            self.negative_slope, self.scale = negative_slope, scale

        def forward(self, x):
            return fused_leaky_relu(x, self.bias, self.negative_slope,
                                    self.scale)

    def upfirdn2d(x, kernel, up=1, down=1, pad=(0, 0)):
        b, c, h, w = x.shape
        x = x.view(-1, 1, h, w)
        if up > 1:
            x = F.pad(x, (0, up - 1, 0, up - 1))
            x = x.view(-1, 1, h, up, w, up).transpose(3, 4).reshape(
                -1, 1, h * up, w * up
            )  # zero-stuffing
        x = F.pad(x, (pad[0], pad[1], pad[0], pad[1]))
        k = kernel.flip(0, 1).view(1, 1, *kernel.shape)
        x = F.conv2d(x, k)
        if down > 1:
            x = x[:, :, ::down, ::down]
        return x.view(b, c, x.shape[-2], x.shape[-1])

    stubs = {}
    tv = types.ModuleType("torchvision")
    tv_utils = types.ModuleType("torchvision.utils")
    tv_utils.make_grid = lambda *a, **k: a[0]
    tv_utils.save_image = lambda *a, **k: None
    tv_tr = types.ModuleType("torchvision.transforms")
    tv_trf = types.ModuleType("torchvision.transforms.functional")
    tv.utils, tv.transforms, tv_tr.functional = tv_utils, tv_tr, tv_trf
    stubs.update({"torchvision": tv, "torchvision.utils": tv_utils,
                  "torchvision.transforms": tv_tr,
                  "torchvision.transforms.functional": tv_trf,
                  "imageio": types.ModuleType("imageio")})
    op = types.ModuleType("models.d2c_vae.op")
    op.FusedLeakyReLU = FusedLeakyReLU
    op.fused_leaky_relu = fused_leaky_relu
    op.upfirdn2d = upfirdn2d
    stubs["models.d2c_vae.op"] = op
    sys.modules.update(stubs)
    sys.path.insert(0, REF)


def _count_ops(module, *inputs):
    """Dispatched aten ops for one forward (each is >=1 eager CUDA launch)."""
    import torch
    from torch.profiler import ProfilerActivity, profile

    with torch.no_grad():
        module(*inputs)  # warm (parametrization / lazy init)
        with profile(activities=[ProfilerActivity.CPU]) as prof:
            module(*inputs)
    n = 0
    for ev in prof.events():
        name = ev.name
        if name.startswith("aten::") and ev.cpu_parent is None:
            # top-level dispatches only: children (e.g. aten::mm inside
            # aten::linear) are fused into one launch sequence upstream of
            # the dispatcher and would double-count
            n += 1
    return n


def main():
    _install_stubs()
    import torch

    import yaml

    torch.manual_seed(0)

    from models.ldm.modules.diffusionmodules.openaimodel import (
        UNetModel,
        UNetModel_Triplane,
    )
    from models.d2c_vae.mlp import MLPNeRF

    def unetconfig(name):
        with open(f"{REF}/configs/ldm/{name}.yaml") as f:
            cfg = yaml.safe_load(f)
        return cfg["model"]["params"]["unetconfig"]

    results = {}

    # image: celebahq 64x64x64 latents (tools/ldm/image.py:240)
    c = unetconfig("celebahq")
    m = UNetModel(**c).eval()
    x = torch.randn(1, c["in_channels"], 64, 64)
    t = torch.zeros(1, dtype=torch.long)
    results["image_unet_fwd"] = _count_ops(m, x, t)
    del m

    # occupancy / nerf: 16x16 triplane-concat latents
    # (tools/ldm/occupancy.py:215, tools/ldm/nerf.py)
    for name, key in (("shapenet", "occupancy_unet_fwd"),
                      ("srn_cars", "nerf_unet_fwd")):
        c = unetconfig(name)
        m = UNetModel(**c).eval()
        x = torch.randn(1, c["in_channels"], c["image_size"], c["image_size"])
        results[key] = _count_ops(m, x, t)
        del m

    # video: UNetModel_Triplane on the [xy|xt|yt] 1D token concat
    # (tools/ldm/video.py:150-153 -> openaimodel.py:1144-1165)
    c = unetconfig("skytimelapse")
    m = UNetModel_Triplane(**c).eval()
    L = c["size1"] * c["size2"] + 2 * c["size1"] * c["size3"]
    x = torch.randn(1, c["in_channels"], L)
    results["video_unet_fwd"] = _count_ops(m, x, t)
    del m

    # NeRF render MLP: ops per netchunk of run_network
    # (utils/nerf_helpers.py:455-484, chunk=40000 points through MLPNeRF)
    with open(f"{REF}/configs/ldm/srn_cars.yaml") as f:
        sc = yaml.safe_load(f)
    mc = sc["model"]["params"]["mlpconfig"]
    m = MLPNeRF(**mc).eval()
    pts = torch.randn(1024, m.in_channels_xyz + m.in_channels_dir)
    results["nerf_mlp_chunk_fwd"] = _count_ops(m, pts)

    results["_provenance"] = (
        "top-level aten dispatches per forward, torch.profiler on CPU, "
        "actual reference modules at protocol configs (bench_refops.py); "
        "each is >=1 eager CUDA launch on A100"
    )
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
