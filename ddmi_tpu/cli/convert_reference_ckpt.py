"""Convert reference-DDMI torch checkpoints into ddmi_tpu Orbax checkpoints.

Usage:
  python -m ddmi_tpu.cli.convert_reference_ckpt \
      --exp d2c-vae --configs configs/d2c-vae/celebahq.yaml \
      --ckpt /path/model-last.pt [--out <save_pth>]

  python -m ddmi_tpu.cli.convert_reference_ckpt \
      --exp ldm --configs configs/ldm/celebahq.yaml \
      --ckpt /path/ldm-last.pt [--out <save_pth>]

Writes the converted parameters into the `stage1` (and, for --exp ldm, also
`stage2`) Orbax checkpoint trees under the config's `data.save_pth`, so
`mode: train` resumes from them and `mode: gen`/`eval` sample from them
directly — the migration path for users with trained reference checkpoints
(reference save formats: tools/d2c_vae/image.py:117-133,
tools/ldm/image.py:104-119).

Supported domains: all four — image, video (TimeSformer VAE + triplane
UNet), occupancy, NeRF.  Optimizer / SN-regularizer / discriminator states
are freshly initialized: torch Adam moments don't transfer across frameworks
meaningfully.
"""

from __future__ import annotations

import argparse

import jax
import numpy as np

from ddmi_tpu.core.checkpoint import CheckpointManager
from ddmi_tpu.core.config import load_config
from ddmi_tpu.interop.reference_ckpt import (
    convert_stage1_image,
    convert_stage2_image,
    load_torch_checkpoint,
)


def _check_tree_match(name: str, converted, template) -> None:
    """Converted params must match the init tree exactly (keys + shapes)."""
    c_paths = {
        "/".join(str(getattr(k, "key", k)) for k in p): v.shape
        for p, v in jax.tree_util.tree_flatten_with_path(converted)[0]
    }
    t_paths = {
        "/".join(str(getattr(k, "key", k)) for k in p): v.shape
        for p, v in jax.tree_util.tree_flatten_with_path(template)[0]
    }
    missing = sorted(set(t_paths) - set(c_paths))[:8]
    extra = sorted(set(c_paths) - set(t_paths))[:8]
    if missing or extra:
        raise ValueError(
            f"{name}: converted tree differs from model tree; "
            f"missing={missing} extra={extra}"
        )
    bad = [
        (k, c_paths[k], t_paths[k])
        for k in t_paths
        if tuple(c_paths[k]) != tuple(t_paths[k])
    ][:8]
    if bad:
        raise ValueError(f"{name}: shape mismatches {bad}")


def _to_f32(tree):
    return jax.tree_util.tree_map(
        lambda x: np.asarray(x, np.float32) if np.asarray(x).dtype != np.bool_
        else np.asarray(x), tree
    )


def _convert_stage1_params(data: dict, cfg, pipe, exp: str):
    """Domain dispatch for the stage-1 tensors inside a reference .pt.
    Image d2c-vae files store the VAE under 'model'
    (tools/d2c_vae/image.py:123); everything else uses 'vaemodel'."""
    m = cfg.model
    domain = cfg.data.domain
    if domain == "image":
        vae_key = "model" if (exp == "d2c-vae" and "model" in data) else "vaemodel"
        return convert_stage1_image(
            data, m.ddconfig, m.mlpconfig, vae_key=vae_key
        )
    if domain == "video":
        from ddmi_tpu.interop.reference_ckpt import convert_stage1_video

        return convert_stage1_video(data, m.ddconfig)
    if domain in ("occupancy", "nerf"):
        from ddmi_tpu.interop.reference_ckpt import convert_stage1_3d

        return convert_stage1_3d(
            data, m.ddconfig, domain,
            nerf_depth=getattr(pipe.mlp, "depth", 8),
            pointnet_blocks=getattr(pipe.pointnet, "n_blocks", 5),
        )
    raise SystemExit(f"checkpoint conversion not supported for domain {domain!r}")


def convert(exp: str, config_path: str, ckpt_path: str, out_dir: str | None,
            steps_per_epoch: int = 1000) -> str:
    cfg = load_config(config_path)
    from ddmi_tpu.cli.main import build_pipeline

    pipe = build_pipeline(cfg)
    data = load_torch_checkpoint(ckpt_path)
    save_dir = out_dir or cfg.data.save_pth
    step = int(data.get("step", 0))
    m = cfg.model

    if exp == "d2c-vae":
        params = _to_f32(_convert_stage1_params(data, cfg, pipe, exp))
        state = pipe.init_stage1(jax.random.PRNGKey(0), steps_per_epoch)
        _check_tree_match("stage1", params, state.params)
        state = state.replace(
            params=params, step=np.asarray(step, np.int32)
        )
        ckpt = CheckpointManager(save_dir, prefix="stage1")
        ckpt.save(step, jax.device_get(state), force=True, overwrite=True)
        ckpt.wait()
    elif exp == "ldm":
        # the ldm file embeds the frozen stage-1 weights too — write both
        s1_params = _to_f32(_convert_stage1_params(data, cfg, pipe, exp))
        s1 = pipe.init_stage1(jax.random.PRNGKey(0), steps_per_epoch)
        _check_tree_match("stage1", s1_params, s1.params)
        s1 = s1.replace(params=s1_params)
        c1 = CheckpointManager(save_dir, prefix="stage1")
        c1.save(step, jax.device_get(s1), force=True, overwrite=True)

        # denoiser: plain ADM UNet (image/occupancy/nerf latents,
        # mixing_logit NCHW -> NHWC), triplane token UNet (video), or
        # MDTv2 when the config sets DiT: True
        if m.DiT:
            from ddmi_tpu.interop.reference_ckpt import convert_stage2_mdt

            convert_stage2 = convert_stage2_mdt
            denoiser_cfg = m.ditconfig
        elif cfg.data.domain == "video":
            from ddmi_tpu.interop.reference_ckpt import convert_stage2_video

            convert_stage2 = convert_stage2_video
            denoiser_cfg = m.unetconfig
        else:
            convert_stage2 = convert_stage2_image
            denoiser_cfg = m.unetconfig
        params = _to_f32(convert_stage2(data, denoiser_cfg))
        try:
            ema = _to_f32(convert_stage2(data, denoiser_cfg, use_ema=True))
        except KeyError:
            ema = params
        s2 = pipe.init_stage2(jax.random.PRNGKey(0), steps_per_epoch)
        _check_tree_match("stage2", params, s2.params)
        _check_tree_match("stage2-ema", ema, s2.ema_params)
        s2 = s2.replace(
            params=params, ema_params=ema, step=np.asarray(step, np.int32)
        )
        c2 = CheckpointManager(save_dir, prefix="stage2")
        c2.save(step, jax.device_get(s2), force=True, overwrite=True)
        c1.wait()
        c2.wait()
    else:
        raise SystemExit(f"unknown --exp {exp}")
    print(f"converted {ckpt_path} (step {step}) -> {save_dir}")
    return save_dir


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--exp", required=True, choices=["d2c-vae", "ldm"])
    ap.add_argument("--configs", required=True)
    ap.add_argument("--ckpt", required=True, help="reference .pt file")
    ap.add_argument("--out", default=None, help="override data.save_pth")
    args = ap.parse_args()
    # Host-side tool: weight re-layout + template init + Orbax write.  Pin to
    # CPU so the template inits don't compile on (and occupy) an accelerator.
    jax.config.update("jax_platforms", "cpu")
    convert(args.exp, args.configs, args.ckpt, args.out)


if __name__ == "__main__":
    main()
