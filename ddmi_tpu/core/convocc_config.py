"""Nested convocc-style YAML loading for the 3D/NeRF subsystem.

Port of convocc/src/config.py:13-58: `inherit_from` recursion with recursive
dict merging, used by `data.conv_config` (configs/ldm/shapenet.yaml:80).
The resulting dict feeds pointnet/generation/NeRF kwargs in the occupancy and
NeRF pipelines."""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import yaml


def _merge(base: Dict[str, Any], override: Dict[str, Any]) -> None:
    for k, v in override.items():
        if k in base and isinstance(base[k], dict) and isinstance(v, dict):
            _merge(base[k], v)
        else:
            base[k] = v


def load_convocc_config(path: str) -> Dict[str, Any]:
    with open(path) as f:
        cfg = yaml.safe_load(f) or {}
    parent = cfg.get("inherit_from")
    if parent:
        parent_path = parent
        if not os.path.isabs(parent_path):
            parent_path = os.path.join(os.path.dirname(path), parent_path)
            if not os.path.exists(parent_path):
                parent_path = parent  # repo-relative fallback
        base = load_convocc_config(parent_path)
    else:
        base = {}
    _merge(base, cfg)
    return base


def encoder_name(conv_cfg: Dict[str, Any]) -> str:
    """convocc model.encoder: 'pointnet_local_pool' (default) or
    'voxel_simple_local' (convocc/src/encoder/__init__.py registry)."""
    return (conv_cfg.get("model") or {}).get("encoder", "pointnet_local_pool")


def pointnet_kwargs(conv_cfg: Dict[str, Any]) -> Dict[str, Any]:
    """Extract LocalPoolPointnet kwargs (convocc encoder_kwargs schema),
    including the optional plane-feature UNet refinement."""
    enc = (conv_cfg.get("model") or {}).get("encoder_kwargs", {})
    kw = {
        "c_dim": (conv_cfg.get("model") or {}).get("c_dim", 32),
        "hidden_dim": enc.get("hidden_dim", 256),
        "plane_resolution": enc.get("plane_resolution", 64),
        "n_blocks": enc.get("n_blocks", 7),
    }
    if enc.get("unet"):
        uk = enc.get("unet_kwargs") or {}
        kw.update(
            unet=True,
            unet_depth=uk.get("depth", 4),
            unet_start_filts=uk.get("start_filts", 32),
        )
    return kw


def voxel_encoder_kwargs(conv_cfg: Dict[str, Any]) -> Dict[str, Any]:
    """Extract LocalVoxelEncoder kwargs (voxels.py LocalVoxelEncoder)."""
    enc = (conv_cfg.get("model") or {}).get("encoder_kwargs", {})
    kw = {
        "c_dim": (conv_cfg.get("model") or {}).get("c_dim", 32),
        "plane_resolution": enc.get("plane_resolution", 64),
        "kernel_size": enc.get("kernel_size", 3),
        "unet3d": bool(enc.get("unet3d", False)),
    }
    pt = enc.get("plane_type")
    if pt:
        kw["plane_type"] = tuple(pt)
    if enc.get("unet"):
        uk = enc.get("unet_kwargs") or {}
        kw.update(
            unet=True,
            unet_depth=uk.get("depth", 4),
            unet_start_filts=uk.get("start_filts", 32),
        )
    return kw


def generation_kwargs(conv_cfg: Dict[str, Any]) -> Dict[str, Any]:
    """Extract MeshGenerator kwargs (convocc generation schema)."""
    g = conv_cfg.get("generation") or {}
    t = conv_cfg.get("test") or {}
    return {
        "threshold": t.get("threshold", 0.2),
        "resolution0": g.get("resolution_0", 64),
        "upsampling_steps": g.get("upsampling_steps", 2),
        "simplify_nfaces": g.get("simplify_nfaces"),
        # gradient-based vertex refinement (reference default.yaml:49,
        # conv_onet/config.py:122, generation.py:219-222)
        "refinement_step": g.get("refinement_step", 0),
    }


def nerf_kwargs(conv_cfg: Dict[str, Any]) -> Dict[str, Any]:
    """Extract NeRF render kwargs (the model.TN block,
    srncars_nerf_3plane.yaml)."""
    tn = (conv_cfg.get("model") or {}).get("TN", {})
    return {
        "N_samples": tn.get("N_samples", 256),
        "N_rand": tn.get("N_rand", 5000),
        "white_bkgd": tn.get("white_bkgd", True),
        "multires": tn.get("multires", 10),
        "multires_views": tn.get("multires_views", 4),
        "netchunk": tn.get("netchunk", 40000),
        "perturb": tn.get("peturb", tn.get("perturb", 1.0)),
    }
