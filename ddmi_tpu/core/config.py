"""Typed configuration system.

One dataclass schema covering both training stages and all four domains,
mirroring the reference's OmegaConf YAML layout (configs/ldm/celebahq.yaml:1-77,
main.py:11-47 flattening) so reference configs port 1:1.  Unlike the reference
(ad-hoc attribute flattening onto argparse `args`), configs here are immutable
dataclasses with explicit fields + an `extra` dict for forward-compat keys.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import yaml


def _filter_kwargs(cls, d: Dict[str, Any]) -> Dict[str, Any]:
    fields = {f.name: f for f in dataclasses.fields(cls)}
    known = {}
    extra = {k: v for k, v in d.items() if k not in fields}
    for k, v in d.items():
        if k not in fields:
            continue
        # YAML 1.1 parses '1e-4' as a string — coerce by declared field type
        t = fields[k].type
        if isinstance(v, str):
            if t in (float, "float"):
                v = float(v)
            elif t in (int, "int"):
                v = int(v)
        elif t in (float, "float") and isinstance(v, int):
            v = float(v)
        known[k] = v
    if "extra" in fields:
        # merge unknown keys into any explicitly-provided `extra:` block
        # (explicit keys win)
        explicit = known.get("extra") or {}
        known["extra"] = {**extra, **explicit}
    return known


@dataclass(frozen=True)
class LossConfig:
    """Stage-1 (d2c-vae) and stage-2 (ldm) loss / schedule hyperparameters."""

    epochs: int = 200
    warmup_epochs: int = 5
    multiscale: bool = True
    adversarial: bool = False
    # KL annealing (reference: utils/general_utils.py:218, tools/d2c_vae/image.py:193-199)
    kl_anneal: bool = True
    kl_max_coeff: float = 0.5
    kl_const_coeff: float = 1e-4
    kl_const_portion: float = 1e-4
    kl_anneal_portion: float = 0.9
    disc_weight: float = 0.5
    # Spectral-norm regularizer (reference: utils/sr_utils.py)
    sn_reg: bool = True
    sn_reg_weight_decay: float = 0.1
    sn_reg_weight_decay_anneal: bool = True
    sn_reg_weight_decay_init: float = 5.0
    lr_scheduler: bool = True
    save_and_sample_every: int = 25
    gradient_accumulate_every: int = 1
    # stage-2 EMA (reference: tools/ldm/image.py:63-65)
    ema_decay: float = 0.9999
    ema_update_every: int = 10
    perceptual_weight: float = 1.0
    extra: Dict[str, Any] = field(default_factory=dict)


@dataclass(frozen=True)
class DDConfig:
    """VAE encoder/decoder config (reference ddconfig, autoencoder_unet.py:608,703)."""

    double_z: bool = True
    z_channels: int = 128
    resolution: int = 256
    in_channels: int = 3
    out_ch: int = 64
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4)
    num_res_blocks: int = 3
    attn_resolutions: Tuple[int, ...] = ()
    hdbf_resolutions: Tuple[int, ...] = (128, 64)
    inter_attn_resolutions: Tuple[int, ...] = ()
    dropout: float = 0.0
    attn_type: str = "vanilla"
    # video (VIT autoencoder) extras
    timesformer_channels: int = 384
    patch_size: int = 8
    splits: int = 1
    extra: Dict[str, Any] = field(default_factory=dict)

    def __post_init__(self):
        object.__setattr__(self, "ch_mult", tuple(self.ch_mult))
        object.__setattr__(self, "attn_resolutions", tuple(self.attn_resolutions))
        object.__setattr__(self, "hdbf_resolutions", tuple(self.hdbf_resolutions))
        object.__setattr__(
            self, "inter_attn_resolutions", tuple(self.inter_attn_resolutions)
        )


@dataclass(frozen=True)
class MLPConfig:
    """INR head config (reference mlpconfig, models/d2c_vae/mlp.py:12-31)."""

    in_ch: int = 2
    out_ch: int = 3
    ch: int = 256
    latent_dim: int = 64
    extra: Dict[str, Any] = field(default_factory=dict)


@dataclass(frozen=True)
class UNetConfig:
    """ADM UNet denoiser config (reference unetconfig, openaimodel.py:463-560)."""

    image_size: int = 64
    in_channels: int = 64
    model_channels: int = 256
    out_channels: int = 64
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (8, 4, 2)
    channel_mult: Tuple[int, ...] = (1, 2, 4, 8)
    num_heads: int = -1
    num_head_channels: int = 32
    dropout: float = 0.0
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    use_checkpoint: bool = False
    use_fp16: bool = False
    # triplane (video) variant: cross-plane 1D attention after each block
    triplane: bool = False
    plane_sizes: Tuple[Tuple[int, int], ...] = ()
    # context-conditioned denoiser: swap self-attention for SpatialTransformer
    # blocks cross-attending to a (B, n_ctx, context_dim) context tensor
    # (reference openaimodel.py:512-528 use_spatial_transformer/context_dim;
    # no shipped DDMI config enables it, but the framework supports it)
    use_spatial_transformer: bool = False
    transformer_depth: int = 1
    context_dim: Optional[int] = None
    # class-conditional variant: label embedding added to the timestep
    # embedding (reference openaimodel.py:565-566 num_classes/label_emb)
    num_classes: Optional[int] = None
    extra: Dict[str, Any] = field(default_factory=dict)

    def __post_init__(self):
        object.__setattr__(
            self, "attention_resolutions", tuple(self.attention_resolutions)
        )
        object.__setattr__(self, "channel_mult", tuple(self.channel_mult))
        object.__setattr__(
            self, "plane_sizes", tuple(tuple(p) for p in self.plane_sizes)
        )


@dataclass(frozen=True)
class DDPMConfig:
    """Diffusion process config (reference ddpmconfig, diffusion/ddpm.py:76-161)."""

    timesteps: int = 1000
    beta_schedule: str = "linear"
    linear_start: float = 0.0015
    linear_end: float = 0.0195
    cosine_s: float = 8e-3
    image_size: int = 64
    channels: int = 64
    clip_denoised: bool = False
    parameterization: str = "eps"
    loss_type: str = "l2"
    mixed_prediction: bool = True
    mixed_init: float = -6.0
    sampling_timesteps: int = 50
    ddim_sampling_eta: float = 0.0
    original_elbo_weight: float = 0.0
    l_simple_weight: float = 1.0
    v_posterior: float = 0.0
    w: float = 1.0  # classifier-free guidance weight
    extra: Dict[str, Any] = field(default_factory=dict)


@dataclass(frozen=True)
class DiTConfig:
    """MDTv2 (masked diffusion transformer) denoiser config."""

    input_size: int = 64
    patch_size: int = 2
    in_channels: int = 64
    hidden_size: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    mask_ratio: Optional[float] = None
    decode_layer: int = 4
    cross_plane: bool = False
    extra: Dict[str, Any] = field(default_factory=dict)


@dataclass(frozen=True)
class DataConfig:
    """Data / run config (reference `data:` block)."""

    domain: str = "image"  # image | video | occupancy | nerf
    mode: str = "train"  # train | eval | gen
    data_dir: str = "./train_data"
    test_data_dir: str = "./test_data"
    save_pth: str = "./save"
    batch_size: int = 8
    test_batch_size: int = 8
    test_resolution: int = 256
    frames: int = 16
    conv_config: Optional[str] = None  # nested convocc YAML for 3D/NeRF
    dataset: str = "folder"  # folder | synthetic | shapenet | srncars | sky | ucf101
    num_workers: int = 4
    extra: Dict[str, Any] = field(default_factory=dict)


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh / parallelism config (TPU-native; no reference equivalent —
    the reference is DDP-only, SURVEY.md §2.10)."""

    data: int = -1  # -1: all devices on the data axis
    model: int = 1  # tensor-parallel axis (extension beyond reference parity)
    fsdp: int = 1   # parameter-sharding axis
    extra: Dict[str, Any] = field(default_factory=dict)


@dataclass(frozen=True)
class ModelConfig:
    DiT: bool = False
    pretrained: bool = False
    resume: bool = False
    use_fp16: bool = True
    amp: bool = True
    lr: float = 1e-4
    embed_dim: int = 64
    lossconfig: LossConfig = field(default_factory=LossConfig)
    ddconfig: DDConfig = field(default_factory=DDConfig)
    mlpconfig: MLPConfig = field(default_factory=MLPConfig)
    unetconfig: UNetConfig = field(default_factory=UNetConfig)
    ddpmconfig: DDPMConfig = field(default_factory=DDPMConfig)
    ditconfig: DiTConfig = field(default_factory=DiTConfig)
    extra: Dict[str, Any] = field(default_factory=dict)


@dataclass(frozen=True)
class Config:
    exp: str = "d2c-vae"  # d2c-vae | ldm
    seed: int = 42
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    extra: Dict[str, Any] = field(default_factory=dict)


def _build_model_config(m: Dict[str, Any]) -> ModelConfig:
    m = dict(m)
    params = m.pop("params", {}) or {}
    sub = {}
    for key, cls in (
        ("lossconfig", LossConfig),
        ("ddconfig", DDConfig),
        ("mlpconfig", MLPConfig),
        ("unetconfig", UNetConfig),
        ("ddpmconfig", DDPMConfig),
        ("ditconfig", DiTConfig),
    ):
        if key in params and params[key] is not None:
            sub[key] = cls(**_filter_kwargs(cls, dict(params[key])))
    return ModelConfig(**_filter_kwargs(ModelConfig, {**m, **sub}))


def config_from_dict(d: Dict[str, Any]) -> Config:
    d = dict(d)
    out: Dict[str, Any] = {}
    if "model" in d:
        out["model"] = _build_model_config(dict(d.pop("model")))
    if "data" in d:
        out["data"] = DataConfig(**_filter_kwargs(DataConfig, dict(d.pop("data"))))
    if "mesh" in d:
        out["mesh"] = MeshConfig(**_filter_kwargs(MeshConfig, dict(d.pop("mesh"))))
    out.update(_filter_kwargs(Config, d))
    return Config(**out)


def load_config(path: str, **overrides: Any) -> Config:
    """Load a YAML config file (reference schema) into a typed Config."""
    with open(path) as f:
        raw = yaml.safe_load(f)
    raw.update(overrides)
    return config_from_dict(raw)


def replace(cfg, **kw):
    return dataclasses.replace(cfg, **kw)
