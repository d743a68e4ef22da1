"""Convert reference-DDMI PyTorch checkpoints to ddmi_tpu Flax param trees.

The reference saves flat torch state_dicts (stage-1: 'model' = Autoencoder,
'mlp' = INR MLP, tools/d2c_vae/image.py:117-133; stage-2: 'diffusion' = DDPM
wrapping the UNet + mixing_logit, 'ema' = ema_pytorch copy, 'vaemodel'/'mlp'
= frozen stage 1, tools/ldm/image.py:104-119).  This module walks the same
structural loops as the reference model constructors (autoencoder_unet.py
Encoder :608-699 / Decoder :703-829, mlp.py MLP :12-66, openaimodel.py
UNetModel :463-793) and emits the equivalent ddmi_tpu tree, converting weight
layouts:

  * Conv2d  (O, I, kh, kw)      -> Flax Conv kernel (kh, kw, I, O)
  * Conv1d  (O, I, 1)           -> 1x1 Conv kernel  (1, 1, I, O)
  * Linear  (O, I)              -> Dense kernel     (I, O)
  * GroupNorm weight/bias       -> scale/bias (FastGroupNorm uses the same)
  * ModulatedConv2d (1,O,I,k,k) -> (k, k, I, O)  (input-scaling formulation
    in nn/stylegan.py is algebraically identical; weights transfer 1:1)
  * ADM qkv Conv1d: the reference's QKVAttentionLegacy layout is head-major
    ([h0: q|k|v, h1: q|k|v, ...], openaimodel.py:399-421); ours is qkv-major
    ([q: h0..hN, k: ..., v: ...], nn/unet.py AttentionBlock) — output
    channels are permuted accordingly.  proj_out needs no permutation (both
    sides concatenate attention outputs head-major).

Everything operates on numpy arrays: load the torch file with
`load_torch_state_dicts` (requires torch, CPU-only) or feed dicts of
numpy arrays directly.  Every converter asserts that all source keys were
consumed and is exercised against live torch layers in
tests/test_interop.py.

Scope: all four domains.  Image (the reference's released CelebA-HQ/AFHQ
checkpoints), occupancy/NeRF (triplane VAE + pointnet + MLP heads), and
video (TimeSformer VITAutoencoder + VideoDecoder_light + MLPVideo +
UNetModel_Triplane) — each walks the corresponding reference constructor
loops.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from ddmi_tpu.core.config import DDConfig, MLPConfig, UNetConfig

Array = np.ndarray
SD = Dict[str, Array]


class _Source:
    """State-dict view that tracks consumption (strict load semantics).
    `sub(prefix)` returns a view sharing the same consumption set."""

    def __init__(self, sd: Dict[str, Array], prefix: str = "", _shared=None):
        if _shared is not None:
            self._sd, self._used = _shared
        else:
            self._sd = {k: np.asarray(v) for k, v in sd.items()}
            self._used = set()
        self._prefix = prefix

    def sub(self, prefix: str) -> "_Source":
        return _Source({}, self._prefix + prefix, (self._sd, self._used))

    def pop(self, key: str) -> Array:
        full = self._prefix + key
        if full not in self._sd:
            raise KeyError(
                f"reference checkpoint is missing '{full}' — wrong config "
                f"for this checkpoint?"
            )
        self._used.add(full)
        return self._sd[full]

    def has(self, key: str) -> bool:
        return (self._prefix + key) in self._sd

    def finish(self, ignore_unused: tuple = ()) -> None:
        """Assert every tensor was consumed (like torch strict=True)."""
        left = [
            k
            for k in self._sd
            if k not in self._used
            and not any(k.startswith(p) for p in ignore_unused)
        ]
        if left:
            raise ValueError(
                f"unconverted reference tensors (first 10): {sorted(left)[:10]}"
            )


# ----------------------------------------------------------------- leaf maps


def conv_kernel(w: Array) -> Array:
    """torch Conv2d (O, I, kh, kw) -> Flax (kh, kw, I, O)."""
    return np.transpose(w, (2, 3, 1, 0))


def conv1d_kernel(w: Array) -> Array:
    """torch Conv1d (O, I, 1) -> Flax 1x1 Conv2d (1, 1, I, O)."""
    assert w.ndim == 3 and w.shape[2] == 1, w.shape
    return np.transpose(w, (2, 1, 0))[None]  # (1, 1, I, O)


def linear_kernel(w: Array) -> Array:
    """torch Linear (O, I) -> Flax Dense (I, O)."""
    return np.transpose(w)


def modconv_kernel(w: Array) -> Array:
    """reference ModulatedConv2d (1, O, I, k, k) -> ddmi_tpu (k, k, I, O)."""
    assert w.ndim == 5 and w.shape[0] == 1, w.shape
    return np.transpose(w[0], (2, 3, 1, 0))


def _conv(src: _Source, key: str) -> dict:
    return {"kernel": conv_kernel(src.pop(key + ".weight")),
            "bias": src.pop(key + ".bias")}


def _conv1d(src: _Source, key: str) -> dict:
    return {"kernel": conv1d_kernel(src.pop(key + ".weight")),
            "bias": src.pop(key + ".bias")}


def _dense(src: _Source, key: str) -> dict:
    return {"kernel": linear_kernel(src.pop(key + ".weight")),
            "bias": src.pop(key + ".bias")}


def _gn(src: _Source, key: str) -> dict:
    """GroupNorm -> FastGroupNorm / nn.GroupNorm {'scale','bias'}."""
    return {"scale": src.pop(key + ".weight"), "bias": src.pop(key + ".bias")}


def _gn_nested(src: _Source, key: str) -> dict:
    """Our VAE wraps GroupNorm in a Norm module -> {'GroupNorm_0': {...}}."""
    return {"GroupNorm_0": _gn(src, key)}


# ------------------------------------------------------------- stage-1 VAE


def _vae_resnet(src: _Source, key: str) -> dict:
    out = {
        "Norm_0": _gn_nested(src, key + ".norm1"),
        "Conv_0": _conv(src, key + ".conv1"),
        "Norm_1": _gn_nested(src, key + ".norm2"),
        "Conv_1": _conv(src, key + ".conv2"),
    }
    if src.has(key + ".nin_shortcut.weight"):
        out["nin_shortcut"] = _conv(src, key + ".nin_shortcut")
    return out


def _vae_attn(src: _Source, key: str) -> dict:
    return {
        "Norm_0": _gn_nested(src, key + ".norm"),
        "q": _conv(src, key + ".q"),
        "k": _conv(src, key + ".k"),
        "v": _conv(src, key + ".v"),
        "proj_out": _conv(src, key + ".proj_out"),
    }


def _attn_block(src: _Source, key: str, attn_type: str):
    """(flax module name prefix, params) for one make_attn site
    (autoencoder_unet.py:546-553).  'linear' = LinAttnBlock
    (attention.py:80-101): bias-free to_qkv + to_out, no norm."""
    if attn_type == "linear":
        return "LinAttnBlock", {
            "to_qkv": {"kernel": conv_kernel(src.pop(key + ".to_qkv.weight"))},
            "to_out": _conv(src, key + ".to_out"),
        }
    return "AttnBlock", _vae_attn(src, key)


def _convert_vae_encoder(src: _Source, cfg: DDConfig) -> dict:
    """Mirror of nn/vae.py Encoder's construction order (reference
    autoencoder_unet.py:608-699)."""
    out = {"conv_in": _conv(src, "conv_in")}
    rb = ab = dsn = 0
    curr = cfg.resolution
    n_levels = len(cfg.ch_mult)
    for i_level in range(n_levels):
        for i_block in range(cfg.num_res_blocks):
            out[f"ResnetBlock_{rb}"] = _vae_resnet(
                src, f"down.{i_level}.block.{i_block}"
            )
            rb += 1
            if curr in cfg.attn_resolutions:
                nm, pr = _attn_block(
                    src, f"down.{i_level}.attn.{i_block}", cfg.attn_type
                )
                out[f"{nm}_{ab}"] = pr
                ab += 1
        if i_level != n_levels - 1:
            out[f"Downsample_{dsn}"] = {
                "Conv_0": _conv(src, f"down.{i_level}.downsample.conv")
            }
            dsn += 1
            curr //= 2
    out[f"ResnetBlock_{rb}"] = _vae_resnet(src, "mid.block_1")
    rb += 1
    if cfg.attn_type != "none":
        nm, pr = _attn_block(src, "mid.attn_1", cfg.attn_type)
        out[f"{nm}_{ab}"] = pr
        ab += 1
    out[f"ResnetBlock_{rb}"] = _vae_resnet(src, "mid.block_2")
    out["Norm_0"] = _gn_nested(src, "norm_out")
    out["conv_out"] = _conv(src, "conv_out")
    return out


def _convert_vae_decoder(src: _Source, cfg: DDConfig) -> dict:
    """Mirror of nn/vae.py Decoder (reference autoencoder_unet.py:703-829).
    hdbf taps become `hdbf_{resolution}` 1x1 convs."""
    out = {"conv_in": _conv(src, "conv_in")}
    rb = ab = up = 0
    n_levels = len(cfg.ch_mult)
    curr = cfg.resolution // 2 ** (n_levels - 1)

    out[f"ResnetBlock_{rb}"] = _vae_resnet(src, "mid.block_1")
    rb += 1
    if cfg.attn_type != "none":
        nm, pr = _attn_block(src, "mid.attn_1", cfg.attn_type)
        out[f"{nm}_{ab}"] = pr
        ab += 1
    out[f"ResnetBlock_{rb}"] = _vae_resnet(src, "mid.block_2")
    rb += 1

    for i_level in reversed(range(n_levels)):
        for i_block in range(cfg.num_res_blocks + 1):
            out[f"ResnetBlock_{rb}"] = _vae_resnet(
                src, f"up.{i_level}.block.{i_block}"
            )
            rb += 1
            if curr in cfg.attn_resolutions:
                nm, pr = _attn_block(
                    src, f"up.{i_level}.attn.{i_block}", cfg.attn_type
                )
                out[f"{nm}_{ab}"] = pr
                ab += 1
        if curr in cfg.hdbf_resolutions:
            out[f"hdbf_{curr}"] = _conv(src, f"up.{i_level}.hdbf.0")
        if i_level != 0:
            out[f"Upsample_{up}"] = {
                "Conv_0": _conv(src, f"up.{i_level}.upsample.conv")
            }
            up += 1
            curr *= 2
    out["Norm_0"] = _gn_nested(src, "norm_out")
    out["conv_out"] = _conv(src, "conv_out")
    return out


def convert_vae(sd: SD, cfg: DDConfig) -> dict:
    """Reference Autoencoder state_dict ('model' entry) -> our Autoencoder
    params {'encoder','decoder','quant_conv','post_quant_conv'}."""
    src = _Source(sd)
    out = {
        "encoder": _convert_vae_encoder(src.sub("encoder."), cfg),
        "decoder": _convert_vae_decoder(src.sub("decoder."), cfg),
        "quant_conv": _conv(src, "quant_conv"),
        "post_quant_conv": _conv(src, "post_quant_conv"),
    }
    src.finish()
    return out


# ------------------------------------------------------------- stage-1 MLP


def _styled_conv(src: _Source, key: str) -> dict:
    """reference StyledConv (blocks.py:312-356) -> our StyledConv
    {'conv': {'weight','modulation'}, 'noise': {'weight'}, 'act_bias'}."""
    return {
        "conv": {
            "weight": modconv_kernel(src.pop(key + ".conv.weight")),
            "modulation": {
                "weight": linear_kernel(src.pop(key + ".conv.modulation.weight")),
                "bias": src.pop(key + ".conv.modulation.bias"),
            },
        },
        "noise": {"weight": src.pop(key + ".noise.weight").reshape(1)},
        "act_bias": src.pop(key + ".activate.bias"),
    }


def _styled_resblock(src: _Source, key: str) -> dict:
    """reference StyledResBlock (blocks.py:604-638).  The skip ConvLayer is a
    Sequential([EqualConv2d]) -> key '.skip.0.weight' (O, I, 1, 1); our token
    layout uses EqualLinear (I, O) — same equalized-lr scale (1/sqrt(I))."""
    out = {
        "conv1": _styled_conv(src, key + ".conv1"),
        "conv2": _styled_conv(src, key + ".conv2"),
        "conv3": _styled_conv(src, key + ".conv3"),
    }
    if src.has(key + ".skip.0.weight"):
        w = src.pop(key + ".skip.0.weight")  # (O, I, 1, 1)
        out["skip"] = {
            "EqualLinear_0": {"weight": linear_kernel(w[:, :, 0, 0])}
        }
    return out


def convert_mlp_image(sd: SD, cfg: MLPConfig) -> dict:
    """Reference MLP ('mlp' entry, mlp.py:12-66) -> our INRImage params.
    time_mlp.{1,3} Linears map to the two style Dense layers."""
    src = _Source(sd)
    out = {
        "Dense_0": _dense(src, "time_mlp.1"),
        "Dense_1": _dense(src, "time_mlp.3"),
        "net_res1": _styled_resblock(src, "net_res1"),
        "net_res2": _styled_resblock(src, "net_res2"),
        "net_res3": _styled_resblock(src, "net_res3"),
        "net_res4": _styled_resblock(src, "net_res4"),
        "torgb": {
            "conv": {
                "weight": modconv_kernel(src.pop("torgb.conv.weight")),
                "modulation": {
                    "weight": linear_kernel(
                        src.pop("torgb.conv.modulation.weight")
                    ),
                    "bias": src.pop("torgb.conv.modulation.bias"),
                },
            },
            "bias": src.pop("torgb.bias").reshape(-1),
        },
    }
    src.finish()
    return out


# ------------------------------------------------------------- stage-2 UNet


def qkv_permutation(num_heads: int, head_dim: int) -> np.ndarray:
    """Output-channel permutation: reference QKVAttentionLegacy head-major
    [h, (q|k|v), d] -> our qkv-major [(q|k|v), h, d] (nn/unet.py qkv
    reshape (B, n, 3, nh, hd))."""
    idx = np.arange(3 * num_heads * head_dim).reshape(num_heads, 3, head_dim)
    return idx.transpose(1, 0, 2).reshape(-1)


def _adm_resblock(src: _Source, key: str) -> dict:
    """reference ResBlock (openaimodel.py:164-280): in_layers = [GN, SiLU,
    conv], emb_layers = [SiLU, Linear], out_layers = [GN, SiLU, Dropout,
    conv], skip_connection."""
    out = {
        "norm_in": _gn(src, key + ".in_layers.0"),
        "conv_in": _conv(src, key + ".in_layers.2"),
        "emb_proj": _dense(src, key + ".emb_layers.1"),
        "norm_out": _gn(src, key + ".out_layers.0"),
        "conv_out": _conv(src, key + ".out_layers.3"),
    }
    if src.has(key + ".skip_connection.weight"):
        out["skip"] = _conv(src, key + ".skip_connection")
    return out


def _adm_attn(src: _Source, key: str, num_heads: int) -> dict:
    qkv_w = src.pop(key + ".qkv.weight")  # (3C, C, 1)
    qkv_b = src.pop(key + ".qkv.bias")
    C = qkv_w.shape[1]
    perm = qkv_permutation(num_heads, C // num_heads)
    return {
        "norm": _gn(src, key + ".norm"),
        "qkv": {
            "kernel": conv1d_kernel(qkv_w)[..., perm],
            "bias": qkv_b[perm],
        },
        "proj_out": _conv1d(src, key + ".proj_out"),
    }


def _unet_heads(ch: int, cfg: UNetConfig) -> int:
    if cfg.num_head_channels != -1:
        return max(1, ch // cfg.num_head_channels)
    return max(1, cfg.num_heads)


def convert_unet(sd: SD, cfg: UNetConfig) -> dict:
    """Reference UNetModel state_dict -> our UNet params, by walking the ADM
    input/middle/output block layout (openaimodel.py:463-793)."""
    src = _Source(sd)
    out = {
        "time_dense1": _dense(src, "time_embed.0"),
        "time_dense2": _dense(src, "time_embed.2"),
        "conv_in": _conv(src, "input_blocks.0.0"),
    }
    mc = cfg.model_channels

    # --- input blocks (index 0 is conv_in above)
    idx = 1
    ds = 1
    ch = mc
    for i_level, mult in enumerate(cfg.channel_mult):
        for i_block in range(cfg.num_res_blocks):
            key = f"input_blocks.{idx}"
            out[f"down_{i_level}_{i_block}"] = _adm_resblock(src, key + ".0")
            ch = mult * mc
            if ds in cfg.attention_resolutions:
                out[f"down_attn_{i_level}_{i_block}"] = _adm_attn(
                    src, key + ".1", _unet_heads(ch, cfg)
                )
            idx += 1
        if i_level != len(cfg.channel_mult) - 1:
            out[f"downsample_{i_level}"] = {
                "Conv_0": _conv(src, f"input_blocks.{idx}.0.op")
            }
            idx += 1
            ds *= 2

    # --- middle
    out["mid_block1"] = _adm_resblock(src, "middle_block.0")
    out["mid_attn"] = _adm_attn(src, "middle_block.1", _unet_heads(ch, cfg))
    out["mid_block2"] = _adm_resblock(src, "middle_block.2")

    # --- output blocks
    idx = 0
    for i_level, mult in reversed(list(enumerate(cfg.channel_mult))):
        for i_block in range(cfg.num_res_blocks + 1):
            key = f"output_blocks.{idx}"
            out[f"up_{i_level}_{i_block}"] = _adm_resblock(src, key + ".0")
            ch = mult * mc
            sub = 1
            if ds in cfg.attention_resolutions:
                out[f"up_attn_{i_level}_{i_block}"] = _adm_attn(
                    src, key + f".{sub}", _unet_heads(ch, cfg)
                )
                sub += 1
            if i_level != 0 and i_block == cfg.num_res_blocks:
                out[f"upsample_{i_level}"] = {
                    "Conv_0": _conv(src, key + f".{sub}.conv")
                }
                ds //= 2
            idx += 1

    out["norm_out"] = _gn(src, "out.0")
    out["conv_out"] = _conv(src, "out.2")
    src.finish()
    return out


# ---------------------------------------------- triplane VAE (3D / NeRF)


def _dense_from_1x1(src: _Source, key: str) -> dict:
    """torch Conv2d 1x1 (O, I, 1, 1) -> Flax Dense (I, O)."""
    w = src.pop(key + ".weight")
    return {"kernel": linear_kernel(w[:, :, 0, 0]), "bias": src.pop(key + ".bias")}


def _inter_block(src: _Source, key0: str, key_attn: str, key1: str,
                 attn_type: str) -> dict:
    """[ResnetBlock(3c), attn(3c), ResnetBlock(3c)] -> our InterPlaneBlock
    {'block_a', 'AttnBlock_0', 'block_b'} (nn/triplane_vae.py)."""
    out = {"block_a": _vae_resnet(src, key0), "block_b": _vae_resnet(src, key1)}
    if attn_type != "none":
        nm, pr = _attn_block(src, key_attn, attn_type)
        out[f"{nm}_0"] = pr
    return out


def _convert_triplane_encoder(src: _Source, cfg: DDConfig) -> dict:
    """Encoder_triplane (autoencoder_unet.py:1147-1346): shared-weight plane
    blocks + channel-concat inter_attn triples; our names are explicit
    (down_{l}_{b}, inter_{l}, mid_inter) except per-block and mid attns which
    auto-number AttnBlock_k in call order."""
    out = {"conv_in": _conv(src, "conv_in")}
    ab = 0
    curr = cfg.resolution
    n = len(cfg.ch_mult)
    for i_level in range(n):
        for i_block in range(cfg.num_res_blocks):
            out[f"down_{i_level}_{i_block}"] = _vae_resnet(
                src, f"down.{i_level}.block.{i_block}"
            )
            if curr in cfg.attn_resolutions:
                nm, pr = _attn_block(
                    src, f"down.{i_level}.attn.{i_block}", cfg.attn_type
                )
                out[f"{nm}_{ab}"] = pr
                ab += 1
        if curr in cfg.inter_attn_resolutions:
            out[f"inter_{i_level}"] = _inter_block(
                src,
                f"down.{i_level}.inter_attn.0",
                f"down.{i_level}.inter_attn.1",
                f"down.{i_level}.inter_attn.2",
                cfg.attn_type,
            )
        if i_level != n - 1:
            out[f"downsample_{i_level}"] = {
                "Conv_0": _conv(src, f"down.{i_level}.downsample.conv")
            }
            curr //= 2
    out["mid_block1"] = _vae_resnet(src, "mid.block_1")
    if cfg.attn_type != "none":
        nm, pr = _attn_block(src, "mid.attn_1", cfg.attn_type)
        out[f"{nm}_{ab}"] = pr
        ab += 1
    out["mid_block2"] = _vae_resnet(src, "mid.block_2")
    # mid inter triple: mid.block_3 / top-level mid_attn / mid.block_4
    out["mid_inter"] = _inter_block(
        src, "mid.block_3", "", "mid.block_4", "none"
    )
    if cfg.attn_type != "none":
        nm, pr = _attn_block(src, "mid_attn", cfg.attn_type)
        out["mid_inter"][f"{nm}_0"] = pr
    out["norm_out"] = _gn_nested(src, "norm_out")
    out["conv_out"] = _conv(src, "conv_out")
    return out


def _convert_triplane_decoder(src: _Source, cfg: DDConfig) -> dict:
    """Decoder_triplane (autoencoder_unet.py:1348-1563).  Per-plane loops
    share weights; inter_attn applied BEFORE the hdbf tap (forward
    :1505-1537), exactly as nn/triplane_vae.py TriplaneDecoder."""
    out = {"conv_in": _conv(src, "conv_in")}
    ab = 0
    n = len(cfg.ch_mult)
    curr = cfg.resolution // 2 ** (n - 1)
    out["mid_block1"] = _vae_resnet(src, "mid.block_1")
    if cfg.attn_type != "none":
        nm, pr = _attn_block(src, "mid.attn_1", cfg.attn_type)
        out[f"{nm}_{ab}"] = pr
        ab += 1
    out["mid_block2"] = _vae_resnet(src, "mid.block_2")
    out["mid_inter"] = _inter_block(
        src, "mid.block_3", "", "mid.block_4", "none"
    )
    if cfg.attn_type != "none":
        nm, pr = _attn_block(src, "mid_attn", cfg.attn_type)
        out["mid_inter"][f"{nm}_0"] = pr

    for i_level in reversed(range(n)):
        for i_block in range(cfg.num_res_blocks + 1):
            out[f"up_{i_level}_{i_block}"] = _vae_resnet(
                src, f"up.{i_level}.block.{i_block}"
            )
            if curr in cfg.attn_resolutions:
                nm, pr = _attn_block(
                    src, f"up.{i_level}.attn.{i_block}", cfg.attn_type
                )
                out[f"{nm}_{ab}"] = pr
                ab += 1
        if curr in cfg.inter_attn_resolutions:
            out[f"inter_{i_level}"] = _inter_block(
                src,
                f"up.{i_level}.inter_attn.0",
                f"up.{i_level}.inter_attn.1",
                f"up.{i_level}.inter_attn.2",
                cfg.attn_type,
            )
        if curr in cfg.hdbf_resolutions:
            out[f"hdbf_{curr}"] = _conv(src, f"up.{i_level}.hdbf.0")
        if i_level != 0:
            out[f"upsample_{i_level}"] = {
                "Conv_0": _conv(src, f"up.{i_level}.upsample.conv")
            }
            curr *= 2
    out["norm_out"] = _gn_nested(src, "norm_out")
    out["conv_out"] = _conv(src, "conv_out")
    return out


def convert_triplane_vae(sd: SD, cfg: DDConfig) -> dict:
    """Reference Autoencoder3D ('vaemodel' entry, autoencoder_unet.py:877-936)
    -> our TriplaneAutoencoder params.  The per-plane 1x1 quant convs become
    Dense layers (quant_xy/..., post_xy/...)."""
    src = _Source(sd)
    out = {
        "encoder": _convert_triplane_encoder(src.sub("encoder."), cfg),
        "decoder": _convert_triplane_decoder(src.sub("decoder."), cfg),
        "quant_xy": _dense_from_1x1(src, "quant_conv_xy"),
        "quant_yz": _dense_from_1x1(src, "quant_conv_yz"),
        "quant_xz": _dense_from_1x1(src, "quant_conv_xz"),
        "post_xy": _dense_from_1x1(src, "post_quant_conv_xy"),
        "post_yz": _dense_from_1x1(src, "post_quant_conv_yz"),
        "post_xz": _dense_from_1x1(src, "post_quant_conv_xz"),
    }
    src.finish()
    return out


# ------------------------------------------- stage-1 MLP3D / NeRF / pointnet


def _resnet_fc(src: _Source, key: str) -> dict:
    """reference ResnetBlockFC (blocks.py:673-715) -> {'fc_0','fc_1',
    'shortcut'?} (shortcut is bias-free)."""
    out = {"fc_0": _dense(src, key + ".fc_0"), "fc_1": _dense(src, key + ".fc_1")}
    if src.has(key + ".shortcut.weight"):
        out["shortcut"] = {
            "kernel": linear_kernel(src.pop(key + ".shortcut.weight"))
        }
    return out


def convert_mlp_3d(sd: SD) -> dict:
    """Reference MLP3D (mlp.py:69-111) -> our INR3D params."""
    src = _Source(sd)
    out = {"net_p": _dense(src, "net_p")}
    for i in (1, 2, 3, 4):
        out[f"net_res{i}"] = _resnet_fc(src, f"net_res{i}")
    out["net_out"] = _dense(src, "net_out")
    src.finish()
    return out


def convert_mlp_nerf(sd: SD, depth: int = 8) -> dict:
    """Reference MLPNeRF (mlp.py:199-281) -> our INRNeRF params.  The
    Sequential wrappers (Linear+activation) put the Linear at index 0."""
    src = _Source(sd)
    out = {}
    for i in range(1, depth + 1):
        out[f"xyz_encoding_{i}"] = _dense(src, f"xyz_encoding_{i}.0")
    out["xyz_encoding_final"] = _dense(src, "xyz_encoding_final")
    out["dir_encoding"] = _dense(src, "dir_encoding.0")
    out["sigma"] = _dense(src, "sigma")
    out["rgb"] = _dense(src, "rgb.0")
    src.finish()
    return out


def convert_pointnet(sd: SD, n_blocks: int = 5) -> dict:
    """Reference LocalPoolPointnet (models/d2c_vae/pointnet.py:8-135) -> our
    LocalPoolPointnet (fc_pos, block{i}, fc_c)."""
    src = _Source(sd)
    out = {"fc_pos": _dense(src, "fc_pos")}
    for i in range(n_blocks):
        out[f"block{i}"] = _resnet_fc(src, f"blocks.{i}")
    out["fc_c"] = _dense(src, "fc_c")
    src.finish()
    return out


def convert_stage1_3d(data: dict, ddconfig: DDConfig, domain: str,
                      nerf_depth: int = 8, pointnet_blocks: int = 5) -> dict:
    """Occupancy / NeRF stage-1 checkpoint ('pointnet'/'vaemodel'/'mlp',
    tools/d2c_vae/{occupancy,nerf}.py:111-123) -> {'pointnet','vae','mlp'}."""
    mlp_sd = _as_numpy(data["mlp"])
    if domain == "occupancy":
        mlp = convert_mlp_3d(mlp_sd)
    elif domain == "nerf":
        mlp = convert_mlp_nerf(mlp_sd, depth=nerf_depth)
    else:
        raise ValueError(f"unsupported 3D domain {domain!r}")
    return {
        "pointnet": convert_pointnet(
            _as_numpy(data["pointnet"]), n_blocks=pointnet_blocks
        ),
        "vae": convert_triplane_vae(_as_numpy(data["vaemodel"]), ddconfig),
        "mlp": mlp,
    }


# ----------------------------------------------------------- MDTv2 (DiT)


def _mdt_block(src: _Source, key: str, has_skip: bool) -> dict:
    """reference MDTBlock (maskedtransformer.py:187-220) -> our MDTBlock.
    Both sides split the qkv Linear output qkv-major then head-major, so the
    relayout is permutation-free; relative_position_index is a derived
    buffer (recomputed here), only the bias table transfers."""
    src.pop(key + ".attn.rel_pos_bias.relative_position_index")  # buffer
    out = {
        "adaLN_modulation": _dense(src, key + ".adaLN_modulation.1"),
        "attn": {
            "qkv": _dense(src, key + ".attn.qkv"),
            "proj": _dense(src, key + ".attn.proj"),
            "rel_pos_table": src.pop(
                key + ".attn.rel_pos_bias.relative_position_bias_table"
            ),
        },
        "mlp_fc1": _dense(src, key + ".mlp.fc1"),
        "mlp_fc2": _dense(src, key + ".mlp.fc2"),
    }
    if has_skip:
        out["skip_linear"] = _dense(src, key + ".skip_linear")
    return out


def convert_mdt(sd: SD, *, patch_size: int, in_channels: int, depth: int,
                decode_layer: int, masked: bool) -> dict:
    """Reference MDTv2 state_dict (maskedtransformer.py:246-320) -> our
    nn/mdt.py MDTv2 params.  The PatchEmbed Conv2d becomes a Dense over
    (p, p, c)-ordered patch vectors; pos embeddings copy verbatim."""
    src = _Source(sd)
    p, C = patch_size, in_channels
    w = src.pop("x_embedder.proj.weight")  # (D, C, p, p)
    D = w.shape[0]
    out = {
        "x_embedder": {
            "kernel": np.transpose(w, (2, 3, 1, 0)).reshape(p * p * C, D),
            "bias": src.pop("x_embedder.proj.bias"),
        },
        "pos_embed": src.pop("pos_embed"),
        "decoder_pos_embed": src.pop("decoder_pos_embed"),
        "t_mlp1": _dense(src, "t_embedder.mlp.0"),
        "t_mlp2": _dense(src, "t_embedder.mlp.2"),
        "final_adaLN": _dense(src, "final_layer.adaLN_modulation.1"),
        "final_linear": _dense(src, "final_layer.linear"),
    }
    half_depth = (depth - decode_layer) // 2
    for i in range(half_depth):
        out[f"en_in_{i}"] = _mdt_block(src, f"en_inblocks.{i}", False)
        out[f"en_out_{i}"] = _mdt_block(src, f"en_outblocks.{i}", True)
    for i in range(decode_layer):
        out[f"de_{i}"] = _mdt_block(src, f"de_blocks.{i}", True)
    if masked:
        out["sideblock"] = _mdt_block(src, "sideblocks.0", False)
        out["mask_token"] = src.pop("mask_token")
    src.finish()
    return out


def convert_stage2_mdt(data: dict, ditconfig, use_ema: bool = False) -> dict:
    """Stage-2 ('ldm-*.pt') with a DiT/MDTv2 denoiser ('DiT: True',
    exp/stage.py:196-199) -> {'unet','mixing_logit'}."""
    if use_ema:
        sd = {
            k[len("ema_model."):]: v
            for k, v in _as_numpy(data["ema"]).items()
            if k.startswith("ema_model.")
        }
    else:
        sd = _as_numpy(data["diffusion"])
    model_sd = {
        k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")
    }
    ml = np.asarray(sd["mixing_logit"])  # (1, C, 1, 1)
    return {
        "unet": convert_mdt(
            model_sd,
            patch_size=ditconfig.patch_size,
            in_channels=ditconfig.in_channels,
            depth=ditconfig.depth,
            decode_layer=ditconfig.decode_layer,
            masked=ditconfig.mask_ratio is not None,
        ),
        "mixing_logit": np.transpose(ml, (0, 2, 3, 1)),
    }


# ------------------------------------------------------------ video domain


def _ln(src: _Source, key: str) -> dict:
    """torch LayerNorm -> flax {'scale','bias'}."""
    return {"scale": src.pop(key + ".weight"), "bias": src.pop(key + ".bias")}


def _dense_from_conv1d(src: _Source, key: str) -> dict:
    """torch Conv1d 1x1 (O, I, 1) -> Flax Dense (I, O) over (b, n, c) tokens."""
    w = src.pop(key + ".weight")
    assert w.ndim == 3 and w.shape[2] == 1, w.shape
    return {"kernel": linear_kernel(w[:, :, 0]), "bias": src.pop(key + ".bias")}


def _attn1d(src: _Source, key: str) -> dict:
    """MemoryEfficientAttnBlock1D[_expand] (autoencoder_unet.py:410-534) ->
    our AttnBlock1D / AttnBlock1DExpand.  Both sides split channels
    head-major, so the Conv1d->Dense relayout is permutation-free."""
    return {
        "GroupNormTokens_0": {"GroupNorm_0": _gn(src, key + ".norm")},
        "q": _dense_from_conv1d(src, key + ".q"),
        "k": _dense_from_conv1d(src, key + ".k"),
        "v": _dense_from_conv1d(src, key + ".v"),
        "proj_out": _dense_from_conv1d(src, key + ".proj_out"),
    }


def _convert_timesformer(src: _Source, depth: int = 8) -> dict:
    """TimeSformerEncoder (vit_modules.py:176-248) -> our nn/vit.py
    TimeSformerEncoder.  layers.{i} = [PreNorm(time Attention),
    PreNorm(space Attention), PreNorm(GEGLU FeedForward)]; rotary embeddings
    are computed, not stored."""

    def _prenorm_attn(i: int, j: int) -> tuple:
        base = f"layers.{i}.{j}"
        norm = _ln(src, base + ".norm")
        attn = {
            "to_qkv": {
                "kernel": linear_kernel(src.pop(base + ".fn.to_qkv.weight"))
            },
            "to_out": _dense(src, base + ".fn.to_out.0"),
        }
        return norm, attn

    out = {"to_patch_embedding": _dense(src, "to_patch_embedding")}
    for i in range(depth):
        out[f"time_norm_{i}"], out[f"time_attn_{i}"] = _prenorm_attn(i, 0)
        out[f"space_norm_{i}"], out[f"space_attn_{i}"] = _prenorm_attn(i, 1)
        out[f"ff_norm_{i}"] = _ln(src, f"layers.{i}.2.norm")
        # GEGLU FeedForward: net.0 = Linear(dim, 2*4*dim), net.3 = Linear
        # (vit_modules.py:104-115); chunk order (value, gates) matches
        out[f"ff_{i}"] = {
            "Dense_0": _dense(src, f"layers.{i}.2.fn.net.0"),
            "Dense_1": _dense(src, f"layers.{i}.2.fn.net.3"),
        }
    return out


def _convert_quant_attn(src: _Source, depth: int = 4) -> dict:
    """Axis-pooling Transformer (autoencoder_vit.py:76-92) -> our nn/vit.py
    Transformer.  layers.{i} = [PreNorm(Attention), PreNorm(FeedForward)];
    FeedForward net.0/net.3 are the two Linears (:31-41)."""
    out = {}
    for i in range(depth):
        base = f"layers.{i}"
        out[f"attn_norm_{i}"] = _ln(src, base + ".0.norm")
        out[f"qkv_{i}"] = {
            "kernel": linear_kernel(src.pop(base + ".0.fn.to_qkv.weight"))
        }
        out[f"attn_out_{i}"] = _dense(src, base + ".0.fn.to_out.0")
        out[f"ff_norm_{i}"] = _ln(src, base + ".1.norm")
        out[f"ff_{i}"] = {
            "Dense_0": _dense(src, base + ".1.fn.net.0"),
            "Dense_1": _dense(src, base + ".1.fn.net.3"),
        }
    return out


def _convert_video_decoder(src: _Source, cfg: DDConfig) -> dict:
    """VideoDecoder_light (autoencoder_unet.py:944-1144) -> our
    nn/video_vae.py VideoDecoder.  Shared-weight plane blocks; 1D cross-plane
    attention (expand variant) at the bottleneck and at
    inter_attn_resolutions; hdbf taps; t axis never upsampled (the
    SharedUpsample conv is the reference's per-level upsample.conv)."""
    out = {"conv_in": _conv(src, "conv_in")}
    ab = 0
    out["mid_block1"] = _vae_resnet(src, "mid.block_1")
    if cfg.attn_type != "none":
        nm, pr = _attn_block(src, "mid.attn_1", cfg.attn_type)
        out[f"{nm}_{ab}"] = pr
        ab += 1
    out["mid_block2"] = _vae_resnet(src, "mid.block_2")
    out["mid_inter_attn"] = _attn1d(src, "mid_attn")

    n = len(cfg.ch_mult)
    curr = cfg.resolution // 2 ** (n - 1)
    for i_level in reversed(range(n)):
        for i_block in range(cfg.num_res_blocks + 1):
            out[f"up_{i_level}_{i_block}"] = _vae_resnet(
                src, f"up.{i_level}.block.{i_block}"
            )
            if curr in cfg.attn_resolutions:
                nm, pr = _attn_block(
                    src, f"up.{i_level}.attn.{i_block}", cfg.attn_type
                )
                out[f"{nm}_{ab}"] = pr
                ab += 1
        if curr in cfg.inter_attn_resolutions:
            out[f"inter_attn_{i_level}"] = _attn1d(
                src, f"up.{i_level}.inter_attn.0"
            )
        if curr in cfg.hdbf_resolutions:
            out[f"hdbf_{curr}"] = _conv(src, f"up.{i_level}.hdbf.0")
        if i_level != 0:
            out[f"upsample_{i_level}"] = {
                "Conv_0": _conv(src, f"up.{i_level}.upsample.conv")
            }
            curr *= 2
    out["norm_out"] = _gn_nested(src, "norm_out")
    out["conv_out"] = _conv(src, "conv_out")
    return out


def convert_video_vae(sd: SD, cfg: DDConfig) -> dict:
    """Reference VITAutoencoder ('vaemodel' entry, autoencoder_vit.py:93-220)
    -> our VideoAutoencoder params.  Class tokens / positional embeddings copy
    verbatim; the per-plane pre/post 1x1 Conv2d quant layers become Dense."""
    src = _Source(sd)
    out = {
        "encoder": _convert_timesformer(src.sub("encoder.")),
        "decoder": _convert_video_decoder(src.sub("decoder."), cfg),
    }
    for t in ("xy", "xt", "yt"):
        out[f"{t}_token"] = src.pop(f"{t}_token")
        out[f"{t}_pos"] = src.pop(f"{t}_pos_embedding")
        out[f"{t}_quant_attn"] = _convert_quant_attn(
            src.sub(f"{t}_quant_attn.")
        )
        out[f"pre_{t}"] = _dense_from_1x1(src, f"pre_{t}")
        out[f"post_{t}"] = _dense_from_1x1(src, f"post_{t}")
    # Rotary-embedding buffers are deterministic functions of the dims
    # (vit_modules.py:36,65: logspace scales / 10000^(-2i/d) inv freqs) —
    # our TimeSformer recomputes them (nn/vit.py), nothing to copy.
    src.finish(ignore_unused=(
        "encoder.frame_rot_emb.", "encoder.image_rot_emb.",
    ))
    return out


def convert_mlp_video(sd: SD) -> dict:
    """Reference MLPVideo (mlp.py:114-157) -> our INRVideo params."""
    src = _Source(sd)
    out = {f"net_res{i}": _resnet_fc(src, f"net_res{i}") for i in (1, 2, 3, 4)}
    out["net_out"] = _dense(src, "net_out")
    src.finish()
    return out


def convert_unet_triplane(sd: SD, cfg: UNetConfig) -> dict:
    """Reference UNetModel_Triplane state_dict -> our TriplaneUNet params.
    Same ADM block walk as convert_unet plus the per-block cross-plane 1D
    attentions: input_attns.{i} (index 0 is an Identity), mid_attn,
    output_attns.{i} (openaimodel.py:905-1082)."""
    src = _Source(sd)
    out = {
        "time_dense1": _dense(src, "time_embed.0"),
        "time_dense2": _dense(src, "time_embed.2"),
        "conv_in": _conv(src, "input_blocks.0.0"),
    }
    mc = cfg.model_channels

    idx = 1
    ds = 1
    ch = mc
    for i_level, mult in enumerate(cfg.channel_mult):
        for i_block in range(cfg.num_res_blocks):
            key = f"input_blocks.{idx}"
            out[f"down_{i_level}_{i_block}"] = _adm_resblock(src, key + ".0")
            ch = mult * mc
            if ds in cfg.attention_resolutions:
                out[f"down_attn_{i_level}_{i_block}"] = _adm_attn(
                    src, key + ".1", _unet_heads(ch, cfg)
                )
            out[f"down_xattn_{i_level}_{i_block}"] = _attn1d(
                src, f"input_attns.{idx}"
            )
            idx += 1
        if i_level != len(cfg.channel_mult) - 1:
            out[f"downsample_{i_level}"] = {
                "Conv_0": _conv(src, f"input_blocks.{idx}.0.op")
            }
            out[f"down_xattn_ds_{i_level}"] = _attn1d(
                src, f"input_attns.{idx}"
            )
            idx += 1
            ds *= 2

    out["mid_block1"] = _adm_resblock(src, "middle_block.0")
    out["mid_attn"] = _adm_attn(src, "middle_block.1", _unet_heads(ch, cfg))
    out["mid_block2"] = _adm_resblock(src, "middle_block.2")
    out["mid_xattn"] = _attn1d(src, "mid_attn")

    idx = 0
    for i_level, mult in reversed(list(enumerate(cfg.channel_mult))):
        for i_block in range(cfg.num_res_blocks + 1):
            key = f"output_blocks.{idx}"
            out[f"up_{i_level}_{i_block}"] = _adm_resblock(src, key + ".0")
            ch = mult * mc
            sub = 1
            if ds in cfg.attention_resolutions:
                out[f"up_attn_{i_level}_{i_block}"] = _adm_attn(
                    src, key + f".{sub}", _unet_heads(ch, cfg)
                )
                sub += 1
            if i_level != 0 and i_block == cfg.num_res_blocks:
                out[f"upsample_{i_level}"] = {
                    "Conv_0": _conv(src, key + f".{sub}.conv")
                }
                ds //= 2
            out[f"up_xattn_{i_level}_{i_block}"] = _attn1d(
                src, f"output_attns.{idx}"
            )
            idx += 1

    out["norm_out"] = _gn(src, "out.0")
    out["conv_out"] = _conv(src, "out.2")
    src.finish()
    return out


def convert_stage1_video(data: dict, ddconfig: DDConfig) -> dict:
    """Video stage-1 checkpoint ('vaemodel'/'mlp',
    tools/d2c_vae/video.py:123-138) -> {'vae','mlp'} params."""
    return {
        "vae": convert_video_vae(_as_numpy(data["vaemodel"]), ddconfig),
        "mlp": convert_mlp_video(_as_numpy(data["mlp"])),
    }


def convert_stage2_video(data: dict, unetconfig: UNetConfig,
                         use_ema: bool = False) -> dict:
    """Video stage-2 ('ldm-*.pt') -> {'unet','mixing_logit'}.  The video
    mixing_logit is stored (1, C, 1) over (b, c, n) tokens (ddpm.py:157-159);
    ours is (1, 1, C) over (b, n, c)."""
    if use_ema:
        sd = {
            k[len("ema_model."):]: v
            for k, v in _as_numpy(data["ema"]).items()
            if k.startswith("ema_model.")
        }
    else:
        sd = _as_numpy(data["diffusion"])
    unet_sd = {
        k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")
    }
    ml = np.asarray(sd["mixing_logit"])  # (1, C, 1)
    return {
        "unet": convert_unet_triplane(unet_sd, unetconfig),
        "mixing_logit": np.transpose(ml, (0, 2, 1)),
    }


# --------------------------------------------------------------- top level


def convert_stage1_image(data: dict, ddconfig: DDConfig, mlpconfig: MLPConfig,
                         vae_key: str = "model", mlp_key: str = "mlp") -> dict:
    """Full stage-1 checkpoint dict -> {'vae': ..., 'mlp': ...} params."""
    return {
        "vae": convert_vae(_as_numpy(data[vae_key]), ddconfig),
        "mlp": convert_mlp_image(_as_numpy(data[mlp_key]), mlpconfig),
    }


def convert_stage2_image(data: dict, unetconfig: UNetConfig,
                         use_ema: bool = False) -> dict:
    """Stage-2 ('ldm-*.pt') dict -> {'unet': ..., 'mixing_logit': ...}.

    data['diffusion'] is the DDPM state_dict: 'model.*' = UNet,
    'mixing_logit' (1, C, 1, 1) -> our NHWC (1, 1, 1, C); schedule buffers
    (betas, alphas_cumprod, ...) are recomputed, not loaded.  With
    use_ema=True, reads the ema_pytorch copy under 'ema' ('ema_model.*',
    reference tools/ldm/image.py:63-65)."""
    if use_ema:
        sd = {
            k[len("ema_model."):]: v
            for k, v in _as_numpy(data["ema"]).items()
            if k.startswith("ema_model.")
        }
    else:
        sd = _as_numpy(data["diffusion"])
    unet_sd = {
        k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")
    }
    ml = np.asarray(sd["mixing_logit"])  # (1, C, 1, 1)
    return {
        "unet": convert_unet(unet_sd, unetconfig),
        "mixing_logit": np.transpose(ml, (0, 2, 3, 1)),
    }


def _as_numpy(sd) -> SD:
    out = {}
    for k, v in sd.items():
        if hasattr(v, "detach"):  # torch tensor without importing torch
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v)
    return out


def load_torch_checkpoint(path: str) -> dict:
    """torch.load a reference .pt on CPU (stage-2 files embed OmegaConf args,
    so weights_only must be off for those).

    Only the specific weights-only rejection triggers the unsafe fallback —
    full pickle loading executes arbitrary code from the file, so it is
    restricted to that case and announced with a warning.  Genuine load
    errors (corrupt file, bad path) propagate on the first attempt."""
    import pickle
    import warnings

    import torch

    try:
        return torch.load(path, map_location="cpu", weights_only=True)
    except pickle.UnpicklingError:
        warnings.warn(
            f"{path}: weights_only load rejected (embedded non-tensor "
            f"objects, e.g. OmegaConf args in reference stage-2 files); "
            f"falling back to FULL pickle loading, which can execute code "
            f"from the checkpoint — only convert checkpoints you trust"
        )
        return torch.load(path, map_location="cpu", weights_only=False)
