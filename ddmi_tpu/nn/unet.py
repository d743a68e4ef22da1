"""ADM (guided-diffusion) UNet denoiser.

TPU-native redesign of models/ldm/modules/diffusionmodules/openaimodel.py
(UNetModel :463-793): NHWC, Flax, plain einsum attention (latent grids are
64x64 -> 4096 tokens max; xformers unnecessary), bfloat16 compute with fp32
params/softmax, optional remat via `use_checkpoint`.

The triplane variant (UNetModel_Triplane :796-1221, video latents) lives in
`ddmi_tpu.nn.unet_triplane`.
"""

from __future__ import annotations

import math
import os
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ddmi_tpu.core.config import UNetConfig
from ddmi_tpu.nn.transformer import SpatialTransformer
from ddmi_tpu.ops.fused import FastGroupNorm
from ddmi_tpu.ops.pallas import attention as vmem_attn
from ddmi_tpu.ops.pallas import attn_block

# Token count at/above which AttentionBlock switches from dense (materialized
# n^2 scores, fp32 softmax) to the Pallas flash kernel.  Module-level so
# benches can sweep it; 512 chosen from on-chip measurement (BASELINE.md).
FLASH_MIN_TOKENS = 512
# Pallas flash block size (q and k); capped at the sequence length.
FLASH_BLOCK = 1024


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: int = 10000):
    """Sinusoidal timestep embedding (util.py:150-171)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class ResBlock(nn.Module):
    """Timestep-embedded residual block (openaimodel.py:164-280)."""

    out_channels: int
    dropout: float = 0.0
    use_scale_shift_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb, *, deterministic: bool = True):
        C = self.out_channels
        h = FastGroupNorm(32, epsilon=1e-5, dtype=self.dtype, name="norm_in")(x)
        h = jax.nn.silu(h)
        h = nn.Conv(C, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(h)

        emb_out = nn.Dense(
            2 * C if self.use_scale_shift_norm else C,
            dtype=self.dtype,
            name="emb_proj",
        )(jax.nn.silu(emb))
        emb_out = emb_out[:, None, None, :]

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = FastGroupNorm(32, epsilon=1e-5, dtype=self.dtype, name="norm_out")(h)
            h = h * (1 + scale) + shift
        else:
            h = h + emb_out
            h = FastGroupNorm(32, epsilon=1e-5, dtype=self.dtype, name="norm_out")(h)
        h = jax.nn.silu(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Conv(
            C, (3, 3), padding=1, kernel_init=nn.initializers.zeros,
            dtype=self.dtype, name="conv_out",
        )(h)

        if x.shape[-1] != C:
            x = nn.Conv(C, (1, 1), dtype=self.dtype, name="skip")(x)
        return x + h


class _Conv1x1(nn.Module):
    """1x1 conv with an nn.Conv-identical param tree ('kernel' (1,1,Cin,Cout),
    'bias' (Cout,), same default init) that can also hand out its raw params
    via `weights(Cin)` — the fused attention-block kernel folds them into one
    Pallas call while this module stays the checkpoint-compatible owner."""

    features: int
    kernel_init: Any = nn.initializers.lecun_normal()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def weights(self, in_features: int):
        k = self.param(
            "kernel", self.kernel_init, (1, 1, in_features, self.features)
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b

    def __call__(self, x):
        k, b = self.weights(x.shape[-1])
        k = k[0, 0].astype(self.dtype)
        return jax.lax.dot_general(
            x.astype(self.dtype), k, (((x.ndim - 1,), (0,)), ((), ()))
        ) + b.astype(self.dtype)


class AttentionBlock(nn.Module):
    """Self-attention over flattened spatial tokens (openaimodel.py:283-427).
    Softmax in fp32 regardless of compute dtype.

    On TPU at seq >= 512 the Pallas flash-attention kernel takes over: the
    dense path materializes an f32[B, heads, n, n] matrix (0.5 GB per block
    at 32x32 resolution) — profiled as the single largest HBM consumer of the
    denoiser forward.  Sampling/eval traces (vmem_attn.inference_mode) fuse
    the ENTIRE block — GN, qkv, attention, proj, residual — into one Pallas
    kernel (ops/pallas/attn_block.py) when the shape allows it."""

    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        nh = self.num_heads
        hd = C // nh
        n = H * W
        norm_mod = FastGroupNorm(32, epsilon=1e-5, dtype=self.dtype, name="norm")
        qkv_mod = _Conv1x1(3 * C, dtype=self.dtype, name="qkv")
        proj_mod = _Conv1x1(
            C, kernel_init=nn.initializers.zeros, dtype=self.dtype,
            name="proj_out",
        )
        from ddmi_tpu.ops.platform import on_tpu as _on_tpu

        on_tpu = _on_tpu()
        if (
            on_tpu
            and vmem_attn.is_inference()
            and attn_block.supported(n, C, nh)
            and not os.environ.get("DDMI_NO_FUSED_ATTN")  # on-chip A/B switch
        ):
            gs, gb = norm_mod.weights(C)
            wq, bq = qkv_mod.weights(C)
            wp, bp = proj_mod.weights(C)
            return attn_block.fused_attention_block(
                x, gs, gb, wq[0, 0], bq, wp[0, 0], bp, nh, hd**-0.5
            )
        h = norm_mod(x)
        qkv = qkv_mod(h)
        qkv = qkv.reshape(B, n, 3, nh, hd)
        if on_tpu and vmem_attn.is_inference() and vmem_attn.supported(n, hd):
            # Sampling/eval: single-pass VMEM kernel — no flash streaming
            # bookkeeping, no HBM score traffic (ops/pallas/attention.py).
            qkv_t = jnp.transpose(qkv, (2, 0, 3, 1, 4))  # (3, B, nh, n, hd)
            out = vmem_attn.mha_vmem(
                qkv_t[0], qkv_t[1], qkv_t[2], hd**-0.5
            )
            out = jnp.swapaxes(out, 1, 2).reshape(B, H, W, C)
        elif on_tpu and n >= FLASH_MIN_TOKENS:
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                BlockSizes,
                flash_attention,
            )

            blk = min(n, FLASH_BLOCK)
            # backward blocks MUST be given or differentiating the kernel
            # fails ("not all backward blocks are specified") — stage-2
            # training differentiates this path at 32x32 (1024 tokens)
            bs = BlockSizes(
                block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
                block_q_major_dkv=blk, block_k_major_dkv=blk,
                block_k_dkv=blk, block_q_dkv=blk,
                block_k_major_dq=blk, block_k_dq=blk, block_q_dq=blk,
            )
            # ONE transpose for all of q/k/v (leading-axis slices are free)
            qkv_t = jnp.transpose(qkv, (2, 0, 3, 1, 4))  # (3, B, nh, n, hd)
            out = flash_attention(
                qkv_t[0], qkv_t[1], qkv_t[2], sm_scale=hd**-0.5,
                block_sizes=bs,
            )
            out = jnp.swapaxes(out, 1, 2).reshape(B, H, W, C)
        else:
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            attn = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * (
                hd**-0.5
            )
            attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, H, W, C)
        out = proj_mod(out)
        return x + out


class Downsample(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            x.shape[-1], (3, 3), strides=2, padding=1, dtype=self.dtype
        )(x)


class Upsample(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, 2 * H, 2 * W, C), method="nearest")
        return nn.Conv(C, (3, 3), padding=1, dtype=self.dtype)(x)


def _num_heads(ch: int, cfg: UNetConfig) -> int:
    if cfg.num_head_channels != -1:
        return max(1, ch // cfg.num_head_channels)
    return max(1, cfg.num_heads)


class UNet(nn.Module):
    """The full denoiser: x (b,h,w,c_in), t (b,) -> (b,h,w,c_out).

    Encoder propagation (opt-in sampling acceleration, arXiv:2312.09608
    "Faster Diffusion"): `return_cache=True` additionally returns the
    down-path features (bottleneck input + skip stack); a later call with
    `cache=` skips conv_in and the whole down path and re-runs only the
    middle/up path under the CURRENT timestep embedding.  Exact when x/t
    match the caching call (tested); an approximation across nearby DDIM
    steps (diffusion/process.py::ddim_sample_encoder_reuse)."""

    cfg: UNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t, cond=None, y=None, *, deterministic: bool = True,
                 cache=None, return_cache: bool = False):
        c = self.cfg
        mc = c.model_channels
        time_embed_dim = mc * 4

        if cond is not None and not c.use_spatial_transformer:
            # No silently-ignored conditioning: the self-attention UNet has no
            # context path (the reference asserts the same pairing,
            # openaimodel.py:523-527).
            raise ValueError(
                "cond was passed but unetconfig.use_spatial_transformer is "
                "off — enable it (with context_dim) to get the "
                "cross-attention conditioning path"
            )
        if c.use_spatial_transformer and c.context_dim is None:
            raise ValueError(
                "use_spatial_transformer requires unetconfig.context_dim"
            )

        emb = timestep_embedding(t, mc)
        emb = nn.Dense(time_embed_dim, dtype=self.dtype, name="time_dense1")(emb)
        emb = jax.nn.silu(emb)
        emb = nn.Dense(time_embed_dim, dtype=self.dtype, name="time_dense2")(emb)

        if c.num_classes is not None:
            # Class-conditional: label embedding added to the timestep
            # embedding (openaimodel.py:565-566, :745-748).
            if y is None:
                raise ValueError("num_classes is set; class labels y required")
            emb = emb + nn.Embed(
                c.num_classes, time_embed_dim, dtype=self.dtype,
                name="label_emb",
            )(y)

        def attn(h, name):
            nh = _num_heads(h.shape[-1], c)
            if c.use_spatial_transformer:
                return SpatialTransformer(
                    h.shape[-1], nh, h.shape[-1] // nh,
                    depth=c.transformer_depth, dropout=c.dropout,
                    context_dim=c.context_dim, dtype=self.dtype, name=name,
                )(h, context=cond, deterministic=deterministic)
            return AttentionBlock(nh, self.dtype, name=name)(h)

        res_block = ResBlock
        if c.use_checkpoint:
            res_block = nn.remat(ResBlock, static_argnums=(3,))

        if cache is not None:
            h, hs = cache[0], list(cache[1])
            ds = 2 ** (len(c.channel_mult) - 1)
        else:
            h = nn.Conv(mc, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(
                x.astype(self.dtype)
            )
            hs = [h]
            ds = 1
            # down path
            for i_level, mult in enumerate(c.channel_mult):
                for i_block in range(c.num_res_blocks):
                    h = res_block(
                        mult * mc, c.dropout, c.use_scale_shift_norm, self.dtype,
                        name=f"down_{i_level}_{i_block}",
                    )(h, emb, deterministic=deterministic)
                    if ds in c.attention_resolutions:
                        h = attn(h, f"down_attn_{i_level}_{i_block}")
                    hs.append(h)
                if i_level != len(c.channel_mult) - 1:
                    h = Downsample(self.dtype, name=f"downsample_{i_level}")(h)
                    hs.append(h)
                    ds *= 2
        out_cache = (h, tuple(hs))

        # middle
        ch = h.shape[-1]
        h = res_block(
            ch, c.dropout, c.use_scale_shift_norm, self.dtype, name="mid_block1"
        )(h, emb, deterministic=deterministic)
        h = attn(h, "mid_attn")
        h = res_block(
            ch, c.dropout, c.use_scale_shift_norm, self.dtype, name="mid_block2"
        )(h, emb, deterministic=deterministic)

        # up path
        for i_level, mult in reversed(list(enumerate(c.channel_mult))):
            for i_block in range(c.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = res_block(
                    mult * mc, c.dropout, c.use_scale_shift_norm, self.dtype,
                    name=f"up_{i_level}_{i_block}",
                )(h, emb, deterministic=deterministic)
                if ds in c.attention_resolutions:
                    h = attn(h, f"up_attn_{i_level}_{i_block}")
            if i_level != 0:
                h = Upsample(self.dtype, name=f"upsample_{i_level}")(h)
                ds //= 2
        assert not hs

        h = FastGroupNorm(32, epsilon=1e-5, dtype=self.dtype, name="norm_out")(h)
        h = jax.nn.silu(h)
        h = nn.Conv(
            c.out_channels, (3, 3), padding=1,
            kernel_init=nn.initializers.zeros, name="conv_out",
        )(h.astype(jnp.float32))
        if return_cache:
            return h, out_cache
        return h
