"""Context-conditioned spatial transformer for the denoiser.

TPU-native redesign of the reference's conditioning path
(/root/reference/models/ldm/modules/attention.py:152-260: CrossAttention,
BasicTransformerBlock, SpatialTransformer; plumbed into the UNet via
use_spatial_transformer/context_dim, openaimodel.py:512-576, :761-793).

No shipped DDMI config enables this path, but the reference framework
supports it, so the rebuild does too: `UNetConfig.use_spatial_transformer`
swaps the self-attention blocks for these context-conditioned transformer
blocks, and `UNet.__call__(..., cond=ctx)` routes the context tensor to
every cross-attention layer (classifier-free guidance then runs at the
sampler level via `cond_model_fn`, diffusion/process.py).

Design (idiomatic JAX, not a translation):
  * tokens stay (B, n, C) with a separate heads axis in one einsum — no
    (b·h) flattening round-trips (reference attention.py:179 rearranges
    through '(b h) n d'; XLA fuses the reshape-free form better);
  * softmax in fp32 regardless of compute dtype (matches the repo-wide
    attention discipline, nn/unet.py::AttentionBlock);
  * sequences here are <= 4096 latent tokens + short context — dense
    attention on the MXU; no flash machinery needed;
  * proj_out is zero-init so a freshly-enabled transformer block is an
    identity map (reference attention.py:251: zero_module), which keeps
    fine-tuning from a self-attention checkpoint stable.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ddmi_tpu.ops.fused import FastGroupNorm


class GEGLU(nn.Module):
    """Gated-GELU projection (reference attention.py:37-44)."""

    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        xg = nn.Dense(2 * self.dim_out, dtype=self.dtype, name="proj")(x)
        x, gate = jnp.split(xg, 2, axis=-1)
        return x * jax.nn.gelu(gate, approximate=False)


class FeedForward(nn.Module):
    """Transformer MLP, gated by default (reference attention.py:47-63)."""

    dim: int
    mult: int = 4
    glu: bool = True
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        inner = self.dim * self.mult
        if self.glu:
            h = GEGLU(inner, dtype=self.dtype, name="geglu")(x)
        else:
            h = nn.Dense(inner, dtype=self.dtype, name="in_proj")(x)
            h = jax.nn.gelu(h, approximate=False)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.Dense(self.dim, dtype=self.dtype, name="out_proj")(h)


class CrossAttention(nn.Module):
    """Multi-head attention with an optional external key/value context
    (reference attention.py:152-194).  `context=None` -> self-attention."""

    query_dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, mask=None, *, deterministic=True):
        h, d = self.heads, self.dim_head
        inner = h * d
        ctx = x if context is None else context

        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)

        B, n, _ = q.shape
        m = ctx.shape[1]
        q = q.reshape(B, n, h, d)
        k = k.reshape(B, m, h, d)
        v = v.reshape(B, m, h, d)

        sim = jnp.einsum("bihd,bjhd->bhij", q, k).astype(jnp.float32) * (
            d**-0.5
        )
        if mask is not None:
            # mask: (B, m) True = attend (reference attention.py:181-185)
            neg = jnp.finfo(jnp.float32).min
            sim = jnp.where(mask[:, None, None, :], sim, neg)
        attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhij,bjhd->bihd", attn, v).reshape(B, n, inner)
        out = nn.Dense(self.query_dim, dtype=self.dtype, name="to_out")(out)
        if self.dropout > 0:
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out


class BasicTransformerBlock(nn.Module):
    """LN -> self-attn -> LN -> cross-attn(context) -> LN -> gated FF, all
    residual (reference attention.py:196-217)."""

    dim: int
    n_heads: int
    d_head: int
    dropout: float = 0.0
    gated_ff: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, *, deterministic: bool = True):
        x = x + CrossAttention(
            self.dim, self.n_heads, self.d_head, self.dropout,
            dtype=self.dtype, name="attn1",
        )(nn.LayerNorm(name="norm1")(x), deterministic=deterministic)
        x = x + CrossAttention(
            self.dim, self.n_heads, self.d_head, self.dropout,
            dtype=self.dtype, name="attn2",
        )(
            nn.LayerNorm(name="norm2")(x), context=context,
            deterministic=deterministic,
        )
        x = x + FeedForward(
            self.dim, glu=self.gated_ff, dropout=self.dropout,
            dtype=self.dtype, name="ff",
        )(nn.LayerNorm(name="norm3")(x), deterministic=deterministic)
        return x


class SpatialTransformer(nn.Module):
    """Image-shaped transformer: GN -> 1x1 in-proj -> depth x
    BasicTransformerBlock(context) -> zero-init 1x1 out-proj -> +x
    (reference attention.py:219-261).  x: (B, H, W, C) NHWC."""

    in_channels: int
    n_heads: int
    d_head: int
    depth: int = 1
    dropout: float = 0.0
    context_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, *, deterministic: bool = True):
        B, H, W, C = x.shape
        inner = self.n_heads * self.d_head
        h = FastGroupNorm(32, epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        h = h.reshape(B, H * W, C)
        # 1x1 convs on NHWC tokens are Dense layers — same math, one matmul.
        h = nn.Dense(inner, dtype=self.dtype, name="proj_in")(h)
        for i in range(self.depth):
            h = BasicTransformerBlock(
                inner, self.n_heads, self.d_head, self.dropout,
                dtype=self.dtype, name=f"block_{i}",
            )(h, context=context, deterministic=deterministic)
        h = nn.Dense(
            C, kernel_init=nn.initializers.zeros, dtype=self.dtype,
            name="proj_out",
        )(h)
        return x + h.reshape(B, H, W, C)
