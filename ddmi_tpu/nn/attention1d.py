"""1D attention blocks for cross-plane token sequences.

TPU-native equivalents of the reference's xformers 1D attention blocks
(autoencoder_unet.py:410-556: AttnBlock1d / MemoryEfficientAttnBlock1D /
MemoryEfficientAttnBlock1D_expand): GroupNorm over channels, 1x1 (dense)
qkv projections, residual.  Token layout here is (b, n, c) channel-last;
long sequences route through the chunked online-softmax attention in
ops/mea.py instead of xformers."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ddmi_tpu.ops.mea import attention


class GroupNormTokens(nn.Module):
    """GroupNorm(32) over the channel axis of (b, n, c) tokens — matches the
    reference's Normalize() on (b, c, n) conv1d activations."""

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(num_groups=32, epsilon=1e-6)(x)


class AttnBlock1D(nn.Module):
    """Multi-head self-attention over a token sequence (vanilla-1d-multihead,
    16 heads in reference usage)."""

    num_heads: int = 16

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        nh = self.num_heads
        hd = C // nh
        h = GroupNormTokens()(x)
        q = nn.Dense(C, name="q")(h).reshape(B, N, nh, hd).transpose(0, 2, 1, 3)
        k = nn.Dense(C, name="k")(h).reshape(B, N, nh, hd).transpose(0, 2, 1, 3)
        v = nn.Dense(C, name="v")(h).reshape(B, N, nh, hd).transpose(0, 2, 1, 3)
        out = attention(q, k, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        return x + nn.Dense(C, name="proj_out")(out)


class AttnBlock1DExpand(nn.Module):
    """'Expand' variant (autoencoder_unet.py:470-556): qkv projects C ->
    C*num_heads so every head sees the FULL channel width (head_dim = C),
    then projects back.  Used for the video decoder's cross-plane attention
    over up to ~73k tokens."""

    num_heads: int = 8

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        nh = self.num_heads
        h = GroupNormTokens()(x)
        q = nn.Dense(C * nh, name="q")(h).reshape(B, N, nh, C).transpose(0, 2, 1, 3)
        k = nn.Dense(C * nh, name="k")(h).reshape(B, N, nh, C).transpose(0, 2, 1, 3)
        v = nn.Dense(C * nh, name="v")(h).reshape(B, N, nh, C).transpose(0, 2, 1, 3)
        out = attention(q, k, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C * nh)
        return x + nn.Dense(C, name="proj_out")(out)
