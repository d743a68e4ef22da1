"""1D attention blocks for cross-plane token sequences.

TPU-native equivalents of the reference's xformers 1D attention blocks
(autoencoder_unet.py:410-556: AttnBlock1d / MemoryEfficientAttnBlock1D /
MemoryEfficientAttnBlock1D_expand): GroupNorm over channels, 1x1 (dense)
qkv projections, residual.  Token layout here is (b, n, c) channel-last;
long sequences route through the chunked online-softmax attention in
ops/mea.py instead of xformers."""

from __future__ import annotations

import os

import flax.linen as nn
import jax
import jax.numpy as jnp

from ddmi_tpu.ops.mea import attention
from ddmi_tpu.ops.pallas import attention as vmem_attn


def tiered_attention(q, k, v):
    """Attention over (B, nh, n, hd) with the same Pallas tiers as the image
    UNet's AttentionBlock (nn/unet.py:115-195): the single-pass VMEM kernel
    when the shape fits (n <= 1024, sampling only — the kernel is
    forward-only), the TPU flash kernel for long sequences (training AND
    sampling: its Pallas backward is exactly what the video decoder's
    73k-token cross-plane attentions need under autodiff — the chunked MEA
    fallback's remat'd lax.scan recomputes every tile's scores on the
    backward), and the chunked online-softmax MEA path otherwise.

    Measured motivation: the video DDIM scan is 63% of generation time and
    its cross-plane attentions ran dense-XLA (BASELINE.md video
    decomposition, bench_video_decompose.py); flash-under-training A/B in
    BASELINE.md "Training roofline" (DDMI_NO_FLASH_1D flips it back)."""
    n, hd = q.shape[-2], q.shape[-1]
    from ddmi_tpu.ops.platform import on_tpu as _on_tpu

    on_tpu = _on_tpu()
    if on_tpu and vmem_attn.is_inference() and vmem_attn.supported(n, hd):
        return vmem_attn.mha_vmem(q, k, v, hd**-0.5)
    from ddmi_tpu.nn.unet import FLASH_BLOCK, FLASH_MIN_TOKENS

    blk = min(n, FLASH_BLOCK)
    # Training-mode token cap (round 5): differentiating the flash kernel at
    # the video decoder's 73,728-token attention crashes the TPU compile
    # service (tpu_compile_helper exit 1 — the backward's dq/dkv kernels at
    # a 144x144 block grid; the program's MLIR itself is a clean 6.5 MB, so
    # this is compiler-side resource exhaustion, not payload).  Sampling is
    # unaffected (the 73k forward-only flash compiles and is the measured
    # round-3 win), so the cap applies only outside inference mode; above it
    # training falls back to the chunked MEA path.  DDMI_FLASH_TRAIN_MAX
    # overrides for A/B.
    train_max = int(os.environ.get("DDMI_FLASH_TRAIN_MAX", "32768"))
    if (
        on_tpu
        and not os.environ.get("DDMI_NO_FLASH_1D")  # on-chip A/B switch
        and n >= FLASH_MIN_TOKENS
        and (vmem_attn.is_inference() or n <= train_max)
        and n % blk == 0
        # hd < 128 underuses MXU lanes but flash still wins by never
        # materializing the n^2 fp32 scores in HBM (0.5 GB per ds1
        # cross-plane call at n=2048)
        and hd in (16, 32, 64, 128)
    ):
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes,
            flash_attention,
        )

        bs = BlockSizes(
            block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
            block_q_major_dkv=blk, block_k_major_dkv=blk,
            block_k_dkv=blk, block_q_dkv=blk,
            block_k_major_dq=blk, block_k_dq=blk, block_q_dq=blk,
        )
        return flash_attention(q, k, v, sm_scale=hd**-0.5, block_sizes=bs)
    return attention(q, k, v)


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
        out = tiered_attention(q, k, v)
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
        out = tiered_attention(q, k, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C * nh)
        return x + nn.Dense(C, name="proj_out")(out)
