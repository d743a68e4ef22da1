"""ViT / TimeSformer building blocks for the video VAE encoder.

TPU-native redesign of models/d2c_vae/vit_modules.py: divided space-time
attention with rotary embeddings, standard pre-norm transformer blocks.
Video tensors are time-major NTHWC (reference is NCTHW)."""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def rotate_every_two(x: jnp.ndarray) -> jnp.ndarray:
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)


def apply_rot_emb(q, k, rot_emb):
    """Rotary embedding application (vit_modules.py:24-29); sin/cos shaped
    (1, n, rot_dim), q/k (..., n, d) with d >= rot_dim."""
    sin, cos = rot_emb
    rot_dim = sin.shape[-1]

    def rot(t):
        t_rot, t_pass = t[..., :rot_dim], t[..., rot_dim:]
        t_rot = t_rot * cos + rotate_every_two(t_rot) * sin
        return jnp.concatenate([t_rot, t_pass], axis=-1)

    return rot(q), rot(k)


def rotary_frame_emb(n: int, dim_head: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """1D rotary for the time axis (vit_modules.py:62-73)."""
    inv_freqs = 1.0 / (10000 ** (jnp.arange(0, dim_head, 2) / dim_head))
    freqs = jnp.arange(n)[:, None] * inv_freqs[None]
    freqs = jnp.concatenate([freqs, freqs], axis=-1)[None]
    return jnp.sin(freqs), jnp.cos(freqs)


def rotary_axial_emb(h: int, w: int, dim_head: int, max_freq: int = 10):
    """2D axial rotary for the space axes (vit_modules.py:32-60)."""
    n_scales = dim_head // 4
    scales = jnp.logspace(
        0.0, math.log(max_freq / 2) / math.log(2), n_scales, base=2.0
    )
    h_seq = jnp.linspace(-1.0, 1.0, h)[:, None] * scales[None] * jnp.pi
    w_seq = jnp.linspace(-1.0, 1.0, w)[:, None] * scales[None] * jnp.pi
    x_sinu = jnp.broadcast_to(h_seq[:, None, :], (h, w, n_scales))
    y_sinu = jnp.broadcast_to(w_seq[None, :, :], (h, w, n_scales))
    sin = jnp.concatenate([jnp.sin(x_sinu), jnp.sin(y_sinu)], axis=-1)
    cos = jnp.concatenate([jnp.cos(x_sinu), jnp.cos(y_sinu)], axis=-1)
    sin = sin.reshape(h * w, -1)
    cos = cos.reshape(h * w, -1)
    # interleave-duplicate to (n, 2*d) matching 'n d -> () n (d j)', j=2
    sin = jnp.repeat(sin, 2, axis=-1)[None]
    cos = jnp.repeat(cos, 2, axis=-1)[None]
    return sin, cos


class FeedForwardGEGLU(nn.Module):
    """GEGLU feedforward used by TimeSformer (vit_modules.py:99-115)."""

    dim: int
    mult: int = 4

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim * self.mult * 2)(x)
        a, gates = jnp.split(h, 2, axis=-1)
        # exact (erf) GELU: torch F.gelu default (vit_modules.py:102)
        return nn.Dense(self.dim)(a * jax.nn.gelu(gates, approximate=False))


class FeedForwardMLP(nn.Module):
    """Plain GELU MLP used by the quant-attn Transformer
    (autoencoder_vit.py:31-41)."""

    dim: int
    hidden_dim: int

    @nn.compact
    def __call__(self, x):
        h = jax.nn.gelu(nn.Dense(self.hidden_dim)(x), approximate=False)
        return nn.Dense(self.dim)(h)


def _attend(q, k, v):
    """q pre-scaled.  Long sequences (the per-frame space attention: leading
    dims batch x heads x frames with n=1024 at 256^2) stream through the
    q-tiled online-softmax path — the dense (…, n, n) score tensor is 1 GB
    fp32 PER LAYER at production scale and OOMs training; short sequences
    (time attention over f, class-token pooling) stay dense."""
    from ddmi_tpu.ops.mea import attention

    return attention(q, k, v, kv_chunk=1024, q_chunk=256, scale=1.0,
                     dense_max=512)


class DividedAttention(nn.Module):
    """One attention over a chosen axis grouping (time or space), with
    optional rotary embedding — the core of divided space-time attention
    (vit_modules.py:130-172)."""

    dim: int
    heads: int = 8
    dim_head: int = 64

    @nn.compact
    def __call__(self, x, group: str, f: int, n: int, rot_emb=None):
        """x: (b, f*n, dim); group='time' attends over f within each spatial
        site; group='space' attends over n within each frame."""
        b = x.shape[0]
        inner = self.heads * self.dim_head
        qkv = nn.Dense(3 * inner, use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(t):
            return t.reshape(b, f * n, self.heads, self.dim_head).transpose(
                0, 2, 1, 3
            )  # (b, h, fn, d)

        q, k, v = map(split_heads, (q, k, v))
        q = q * (self.dim_head**-0.5)

        if group == "time":
            # (b,h,f*n,d) -> (b,h,n,f,d): attend over f
            reshape = lambda t: t.reshape(b, self.heads, f, n, self.dim_head
                                          ).transpose(0, 1, 3, 2, 4)
            unshape = lambda t: t.transpose(0, 1, 3, 2, 4).reshape(
                b, self.heads, f * n, self.dim_head
            )
        else:
            reshape = lambda t: t.reshape(b, self.heads, f, n, self.dim_head)
            unshape = lambda t: t.reshape(b, self.heads, f * n, self.dim_head)

        q, k, v = map(reshape, (q, k, v))
        if rot_emb is not None:
            q, k = apply_rot_emb(q, k, rot_emb)
        out = _attend(q, k, v)
        out = unshape(out)
        out = out.transpose(0, 2, 1, 3).reshape(b, f * n, inner)
        return nn.Dense(self.dim, name="to_out")(out)


class TimeSformerEncoder(nn.Module):
    """Divided space-time transformer over patch embeddings
    (vit_modules.py:176-248).  Input: (b, f, h, w, c) video in [-1, 1];
    output: (b, f*hp*wp, dim) patch tokens.

    `remat` (default on) checkpoints each layer: without it, training at
    production scale keeps every layer's (frames x 1024^2 x heads) fp32
    attention matrix alive for backward — ~1 GB per layer at 16f 256^2 —
    which OOMs stage-1 video training on a 16 GB chip.  Inference cost is
    zero (checkpoint is an identity outside autodiff); training recomputes
    each layer's forward once.  Parameter names are unchanged."""

    dim: int = 512
    num_frames: int = 16
    image_size: int = 256
    patch_size: int = 8
    depth: int = 8
    heads: int = 8
    dim_head: int = 64
    remat: bool = True

    def _layer(self, x, i, f, n, frame_rot, image_rot):
        h_norm = nn.LayerNorm(name=f"time_norm_{i}")(x)
        x = x + DividedAttention(
            self.dim, self.heads, self.dim_head, name=f"time_attn_{i}"
        )(h_norm, "time", f, n, rot_emb=frame_rot)
        h_norm = nn.LayerNorm(name=f"space_norm_{i}")(x)
        x = x + DividedAttention(
            self.dim, self.heads, self.dim_head, name=f"space_attn_{i}"
        )(h_norm, "space", f, n, rot_emb=image_rot)
        h_norm = nn.LayerNorm(name=f"ff_norm_{i}")(x)
        return x + FeedForwardGEGLU(self.dim, name=f"ff_{i}")(h_norm)

    @nn.compact
    def __call__(self, video: jnp.ndarray) -> jnp.ndarray:
        b, f, h, w, c = video.shape
        p = self.patch_size
        hp, wp = h // p, w // p
        n = hp * wp

        x = video.reshape(b, f, hp, p, wp, p, c)
        x = x.transpose(0, 1, 2, 4, 3, 5, 6).reshape(b, f * n, p * p * c)
        x = nn.Dense(self.dim, name="to_patch_embedding")(x)

        frame_rot = rotary_frame_emb(f, self.dim_head)
        image_rot = rotary_axial_emb(hp, wp, self.dim_head)

        layer = (
            nn.remat(
                TimeSformerEncoder._layer,
                static_argnums=(2, 3, 4),  # i, f, n (self is argnum 0)
                prevent_cse=False,
            )
            if self.remat
            else TimeSformerEncoder._layer
        )
        for i in range(self.depth):
            x = layer(self, x, i, f, n, frame_rot, image_rot)
        return x


class Transformer(nn.Module):
    """Standard pre-norm ViT transformer (autoencoder_vit.py:76-92), used for
    the per-axis class-token pooling attention."""

    dim: int
    depth: int = 4
    heads: int = 4
    dim_head: int = 48
    mlp_dim: int = 512

    @nn.compact
    def __call__(self, x):
        inner = self.heads * self.dim_head
        for i in range(self.depth):
            h = nn.LayerNorm(name=f"attn_norm_{i}")(x)
            qkv = nn.Dense(3 * inner, use_bias=False, name=f"qkv_{i}")(h)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            bsz, nseq = h.shape[0], h.shape[1]

            def sh(t):
                return t.reshape(bsz, nseq, self.heads, self.dim_head
                                 ).transpose(0, 2, 1, 3)

            out = _attend(sh(q) * (self.dim_head**-0.5), sh(k), sh(v))
            out = out.transpose(0, 2, 1, 3).reshape(bsz, nseq, inner)
            x = x + nn.Dense(self.dim, name=f"attn_out_{i}")(out)
            h = nn.LayerNorm(name=f"ff_norm_{i}")(x)
            x = x + FeedForwardMLP(self.dim, self.mlp_dim, name=f"ff_{i}")(h)
        return x
