"""MDTv2 — Masked Diffusion Transformer (the `DiT: True` denoiser option).

TPU-native redesign of models/ldm/modules/diffusionmodules/
maskedtransformer.py (MDTv2 :246-530): patchify + adaLN transformer blocks
with 2D relative-position-bias attention, U-style skip connections
(en_inblocks -> en_outblocks with skips, then decode blocks skipping to the
input), masked-latent training with a side interpolater, and an optional
cross-plane mode for triplane latents.

Static-shape reformulation: the reference samples a random mask ratio in
[mask_ratio, mask_ratio+0.2] per step (:484-488), which changes the kept-token
count (a dynamic shape under jit).  Here the kept count is static at
mask_ratio + 0.1 (the mean); the kept SET is still uniformly random per
sample.  Also fixes the reference bug where unmasked MDTv2 crashes in
initialize_weights (sideblocks undefined, SURVEY.md §2.12)."""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ddmi_tpu.core.config import DiTConfig


def modulate(x, shift, scale):
    return x * (1 + scale[:, None]) + shift[:, None]


def _rel_pos_index(h: int, w: int) -> np.ndarray:
    """Swin-style (h*w, h*w) index into the (2h-1)*(2w-1)+... bias table."""
    coords = np.stack(np.meshgrid(np.arange(h), np.arange(w), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += h - 1
    rel[:, :, 1] += w - 1
    rel[:, :, 0] *= 2 * w - 1
    return rel.sum(-1)


class RPBAttention(nn.Module):
    """Multi-head attention with learned relative position bias
    (maskedtransformer.py:13-59, :61-104); supports gathering the bias rows/
    cols by per-sample kept-token ids during masked training."""

    dim: int
    num_heads: int
    window: Tuple[int, int]

    @nn.compact
    def __call__(self, x, ids_keep: Optional[jnp.ndarray] = None):
        B, N, C = x.shape
        nh = self.num_heads
        hd = C // nh
        h, w = self.window
        L = h * w

        qkv = nn.Dense(3 * C, use_bias=True, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        shp = lambda t: t.reshape(B, N, nh, hd).transpose(0, 2, 1, 3)
        q, k, v = shp(q), shp(k), shp(v)

        table = self.param(
            "rel_pos_table",
            nn.initializers.normal(0.02),
            ((2 * h - 1) * (2 * w - 1) + 3, nh),
        )
        index = jnp.asarray(_rel_pos_index(h, w))
        bias = table[index.reshape(-1)].reshape(L, L, nh)
        bias = bias.transpose(2, 0, 1)[None]  # (1, nh, L, L)
        if ids_keep is not None:
            # gather kept rows and cols per sample (get_masked_rel_bias)
            nk = ids_keep.shape[1]
            b_bias = jnp.broadcast_to(bias, (B, nh, L, L))
            b_bias = jnp.take_along_axis(
                b_bias, ids_keep[:, None, :, None].repeat(nh, 1), axis=2
            )
            b_bias = jnp.take_along_axis(
                b_bias,
                jnp.broadcast_to(ids_keep[:, None, None, :], (B, nh, nk, nk)),
                axis=3,
            )
            bias = b_bias

        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (hd**-0.5)
        if bias.shape[-1] == N:
            attn = attn + bias
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        return nn.Dense(C, name="proj")(out)


class MDTBlock(nn.Module):
    """adaLN transformer block, optional skip fusion
    (maskedtransformer.py:187-221)."""

    dim: int
    num_heads: int
    window: Tuple[int, int]
    mlp_ratio: float = 4.0
    skip: bool = False

    @nn.compact
    def __call__(self, x, c, skip=None, ids_keep=None):
        if self.skip:
            x = nn.Dense(self.dim, name="skip_linear")(
                jnp.concatenate([x, skip], -1)
            )
        mod = nn.Dense(
            6 * self.dim, kernel_init=nn.initializers.zeros,
            name="adaLN_modulation",
        )(jax.nn.silu(c))
        sa_shift, sa_scale, sa_gate, mlp_shift, mlp_scale, mlp_gate = jnp.split(
            mod, 6, axis=-1
        )
        h = nn.LayerNorm(use_scale=False, use_bias=False, name="norm1")(x)
        h = modulate(h, sa_shift, sa_scale)
        x = x + sa_gate[:, None] * RPBAttention(
            self.dim, self.num_heads, self.window, name="attn"
        )(h, ids_keep=ids_keep)
        h = nn.LayerNorm(use_scale=False, use_bias=False, name="norm2")(x)
        h = modulate(h, mlp_shift, mlp_scale)
        hidden = int(self.dim * self.mlp_ratio)
        h = nn.Dense(hidden, name="mlp_fc1")(h)
        h = jax.nn.gelu(h, approximate=True)
        h = nn.Dense(self.dim, name="mlp_fc2")(h)
        return x + mlp_gate[:, None] * h


class MDTv2(nn.Module):
    """x: (b, h, w, c) latent (or (b, h, w, 3c) cross-plane), t: (b,) ->
    same-shape prediction."""

    cfg: DiTConfig

    @nn.compact
    def __call__(self, x, t, cond=None, *, enable_mask: bool = False,
                 rng: Optional[jax.Array] = None):
        c = self.cfg
        p = c.patch_size
        B, H, W, _ = x.shape
        hp, wp = H // p, W // p
        L = hp * wp
        D = c.hidden_size
        window = (hp, wp)

        x_embedder = nn.Dense(D, name="x_embedder")

        def patchify(img):
            h = img.reshape(B, hp, p, wp, p, img.shape[-1])
            h = h.transpose(0, 1, 3, 2, 4, 5).reshape(B, L, p * p * img.shape[-1])
            return x_embedder(h)

        pos = self.param("pos_embed", nn.initializers.normal(0.02), (1, L, D))
        if c.cross_plane:
            planes = jnp.split(x, 3, axis=-1)
            tokens = jnp.concatenate([patchify(pl) + pos for pl in planes], 1)
        else:
            tokens = patchify(x) + pos

        # timestep embedding (TimestepEmbedder :106-147)
        half = 128
        freqs = jnp.exp(
            -math.log(10000) * jnp.arange(half, dtype=jnp.float32) / half
        )
        targs = t.astype(jnp.float32)[:, None] * freqs[None]
        temb = jnp.concatenate([jnp.cos(targs), jnp.sin(targs)], -1)
        temb = nn.Dense(D, name="t_mlp1")(temb)
        temb = jax.nn.silu(temb)
        cvec = nn.Dense(D, name="t_mlp2")(temb)

        xx = tokens
        input_skip = xx
        ids_keep = None
        mask = None
        ids_restore = None
        if c.mask_ratio is not None and enable_mask:
            assert rng is not None, "masked training needs an rng"
            ratio = min(0.99, c.mask_ratio + 0.1)  # static mean of ref range
            Ltot = xx.shape[1]
            len_keep = max(1, int(Ltot * (1 - ratio)))
            noise = jax.random.uniform(rng, (B, Ltot))
            ids_shuffle = jnp.argsort(noise, axis=1)
            ids_restore = jnp.argsort(ids_shuffle, axis=1)
            ids_keep = ids_shuffle[:, :len_keep]
            xx = jnp.take_along_axis(
                xx, ids_keep[..., None].repeat(D, -1), axis=1
            )
            mask = jnp.ones((B, Ltot))
            mask = mask.at[:, :len_keep].set(0.0)
            mask = jnp.take_along_axis(mask, ids_restore, axis=1)

        half_depth = (c.depth - c.decode_layer) // 2
        skips = []
        rpb_ids = ids_keep if not c.cross_plane else None
        for i in range(half_depth):
            xx = MDTBlock(D, c.num_heads, window, c.mlp_ratio,
                          name=f"en_in_{i}")(xx, cvec, ids_keep=rpb_ids)
            skips.append(xx)
        for i in range(half_depth):
            xx = MDTBlock(D, c.num_heads, window, c.mlp_ratio, skip=True,
                          name=f"en_out_{i}")(
                xx, cvec, skip=skips.pop(), ids_keep=rpb_ids
            )

        dec_pos = self.param(
            "decoder_pos_embed", nn.initializers.normal(0.02), (1, L, D)
        )
        if ids_keep is not None:
            # side interpolater (:424-444): scatter kept tokens back, fill
            # with mask token, one side block, masked shortcut
            mask_token = self.param(
                "mask_token", nn.initializers.normal(0.02), (1, 1, D)
            )
            Ltot = ids_restore.shape[1]
            pad = jnp.broadcast_to(
                mask_token, (B, Ltot - xx.shape[1], D)
            )
            x_ = jnp.concatenate([xx, pad], axis=1)
            x_ = jnp.take_along_axis(
                x_, ids_restore[..., None].repeat(D, -1), axis=1
            )
            x_ = x_ + dec_pos
            x_before = x_
            x_ = MDTBlock(D, c.num_heads, window, c.mlp_ratio,
                          name="sideblock")(x_, cvec)
            xx = x_ * mask[..., None] + (1 - mask[..., None]) * x_before
        else:
            if c.cross_plane:
                xx = xx + jnp.tile(dec_pos, (1, 3, 1))
            else:
                xx = xx + dec_pos

        for i in range(c.decode_layer):
            xx = MDTBlock(D, c.num_heads, window, c.mlp_ratio, skip=True,
                          name=f"de_{i}")(xx, cvec, skip=input_skip)

        # final layer (:233-243): adaLN + linear to patch pixels, zero-init;
        # module instances created once so cross-plane calls share weights
        final_adaLN = nn.Dense(
            2 * D, kernel_init=nn.initializers.zeros, name="final_adaLN"
        )
        final_norm = nn.LayerNorm(
            use_scale=False, use_bias=False, name="final_norm"
        )
        final_linear = nn.Dense(
            p * p * c.in_channels, kernel_init=nn.initializers.zeros,
            name="final_linear",
        )

        def final(tok):
            mod = final_adaLN(jax.nn.silu(cvec))
            shift, scale = jnp.split(mod, 2, -1)
            h = modulate(final_norm(tok), shift, scale)
            h = final_linear(h)
            h = h.reshape(B, hp, wp, p, p, c.in_channels)
            return h.transpose(0, 1, 3, 2, 4, 5).reshape(
                B, H, W, c.in_channels
            )

        if c.cross_plane:
            outs = [final(tok) for tok in jnp.split(xx, 3, axis=1)]
            return jnp.concatenate(outs, axis=-1)
        return final(xx)
