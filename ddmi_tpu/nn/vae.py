"""D2C-VAE stage-1 autoencoder: LDM-style conv VAE whose decoder emits a
hierarchically-decomposed basis-field (HDBF) pyramid.

TPU-native redesign of models/d2c_vae/autoencoder_unet.py (Encoder :608-699,
Decoder :703-829, Autoencoder :834-874): NHWC layout, Flax modules, plain
dot-product attention (sequence lengths are <= 4096 — no need for the
reference's xformers path).  Decoder taps a 1x1 conv at each resolution in
`hdbf_resolutions` plus the final output conv, yielding a list of basis-field
planes ordered coarse -> fine.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ddmi_tpu.core.config import DDConfig
from ddmi_tpu.nn.distributions import DiagonalGaussian


def nonlinearity(x):
    return jax.nn.swish(x)


class Norm(nn.Module):
    """GroupNorm(32, eps=1e-6) as used throughout the LDM VAE."""

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(num_groups=32, epsilon=1e-6)(x)


class ResnetBlock(nn.Module):
    out_channels: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        h = Norm()(x)
        h = nonlinearity(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1)(h)
        h = Norm()(h)
        h = nonlinearity(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Conv(self.out_channels, (3, 3), padding=1)(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Spatial self-attention over an NHWC plane (autoencoder_unet AttnBlock)."""

    num_heads: int = 1

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = Norm()(x)
        q = nn.Conv(C, (1, 1), name="q")(h)
        k = nn.Conv(C, (1, 1), name="k")(h)
        v = nn.Conv(C, (1, 1), name="v")(h)

        nh = self.num_heads
        hd = C // nh
        q = q.reshape(B, H * W, nh, hd)
        k = k.reshape(B, H * W, nh, hd)
        v = v.reshape(B, H * W, nh, hd)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (hd**-0.5)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, H, W, C)
        out = nn.Conv(C, (1, 1), name="proj_out")(out)
        return x + out


class LinAttnBlock(nn.Module):
    """Linear attention over an NHWC plane — the `attn_type: linear` branch
    of the reference's make_attn (models/d2c_vae/autoencoder_unet.py:546-553
    -> models/ldm/modules/attention.py:80-101 LinearAttention, wrapped as
    LinAttnBlock at autoencoder_unet.py:152-155 with heads=1, dim_head=C).

    Reference semantics kept exactly (they differ from AttnBlock on
    purpose): NO pre-norm, NO residual; k softmaxed over the SPATIAL axis;
    context = k vᵀ (C×C) then q read out against it — O(n·C²) instead of
    O(n²·C), linear in sequence length.  to_qkv is bias-free (reference
    :85); to_out carries a bias.  Softmax and the two contractions run in
    fp32 for stability, cast back to the input dtype."""

    heads: int = 1

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        nh = self.heads
        hd = C // nh  # dim_head = C at heads=1 (LinAttnBlock wrapper)
        qkv = nn.Conv(3 * C, (1, 1), use_bias=False, name="to_qkv")(x)
        # torch layout 'b (qkv heads c) h w': qkv outermost, then heads,
        # then dim_head — matched here so converted checkpoints line up
        qkv = qkv.reshape(B, H * W, 3, nh, hd).astype(jnp.float32)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, n, h, d)
        k = jax.nn.softmax(k, axis=1)  # over spatial positions
        context = jnp.einsum("bnhd,bnhe->bhde", k, v)  # (B, h, d, d)
        out = jnp.einsum("bhde,bnhd->bnhe", context, q)  # (B, n, h, d)
        out = out.reshape(B, H, W, C).astype(x.dtype)
        return nn.Conv(C, (1, 1), name="to_out")(out)


class Downsample(nn.Module):
    with_conv: bool = True

    @nn.compact
    def __call__(self, x):
        if self.with_conv:
            # asymmetric (0,1) pad then stride-2 valid conv (reference parity)
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            return nn.Conv(x.shape[-1], (3, 3), strides=2, padding="VALID")(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class Upsample(nn.Module):
    with_conv: bool = True

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, 2 * H, 2 * W, C), method="nearest")
        if self.with_conv:
            x = nn.Conv(C, (3, 3), padding=1)(x)
        return x


def _res_block(c: DDConfig, which: str, out_ch: int, h, deterministic: bool):
    """One ResnetBlock application, optionally under jax.checkpoint.

    `ddconfig.extra['remat'] in ('enc'|'dec'|'all')` reruns the block's
    internals on the backward pass instead of saving its activations — a
    fusion-granularity / HBM-traffic experiment lever (BASELINE.md round-5
    image-s1 "reshape the work" A/B), OFF by default.  Parameter names are
    unchanged (flax lifted transform), so checkpoints are layout-compatible
    either way."""
    if c.extra.get("remat", "") in ("all", which):
        assert c.dropout == 0.0, "remat path assumes dropout=0 (prod configs)"
        return _remat_resblock()(out_ch, 0.0)(h)
    return ResnetBlock(out_ch, c.dropout)(h, deterministic=deterministic)


_REMAT_RESBLOCK = None


def _remat_resblock():
    global _REMAT_RESBLOCK
    if _REMAT_RESBLOCK is None:
        # prevent_cse=True (the jax.checkpoint default) is REQUIRED here:
        # these blocks are not inside a scan, and with CSE allowed XLA
        # eliminates the recompute entirely — measured round 5: the
        # prevent_cse=False variant compiled to the bit-identical program
        # (same 732.4 ms, same cost analysis) as no-remat.
        cls = nn.remat(ResnetBlock)
        # Keep flax auto-naming (and therefore checkpoint param paths)
        # identical to the non-remat path: flax names instances from
        # cls.__name__, which nn.remat prefixes with "Checkpoint".
        cls.__name__ = "ResnetBlock"
        _REMAT_RESBLOCK = cls
    return _REMAT_RESBLOCK


def _make_attn(ch: int, attn_type: str):
    """The reference make_attn enum (autoencoder_unet.py:546-553): vanilla /
    vanilla-multihead / linear / none (None = caller skips the block)."""
    if attn_type in ("vanilla", "none"):
        return AttnBlock(num_heads=1) if attn_type == "vanilla" else None
    if attn_type == "vanilla-multihead":
        return AttnBlock(num_heads=16)
    if attn_type == "linear":
        return LinAttnBlock()
    raise NotImplementedError(attn_type)


class Encoder(nn.Module):
    """Downsampling conv encoder -> 2*z_channels moments (reference :608-699)."""

    cfg: DDConfig

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        c = self.cfg
        num_resolutions = len(c.ch_mult)
        curr_res = c.resolution

        h = nn.Conv(c.ch, (3, 3), padding=1, name="conv_in")(x)
        for i_level in range(num_resolutions):
            block_out = c.ch * c.ch_mult[i_level]
            for i_block in range(c.num_res_blocks):
                h = _res_block(c, "enc", block_out, h, deterministic)
                if curr_res in c.attn_resolutions:
                    h = _make_attn(block_out, c.attn_type)(h)
            if i_level != num_resolutions - 1:
                h = Downsample()(h)
                curr_res //= 2

        h = _res_block(c, "enc", h.shape[-1], h, deterministic)
        attn = _make_attn(h.shape[-1], c.attn_type)
        if attn is not None:
            h = attn(h)
        h = _res_block(c, "enc", h.shape[-1], h, deterministic)

        h = Norm()(h)
        h = nonlinearity(h)
        out_ch = 2 * c.z_channels if c.double_z else c.z_channels
        return nn.Conv(out_ch, (3, 3), padding=1, name="conv_out")(h)


class Decoder(nn.Module):
    """Upsampling conv decoder emitting the HDBF pyramid (reference :703-829).

    Returns a list of planes: one 1x1-conv tap at each resolution in
    `hdbf_resolutions` (coarse -> fine) plus the final 3x3 output conv."""

    cfg: DDConfig

    @nn.compact
    def __call__(self, z, *, deterministic: bool = True):
        c = self.cfg
        num_resolutions = len(c.ch_mult)
        curr_res = c.resolution // 2 ** (num_resolutions - 1)

        hdbf = []
        block_in = c.ch * c.ch_mult[num_resolutions - 1]
        h = nn.Conv(block_in, (3, 3), padding=1, name="conv_in")(z)

        h = _res_block(c, "dec", block_in, h, deterministic)
        attn = _make_attn(block_in, c.attn_type)
        if attn is not None:
            h = attn(h)
        h = _res_block(c, "dec", block_in, h, deterministic)

        for i_level in reversed(range(num_resolutions)):
            block_out = c.ch * c.ch_mult[i_level]
            for i_block in range(c.num_res_blocks + 1):
                h = _res_block(c, "dec", block_out, h, deterministic)
                if curr_res in c.attn_resolutions:
                    h = _make_attn(block_out, c.attn_type)(h)
            if curr_res in c.hdbf_resolutions:
                hdbf.append(
                    nn.Conv(c.out_ch, (1, 1), name=f"hdbf_{curr_res}")(h)
                )
            if i_level != 0:
                h = Upsample()(h)
                curr_res *= 2

        h = Norm()(h)
        h = nonlinearity(h)
        h = nn.Conv(c.out_ch, (3, 3), padding=1, name="conv_out")(h)
        hdbf.append(h)
        return hdbf


class Autoencoder(nn.Module):
    """encode -> DiagonalGaussian over embed_dim latents; decode -> HDBF list
    (reference Autoencoder, autoencoder_unet.py:834-874)."""

    cfg: DDConfig
    embed_dim: int = 64

    def setup(self):
        assert self.cfg.double_z
        self.encoder = Encoder(self.cfg)
        self.decoder = Decoder(self.cfg)
        self.quant_conv = nn.Conv(2 * self.embed_dim, (1, 1))
        self.post_quant_conv = nn.Conv(self.cfg.z_channels, (1, 1))

    def encode(self, x, *, deterministic: bool = True) -> DiagonalGaussian:
        h = self.encoder(x, deterministic=deterministic)
        moments = self.quant_conv(h)
        return DiagonalGaussian.from_moments(moments)

    def decode(self, z, *, deterministic: bool = True):
        z = self.post_quant_conv(z)
        return self.decoder(z, deterministic=deterministic)

    def __call__(self, x, rng: Optional[jax.Array] = None, sample_posterior=True,
                 *, deterministic: bool = True):
        posterior = self.encode(x, deterministic=deterministic)
        if sample_posterior:
            z = posterior.sample(rng)
        else:
            z = posterior.mode()
        dec = self.decode(z, deterministic=deterministic)
        return dec, posterior
