"""Triplane VAE for 3D occupancy / NeRF.

TPU-native redesign of Autoencoder3D + Encoder_triplane/Decoder_triplane
(models/d2c_vae/autoencoder_unet.py:877-936, :1147-1347, :1348-1563): the
three planes share every conv/attention weight; at `inter_attn_resolutions`
the planes exchange information through CHANNEL-CONCAT blocks
(ResnetBlock(3c) -> 2D attention(3c) -> ResnetBlock(3c) -> split back,
:1199-1208).  Plane tuple order is (xy, yz, xz) throughout (the pointnet
feature dict order used by MLP3D, mlp.py:84-86)."""

from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ddmi_tpu.core.config import DDConfig
from ddmi_tpu.nn.distributions import DiagonalGaussian
from ddmi_tpu.nn.vae import Downsample, Norm, ResnetBlock, Upsample, _make_attn, nonlinearity


class InterPlaneBlock(nn.Module):
    """Channel-concat plane mixing: ResnetBlock(3c)->attn(3c)->ResnetBlock(3c)."""

    channels: int  # per-plane channels
    dropout: float = 0.0
    attn_type: str = "vanilla"

    @nn.compact
    def __call__(self, planes, *, deterministic: bool = True):
        ch = self.channels
        h = jnp.concatenate(planes, axis=-1)
        h = ResnetBlock(3 * ch, self.dropout, name="block_a")(
            h, deterministic=deterministic
        )
        attn = _make_attn(3 * ch, self.attn_type)
        if attn is not None:
            h = attn(h)
        h = ResnetBlock(3 * ch, self.dropout, name="block_b")(
            h, deterministic=deterministic
        )
        return h[..., :ch], h[..., ch : 2 * ch], h[..., 2 * ch :]


class TriplaneEncoder(nn.Module):
    """Shared-weight downsampling encoder with inter-plane mixing
    (Encoder_triplane :1147-1346)."""

    cfg: DDConfig

    @nn.compact
    def __call__(self, planes, *, deterministic: bool = True):
        c = self.cfg
        num_res = len(c.ch_mult)
        curr_res = c.resolution

        conv_in = nn.Conv(c.ch, (3, 3), padding=1, name="conv_in")
        hs = [conv_in(p) for p in planes]

        for i_level in range(num_res):
            block_out = c.ch * c.ch_mult[i_level]
            for i_block in range(c.num_res_blocks):
                blk = ResnetBlock(
                    block_out, c.dropout, name=f"down_{i_level}_{i_block}"
                )
                hs = [blk(h, deterministic=deterministic) for h in hs]
                if curr_res in c.attn_resolutions:
                    attn = _make_attn(block_out, c.attn_type)
                    hs = [attn(h) for h in hs]
            if curr_res in c.inter_attn_resolutions:
                hs = list(
                    InterPlaneBlock(
                        block_out, c.dropout, c.attn_type,
                        name=f"inter_{i_level}",
                    )(hs, deterministic=deterministic)
                )
            if i_level != num_res - 1:
                down = Downsample(name=f"downsample_{i_level}")
                hs = [down(h) for h in hs]
                curr_res //= 2

        ch = hs[0].shape[-1]
        mid1 = ResnetBlock(ch, c.dropout, name="mid_block1")
        mid_attn = _make_attn(ch, c.attn_type)
        mid2 = ResnetBlock(ch, c.dropout, name="mid_block2")

        def mid(h):
            h = mid1(h, deterministic=deterministic)
            if mid_attn is not None:
                h = mid_attn(h)
            return mid2(h, deterministic=deterministic)

        hs = [mid(h) for h in hs]
        hs = list(
            InterPlaneBlock(ch, c.dropout, c.attn_type, name="mid_inter")(
                hs, deterministic=deterministic
            )
        )

        norm = Norm(name="norm_out")
        out_ch = 2 * c.z_channels if c.double_z else c.z_channels
        conv_out = nn.Conv(out_ch, (3, 3), padding=1, name="conv_out")
        return tuple(conv_out(nonlinearity(norm(h))) for h in hs)


class TriplaneDecoder(nn.Module):
    """Shared-weight upsampling decoder emitting one HDBF pyramid per plane
    (Decoder_triplane :1348-1563)."""

    cfg: DDConfig

    @nn.compact
    def __call__(self, planes, *, deterministic: bool = True):
        c = self.cfg
        num_res = len(c.ch_mult)
        curr_res = c.resolution // 2 ** (num_res - 1)

        block_in = c.ch * c.ch_mult[num_res - 1]
        conv_in = nn.Conv(block_in, (3, 3), padding=1, name="conv_in")
        hs = [conv_in(p) for p in planes]

        mid1 = ResnetBlock(block_in, c.dropout, name="mid_block1")
        mid_attn = _make_attn(block_in, c.attn_type)
        mid2 = ResnetBlock(block_in, c.dropout, name="mid_block2")

        def mid(h):
            h = mid1(h, deterministic=deterministic)
            if mid_attn is not None:
                h = mid_attn(h)
            return mid2(h, deterministic=deterministic)

        hs = [mid(h) for h in hs]
        # channel-concat mid mixing — the reference decoder has it too
        # (Decoder_triplane mid.block_3/mid_attn/mid.block_4, forward
        # :1494-1497), not just the encoder
        hs = list(
            InterPlaneBlock(block_in, c.dropout, c.attn_type, name="mid_inter")(
                hs, deterministic=deterministic
            )
        )

        pyramids: Tuple[List[jnp.ndarray], ...] = ([], [], [])
        for i_level in reversed(range(num_res)):
            block_out = c.ch * c.ch_mult[i_level]
            for i_block in range(c.num_res_blocks + 1):
                blk = ResnetBlock(
                    block_out, c.dropout, name=f"up_{i_level}_{i_block}"
                )
                hs = [blk(h, deterministic=deterministic) for h in hs]
                if curr_res in c.attn_resolutions:
                    attn = _make_attn(block_out, c.attn_type)
                    hs = [attn(h) for h in hs]
            if curr_res in c.inter_attn_resolutions:
                hs = list(
                    InterPlaneBlock(
                        block_out, c.dropout, c.attn_type,
                        name=f"inter_{i_level}",
                    )(hs, deterministic=deterministic)
                )
            if curr_res in c.hdbf_resolutions:
                tap = nn.Conv(c.out_ch, (1, 1), name=f"hdbf_{curr_res}")
                for pyr, h in zip(pyramids, hs):
                    pyr.append(tap(h))
            if i_level != 0:
                up = Upsample(name=f"upsample_{i_level}")
                hs = [up(h) for h in hs]
                curr_res *= 2

        norm = Norm(name="norm_out")
        conv_out = nn.Conv(c.out_ch, (3, 3), padding=1, name="conv_out")
        for pyr, h in zip(pyramids, hs):
            pyr.append(conv_out(nonlinearity(norm(h))))
        return pyramids


class TriplaneAutoencoder(nn.Module):
    """Autoencoder3D (:877-936): per-plane quant/post-quant 1x1 convs; decode
    slices the channel-concat latent z into embed_dim thirds in order
    [xy | xz | yz] (:907-916 — note the slice order differs from the plane
    tuple order; pinned here exactly)."""

    cfg: DDConfig
    embed_dim: int = 64

    def setup(self):
        assert self.cfg.double_z
        self.encoder = TriplaneEncoder(self.cfg)
        self.decoder = TriplaneDecoder(self.cfg)
        e = self.embed_dim
        self.quant_xy = nn.Dense(2 * e)
        self.quant_yz = nn.Dense(2 * e)
        self.quant_xz = nn.Dense(2 * e)
        self.post_xy = nn.Dense(self.cfg.z_channels)
        self.post_yz = nn.Dense(self.cfg.z_channels)
        self.post_xz = nn.Dense(self.cfg.z_channels)

    def encode(self, planes, *, deterministic: bool = True):
        """planes: (xy, yz, xz) NHWC -> three DiagonalGaussians."""
        xy, yz, xz = self.encoder(planes, deterministic=deterministic)
        return (
            DiagonalGaussian.from_moments(self.quant_xy(xy)),
            DiagonalGaussian.from_moments(self.quant_yz(yz)),
            DiagonalGaussian.from_moments(self.quant_xz(xz)),
        )

    def decode(self, z: jnp.ndarray, *, deterministic: bool = True):
        """z: (b, h, w, 3*embed_dim) channel-concat [xy | xz | yz] ->
        (pyr_xy, pyr_yz, pyr_xz)."""
        e = self.embed_dim
        xy = self.post_xy(z[..., :e])
        xz = self.post_xz(z[..., e : 2 * e])
        yz = self.post_yz(z[..., 2 * e :])
        return self.decoder((xy, yz, xz), deterministic=deterministic)

    def __call__(self, planes, rng, sample_posterior=True, *, deterministic=True):
        p_xy, p_yz, p_xz = self.encode(planes, deterministic=deterministic)
        if sample_posterior:
            r1, r2, r3 = jax.random.split(rng, 3)
            xy, yz, xz = p_xy.sample(r1), p_yz.sample(r2), p_xz.sample(r3)
        else:
            xy, yz, xz = p_xy.mode(), p_yz.mode(), p_xz.mode()
        z = jnp.concatenate([xy, xz, yz], axis=-1)
        dec = self.decode(z, deterministic=deterministic)
        return dec, (p_xy, p_yz, p_xz)
