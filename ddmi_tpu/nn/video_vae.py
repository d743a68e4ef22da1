"""Video D2C-VAE: TimeSformer encoder with axis-pooled triplane latents and a
shared-weight conv decoder with cross-plane 1D attention.

TPU-native redesign of models/d2c_vae/autoencoder_vit.py (VITAutoencoder) and
autoencoder_unet.py:944-1144 (VideoDecoder_light).  Layouts: video NTHWC,
planes NHWC, token sequences (b, n, c).

Plane/axis conventions (autoencoder_vit.py:148-186): the xy plane pools the
time axis; the plane the reference labels 'yt' pools the h axis and 'xt'
pools the w axis (the reference's einops labels conflate h/w — they are equal
in every config; we reproduce the exact same dataflow).  The 1D latent token
layout is [xy | xt | yt] (decode slicing, autoencoder_vit.py:188-202), and
the decoded pyramid tuple order is (xy, yt, xt) — both orderings pinned here,
see SURVEY.md §7 hard-part #5."""

from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ddmi_tpu.core.config import DDConfig
from ddmi_tpu.nn.attention1d import AttnBlock1D, AttnBlock1DExpand
from ddmi_tpu.nn.distributions import DiagonalGaussian
from ddmi_tpu.nn.vae import Norm, ResnetBlock, _make_attn, nonlinearity
from ddmi_tpu.nn.vit import TimeSformerEncoder, Transformer


class SharedUpsample(nn.Module):
    """Nearest upsample by per-axis factors + one shared 3x3 conv (the
    reference shares the conv across all three plane calls)."""

    @nn.compact
    def __call__(self, x, scale: Tuple[int, int] = (2, 2)):
        B, H, W, C = x.shape
        x = jax.image.resize(
            x, (B, H * scale[0], W * scale[1], C), method="nearest"
        )
        return nn.Conv(C, (3, 3), padding=1)(x)


def _cat_planes(xy, xt, yt):
    """[xy | xt | yt] token concat (b, n, c)."""
    b, c = xy.shape[0], xy.shape[-1]
    return jnp.concatenate(
        [xy.reshape(b, -1, c), xt.reshape(b, -1, c), yt.reshape(b, -1, c)],
        axis=1,
    )


def _tmap(fn, yt, xt):
    """Apply a shared-weight module to the two time planes as ONE
    batch-stacked call (same rationale as unet_triplane.plane_map: yt/xt
    are identically shaped (b,t,r,c), so stacking halves the per-plane op
    instances and doubles the rows per call; per-sample math unchanged)."""
    st = jnp.concatenate([yt, xt], axis=0)
    out = fn(st)
    b = yt.shape[0]
    return out[:b], out[b:]


def _split_planes(h, xy_shape, xt_shape, yt_shape):
    b, c = h.shape[0], h.shape[-1]
    n1 = xy_shape[0] * xy_shape[1]
    n2 = xt_shape[0] * xt_shape[1]
    xy = h[:, :n1].reshape(b, *xy_shape, c)
    xt = h[:, n1 : n1 + n2].reshape(b, *xt_shape, c)
    yt = h[:, n1 + n2 :].reshape(b, *yt_shape, c)
    return xy, xt, yt


class VideoDecoder(nn.Module):
    """Shared-weight triplane decoder emitting three HDBF pyramids
    (VideoDecoder_light, autoencoder_unet.py:944-1144).  The t axis of the
    xt/yt planes is never upsampled (:1120-1122)."""

    cfg: DDConfig

    @nn.compact
    def __call__(self, planes, *, deterministic: bool = True):
        c = self.cfg
        xy, yt, xt = planes
        num_res = len(c.ch_mult)
        curr_res = c.resolution // 2 ** (num_res - 1)
        assert xy.shape[1] == curr_res, (
            f"latent plane res {xy.shape[1]} != resolution/2^(levels-1) "
            f"= {curr_res}; the ViT encoder emits resolution/8 planes, so "
            f"len(ch_mult) must satisfy 2^(len-1) == 8 x (res ratio)"
        )

        block_in = c.ch * c.ch_mult[num_res - 1]
        conv_in = nn.Conv(block_in, (3, 3), padding=1, name="conv_in")
        xy = conv_in(xy)
        yt, xt = _tmap(conv_in, yt, xt)

        mid1 = ResnetBlock(block_in, c.dropout, name="mid_block1")
        mid_attn2d = _make_attn(block_in, c.attn_type)
        mid2 = ResnetBlock(block_in, c.dropout, name="mid_block2")

        def mid(h):
            h = mid1(h, deterministic=deterministic)
            if mid_attn2d is not None:
                h = mid_attn2d(h)
            return mid2(h, deterministic=deterministic)

        xy = mid(xy)
        yt, xt = _tmap(mid, yt, xt)

        # cross-plane attention at the bottleneck (expand variant, :997)
        h = AttnBlock1DExpand(name="mid_inter_attn")(_cat_planes(xy, xt, yt))
        xy, xt, yt = _split_planes(h, xy.shape[1:3], xt.shape[1:3], yt.shape[1:3])

        hdbf_xy: List[jnp.ndarray] = []
        hdbf_yt: List[jnp.ndarray] = []
        hdbf_xt: List[jnp.ndarray] = []

        for i_level in reversed(range(num_res)):
            block_out = c.ch * c.ch_mult[i_level]
            for i_block in range(c.num_res_blocks + 1):
                blk = ResnetBlock(
                    block_out, c.dropout, name=f"up_{i_level}_{i_block}"
                )
                xy = blk(xy, deterministic=deterministic)
                yt, xt = _tmap(
                    lambda p: blk(p, deterministic=deterministic), yt, xt
                )
                if curr_res in c.attn_resolutions:
                    attn = _make_attn(block_out, c.attn_type)
                    xy = attn(xy)
                    yt, xt = _tmap(attn, yt, xt)

            if curr_res in c.inter_attn_resolutions:
                inter = AttnBlock1DExpand(name=f"inter_attn_{i_level}")
                h = inter(_cat_planes(xy, xt, yt))
                xy, xt, yt = _split_planes(
                    h, xy.shape[1:3], xt.shape[1:3], yt.shape[1:3]
                )

            if curr_res in c.hdbf_resolutions:
                tap = nn.Conv(c.out_ch, (1, 1), name=f"hdbf_{curr_res}")
                hdbf_xy.append(tap(xy))
                t_yt, t_xt = _tmap(tap, yt, xt)
                hdbf_yt.append(t_yt)
                hdbf_xt.append(t_xt)

            if i_level != 0:
                up = SharedUpsample(name=f"upsample_{i_level}")
                xy = up(xy, (2, 2))
                yt, xt = _tmap(lambda p: up(p, (1, 2)), yt, xt)  # t axis fixed
                curr_res *= 2

        norm = Norm(name="norm_out")
        conv_out = nn.Conv(c.out_ch, (3, 3), padding=1, name="conv_out")
        xy = conv_out(nonlinearity(norm(xy)))
        yt, xt = _tmap(lambda p: conv_out(nonlinearity(norm(p))), yt, xt)
        hdbf_xy.append(xy)
        hdbf_yt.append(yt)
        hdbf_xt.append(xt)
        return hdbf_xy, hdbf_yt, hdbf_xt


class VideoAutoencoder(nn.Module):
    """VITAutoencoder: encode video -> 3 plane posteriors; decode 1D latent
    tokens -> 3 HDBF pyramids."""

    cfg: DDConfig
    embed_dim: int = 64
    frames: int = 16

    def setup(self):
        c = self.cfg
        self.down_res = c.resolution // 8  # downsample_factor=3
        patch = 4 if c.resolution == 128 else c.patch_size
        self.encoder = TimeSformerEncoder(
            dim=c.timesformer_channels,
            image_size=c.resolution,
            num_frames=self.frames // c.splits,
            depth=8,
            patch_size=patch,
        )
        tc = c.timesformer_channels
        init = nn.initializers.normal(1.0)
        self.xy_token = self.param("xy_token", init, (1, 1, tc))
        self.xt_token = self.param("xt_token", init, (1, 1, tc))
        self.yt_token = self.param("yt_token", init, (1, 1, tc))
        f = self.frames // c.splits
        self.xy_pos = self.param("xy_pos", init, (1, f + 1, tc))
        self.xt_pos = self.param("xt_pos", init, (1, self.down_res + 1, tc))
        self.yt_pos = self.param("yt_pos", init, (1, self.down_res + 1, tc))
        mk = lambda: Transformer(tc, depth=4, heads=4, dim_head=tc // 8, mlp_dim=512)
        self.xy_quant_attn = mk()
        self.yt_quant_attn = mk()
        self.xt_quant_attn = mk()
        moments = 2 * self.embed_dim if c.double_z else self.embed_dim
        self.pre_xy = nn.Dense(moments)
        self.pre_xt = nn.Dense(moments)
        self.pre_yt = nn.Dense(moments)
        self.post_xy = nn.Dense(c.z_channels)
        self.post_xt = nn.Dense(c.z_channels)
        self.post_yt = nn.Dense(c.z_channels)
        self.decoder = VideoDecoder(c)

    def _pool(self, tokens, cls_token, pos, quant_attn):
        """Append class token, add pos emb, transform, read position 0
        (autoencoder_vit.py:154-158 reads index 0 after attention)."""
        g, n, tc = tokens.shape
        tok = jnp.broadcast_to(cls_token, (g, 1, tc))
        h = jnp.concatenate([tokens, tok], axis=1) + pos[:, : n + 1]
        return quant_attn(h)[:, 0]

    def encode(self, video: jnp.ndarray):
        """video: (b, t, h, w, 3) in [-1,1] -> three DiagonalGaussians
        (xy, yt, xt)."""
        b, t, H, W, _ = video.shape
        r = self.down_res
        x = self.encoder(video)  # (b, t*r*r, tc)
        tc = x.shape[-1]
        x = x.reshape(b, t, r, r, tc)  # (b, t, h, w, c)

        # xy: pool time
        xy = x.transpose(0, 2, 3, 1, 4).reshape(b * r * r, t, tc)
        xy = self._pool(xy, self.xy_token, self.xy_pos, self.xy_quant_attn)
        xy = xy.reshape(b, r, r, tc)
        # 'yt': pool the h axis (reference dataflow, see module docstring)
        yt = x.transpose(0, 1, 3, 2, 4).reshape(b * t * r, r, tc)
        yt = self._pool(yt, self.yt_token, self.yt_pos, self.yt_quant_attn)
        yt = yt.reshape(b, t, r, tc)
        # 'xt': pool the w axis
        xt = x.reshape(b * t * r, r, tc)
        xt = self._pool(xt, self.xt_token, self.xt_pos, self.xt_quant_attn)
        xt = xt.reshape(b, t, r, tc)

        return (
            DiagonalGaussian.from_moments(self.pre_xy(xy)),
            DiagonalGaussian.from_moments(self.pre_yt(yt)),
            DiagonalGaussian.from_moments(self.pre_xt(xt)),
        )

    def decode(self, z: jnp.ndarray, *, deterministic: bool = True):
        """z: (b, n, embed_dim) tokens, layout [xy | xt | yt]
        (autoencoder_vit.py:188-202) -> (hdbf_xy, hdbf_yt, hdbf_xt)."""
        r = self.down_res
        t = self.frames // self.cfg.splits
        b = z.shape[0]
        xy = z[:, : r * r].reshape(b, r, r, -1)
        xt = z[:, r * r : r * (r + t)].reshape(b, t, r, -1)
        yt = z[:, r * (r + t) :].reshape(b, t, r, -1)
        xy = self.post_xy(xy)
        xt = self.post_xt(xt)
        yt = self.post_yt(yt)
        return self.decoder((xy, yt, xt), deterministic=deterministic)

    def __call__(self, video, rng, sample_posterior=True, *, deterministic=True):
        p_xy, p_yt, p_xt = self.encode(video)
        if sample_posterior:
            r1, r2, r3 = jax.random.split(rng, 3)
            xy, yt, xt = p_xy.sample(r1), p_yt.sample(r2), p_xt.sample(r3)
        else:
            xy, yt, xt = p_xy.mode(), p_yt.mode(), p_xt.mode()
        z = _cat_planes(xy, xt, yt)
        dec = self.decode(z, deterministic=deterministic)
        return dec, (p_xy, p_yt, p_xt)
