"""Triplane ADM UNet for video latent diffusion.

TPU-native redesign of UNetModel_Triplane (openaimodel.py:796-1221): the
denoiser input is a 1D token sequence [xy | xt | yt]; every UNet stage runs
the SAME 2D conv/res/attention weights on each plane, then flattens and
applies cross-plane 1D multi-head attention (input_attns/mid_attn/
output_attns).  Downsampling shrinks both axes of every plane (the t axis of
xt/yt included — parity with the reference's per-plane 2D Downsample)."""

from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ddmi_tpu.core.config import UNetConfig
from ddmi_tpu.nn.attention1d import AttnBlock1D
from ddmi_tpu.nn.unet import (
    AttentionBlock,
    Downsample,
    ResBlock,
    Upsample,
    _num_heads,
    timestep_embedding,
)


def split_tokens(h, shapes):
    """(b, n, c) -> three NHWC planes given [(h1,w1),(h2,w2),(h3,w3)]."""
    b, _, c = h.shape
    out = []
    ofs = 0
    for hh, ww in shapes:
        out.append(h[:, ofs : ofs + hh * ww].reshape(b, hh, ww, c))
        ofs += hh * ww
    return out


def cat_tokens(planes):
    b, c = planes[0].shape[0], planes[0].shape[-1]
    return jnp.concatenate([p.reshape(b, -1, c) for p in planes], axis=1)


def plane_map(fn, planes, emb=None):
    """Apply a shared-weight module to each plane, batching the two time
    planes into ONE call when their shapes match (always true for the
    shipped configs: plane_sizes (s1,s2),(s3,s1),(s3,s2) with s1==s2, e.g.
    sky 32/32/16 -> xt and yt are both (16,32)).

    TPU-first motivation: at sampling batch 2 the per-plane convs/norms are
    tiny (2x16x32 rows), so the scan is launch/occupancy-bound — batching
    xt||yt along the batch axis cuts per-plane op instances 3->2 and doubles
    the rows the MXU sees per call.  Mathematically identical per sample
    (conv/GN/attention are batch-parallel); weights stay shared because the
    same module instance is applied (reference shares weights across planes,
    openaimodel.py:796-1221)."""
    xy, xt, yt = planes
    if xt.shape == yt.shape:
        st = jnp.concatenate([xt, yt], axis=0)
        if emb is not None:
            emb2 = jnp.concatenate([emb, emb], axis=0)
            o_xy, o_st = fn(xy, emb), fn(st, emb2)
        else:
            o_xy, o_st = fn(xy), fn(st)
        b = xt.shape[0]
        return [o_xy, o_st[:b], o_st[b:]]
    if emb is not None:
        return [fn(p, emb) for p in planes]
    return [fn(p) for p in planes]


class TriplaneUNet(nn.Module):
    """x: (b, n, c_in) token sequence [xy|xt|yt]; t: (b,) -> (b, n, c_out).

    cfg.plane_sizes = ((s1,s2),(s3,s1),(s3,s2)) — the latent plane shapes
    (reference size1/size2/size3, openaimodel.py:857-859; sky config
    32/32/16)."""

    cfg: UNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t, cond=None, *, deterministic: bool = True,
                 cache=None, return_cache: bool = False):
        c = self.cfg
        mc = c.model_channels
        shapes = [tuple(s) for s in c.plane_sizes]
        assert len(shapes) == 3, "plane_sizes must give 3 (h,w) pairs"

        emb = timestep_embedding(t, mc)
        emb = nn.Dense(mc * 4, dtype=self.dtype, name="time_dense1")(emb)
        emb = jax.nn.silu(emb)
        emb = nn.Dense(mc * 4, dtype=self.dtype, name="time_dense2")(emb)

        def xattn(planes, name):
            cur_shapes = [p.shape[1:3] for p in planes]
            h = AttnBlock1D(num_heads=16, name=name)(cat_tokens(planes))
            return split_tokens(h, cur_shapes)

        if cache is not None:
            # encoder propagation (see nn/unet.py / arXiv:2312.09608):
            # skip the stem + down path, reuse the cached features
            planes = list(cache[0])
            skips = [list(s) for s in cache[1]]
            ds = 2 ** (len(c.channel_mult) - 1)
        else:
            planes = split_tokens(x.astype(self.dtype), shapes)
            # input stem
            conv_in = nn.Conv(
                mc, (3, 3), padding=1, dtype=self.dtype, name="conv_in"
            )
            planes = plane_map(conv_in, planes)
            skips = [planes]
            ds = 1

            for i_level, mult in enumerate(c.channel_mult):
                for i_block in range(c.num_res_blocks):
                    blk = ResBlock(
                        mult * mc, c.dropout, c.use_scale_shift_norm, self.dtype,
                        name=f"down_{i_level}_{i_block}",
                    )
                    planes = plane_map(
                        lambda p, e: blk(p, e, deterministic=deterministic),
                        planes, emb,
                    )
                    if ds in c.attention_resolutions:
                        attn = AttentionBlock(
                            _num_heads(planes[0].shape[-1], c), self.dtype,
                            name=f"down_attn_{i_level}_{i_block}",
                        )
                        planes = plane_map(attn, planes)
                    planes = xattn(planes, f"down_xattn_{i_level}_{i_block}")
                    skips.append(planes)
                if i_level != len(c.channel_mult) - 1:
                    down = Downsample(self.dtype, name=f"downsample_{i_level}")
                    planes = plane_map(down, planes)
                    planes = xattn(planes, f"down_xattn_ds_{i_level}")
                    skips.append(planes)
                    ds *= 2
        out_cache = (tuple(planes), tuple(tuple(s) for s in skips))

        ch = planes[0].shape[-1]
        mid1 = ResBlock(ch, c.dropout, c.use_scale_shift_norm, self.dtype,
                        name="mid_block1")
        mid_attn = AttentionBlock(_num_heads(ch, c), self.dtype, name="mid_attn")
        mid2 = ResBlock(ch, c.dropout, c.use_scale_shift_norm, self.dtype,
                        name="mid_block2")
        planes = plane_map(
            lambda p, e: mid2(mid_attn(mid1(p, e, deterministic=deterministic)),
                              e, deterministic=deterministic),
            planes, emb,
        )
        planes = xattn(planes, "mid_xattn")

        for i_level, mult in reversed(list(enumerate(c.channel_mult))):
            for i_block in range(c.num_res_blocks + 1):
                skip = skips.pop()
                planes = [
                    jnp.concatenate([p, s], axis=-1)
                    for p, s in zip(planes, skip)
                ]
                blk = ResBlock(
                    mult * mc, c.dropout, c.use_scale_shift_norm, self.dtype,
                    name=f"up_{i_level}_{i_block}",
                )
                planes = plane_map(
                    lambda p, e: blk(p, e, deterministic=deterministic),
                    planes, emb,
                )
                if ds in c.attention_resolutions:
                    attn = AttentionBlock(
                        _num_heads(planes[0].shape[-1], c), self.dtype,
                        name=f"up_attn_{i_level}_{i_block}",
                    )
                    planes = plane_map(attn, planes)
                if i_level != 0 and i_block == c.num_res_blocks:
                    # the reference puts the Upsample INSIDE the level's last
                    # output block (openaimodel.py:1064-1079), so the
                    # cross-plane attention that follows each block
                    # (output_attns, :1189-1209) runs on the UPSAMPLED planes
                    up = Upsample(self.dtype, name=f"upsample_{i_level}")
                    planes = plane_map(up, planes)
                    ds //= 2
                planes = xattn(planes, f"up_xattn_{i_level}_{i_block}")
        assert not skips

        norm = nn.GroupNorm(32, epsilon=1e-5, name="norm_out")
        conv_out = nn.Conv(
            c.out_channels, (3, 3), padding=1,
            kernel_init=nn.initializers.zeros, name="conv_out",
        )
        planes = plane_map(
            lambda p: conv_out(jax.nn.silu(norm(p)).astype(jnp.float32)), planes
        )
        out = cat_tokens(planes)
        if return_cache:
            return out, out_cache
        return out
