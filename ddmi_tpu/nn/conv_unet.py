"""Plane/volume feature U-Nets for the convocc encoders.

TPU-native rewrites of convocc/src/encoder/unet.py (2D, Ronneberger-style
down/up with concat or add merge) and unet3d.py (3D variant) — the optional
`unet`/`unet3d` refinement stages of LocalPoolPointnet / LocalVoxelEncoder
(pointnet.py:17-20, voxels.py:37-46).  NHWC / NDHWC, plain Flax convs (XLA
tiles 2D/3D convs onto the MXU directly; the reference's transposed-conv
upsampling becomes resize + conv, the standard artifact-free equivalent)."""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class UNet2D(nn.Module):
    """Feature-plane UNet (encoder/unet.py:117-233): `depth` levels, channel
    width start_filts * 2^level, merge by concat or add."""

    num_classes: int
    depth: int = 5
    start_filts: int = 64
    merge_mode: str = "concat"

    @nn.compact
    def __call__(self, x):
        skips = []
        h = x
        for i in range(self.depth):
            ch = self.start_filts * (2**i)
            h = nn.Conv(ch, (3, 3), padding=1, name=f"down{i}_conv1")(h)
            h = jax.nn.relu(h)
            h = nn.Conv(ch, (3, 3), padding=1, name=f"down{i}_conv2")(h)
            h = jax.nn.relu(h)
            if i < self.depth - 1:
                skips.append(h)
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
        for i in reversed(range(self.depth - 1)):
            ch = self.start_filts * (2**i)
            B, H, W, _ = h.shape
            h = jax.image.resize(h, (B, 2 * H, 2 * W, h.shape[-1]), "nearest")
            h = nn.Conv(ch, (3, 3), padding=1, name=f"up{i}_upconv")(h)
            skip = skips.pop()
            if self.merge_mode == "concat":
                h = jnp.concatenate([h, skip], axis=-1)
            else:
                h = h + skip
            h = nn.Conv(ch, (3, 3), padding=1, name=f"up{i}_conv1")(h)
            h = jax.nn.relu(h)
            h = nn.Conv(ch, (3, 3), padding=1, name=f"up{i}_conv2")(h)
            h = jax.nn.relu(h)
        return nn.Conv(self.num_classes, (1, 1), name="conv_final")(h)


class UNet3D(nn.Module):
    """Volume UNet (encoder/unet3d.py): f_maps * 2^level channels over
    `num_levels` levels, NDHWC."""

    out_channels: int
    f_maps: int = 32
    num_levels: int = 3

    @nn.compact
    def __call__(self, x):
        skips = []
        h = x
        for i in range(self.num_levels):
            ch = self.f_maps * (2**i)
            h = nn.Conv(ch, (3, 3, 3), padding=1, name=f"down{i}_conv1")(h)
            h = jax.nn.relu(h)
            h = nn.Conv(ch, (3, 3, 3), padding=1, name=f"down{i}_conv2")(h)
            h = jax.nn.relu(h)
            if i < self.num_levels - 1:
                skips.append(h)
                h = nn.max_pool(h, (2, 2, 2), strides=(2, 2, 2))
        for i in reversed(range(self.num_levels - 1)):
            ch = self.f_maps * (2**i)
            B, D, H, W, _ = h.shape
            h = jax.image.resize(
                h, (B, 2 * D, 2 * H, 2 * W, h.shape[-1]), "nearest"
            )
            h = nn.Conv(ch, (3, 3, 3), padding=1, name=f"up{i}_upconv")(h)
            h = jnp.concatenate([h, skips.pop()], axis=-1)
            h = nn.Conv(ch, (3, 3, 3), padding=1, name=f"up{i}_conv1")(h)
            h = jax.nn.relu(h)
            h = nn.Conv(ch, (3, 3, 3), padding=1, name=f"up{i}_conv2")(h)
            h = jax.nn.relu(h)
        return nn.Conv(self.out_channels, (1, 1, 1), name="conv_final")(h)
