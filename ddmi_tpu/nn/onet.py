"""Convolutional Occupancy Network (standalone ONet).

TPU-native rewrite of convocc/src/conv_onet/models/{__init__,decoder}.py:
`LocalDecoder` conditions a point-wise FC-ResNet on plane/grid features
sampled at the query points (bilinear/trilinear, border, align_corners=True),
`ConvONet` = encoder + decoder -> occupancy logits.  Used by the reference as
the standalone occupancy model the convocc subsystem pretrains
(conv_onet/training.py BCE loss + IoU eval; see ddmi_tpu.domains.onet)."""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from ddmi_tpu.nn.inr import sample_plane_coords
from ddmi_tpu.nn.stylegan import ResnetBlockFC
from ddmi_tpu.ops.grid_sample import grid_sample_2d, grid_sample_3d


def normalize_3d_coordinate(p: jnp.ndarray, padding: float = 0.1):
    """(b, n, 3) unit-cube points -> (0, 1) (convocc common.py)."""
    p_nor = p / (1 + padding + 1e-5) + 0.5
    return jnp.clip(p_nor, 0.0, 1 - 1e-5)


class LocalDecoder(nn.Module):
    """decoder.py LocalDecoder: fc_p + n_blocks ResnetBlockFC, each block
    additively conditioned by fc_c(plane features at p)."""

    c_dim: int = 32
    hidden_size: int = 256
    n_blocks: int = 5
    leaky: bool = False
    padding: float = 0.1

    @nn.compact
    def __call__(self, p: jnp.ndarray, c_planes: Dict[str, jnp.ndarray]):
        """p (b, n, 3); c_planes {'xz'|'xy'|'yz': (b,r,r,c), 'grid':
        (b,d,h,w,c)} -> occupancy logits (b, n)."""
        c = 0.0
        if "grid" in c_planes:
            pn = 2.0 * normalize_3d_coordinate(p, self.padding) - 1.0
            c = c + grid_sample_3d(c_planes["grid"], pn, align_corners=True)
        for k in ("xz", "xy", "yz"):
            if k in c_planes:
                coords = sample_plane_coords(p, k)
                c = c + grid_sample_2d(
                    c_planes[k], coords, align_corners=True,
                    padding_mode="border",
                )

        net = nn.Dense(self.hidden_size, name="fc_p")(p)
        act = (lambda x: jax.nn.leaky_relu(x, 0.2)) if self.leaky else jax.nn.relu
        for i in range(self.n_blocks):
            if self.c_dim != 0:
                net = net + nn.Dense(self.hidden_size, name=f"fc_c{i}")(c)
            net = ResnetBlockFC(self.hidden_size, name=f"block{i}")(net)
        out = nn.Dense(1, name="fc_out")(act(net))
        return out.squeeze(-1)


class ConvONet(nn.Module):
    """encoder (LocalPoolPointnet / LocalVoxelEncoder) + LocalDecoder."""

    encoder: Any
    decoder: Any

    def encode_inputs(self, inputs):
        return self.encoder(inputs)

    def decode(self, p, c_planes):
        return self.decoder(p, c_planes)

    def __call__(self, p: jnp.ndarray, inputs: jnp.ndarray) -> jnp.ndarray:
        return self.decode(p, self.encode_inputs(inputs))
