"""PointNet encoder with local pooling onto triplanes.

TPU-native redesign of models/d2c_vae/pointnet.py (LocalPoolPointnet): the
reference's CUDA `torch_scatter.scatter_{max,mean}` becomes
`jax.ops.segment_max/segment_sum` with a static segment count (plane_res^2)
— first-class XLA scatter ops (SURVEY.md §2.7).  Points are (b, n, 3) in the
ONet unit cube; feature planes come out NHWC (b, res, res, c_dim)."""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ddmi_tpu.nn.inr import normalize_coordinate
from ddmi_tpu.nn.stylegan import ResnetBlockFC

PLANES = ("xz", "xy", "yz")


def coordinate2index(xy01: jnp.ndarray, reso: int) -> jnp.ndarray:
    """(b, n, 2) in [0,1) -> flat plane index ix + reso*iy
    (general_utils.py:54-69)."""
    x = (xy01 * reso).astype(jnp.int32)
    return x[..., 0] + reso * x[..., 1]


def _segment_mean(values, index, num_segments):
    """Per-batch scatter-mean: values (n, c), index (n,) -> (num_segments, c)."""
    s = jax.ops.segment_sum(values, index, num_segments)
    cnt = jax.ops.segment_sum(jnp.ones_like(index, values.dtype), index, num_segments)
    return s / jnp.maximum(cnt, 1.0)[:, None]


def _segment_max(values, index, num_segments):
    out = jax.ops.segment_max(values, index, num_segments)
    # empty segments come back as -inf; zero them (torch_scatter uses 0 init
    # via gather-back of untouched cells)
    return jnp.where(jnp.isfinite(out), out, 0.0)


class LocalPoolPointnet(nn.Module):
    """Per-point FC-ResNet stack with max-pool feature exchange through the
    three projected planes; emits {'xz','xy','yz'} NHWC feature planes."""

    c_dim: int = 32
    hidden_dim: int = 256
    plane_resolution: int = 64
    n_blocks: int = 7
    scatter_type: str = "max"
    padding: float = 0.1
    # optional plane-feature UNet refinement (reference pointnet.py:17-18,
    # encoder_kwargs `unet`/`unet_kwargs`; off in all shipped configs)
    unet: bool = False
    unet_depth: int = 4
    unet_start_filts: int = 32

    @nn.compact
    def __call__(self, p: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        b, n, _ = p.shape
        reso = self.plane_resolution
        nseg = reso * reso

        index = {
            k: coordinate2index(
                normalize_coordinate(p, padding=self.padding, plane=k), reso
            )
            for k in PLANES
        }

        pool = _segment_max if self.scatter_type == "max" else _segment_mean

        def pool_local(feats):
            # feats (b, n, c) -> sum over planes of gather(scatter(feats))
            out = 0.0
            for k in PLANES:
                seg = jax.vmap(lambda v, i: pool(v, i, nseg))(feats, index[k])
                out = out + jnp.take_along_axis(
                    seg, index[k][..., None], axis=1
                )
            return out

        net = nn.Dense(2 * self.hidden_dim, name="fc_pos")(p)
        net = ResnetBlockFC(self.hidden_dim, name="block0")(net)
        for i in range(1, self.n_blocks):
            pooled = pool_local(net)
            net = jnp.concatenate([net, pooled], axis=-1)
            net = ResnetBlockFC(self.hidden_dim, name=f"block{i}")(net)
        c = nn.Dense(self.c_dim, name="fc_c")(net)

        fea = {}
        for k in PLANES:
            plane = jax.vmap(lambda v, i: _segment_mean(v, i, nseg))(c, index[k])
            # flat index = ix + reso*iy -> reshape (iy, ix) = (row, col) NHWC
            fea[k] = plane.reshape(b, reso, reso, self.c_dim)
        if self.unet:
            from ddmi_tpu.nn.conv_unet import UNet2D

            # one shared-weight UNet over all three planes (reference shares
            # self.unet across plane calls, pointnet.py generate_plane_features)
            refine = UNet2D(
                self.c_dim, depth=self.unet_depth,
                start_filts=self.unet_start_filts, name="unet",
            )
            stacked = jnp.concatenate([fea[k] for k in PLANES], axis=0)
            out = refine(stacked)
            for i, k in enumerate(PLANES):
                fea[k] = out[i * b : (i + 1) * b]
        return fea


class LocalVoxelEncoder(nn.Module):
    """Voxel-input encoder (convocc/src/encoder/voxels.py LocalVoxelEncoder):
    a 3D conv over the occupancy grid, features projected to triplanes (or
    kept as a 'grid' volume) by mean-pooling along the orthogonal axis — on a
    regular voxel grid the reference's scatter_mean over plane indices IS the
    axis mean when plane_resolution == grid resolution (resized otherwise).
    Optional UNet2D / UNet3D refinement as in the reference."""

    c_dim: int = 32
    plane_resolution: int = 64
    plane_type: Tuple[str, ...] = PLANES
    kernel_size: int = 3
    unet: bool = False
    unet_depth: int = 4
    unet_start_filts: int = 32
    unet3d: bool = False

    @nn.compact
    def __call__(self, voxels: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """voxels: (b, r, r, r) occupancy in {0,1} (axes x, y, z) ->
        {'xz','xy','yz'} NHWC planes and/or 'grid' NDHWC volume."""
        b, r = voxels.shape[0], voxels.shape[1]
        h = voxels[..., None].astype(jnp.float32)
        if self.kernel_size == 1:
            h = nn.Conv(self.c_dim, (1, 1, 1), name="conv_in")(h)
        else:
            h = nn.Conv(
                self.c_dim, (self.kernel_size,) * 3, padding=1, name="conv_in"
            )(h)
        h = jax.nn.relu(h)

        fea: Dict[str, jnp.ndarray] = {}
        # axis conventions: h is (b, x, y, z, c); plane rows/cols follow
        # coordinate2index (col = first plane coord, row = second)
        proj = {
            "xy": h.mean(axis=3),                        # (b, x, y, c)
            "xz": h.mean(axis=2),                        # (b, x, z, c)
            "yz": h.mean(axis=1),                        # (b, y, z, c)
        }
        for k in self.plane_type:
            if k == "grid":
                continue
            # match LocalPoolPointnet layout: (b, row, col, c) with
            # col = first coord -> transpose the projected (b, c0, c1, c)
            plane = jnp.swapaxes(proj[k], 1, 2)
            if self.plane_resolution != r:
                plane = jax.image.resize(
                    plane,
                    (b, self.plane_resolution, self.plane_resolution,
                     self.c_dim),
                    "bilinear",
                )
            fea[k] = plane
        if self.unet and fea:
            from ddmi_tpu.nn.conv_unet import UNet2D

            refine = UNet2D(
                self.c_dim, depth=self.unet_depth,
                start_filts=self.unet_start_filts, name="unet",
            )
            keys = [k for k in self.plane_type if k != "grid"]
            stacked = jnp.concatenate([fea[k] for k in keys], axis=0)
            out = refine(stacked)
            for i, k in enumerate(keys):
                fea[k] = out[i * b : (i + 1) * b]
        if "grid" in self.plane_type:
            g = h
            if self.unet3d:
                from ddmi_tpu.nn.conv_unet import UNet3D

                g = UNet3D(self.c_dim, name="unet3d")(g)
            fea["grid"] = g
        return fea
