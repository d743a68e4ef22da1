"""PointNet++ encoder (convocc/src/encoder/pointnetpp.py equivalent).

Set-abstraction (FPS -> ball query -> grouped MLP -> max pool) and feature
propagation (3-NN inverse-distance interpolation) with the reference's
exact layer plan (pointnetpp.py:105-129): SA(512, r=0.2, k=32, [64,64,128])
-> SA(128, r=0.4, k=64, [128,128,256]) -> SA(group_all, [256,512,1024]) ->
FP[256,256] -> FP[256,128] -> FP[128,128,c_dim].

TPU-first reformulation of the CUDA idioms:
  * farthest-point sampling is a `lax.fori_loop` carrying the running
    min-distance field — static trip count, fully batched, no host sync
    (reference: python loop of masked scatter writes, pointnetpp.py:188-209);
  * ball query is a masked `lax.top_k` over an index key (out-of-radius
    points get key N and clamp to the group's first member) — one fused
    pass, replacing the full-N sort (pointnetpp.py:212-232);
  * tensors stay channels-LAST ((b, n, c)) so the grouped MLPs are plain
    Dense matmuls on the MXU; the reference permutes to channels-first for
    Conv2d/1x1.

Deviations (documented):
  * FPS starts from point 0 instead of `torch.randint` — deterministic
    under jit; the reference's random start only permutes which of the
    equivalent farthest-point sets is chosen.
  * BatchNorm uses current-batch statistics with no running averages
    (same policy as losses/gan.py::SyncBatchNorm — stats are global under
    SPMD sharding).  No pretrained checkpoints exist for this encoder in
    the reference (it is registered but selected by no shipped config), so
    there is no running-stats state to import.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def square_distance(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Pairwise squared Euclidean distance: (b, n, c), (b, m, c) -> (b, n, m)."""
    d = -2.0 * jnp.einsum("bnc,bmc->bnm", src, dst)
    d += jnp.sum(src**2, -1)[:, :, None]
    d += jnp.sum(dst**2, -1)[:, None, :]
    return d


def index_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather rows of (b, n, c) by an index tensor (b, ...) -> (b, ..., c)."""
    return jnp.take_along_axis(
        points.reshape(points.shape[0], 1, points.shape[1], points.shape[2]),
        idx.reshape(idx.shape[0], -1, 1, 1).astype(jnp.int32),
        axis=2,
    ).reshape(*idx.shape, points.shape[-1])


def farthest_point_sample(xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    """Greedy farthest-point sampling: (b, n, 3) -> (b, npoint) int32 indices.

    Carries (selected indices, per-point min distance to the selected set,
    current farthest index) through a static-count fori_loop.
    """
    b, n, _ = xyz.shape
    init = (
        jnp.zeros((b, npoint), jnp.int32),
        jnp.full((b, n), jnp.inf, jnp.float32),
        jnp.zeros((b,), jnp.int32),  # deterministic start (deviation above)
    )

    def body(i, carry):
        cents, mind, far = carry
        cents = cents.at[:, i].set(far)
        centroid = jnp.take_along_axis(xyz, far[:, None, None], axis=1)
        d = jnp.sum((xyz - centroid) ** 2, -1).astype(jnp.float32)
        mind = jnp.minimum(mind, d)
        return cents, mind, jnp.argmax(mind, -1).astype(jnp.int32)

    cents, _, _ = jax.lax.fori_loop(0, npoint, body, init)
    return cents


def query_ball_point(radius: float, nsample: int, xyz: jnp.ndarray,
                     new_xyz: jnp.ndarray) -> jnp.ndarray:
    """Indices of up to nsample points within `radius` of each query:
    (b, n, 3), (b, s, 3) -> (b, s, nsample) int32.  Like the reference,
    groups take the nsample LOWEST-index in-radius points and pad short
    groups with the group's first member (pointnetpp.py:212-232)."""
    n = xyz.shape[1]
    sqr = square_distance(new_xyz, xyz)
    key = jnp.where(sqr > radius**2, n, jnp.arange(n)[None, None, :])
    # nsample smallest keys == top_k of the negated keys
    neg_small, _ = jax.lax.top_k(-key, nsample)
    group_idx = -neg_small
    first = group_idx[:, :, :1]
    return jnp.where(group_idx == n, first, group_idx).astype(jnp.int32)


class _BNorm(nn.Module):
    """Batch-stats normalization over all non-channel axes (no running
    averages; see module docstring)."""

    @nn.compact
    def __call__(self, x):
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(x, axes, keepdims=True)
        var = jnp.var(x, axes, keepdims=True)
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return (x - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias


class PointNetSetAbstraction(nn.Module):
    """FPS + ball-query grouping + shared MLP + per-group max pool
    (pointnetpp.py:10-51).  Channels-last: xyz (b, n, 3), feats (b, n, d)
    -> (new_xyz (b, s, 3), new_feats (b, s, mlp[-1]))."""

    npoint: Optional[int]
    radius: Optional[float]
    nsample: Optional[int]
    mlp: Sequence[int]
    group_all: bool = False

    @nn.compact
    def __call__(self, xyz, feats):
        if self.group_all:
            new_xyz = jnp.zeros((xyz.shape[0], 1, xyz.shape[2]), xyz.dtype)
            grouped = xyz[:, None]  # (b, 1, n, 3)
            if feats is not None:
                grouped = jnp.concatenate([grouped, feats[:, None]], -1)
        else:
            fps_idx = farthest_point_sample(xyz, self.npoint)
            new_xyz = index_points(xyz, fps_idx)
            idx = query_ball_point(self.radius, self.nsample, xyz, new_xyz)
            grouped = index_points(xyz, idx) - new_xyz[:, :, None, :]
            if feats is not None:
                grouped = jnp.concatenate(
                    [grouped, index_points(feats, idx)], -1
                )
        h = grouped
        for i, c in enumerate(self.mlp):
            h = nn.Dense(c, name=f"mlp_{i}")(h)
            h = nn.relu(_BNorm(name=f"bn_{i}")(h))
        return new_xyz, jnp.max(h, axis=2)


class PointNetFeaturePropagation(nn.Module):
    """Inverse-distance 3-NN feature upsampling + shared MLP
    (pointnetpp.py:53-103).  xyz1 (b, n, 3) dense, xyz2 (b, s, 3) sparse."""

    mlp: Sequence[int]

    @nn.compact
    def __call__(self, xyz1, xyz2, feats1, feats2):
        n = xyz1.shape[1]
        s = xyz2.shape[1]
        if s == 1:
            interp = jnp.repeat(feats2, n, axis=1)
        else:
            d = square_distance(xyz1, xyz2)
            neg_d, idx = jax.lax.top_k(-d, 3)  # 3 nearest
            w = 1.0 / (-neg_d + 1e-8)
            w = w / jnp.sum(w, -1, keepdims=True)
            interp = jnp.sum(index_points(feats2, idx) * w[..., None], axis=2)
        h = (interp if feats1 is None
             else jnp.concatenate([feats1, interp], -1))
        for i, c in enumerate(self.mlp):
            h = nn.Dense(c, name=f"mlp_{i}")(h)
            h = nn.relu(_BNorm(name=f"bn_{i}")(h))
        return h


class PointNetPlusPlus(nn.Module):
    """Full encoder (pointnetpp.py:105-129): three set abstractions down,
    three feature propagations back up to per-point c_dim features.
    Input (b, n, 3) -> (xyz (b, n, 3), features (b, n, c_dim))."""

    dim: Optional[int] = None   # accepted for registry parity; unused, as
    c_dim: int = 128            # in the reference (pointnetpp.py:106)
    padding: float = 0.1

    @nn.compact
    def __call__(self, xyz: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        l0_xyz, l0_feats = xyz, xyz
        l1_xyz, l1_feats = PointNetSetAbstraction(
            512, 0.2, 32, (64, 64, 128), name="sa1")(l0_xyz, l0_feats)
        l2_xyz, l2_feats = PointNetSetAbstraction(
            128, 0.4, 64, (128, 128, 256), name="sa2")(l1_xyz, l1_feats)
        l3_xyz, l3_feats = PointNetSetAbstraction(
            None, None, None, (256, 512, 1024), group_all=True,
            name="sa3")(l2_xyz, l2_feats)
        l2_feats = PointNetFeaturePropagation(
            (256, 256), name="fp3")(l2_xyz, l3_xyz, l2_feats, l3_feats)
        l1_feats = PointNetFeaturePropagation(
            (256, 128), name="fp2")(l1_xyz, l2_xyz, l1_feats, l2_feats)
        l0_feats = PointNetFeaturePropagation(
            (128, 128, self.c_dim), name="fp1")(
                l0_xyz, l1_xyz, None, l1_feats)
        return xyz, l0_feats
