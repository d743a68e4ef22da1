"""Fused NeRF-MLP Pallas kernel — the volume-render hot path.

Round-5 decomposition (`bench_nerf_decompose.py`, BASELINE.md): the NeRF
scene is 97% render, and one 4096-ray x 256-sample tile runs at 117% of
cost-analysis HBM — XLA executes the D-deep MLP (INRNeRF,
ddmi_tpu/nn/inr.py:277, reference mlp.py:199-281) as ~11 separate matmuls,
each a full HBM round-trip of (N, 256) activations for ~0.5 FLOP/byte.

Same structural cure as the image INR decode (`inr_decode.py`): all layer
weights fit comfortably in VMEM (<1.5 MB bf16 at W=256, D=8), so the kernel
tiles the point axis and runs the ENTIRE network — xyz trunk with skip
concats, sigma head, feature layer, view-conditioned rgb head — out of
VMEM: one HBM read of the per-point features, one 4-lane-wide write of
(rgb, sigma).

Layout contract (host-side `fold_nerf_params`):
  xp  (N, XP)   xyz-side input  [feat | e_xyz], zero-padded 159 -> XP=256
  dp  (N, DP)   dir-side input  e_dir, zero-padded 27 -> DP=128
  Per-layer Dense kernels are split at the concat boundary
  (inr.py:299 `concat([input_xyz, h])`): rows [0:in_xyz] -> WX[i],
  rows [in_xyz:] -> WH[i]; non-skip layers get a zero WX (never used —
  the unrolled Python loop skips the matmul entirely).

Output: (N, LANE) with lanes [0:3] = sigmoid(rgb), lane 3 = sigma —
caller slices [:, :4].  fp32 accumulation on bf16 weights
(`preferred_element_type`), matching the XLA path's promotion.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SLOPE = 0.01  # leaky_relu negative slope (inr.py:301)


def _pad_to(n: int, m: int) -> int:
    return max(m, ((n + m - 1) // m) * m)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class FoldedNeRF:
    """Padded INRNeRF weights for the fused kernel.

    wx: (D, XP, W)    xyz-side kernels (zero for non-skip layers i>0)
    wh: (D, W, W)     h-side kernels (zero for layer 0)
    b:  (D, W)        trunk biases
    w_sig: (W, LANE)  sigma head, col 0 live
    b_sig: (1, LANE)
    w_fin: (W, W)     xyz_encoding_final
    b_fin: (1, W)
    w_dirf: (W, LANE)   dir_encoding rows [0:W] (feat part)
    w_dird: (DP, LANE)  dir_encoding rows [W:W+27] (dir part), padded
    b_dir: (1, LANE)    dir head width W//2=128 == LANE exactly
    w_rgb: (LANE, LANE) rgb head, cols 0..2 live
    b_rgb: (1, LANE)
    """

    wx: jnp.ndarray
    wh: jnp.ndarray
    b: jnp.ndarray
    w_sig: jnp.ndarray
    b_sig: jnp.ndarray
    w_fin: jnp.ndarray
    b_fin: jnp.ndarray
    w_dirf: jnp.ndarray
    w_dird: jnp.ndarray
    b_dir: jnp.ndarray
    w_rgb: jnp.ndarray
    b_rgb: jnp.ndarray
    depth: int
    width: int
    in_xyz: int
    in_dir: int
    skips: Tuple[int, ...]

    def tree_flatten(self):
        leaves = (
            self.wx, self.wh, self.b, self.w_sig, self.b_sig, self.w_fin,
            self.b_fin, self.w_dirf, self.w_dird, self.b_dir, self.w_rgb,
            self.b_rgb,
        )
        return leaves, (self.depth, self.width, self.in_xyz, self.in_dir,
                        self.skips)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, *aux)


def fold_nerf_params(params, depth: int, width: int, in_xyz: int,
                     in_dir: int, skips: Tuple[int, ...]) -> FoldedNeRF:
    """Split/pad flax INRNeRF params into the kernel layout (bf16)."""
    W = width
    assert W % LANE == 0 and W // 2 == LANE, (
        f"kernel assumes width {W} == 2*{LANE} (dir head width W//2 == LANE)"
    )
    XP = _pad_to(in_xyz, LANE)
    DP = _pad_to(in_dir, LANE)
    bf = jnp.bfloat16

    def k_of(name):
        return params[name]["kernel"], params[name]["bias"]

    wx = jnp.zeros((depth, XP, W), bf)
    wh = jnp.zeros((depth, W, W), bf)
    b = jnp.zeros((depth, W), bf)
    for i in range(depth):
        kern, bias = k_of(f"xyz_encoding_{i + 1}")
        b = b.at[i].set(bias.astype(bf))
        if i == 0:
            assert kern.shape[0] == in_xyz
            wx = wx.at[i, :in_xyz].set(kern.astype(bf))
        elif i in skips:
            assert kern.shape[0] == in_xyz + W
            wx = wx.at[i, :in_xyz].set(kern[:in_xyz].astype(bf))
            wh = wh.at[i].set(kern[in_xyz:].astype(bf))
        else:
            assert kern.shape[0] == W
            wh = wh.at[i].set(kern.astype(bf))

    ks, bs = k_of("sigma")
    w_sig = jnp.zeros((W, LANE), bf).at[:, :1].set(ks.astype(bf))
    b_sig = jnp.zeros((1, LANE), bf).at[0, :1].set(bs.astype(bf))
    kf, bfin = k_of("xyz_encoding_final")
    kd, bd = k_of("dir_encoding")
    assert kd.shape == (W + in_dir, W // 2)
    w_dirf = kd[:W].astype(bf)
    w_dird = jnp.zeros((DP, LANE), bf).at[:in_dir].set(kd[W:].astype(bf))
    kr, br = k_of("rgb")
    w_rgb = jnp.zeros((LANE, LANE), bf).at[:, :3].set(kr.astype(bf))
    b_rgb = jnp.zeros((1, LANE), bf).at[0, :3].set(br.astype(bf))
    return FoldedNeRF(
        wx=wx, wh=wh, b=b.reshape(depth, 1, W),
        w_sig=w_sig, b_sig=b_sig,
        w_fin=kf.astype(bf), b_fin=bfin.reshape(1, W).astype(bf),
        w_dirf=w_dirf, w_dird=w_dird, b_dir=bd.reshape(1, LANE).astype(bf),
        w_rgb=w_rgb, b_rgb=b_rgb,
        depth=depth, width=W, in_xyz=in_xyz, in_dir=in_dir,
        skips=tuple(skips),
    )


def _kernel(xp_ref, dp_ref, wx_ref, wh_ref, b_ref, wsig_ref, bsig_ref,
            wfin_ref, bfin_ref, wdirf_ref, wdird_ref, bdir_ref, wrgb_ref,
            brgb_ref, out_ref, *, depth: int, skips: Tuple[int, ...]):
    f32 = jnp.float32
    xp = xp_ref[...]  # (B, XP) bf16

    def mm(a, w):
        return jax.lax.dot_general(
            a, w, (((1,), (0,)), ((), ())), preferred_element_type=f32
        )

    h = None
    for i in range(depth):
        acc = mm(xp, wx_ref[i]) if (i == 0 or i in skips) else 0.0
        if i > 0:
            acc = acc + mm(h, wh_ref[i])
        acc = acc + b_ref[i].astype(f32)
        h = jnp.where(acc > 0, acc, SLOPE * acc).astype(jnp.bfloat16)

    sigma = mm(h, wsig_ref[...]) + bsig_ref[...].astype(f32)  # (B, LANE)
    feat = (mm(h, wfin_ref[...]) + bfin_ref[...].astype(f32)).astype(
        jnp.bfloat16
    )
    d = (
        mm(feat, wdirf_ref[...])
        + mm(dp_ref[...], wdird_ref[...])
        + bdir_ref[...].astype(f32)
    )
    d = jnp.where(d > 0, d, SLOPE * d).astype(jnp.bfloat16)
    rgb = jax.nn.sigmoid(mm(d, wrgb_ref[...]) + brgb_ref[...].astype(f32))
    lane = jax.lax.broadcasted_iota(jnp.int32, rgb.shape, 1)
    out = jnp.where(lane < 3, rgb, jnp.where(lane == 3, sigma[:, :1], 0.0))
    out_ref[...] = out.astype(out_ref.dtype)


def nerf_mlp_fused(
    folded: FoldedNeRF,
    x: jnp.ndarray,
    block: int = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """x (N, in_xyz + in_dir) -> (N, 4) [rgb(3), sigma] running the whole
    INRNeRF out of VMEM per point tile.  N is padded up to `block`."""
    import os

    if block is None:
        block = int(os.environ.get("DDMI_NERF_FUSED_BLOCK", "4096"))
    f = folded
    N, C = x.shape
    assert C == f.in_xyz + f.in_dir, (C, f.in_xyz, f.in_dir)
    XP = f.wx.shape[1]
    DP = f.w_dird.shape[0]
    n_pad = _pad_to(N, block)
    xp = jnp.zeros((n_pad, XP), jnp.bfloat16)
    xp = xp.at[:N, : f.in_xyz].set(x[:, : f.in_xyz].astype(jnp.bfloat16))
    dp = jnp.zeros((n_pad, DP), jnp.bfloat16)
    dp = dp.at[:N, : f.in_dir].set(x[:, f.in_xyz :].astype(jnp.bfloat16))

    grid = (n_pad // block,)
    row = lambda i: (i, 0)
    full = lambda ref: pl.BlockSpec(ref.shape, lambda i: (0,) * ref.ndim)
    out = pl.pallas_call(
        partial(_kernel, depth=f.depth, skips=f.skips),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, XP), row),
            pl.BlockSpec((block, DP), row),
            full(f.wx), full(f.wh), full(f.b),
            full(f.w_sig), full(f.b_sig),
            full(f.w_fin), full(f.b_fin),
            full(f.w_dirf), full(f.w_dird), full(f.b_dir),
            full(f.w_rgb), full(f.b_rgb),
        ],
        out_specs=pl.BlockSpec((block, LANE), row),
        out_shape=jax.ShapeDtypeStruct((n_pad, LANE), jnp.float32),
        interpret=interpret,
    )(xp, dp, f.wx, f.wh, f.b, f.w_sig, f.b_sig, f.w_fin, f.b_fin,
      f.w_dirf, f.w_dird, f.b_dir, f.w_rgb, f.b_rgb)
    return out[:N, :4]
