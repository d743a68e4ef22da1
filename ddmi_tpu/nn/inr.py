"""INR (implicit neural representation) heads — the coordinate MLPs that turn
HDBF planes into signals at arbitrary coordinates.

TPU-native redesign of models/d2c_vae/mlp.py.  Layout conventions:
  * HDBF planes are NHWC: (b, h, w, latent_dim).
  * Coordinates are token-major: (n, 2)/(n, 3) or (b, n, 2|3); outputs are
    (b, n, out_ch) — callers reshape to images/volumes.  This keeps the whole
    head a stack of batched MXU matmuls over a flat token axis, which is also
    the tiling axis for the Pallas decode kernel.

grid_sample semantics per call site are preserved exactly (SURVEY.md §7):
image INR uses align_corners=False; 3D/video use align_corners=True.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ddmi_tpu.core.config import MLPConfig
from ddmi_tpu.nn.stylegan import (
    ResnetBlockFC,
    SinusoidalPosEmb,
    StyledResBlock,
    ToRGB,
)
from ddmi_tpu.ops.grid_sample import grid_sample_2d
from ddmi_tpu.ops.resample import separable_grid_sample


def singleplane_pe(hdbf: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Image-path positional encoding: border padding, align_corners=False
    (general_utils.py:122-123).  hdbf (b,h,w,c), coords (b,n,2) -> (b,n,c)."""
    return grid_sample_2d(hdbf, coords, align_corners=False, padding_mode="border")


def triplane_pe_add(
    planes: Sequence[jnp.ndarray], coords: Sequence[jnp.ndarray]
) -> jnp.ndarray:
    """3D-path PE: sum of three plane samples, align_corners=True
    (general_utils.py:126-132 mode='add')."""
    out = grid_sample_2d(planes[0], coords[0], align_corners=True)
    out += grid_sample_2d(planes[1], coords[1], align_corners=True)
    out += grid_sample_2d(planes[2], coords[2], align_corners=True)
    return out


def normalize_coordinate(p: jnp.ndarray, padding: float = 0.1, plane: str = "xz"):
    """Project 3D points onto a plane and normalize to (0,1)
    (general_utils.py:71-94)."""
    if plane == "xz":
        xy = p[..., [0, 2]]
    elif plane == "xy":
        xy = p[..., [0, 1]]
    else:  # yz
        xy = p[..., [1, 2]]
    xy = xy / (1 + padding + 10e-6) + 0.5
    return jnp.clip(xy, 0.0, 1 - 10e-6)


def sample_plane_coords(p: jnp.ndarray, plane: str) -> jnp.ndarray:
    """3D points -> [-1,1] grid coords for one plane (general_utils.py:115-119)."""
    return 2.0 * normalize_coordinate(p, plane=plane) - 1.0


class INRImage(nn.Module):
    """Scale-aware image INR head (reference MLP, mlp.py:12-66).

    forward(coords (b|1, n, 2), hdbf [3 x (b,h,w,latent)], si scalar) ->
    (b, n, out_ch).  The scale si modulates all convs via a sinusoidal style
    embedding, and is injected per-pixel as extra channels."""

    cfg: MLPConfig

    @nn.compact
    def __call__(
        self,
        coords: Optional[jnp.ndarray],
        hdbf: List[jnp.ndarray],
        si=1.0,
        grid_1d: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    ):
        """coords: (b|1, n, 2) arbitrary points, OR grid_1d=(xs, ys) 1D
        coordinate vectors for a regular grid — the fast path where every
        grid_sample becomes two MXU matmuls (ops/resample.py); tokens come
        out y-major (row-major over (ys, xs)), matching
        pixel_center_grid(...).reshape(n*n)."""
        assert len(hdbf) == 3, "expects a 3-level HDBF pyramid"
        c = self.cfg
        b = hdbf[0].shape[0]

        if grid_1d is not None:
            xs, ys = grid_1d
            n = xs.shape[0] * ys.shape[0]

            def pe(plane):
                out = separable_grid_sample(
                    plane, xs, ys, align_corners=False, padding_mode="border"
                )
                return out.reshape(b, n, plane.shape[-1])

        else:
            if coords.shape[0] == 1 and b > 1:
                coords = jnp.broadcast_to(coords, (b,) + coords.shape[1:])
            n = coords.shape[1]

            def pe(plane):
                return singleplane_pe(plane, coords)

        si = jnp.asarray(si, jnp.float32)
        scale_inj = jnp.broadcast_to(si.reshape(-1), (b,))
        # style = MLP(sinusoidal(si)) (mlp.py:18-25)
        dim = c.ch // 4
        style = SinusoidalPosEmb(dim)(scale_inj)
        style = nn.Dense(c.ch)(style)
        style = jax.nn.gelu(style)
        style = nn.Dense(c.ch)(style)
        # keep the token path in the planes' dtype (bf16 sampling)
        style = style.astype(hdbf[0].dtype)

        scale_pix = jnp.full((b, n, c.in_ch), si, hdbf[0].dtype)

        x = jnp.concatenate([pe(hdbf[0]), scale_pix], -1)
        x_m = jnp.concatenate([pe(hdbf[1]), scale_pix], -1)
        x_h = jnp.concatenate([pe(hdbf[2]), scale_pix], -1)

        x = StyledResBlock(c.ch, 1, name="net_res1")(x, style)
        x = jnp.concatenate([x, x_m], -1)
        x = StyledResBlock(c.ch, 1, name="net_res2")(x, style)
        x = jnp.concatenate([x, x_h], -1)
        x = StyledResBlock(c.ch, 1, name="net_res3")(x, style)
        x = StyledResBlock(c.ch, 1, name="net_res4")(x, style)
        return ToRGB(c.out_ch, upsample=False, name="torgb")(x, style)


class INR3D(nn.Module):
    """Occupancy INR head (reference MLP3D, mlp.py:69-111).

    forward(coords (b,n,3), hdbf = 3 plane-pyramids [xy, yz, xz] each a list
    of 3 planes) -> occupancy logits (b, n)."""

    cfg: MLPConfig

    @nn.compact
    def __call__(self, coords: jnp.ndarray, hdbf) -> jnp.ndarray:
        xy_hdbf, yz_hdbf, xz_hdbf = hdbf
        assert len(xy_hdbf) == 3
        c = self.cfg

        xy_c = sample_plane_coords(coords, "xy")
        yz_c = sample_plane_coords(coords, "yz")
        xz_c = sample_plane_coords(coords, "xz")
        cs = (xy_c, yz_c, xz_c)

        pe = lambda lvl: triplane_pe_add(
            (xy_hdbf[lvl], yz_hdbf[lvl], xz_hdbf[lvl]), cs
        )
        x, x_m, x_h = pe(0), pe(1), pe(2)

        p = nn.Dense(c.ch, name="net_p")(coords)
        x = p + ResnetBlockFC(c.ch, name="net_res1")(x)
        x = jnp.concatenate([x, x_m], -1)
        x = ResnetBlockFC(c.ch, name="net_res2")(x)
        x = jnp.concatenate([x, x_h], -1)
        x = ResnetBlockFC(c.ch, name="net_res3")(x)
        x = ResnetBlockFC(c.ch, name="net_res4")(x)
        logits = nn.Dense(c.out_ch, name="net_out")(x)
        return logits.squeeze(-1)


def triplane_pe_concat_video(
    planes: Sequence[jnp.ndarray], coords: Dict[str, jnp.ndarray]
) -> jnp.ndarray:
    """Video-path PE: sample xy/yt/xt planes and broadcast-concat into
    (b, t*h*w, 3c) voxel tokens (general_utils.py:134-146 mode='concat');
    token order matches the reference reshape (t-major, then h, then w).

    coords: either token coords per plane ('xy','yt','xt' of shape (b,n,2))
    or the fast path 'axes' = (ts, ys, xs) 1D arrays for a regular grid —
    separable MXU matmuls instead of gathers."""
    xy, yt, xt = planes
    b = xy.shape[0]
    if "axes" in coords:
        ts, ys, xs = coords["axes"]
        t, h, w = ts.shape[0], ys.shape[0], xs.shape[0]
        c = xy.shape[-1]
        f_xy = separable_grid_sample(xy, xs, ys, align_corners=True
                                     ).reshape(b, h * w, -1)
        # yt/xt planes are stored "transposed": the reference's coord dicts
        # put the t value in the grid's x slot (general_utils.py:45-50), so
        # the plane's H axis is indexed by y/x values and W by t values.
        f_yt = separable_grid_sample(yt, ts, ys, align_corners=True
                                     ).transpose(0, 2, 1, 3).reshape(b, t * h, -1)
        f_xt = separable_grid_sample(xt, ts, xs, align_corners=True
                                     ).transpose(0, 2, 1, 3).reshape(b, t * w, -1)
        f_xy = f_xy.reshape(b, 1, h, w, c)
        f_yt = f_yt.reshape(b, t, h, 1, c)
        f_xt = f_xt.reshape(b, t, 1, w, c)
        out = jnp.concatenate(
            [
                jnp.broadcast_to(f_xy, (b, t, h, w, c)),
                jnp.broadcast_to(f_yt, (b, t, h, w, c)),
                jnp.broadcast_to(f_xt, (b, t, h, w, c)),
            ],
            axis=-1,
        )
        return out.reshape(b, t * h * w, 3 * c)
    f_xy = grid_sample_2d(xy, coords["xy"], align_corners=True)  # (b, h*w, c)
    f_yt = grid_sample_2d(yt, coords["yt"], align_corners=True)  # (b, t*h, c)
    f_xt = grid_sample_2d(xt, coords["xt"], align_corners=True)  # (b, t*w, c)
    h, w = coords["hw"]
    t = f_yt.shape[1] // h
    c = xy.shape[-1]
    f_xy = f_xy.reshape(b, 1, h, w, c)
    f_yt = f_yt.reshape(b, t, h, 1, c)
    f_xt = f_xt.reshape(b, t, 1, w, c)
    out = jnp.concatenate(
        [
            jnp.broadcast_to(f_xy, (b, t, h, w, c)),
            jnp.broadcast_to(f_yt, (b, t, h, w, c)),
            jnp.broadcast_to(f_xt, (b, t, h, w, c)),
        ],
        axis=-1,
    )
    return out.reshape(b, t * h * w, 3 * c)


class INRVideo(nn.Module):
    """Video INR head (reference MLPVideo, mlp.py:114-157): voxel tokens from
    xy/yt/xt pyramids -> (b, t*h*w, out_ch)."""

    cfg: MLPConfig

    @nn.compact
    def __call__(self, coords: Dict[str, jnp.ndarray], hdbf) -> jnp.ndarray:
        xy_hdbf, yt_hdbf, xt_hdbf = hdbf
        assert len(xy_hdbf) == 3
        c = self.cfg

        pe = lambda lvl: triplane_pe_concat_video(
            (xy_hdbf[lvl], yt_hdbf[lvl], xt_hdbf[lvl]), coords
        )
        x, x_m, x_h = pe(0), pe(1), pe(2)

        x = ResnetBlockFC(c.ch, name="net_res1")(x)
        x = jnp.concatenate([x, x_m], -1)
        x = ResnetBlockFC(c.ch, name="net_res2")(x)
        x = jnp.concatenate([x, x_h], -1)
        x = ResnetBlockFC(c.ch, name="net_res3")(x)
        x = ResnetBlockFC(name="net_res4")(x)
        x = jax.nn.leaky_relu(x, 0.2)
        return nn.Dense(c.out_ch, name="net_out")(x)


class FreqEmbedding(nn.Module):
    """NeRF frequency embedding x -> (x, sin(2^k x), cos(2^k x), ...)
    (mlp.py:162-196); interleaved per-frequency like the reference."""

    n_freqs: int
    logscale: bool = True

    def __call__(self, x):
        if self.logscale:
            freqs = 2.0 ** jnp.arange(self.n_freqs)
        else:
            freqs = jnp.linspace(1.0, 2.0 ** (self.n_freqs - 1), self.n_freqs)
        out = [x]
        for f in freqs:
            out.append(jnp.sin(f * x))
            out.append(jnp.cos(f * x))
        return jnp.concatenate(out, axis=-1)


class INRNeRF(nn.Module):
    """NeRF MLP (reference MLPNeRF, mlp.py:199-281): D layers with skips,
    sigma head + view-conditioned rgb head."""

    depth: int = 8
    width: int = 256
    in_channels_xyz: int = 96
    in_channels_dir: int = 27
    skips: Tuple[int, ...] = (2, 4, 6)

    @nn.compact
    def __call__(self, x: jnp.ndarray, sigma_only: bool = False):
        W = self.width
        if not sigma_only:
            input_xyz = x[..., : self.in_channels_xyz]
            input_dir = x[..., self.in_channels_xyz :]
        else:
            input_xyz = x

        h = input_xyz
        for i in range(self.depth):
            if i in self.skips:
                h = jnp.concatenate([input_xyz, h], -1)
            h = nn.Dense(W, name=f"xyz_encoding_{i + 1}")(h)
            h = jax.nn.leaky_relu(h, 0.01)
        sigma = nn.Dense(1, name="sigma")(h)
        if sigma_only:
            return sigma

        feat = nn.Dense(W, name="xyz_encoding_final")(h)
        d = jnp.concatenate([feat, input_dir], -1)
        d = nn.Dense(W // 2, name="dir_encoding")(d)
        d = jax.nn.leaky_relu(d, 0.01)
        rgb = jax.nn.sigmoid(nn.Dense(3, name="rgb")(d))
        return jnp.concatenate([rgb, sigma], -1)
