"""Coordinate grids and image-space transforms.

TPU-native counterparts of utils/general_utils.py:27-219.  Coordinates are
channel-last (..., 2) in (x, y) order, matching what grid_sample_2d expects;
grids use pixel-center ranges [-(n-1)/n, (n-1)/n] as the reference trainers do
(tools/d2c_vae/image.py:257, :182).

`multiscale_image_transform` is reformulated for XLA: the host-RNG branchy
version (general_utils.py:151-201) becomes fixed-shape branches selected with
`lax.switch` — each branch computes only its own scale's resize (conditional
execution, not unconditional-compute-then-select), crops use dynamic_slice,
and the whole thing jits.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax


def coord_grid_2d(
    h: int,
    w: int,
    hstart: float = -1.0,
    hend: float = 1.0,
    wstart: float = -1.0,
    wend: float = 1.0,
) -> jnp.ndarray:
    """(1, h, w, 2) grid; channel order (x, y) (general_utils.py:27-35)."""
    xs = jnp.linspace(wstart, wend, w)
    ys = jnp.linspace(hstart, hend, h)
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    return jnp.stack([gx, gy], axis=-1)[None]


def pixel_center_grid(n: int) -> jnp.ndarray:
    """(1, n, n, 2) pixel-center grid over [-(n-1)/n, (n-1)/n]."""
    e = (n - 1) / n
    return coord_grid_2d(n, n, -e, e, -e, e)


def coord_grid_video(
    h: int, w: int, t: int
) -> dict:
    """Triplane coordinate dict for video (general_utils.py:38-52).
    Channel orders match the reference: xy plane -> (x, y); xt -> (t, x);
    yt -> (t, y).  Shapes (1, n1*n2, 2) token-major plus the ('hw') tuple
    consumed by triplane_pe_concat_video.  Pixel-center endpoints
    [-(n-1)/n, (n-1)/n] — the values the reference trainers pass
    (tools/d2c_vae/video.py:167: -255/256 for 256 px, -15/16 for 16 frames),
    not convert_to_coord_format_3d's [-1,1] defaults."""
    e = lambda n: (n - 1) / n
    xs = jnp.linspace(-e(w), e(w), w)
    ys = jnp.linspace(-e(h), e(h), h)
    ts = jnp.linspace(-e(t), e(t), t)

    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    xy = jnp.stack([gx, gy], -1).reshape(1, h * w, 2)
    gx2, gt = jnp.meshgrid(xs, ts, indexing="xy")
    xt = jnp.stack([gt, gx2], -1).reshape(1, t * w, 2)
    gy2, gt2 = jnp.meshgrid(ys, ts, indexing="xy")
    yt = jnp.stack([gt2, gy2], -1).reshape(1, t * h, 2)
    return {"xy": xy, "xt": xt, "yt": yt, "hw": (h, w)}


def symmetrize(x: jnp.ndarray) -> jnp.ndarray:
    """[0,1] -> [-1,1] (general_utils.py:210)."""
    return 2.0 * x - 1.0


def unsymmetrize(x: jnp.ndarray) -> jnp.ndarray:
    return (x + 1.0) / 2.0


def linear_kl_coeff(step, total_step, constant_step, min_coeff, max_coeff):
    """KL warmup coefficient (general_utils.py:218-219), jit-safe."""
    coeff = min_coeff + (max_coeff - min_coeff) * (step - constant_step) / total_step
    return jnp.clip(coeff, min_coeff, max_coeff)


def get_scale_injection(current_res: int, anchor_res: int = 256) -> float:
    return anchor_res / current_res


def resize_antialias(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """Area-correct antialiased resize of NHWC images to (size, size)."""
    B, H, W, C = x.shape
    if H == size and W == size:
        return x  # identity resize: skip the gather XLA would still emit
    return jax.image.resize(
        x, (B, size, size, C), method="linear", antialias=True
    )


def multiscale_image_transform(
    x: jnp.ndarray, rng: jax.Array, size: int = 256, multiscale: bool = True
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Random-scale target + matched coordinate crop (general_utils.py:151-201).

    Args:
      x: (B, H, W, C) in [-1, 1], H = W >= 2*size when multiscale.
      size: crop size == the model's anchor resolution (256 in reference
        configs; scale resolutions are anchored at size, 1.5*size, 2*size —
        identical to the reference's hardwired 256/384/512 at size=256).

    Returns (target, coords, relative_scale, y_anchor):
      target (B,size,size,C); coords (1,size,size,2); relative_scale scalar
      (1, 1/1.5 or 1/2 with p = .3/.3/.4); y_anchor the plain anchor resize.
    """
    res_m = int(size * 1.5)
    res_h = size * 2
    y_anchor = jnp.clip(resize_antialias(x, size), -1.0, 1.0)
    if not multiscale:
        return y_anchor, pixel_center_grid(size), jnp.float32(1.0), y_anchor

    rng_p, rng_i, rng_j, rng_i2, rng_j2 = jax.random.split(rng, 5)

    i = jax.random.randint(rng_i, (), 0, res_h - 1 - size + 1)
    j = jax.random.randint(rng_j, (), 0, res_h - 1 - size + 1)
    i2 = jax.random.randint(rng_i2, (), 0, res_m - 1 - size + 1)
    j2 = jax.random.randint(rng_j2, (), 0, res_m - 1 - size + 1)

    g512 = pixel_center_grid(res_h)
    g384 = pixel_center_grid(res_m)
    g256 = pixel_center_grid(size)

    def crop(img, ii, jj):
        return lax.dynamic_slice(
            img, (0, ii, jj, 0), (img.shape[0], size, size, img.shape[3])
        )

    # The scale resizes live INSIDE the switch branches so XLA executes only
    # the taken scale's resize each step (an unconditional y384+y512 pair
    # costs two full-batch antialias gathers on 70% / 60% of steps for
    # nothing — measured win in BASELINE.md "Training roofline").
    branches = [
        lambda: (y_anchor, g256, jnp.float32(1.0)),
        lambda: (
            crop(jnp.clip(resize_antialias(x, res_m), -1.0, 1.0), i2, j2),
            crop(g384, i2, j2),
            jnp.float32(1 / 1.5),
        ),
        lambda: (
            crop(jnp.clip(resize_antialias(x, res_h), -1.0, 1.0), i, j),
            crop(g512, i, j),
            jnp.float32(0.5),
        ),
    ]
    p = jax.random.uniform(rng_p)
    idx = jnp.where(p <= 0.3, 0, jnp.where(p <= 0.6, 1, 2))
    target, coords, scale = lax.switch(idx, branches)
    return target, coords, scale, y_anchor
