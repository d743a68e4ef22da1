"""DiffAugment (color / translation / cutout) for GAN training.

TPU-native redesign of losses/diffaugment.py:9-75: all augmentations are
fixed-shape jnp ops driven by explicit PRNG keys (jit-safe) instead of
host-side randomness."""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def rand_brightness(x, rng):
    return x + (jax.random.uniform(rng, (x.shape[0], 1, 1, 1)) - 0.5)


def rand_saturation(x, rng):
    mean = x.mean(axis=-1, keepdims=True)
    f = jax.random.uniform(rng, (x.shape[0], 1, 1, 1)) * 2
    return (x - mean) * f + mean


def rand_contrast(x, rng):
    mean = x.mean(axis=(1, 2, 3), keepdims=True)
    f = jax.random.uniform(rng, (x.shape[0], 1, 1, 1)) + 0.5
    return (x - mean) * f + mean


def rand_translation(x, rng, ratio: float = 0.125):
    """Random per-sample shift with zero padding (gather formulation)."""
    b, h, w, c = x.shape
    sh, sw = int(h * ratio + 0.5), int(w * ratio + 0.5)
    r1, r2 = jax.random.split(rng)
    tx = jax.random.randint(r1, (b,), -sh, sh + 1)
    ty = jax.random.randint(r2, (b,), -sw, sw + 1)
    pad = jnp.pad(x, ((0, 0), (sh, sh), (sw, sw), (0, 0)))

    def shift_one(img, dx, dy):
        return jax.lax.dynamic_slice(
            img, (sh + dx, sw + dy, 0), (h, w, c)
        )

    return jax.vmap(shift_one)(pad, tx, ty)


def rand_cutout(x, rng, ratio: float = 0.5):
    b, h, w, c = x.shape
    ch, cw = int(h * ratio + 0.5), int(w * ratio + 0.5)
    r1, r2 = jax.random.split(rng)
    cy = jax.random.randint(r1, (b, 1, 1), 0, h + (1 - ch % 2))
    cx = jax.random.randint(r2, (b, 1, 1), 0, w + (1 - cw % 2))
    ys = jnp.arange(h).reshape(1, h, 1)
    xs = jnp.arange(w).reshape(1, 1, w)
    mask = (
        (jnp.abs(ys - cy) >= ch // 2) | (jnp.abs(xs - cx) >= cw // 2)
    ).astype(x.dtype)
    return x * mask[..., None]


_POLICIES = {
    "color": (rand_brightness, rand_saturation, rand_contrast),
    "translation": (rand_translation,),
    "cutout": (rand_cutout,),
}


def diff_augment(
    x: jnp.ndarray, rng: jax.Array,
    policy: Sequence[str] = ("color", "translation", "cutout"),
) -> jnp.ndarray:
    """Apply the augmentation pipeline to NHWC images."""
    for p in policy:
        for fn in _POLICIES[p]:
            rng, sub = jax.random.split(rng)
            x = fn(x, sub)
    return x
