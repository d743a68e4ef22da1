"""Fused bias + activation ops.

The reference implements bias-add + LeakyReLU(0.2) * sqrt(2) as a CUDA kernel
with a hand-written backward (models/d2c_vae/op/fused_bias_act_kernel.cu,
op/fused_act.py:10-86).  Under XLA these are trivial elementwise expressions
that fuse into adjacent matmuls/convs automatically; no kernel needed.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

SQRT2 = math.sqrt(2.0)


def fused_leaky_relu(
    x: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    negative_slope: float = 0.2,
    scale: float = SQRT2,
) -> jnp.ndarray:
    """bias-add (broadcast over trailing channel dim) + LeakyReLU * scale."""
    if bias is not None:
        x = x + bias.reshape((1,) * (x.ndim - 1) + (-1,))
    return jax.nn.leaky_relu(x, negative_slope) * scale


def scaled_leaky_relu(x: jnp.ndarray, negative_slope: float = 0.2) -> jnp.ndarray:
    """LeakyReLU * sqrt(2) without bias (blocks.py:176-184)."""
    return jax.nn.leaky_relu(x, negative_slope) * SQRT2
