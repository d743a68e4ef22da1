"""Latent distributions.

DiagonalGaussian mirrors the reference's DiagonalGaussianDistribution
(models/ldm/modules/distributions.py:4-41): moments arrive channel-concat
[mean | logvar] on the trailing axis (NHWC; reference concats on dim 1 NCHW),
logvar clamped to [-30, 20]."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class DiagonalGaussian(NamedTuple):
    mean: jnp.ndarray
    logvar: jnp.ndarray

    @classmethod
    def from_moments(cls, moments: jnp.ndarray) -> "DiagonalGaussian":
        mean, logvar = jnp.split(moments, 2, axis=-1)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        return cls(mean, logvar)

    @property
    def std(self) -> jnp.ndarray:
        return jnp.exp(0.5 * self.logvar)

    @property
    def var(self) -> jnp.ndarray:
        return jnp.exp(self.logvar)

    def sample(self, rng: jax.Array) -> jnp.ndarray:
        """Reparameterized sample.  The noise is drawn and the sample formed
        in fp32 REGARDLESS of the moments' dtype, then cast back: the
        reference's `torch.randn(shape)` (distributions.py:16) is fp32 even
        under fp16 autocast (randn is not an autocast op), and drawing in
        bf16 would produce a DIFFERENT random realization — not a rounded
        one — making amp a re-randomization instead of a rounding
        perturbation (round-5 amp-parity finding: z diverged ~100% of its
        std under amp before this; ~1% after)."""
        eps = jax.random.normal(rng, self.mean.shape, jnp.float32)
        s = (
            self.mean.astype(jnp.float32)
            + self.std.astype(jnp.float32) * eps
        )
        return s.astype(self.mean.dtype)

    def mode(self) -> jnp.ndarray:
        return self.mean

    def kl(self, other: "DiagonalGaussian | None" = None) -> jnp.ndarray:
        """KL divergence summed over non-batch dims (distributions.py:24-33)."""
        axes = tuple(range(1, self.mean.ndim))
        if other is None:
            return 0.5 * jnp.sum(
                self.mean**2 + self.var - 1.0 - self.logvar, axis=axes
            )
        return 0.5 * jnp.sum(
            (self.mean - other.mean) ** 2 / other.var
            + self.var / other.var
            - 1.0
            - self.logvar
            + other.logvar,
            axis=axes,
        )

    def nll(self, sample: jnp.ndarray) -> jnp.ndarray:
        axes = tuple(range(1, self.mean.ndim))
        logtwopi = jnp.log(2.0 * jnp.pi)
        return 0.5 * jnp.sum(
            logtwopi + self.logvar + (sample - self.mean) ** 2 / self.var,
            axis=axes,
        )
