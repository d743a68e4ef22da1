"""Patch-GAN adversarial losses for adversarial stage-1 variants
(lossconfig.adversarial, configs/d2c-vae/afhq_gan.yaml:10).

TPU-native redesign of losses/perceptual.py: NLayerDiscriminator{,3D}
(pix2pix PatchGAN) with feature taps; hinge/vanilla d-losses; generator loss
-mean(logits_fake)*w + L1 feature-matching.  The reference's
`nn.SyncBatchNorm` (the only cross-device collective outside DDP,
perceptual.py:199) becomes a plain train-mode batch norm — under jit with a
batch axis sharded over the mesh, the batch-stat reduction is a GLOBAL mean
(XLA inserts the collective), which IS SyncBN semantics."""

from __future__ import annotations

from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def hinge_d_loss(logits_real, logits_fake):
    """(perceptual.py:23-27)."""
    return 0.5 * (
        jnp.mean(jax.nn.relu(1.0 - logits_real))
        + jnp.mean(jax.nn.relu(1.0 + logits_fake))
    )


def vanilla_d_loss(logits_real, logits_fake):
    return 0.5 * (
        jnp.mean(jax.nn.softplus(-logits_real))
        + jnp.mean(jax.nn.softplus(logits_fake))
    )


class SyncBatchNorm(nn.Module):
    """Train-mode batch norm over (batch, *spatial); stats are global under
    SPMD sharding.  No running stats (the reference only trains the disc)."""

    @nn.compact
    def __call__(self, x):
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(x, axes, keepdims=True)
        var = jnp.var(x, axes, keepdims=True)
        c = x.shape[-1]
        scale = self.param(
            "scale", nn.initializers.normal(0.02, jnp.float32), (c,)
        ) + 1.0  # init ~ N(1, 0.02) like weights_init (perceptual.py:190-194)
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return (x - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias


_conv_init = nn.initializers.normal(0.02)


class NLayerDiscriminator(nn.Module):
    """PatchGAN over NHWC images; returns (logits, feature taps)."""

    ndf: int = 64
    n_layers: int = 3

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        feats = []
        h = nn.Conv(self.ndf, (4, 4), strides=2, padding=2,
                    kernel_init=_conv_init)(x)
        h = jax.nn.leaky_relu(h, 0.2)
        feats.append(h)
        nf = self.ndf
        for n in range(1, self.n_layers):
            nf = min(nf * 2, 512)
            h = nn.Conv(nf, (4, 4), strides=2, padding=2,
                        kernel_init=_conv_init)(h)
            h = SyncBatchNorm()(h)
            h = jax.nn.leaky_relu(h, 0.2)
            feats.append(h)
        nf = min(nf * 2, 512)
        h = nn.Conv(nf, (4, 4), strides=1, padding=2, kernel_init=_conv_init)(h)
        h = SyncBatchNorm()(h)
        h = jax.nn.leaky_relu(h, 0.2)
        feats.append(h)
        logits = nn.Conv(1, (4, 4), strides=1, padding=2,
                         kernel_init=_conv_init)(h)
        feats.append(logits)
        return logits, feats


class NLayerDiscriminator3D(nn.Module):
    """3D PatchGAN over NTHWC videos (perceptual.py:251+)."""

    ndf: int = 64
    n_layers: int = 3

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        feats = []
        h = nn.Conv(self.ndf, (4, 4, 4), strides=2, padding=2,
                    kernel_init=_conv_init)(x)
        h = jax.nn.leaky_relu(h, 0.2)
        feats.append(h)
        nf = self.ndf
        for n in range(1, self.n_layers):
            nf = min(nf * 2, 512)
            h = nn.Conv(nf, (4, 4, 4), strides=2, padding=2,
                        kernel_init=_conv_init)(h)
            h = SyncBatchNorm()(h)
            h = jax.nn.leaky_relu(h, 0.2)
            feats.append(h)
        nf = min(nf * 2, 512)
        h = nn.Conv(nf, (4, 4, 4), strides=1, padding=2,
                    kernel_init=_conv_init)(h)
        h = SyncBatchNorm()(h)
        h = jax.nn.leaky_relu(h, 0.2)
        feats.append(h)
        logits = nn.Conv(1, (4, 4, 4), strides=1, padding=2,
                         kernel_init=_conv_init)(h)
        feats.append(logits)
        return logits, feats


class GANLoss2D(nn.Module):
    """LPIPSWithDiscriminator2D equivalent (perceptual.py:130-185): optional
    scale conditioning appended as a constant channel."""

    disc_weight: float = 1.0
    feature_weight: float = 1.0
    disc_loss: str = "hinge"
    ndf: int = 64
    n_layers: int = 3

    def setup(self):
        self.discriminator = NLayerDiscriminator(self.ndf, self.n_layers)

    def _with_cond(self, x, cond):
        if cond is None:
            return x
        b, h, w, _ = x.shape
        c = jnp.full((b, h, w, 1), cond, x.dtype)
        return jnp.concatenate([x, c], -1)

    def generator_loss(self, inputs, reconstructions, cond=None):
        """g_loss = -w * mean(fake logits) + feature matching."""
        logits_real, feats_real = self.discriminator(self._with_cond(inputs, cond))
        logits_fake, feats_fake = self.discriminator(
            self._with_cond(reconstructions, cond)
        )
        g_loss = -self.disc_weight * jnp.mean(logits_fake)
        feat = 0.0
        for fr, ff in zip(feats_real[:-1], feats_fake[:-1]):
            feat = feat + jnp.mean(jnp.abs(ff - jax.lax.stop_gradient(fr)))
        return g_loss + self.disc_weight * feat

    def discriminator_loss(self, inputs, reconstructions, cond=None):
        loss_fn = hinge_d_loss if self.disc_loss == "hinge" else vanilla_d_loss
        logits_real, _ = self.discriminator(
            self._with_cond(jax.lax.stop_gradient(inputs), cond)
        )
        logits_fake, _ = self.discriminator(
            self._with_cond(jax.lax.stop_gradient(reconstructions), cond)
        )
        return 0.5 * loss_fn(logits_real, logits_fake)

    def __call__(self, inputs, reconstructions, optimizer_idx: bool, cond=None):
        if optimizer_idx:
            return self.generator_loss(inputs, reconstructions, cond)
        return self.discriminator_loss(inputs, reconstructions, cond)


class GANLoss3D(nn.Module):
    """Video variant with 2D (per-frame) + 3D discriminators
    (perceptual.py:64-127)."""

    disc_weight: float = 1.0
    disc_loss: str = "hinge"

    def setup(self):
        self.disc2d = NLayerDiscriminator()
        self.disc3d = NLayerDiscriminator3D()

    def __call__(self, inputs, reconstructions, optimizer_idx: bool,
                 frame_idx: Optional[jnp.ndarray] = None):
        """inputs/recons: (b, t, h, w, 3); frame_idx (b,) selects the frame
        for the 2D discriminator."""
        b, t = inputs.shape[:2]
        if frame_idx is None:
            frame_idx = jnp.zeros((b,), jnp.int32)
        sel = lambda v: jnp.take_along_axis(
            v, frame_idx.reshape(b, 1, 1, 1, 1), axis=1
        ).squeeze(1)
        x2, r2 = sel(inputs), sel(reconstructions)

        loss_fn = hinge_d_loss if self.disc_loss == "hinge" else vanilla_d_loss
        if optimizer_idx:
            lf2, f2f = self.disc2d(r2)
            _, f2r = self.disc2d(x2)
            lf3, f3f = self.disc3d(reconstructions)
            _, f3r = self.disc3d(inputs)
            g = -self.disc_weight * (jnp.mean(lf2) + jnp.mean(lf3))
            feat = 0.0
            for fr, ff in zip(f2r[:-1] + f3r[:-1], f2f[:-1] + f3f[:-1]):
                feat = feat + jnp.mean(jnp.abs(ff - jax.lax.stop_gradient(fr)))
            return g + self.disc_weight * feat
        sg = jax.lax.stop_gradient
        lr2, _ = self.disc2d(sg(x2))
        lf2, _ = self.disc2d(sg(r2))
        lr3, _ = self.disc3d(sg(inputs))
        lf3, _ = self.disc3d(sg(reconstructions))
        return 0.5 * (loss_fn(lr2, lf2) + loss_fn(lr3, lf3))
