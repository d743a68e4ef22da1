"""StyleGAN2-style modulated convolution blocks (INR head building blocks).

TPU-native redesign of models/d2c_vae/blocks.py.  The reference implements
per-sample weight modulation with a grouped-conv trick (blocks.py:252-282:
reshape to batch*out channels, groups=batch) which maps poorly to the MXU.
Here we use the algebraically-identical *input-scaling* formulation:

    conv(x, w * s_b) == conv(x * s_b, w)

so modulation scales the input channels per sample, one *shared-weight* conv
(a batched MXU matmul for the 1x1 case) does the heavy lifting, and
demodulation rescales output channels per sample.  Numerics match the
reference formulation exactly (same epsilon placement, blocks.py:249).

All modules accept either NHWC planes (b,h,w,c) or token layouts (b,n,c) —
kernel_size==1 ops are pure dense contractions either way, which is what the
image INR head uses exclusively (mlp.py:28-32 passes kernel_size=1).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ddmi_tpu.ops.fused import fused_leaky_relu, scaled_leaky_relu
from ddmi_tpu.ops.upfirdn import blur as fir_blur
from ddmi_tpu.ops.upfirdn import make_fir_kernel, upsample_2d


class SinusoidalPosEmb(nn.Module):
    """Sin/cos embedding (blocks.py:11-23)."""

    dim: int

    def __call__(self, x):
        half_dim = self.dim // 2
        emb = math.log(10000) / (half_dim - 1)
        emb = jnp.exp(jnp.arange(half_dim) * -emb)
        emb = x[:, None] * emb[None, :]
        return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


class EqualLinear(nn.Module):
    """Equalized-LR linear (blocks.py:139-168): weight ~ N(0,1)/lr_mul,
    runtime scale (1/sqrt(in))*lr_mul, bias scaled by lr_mul."""

    out_dim: int
    use_bias: bool = True
    bias_init: float = 0.0
    lr_mul: float = 1.0
    activation: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        weight = self.param(
            "weight",
            lambda key, shape: jax.random.normal(key, shape) / self.lr_mul,
            (in_dim, self.out_dim),
        )
        scale = (1 / math.sqrt(in_dim)) * self.lr_mul
        out = x @ (weight * scale)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.constant(self.bias_init), (self.out_dim,)
            )
            if self.activation:
                return fused_leaky_relu(out, bias * self.lr_mul)
            return out + bias * self.lr_mul
        return out


class EqualConv2d(nn.Module):
    """Equalized-LR conv (blocks.py:102-130), NHWC."""

    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k = self.kernel_size
        weight = self.param(
            "weight", nn.initializers.normal(1.0), (k, k, in_ch, self.out_channels)
        )
        scale = 1 / math.sqrt(in_ch * k**2)
        out = jax.lax.conv_general_dilated(
            x,
            weight * scale,
            window_strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.out_channels,)
            )
            out = out + bias
        return out


class ModulatedConv(nn.Module):
    """Style-modulated (de)modulated conv (blocks.py:187-283).

    kernel_size==1 inputs may be (b, ..., c); k>1 requires NHWC planes.
    up/downsample variants include the FIR blur exactly as the reference."""

    out_channels: int
    kernel_size: int
    demodulate: bool = True
    upsample: bool = False
    downsample: bool = False
    blur_kernel: Sequence[int] = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x, style):
        in_ch = x.shape[-1]
        k = self.kernel_size
        weight = self.param(
            "weight",
            nn.initializers.normal(1.0),
            (k, k, in_ch, self.out_channels),
        )
        scale = 1 / math.sqrt(in_ch * k**2)

        # style -> per-sample input-channel gains (bias_init=1, blocks.py:232)
        s = EqualLinear(in_ch, bias_init=1.0, name="modulation")(style)  # (b, in)

        if self.demodulate:
            # demod_bo = rsqrt(sum_khw_i (scale*w*s_bi)^2 + eps)
            w2 = jnp.sum((scale * weight) ** 2, axis=(0, 1))  # (in, out)
            demod = jax.lax.rsqrt(
                jnp.einsum("bi,io->bo", s**2, w2) + 1e-8
            )  # (b, out)
        else:
            demod = None

        bshape = (x.shape[0],) + (1,) * (x.ndim - 2) + (in_ch,)
        xs = x * s.reshape(bshape)

        if k == 1 and not (self.upsample or self.downsample):
            out = jnp.einsum("...i,io->...o", xs, weight[0, 0] * scale)
        elif self.upsample:
            # conv_transpose stride 2 (VALID) then FIR blur (blocks.py:256-267)
            out = jax.lax.conv_transpose(
                xs,
                weight * scale,
                strides=(2, 2),
                padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            factor = 2
            p = (len(self.blur_kernel) - factor) - (k - 1)
            pad0 = (p + 1) // 2 + factor - 1
            pad1 = p // 2 + 1
            out = fir_blur(
                out,
                make_fir_kernel(self.blur_kernel) * (factor**2),
                pad=(pad0, pad1),
            )
        elif self.downsample:
            factor = 2
            p = (len(self.blur_kernel) - factor) + (k - 1)
            pad0 = (p + 1) // 2
            pad1 = p // 2
            xs = fir_blur(xs, make_fir_kernel(self.blur_kernel), pad=(pad0, pad1))
            out = jax.lax.conv_general_dilated(
                xs,
                weight * scale,
                window_strides=(2, 2),
                padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        else:
            pad = k // 2
            out = jax.lax.conv_general_dilated(
                xs,
                weight * scale,
                window_strides=(1, 1),
                padding=((pad, pad), (pad, pad)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        if demod is not None:
            oshape = (x.shape[0],) + (1,) * (out.ndim - 2) + (self.out_channels,)
            out = out * demod.reshape(oshape)
        return out


class NoiseInjection(nn.Module):
    """x + w * N(0,1) per-pixel noise, w zero-init (blocks.py:286-297)."""

    @nn.compact
    def __call__(self, x, noise=None):
        weight = self.param("weight", nn.initializers.zeros, (1,))
        if noise is None:
            shape = x.shape[:-1] + (1,)
            # draw fp32 then cast: a bf16 draw under model.amp is a
            # DIFFERENT realization, not a rounded one (the reference's
            # torch.randn is fp32 even under autocast; see
            # nn/distributions.py::sample)
            noise = jax.random.normal(
                self.make_rng("noise"), shape, jnp.float32
            ).astype(x.dtype)
        return x + weight * noise


class StyledConv(nn.Module):
    """ModulatedConv + noise + fused bias-LeakyReLU (blocks.py:312-356)."""

    out_channels: int
    kernel_size: int
    demodulate: bool = True
    upsample: bool = False
    downsample: bool = False
    activation: Optional[str] = None

    @nn.compact
    def __call__(self, x, style, noise=None):
        out = ModulatedConv(
            self.out_channels,
            self.kernel_size,
            demodulate=self.demodulate,
            upsample=self.upsample,
            downsample=self.downsample,
            name="conv",
        )(x, style)
        out = NoiseInjection(name="noise")(out, noise=noise)
        if self.activation == "sin":
            bias = self.param(
                "bias", nn.initializers.zeros, (self.out_channels,)
            )
            return jnp.sin(out + bias)
        # default path: FusedLeakyReLU with learned per-channel bias
        bias = self.param("act_bias", nn.initializers.zeros, (self.out_channels,))
        return fused_leaky_relu(out, bias)


class ToRGB(nn.Module):
    """1x1 modulated conv (no demod) + bias; optional FIR-upsampled skip
    (blocks.py:390-412)."""

    out_channels: int
    upsample: bool = True

    @nn.compact
    def __call__(self, x, style, skip=None):
        out = ModulatedConv(
            self.out_channels, 1, demodulate=False, name="conv"
        )(x, style)
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        out = out + bias
        if skip is not None:
            if self.upsample:
                skip = upsample_2d(skip, make_fir_kernel((1, 3, 3, 1)))
            out = out + skip
        return out


class ConvLayer(nn.Module):
    """Equal conv + optional blur-resample + activation (blocks.py:453-534).
    Only the pieces the INR path needs (1x1 skip, no resample)."""

    out_channels: int
    kernel_size: int = 1
    activate: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        if x.ndim == 3:  # token layout: 1x1 == equalized dense
            assert self.kernel_size == 1
            out = EqualLinear(
                self.out_channels, use_bias=self.use_bias and not self.activate
            )(x)
        else:
            out = EqualConv2d(
                self.out_channels,
                self.kernel_size,
                padding=(self.kernel_size - 1) // 2,
                use_bias=self.use_bias and not self.activate,
            )(x)
        if self.activate:
            if self.use_bias:
                bias = self.param(
                    "act_bias", nn.initializers.zeros, (self.out_channels,)
                )
                out = fused_leaky_relu(out, bias)
            else:
                out = scaled_leaky_relu(out)
        return out


class StyledResBlock(nn.Module):
    """conv1(1x1) -> conv2(kxk) -> conv3(1x1), each styled; /sqrt(2) residual
    (blocks.py:604-638)."""

    out_channels: int
    kernel_size: int = 1
    demodulate: bool = True
    activation: Optional[str] = None

    @nn.compact
    def __call__(self, x, style):
        out = StyledConv(
            self.out_channels, 1, demodulate=self.demodulate,
            activation=self.activation, name="conv1",
        )(x, style)
        out = StyledConv(
            self.out_channels, self.kernel_size, demodulate=self.demodulate,
            activation=self.activation, name="conv2",
        )(out, style)
        out = StyledConv(
            self.out_channels, 1, demodulate=self.demodulate,
            activation=self.activation, name="conv3",
        )(out, style)

        if x.shape[-1] != self.out_channels:
            skip = ConvLayer(
                self.out_channels, 1, activate=False, use_bias=False, name="skip"
            )(x)
        else:
            skip = x
        return (out + skip) / math.sqrt(2)


class ResnetBlockFC(nn.Module):
    """Fully-connected ResNet block, fc_1 zero-init (blocks.py:673-715)."""

    size_out: Optional[int] = None
    size_h: Optional[int] = None

    @nn.compact
    def __call__(self, x):
        size_in = x.shape[-1]
        size_out = self.size_out or size_in
        size_h = self.size_h or min(size_in, size_out)

        net = nn.Dense(size_h, name="fc_0")(jax.nn.relu(x))
        dx = nn.Dense(size_out, kernel_init=nn.initializers.zeros, name="fc_1")(
            jax.nn.relu(net)
        )
        if size_in == size_out:
            x_s = x
        else:
            x_s = nn.Dense(size_out, use_bias=False, name="shortcut")(x)
        return x_s + dx
