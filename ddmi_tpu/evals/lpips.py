"""LPIPS perceptual distance in Flax.

TPU-native port of losses/lpips.py:55-165 (VGG16 backbone, channel-unit-
normalized feature diffs, learned per-layer 1x1 'lin' weights, spatial mean,
layer sum).  Weights are not bundled (zero-egress environment; the reference
downloads them at runtime, lpips.py:26-53): load a torchvision-format VGG16
state_dict + LPIPS lin checkpoint with `load_torch_weights`, or run with
random init for smoke tests.

Input convention: NHWC in [-1, 1] (same as the reference's expected range).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# VGG16 'features' layout: (conv channel, 'M' = maxpool); slice boundaries
# after relu1_2 / relu2_2 / relu3_3 / relu4_3 / relu5_3.
_VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512]
_SLICE_ENDS = (2, 4, 7, 10, 13)  # conv counts at each tap
_N_TAPS = 5

# Input scaling constants (lpips ScalingLayer)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    """VGG16 conv trunk emitting the five LPIPS tap activations.

    `dtype` is the conv compute dtype (params stay fp32 via flax's param
    dtype): bfloat16 matches the reference training LPIPS under
    `accelerator.autocast()` (tools/d2c_vae/image.py:184 wraps the whole
    loss incl. LPIPS in fp16 autocast); the unit-normalization and
    reductions downstream stay fp32 either way."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        taps = []
        conv_idx = 0
        x = x.astype(self.dtype)
        for v in _VGG16_CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(
                    v, (3, 3), padding=1, dtype=self.dtype,
                    name=f"conv{conv_idx}",
                )(x)
                x = jax.nn.relu(x)
                conv_idx += 1
                if conv_idx in _SLICE_ENDS:
                    taps.append(x)
        return taps


class LPIPS(nn.Module):
    """Full LPIPS: d(x, y) per sample, shape (b,)."""

    use_dropout: bool = True  # parity: lin layers include dropout at train; eval none
    dtype: jnp.dtype = jnp.float32  # VGG trunk compute dtype (see VGG16Features)

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        shift = jnp.asarray(_SHIFT).reshape(1, 1, 1, 3)
        scale = jnp.asarray(_SCALE).reshape(1, 1, 1, 3)
        net = VGG16Features(dtype=self.dtype, name="vgg")
        fx = net((x - shift) / scale)
        fy = net((y - shift) / scale)

        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            a = a.astype(jnp.float32)
            b = b.astype(jnp.float32)
            a = a / jnp.sqrt(jnp.sum(a**2, axis=-1, keepdims=True) + 1e-10)
            b = b / jnp.sqrt(jnp.sum(b**2, axis=-1, keepdims=True) + 1e-10)
            diff = (a - b) ** 2
            w = self.param(
                f"lin{i}",
                nn.initializers.ones,
                (diff.shape[-1],),
            )
            # 1x1 conv over channel diffs (reference NetLinLayer)
            val = jnp.sum(diff * w.reshape(1, 1, 1, -1), axis=-1)
            total = total + jnp.mean(val, axis=(1, 2))
        return total


class PerceptualLoss:
    """LPIPS apply bundled with its frozen params.

    The params pytree MUST flow into jitted losses as an ARGUMENT: a
    closed-over VGG16 (14.7M params, 59 MB fp32) is embedded into the
    lowered program as dense MLIR constants — measured 118 MB of MLIR text
    on the video stage-1 step, enough to OOM-SIGKILL the TPU compile
    helper.  Callers inside jit use `.apply(params, target, output)` with
    params threaded from outside; the legacy 2-arg `__call__` (which embeds)
    remains for tiny-config tests and eval-time one-offs."""

    def __init__(self, apply_fn, params):
        self._apply = apply_fn
        self.params = params

    def apply(self, params, target, output):
        return self._apply(params, target, output)

    def __call__(self, target, output):
        return self._apply(self.params, target, output)


def load_torch_weights(
    vgg_state: Dict[str, Any], lin_state: Optional[Dict[str, Any]] = None
) -> Dict[str, Any]:
    """Convert torchvision VGG16 `features.*` weights + LPIPS `lin*` weights
    (the reference's vgg_lpips checkpoint format) into LPIPS Flax params."""

    def to_np(t):
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)

    params: Dict[str, Any] = {"vgg": {}}
    conv_idx = 0
    layer_idx = 0
    for v in _VGG16_CFG:
        if v == "M":
            layer_idx += 1
            continue
        w = to_np(vgg_state[f"features.{layer_idx}.weight"])  # (out,in,kh,kw)
        b = to_np(vgg_state[f"features.{layer_idx}.bias"])
        params["vgg"][f"conv{conv_idx}"] = {
            "kernel": np.transpose(w, (2, 3, 1, 0)),
            "bias": b,
        }
        conv_idx += 1
        layer_idx += 2  # conv + relu
    if lin_state is not None:
        for i in range(_N_TAPS):
            key = f"lin{i}.model.1.weight"
            if key in lin_state:
                w = to_np(lin_state[key])  # (1, C, 1, 1)
                params[f"lin{i}"] = w.reshape(-1)
    return params
