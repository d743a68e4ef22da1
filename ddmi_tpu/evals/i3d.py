"""I3D (Inflated 3D Inception-v1) for FVD, in Flax.

TPU-native port of evals/fvd/pytorch_i3d.py (the Kinetics-400 I3D used as the
FVD feature network; checkpoint downloaded at evals/fvd/download.py:39-45 —
not bundled here, zero egress).  Video input NTHWC in [-1, 1], 224x224;
returns 400-d logits (the FVD feature space, SURVEY.md §2.9).

All convs use TF-SAME padding (the torch reference re-implements TF padding
by hand; flax 'SAME' matches); BatchNorm is frozen (inference-only params)."""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class Unit3D(nn.Module):
    out_channels: int
    kernel: Tuple[int, int, int] = (1, 1, 1)
    strides: Tuple[int, int, int] = (1, 1, 1)
    use_bn: bool = True
    activation: bool = True
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.out_channels, self.kernel, strides=self.strides,
            padding="SAME", use_bias=self.use_bias, name="conv3d",
        )(x)
        if self.use_bn:
            c = self.out_channels
            mean = self.param("bn_mean", nn.initializers.zeros, (c,))
            var = self.param("bn_var", nn.initializers.ones, (c,))
            scale = self.param("bn_scale", nn.initializers.ones, (c,))
            bias = self.param("bn_bias", nn.initializers.zeros, (c,))
            # eps=1e-5 matches the reference exactly (pytorch_i3d.py:68,
            # BatchNorm3d(eps=1e-5)); 1e-3 here cost 3e-4 relative logit error
            x = (x - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
        if self.activation:
            x = jax.nn.relu(x)
        return x


def _max_pool_same(x, window, strides):
    return nn.max_pool(x, window, strides=strides, padding="SAME")


class InceptionModule(nn.Module):
    channels: Sequence[int]  # [b0, b1a, b1b, b2a, b2b, b3b]

    @nn.compact
    def __call__(self, x):
        c = self.channels
        b0 = Unit3D(c[0], name="Branch_0/Conv3d_0a_1x1")(x)
        b1 = Unit3D(c[1], name="Branch_1/Conv3d_0a_1x1")(x)
        b1 = Unit3D(c[2], (3, 3, 3), name="Branch_1/Conv3d_0b_3x3")(b1)
        b2 = Unit3D(c[3], name="Branch_2/Conv3d_0a_1x1")(x)
        b2 = Unit3D(c[4], (3, 3, 3), name="Branch_2/Conv3d_0b_3x3")(b2)
        b3 = _max_pool_same(x, (3, 3, 3), (1, 1, 1))
        b3 = Unit3D(c[5], name="Branch_3/Conv3d_0b_1x1")(b3)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class I3D(nn.Module):
    num_classes: int = 400

    @nn.compact
    def __call__(self, x):
        """x: (b, t, 224, 224, 3) in [-1, 1] -> (b, num_classes) logits."""
        x = Unit3D(64, (7, 7, 7), (2, 2, 2), name="Conv3d_1a_7x7")(x)
        x = _max_pool_same(x, (1, 3, 3), (1, 2, 2))
        x = Unit3D(64, name="Conv3d_2b_1x1")(x)
        x = Unit3D(192, (3, 3, 3), name="Conv3d_2c_3x3")(x)
        x = _max_pool_same(x, (1, 3, 3), (1, 2, 2))
        x = InceptionModule([64, 96, 128, 16, 32, 32], name="Mixed_3b")(x)
        x = InceptionModule([128, 128, 192, 32, 96, 64], name="Mixed_3c")(x)
        x = _max_pool_same(x, (3, 3, 3), (2, 2, 2))
        x = InceptionModule([192, 96, 208, 16, 48, 64], name="Mixed_4b")(x)
        x = InceptionModule([160, 112, 224, 24, 64, 64], name="Mixed_4c")(x)
        x = InceptionModule([128, 128, 256, 24, 64, 64], name="Mixed_4d")(x)
        x = InceptionModule([112, 144, 288, 32, 64, 64], name="Mixed_4e")(x)
        x = InceptionModule([256, 160, 320, 32, 128, 128], name="Mixed_4f")(x)
        x = _max_pool_same(x, (2, 2, 2), (2, 2, 2))
        x = InceptionModule([256, 160, 320, 32, 128, 128], name="Mixed_5b")(x)
        x = InceptionModule([384, 192, 384, 48, 128, 128], name="Mixed_5c")(x)

        # spatial average pool (keep a small temporal window like the torch
        # avg_pool (2,7,7)), then logits conv and temporal mean
        x = nn.avg_pool(
            x, (2, 7, 7), strides=(1, 1, 1), padding="VALID"
        )
        x = Unit3D(
            self.num_classes, use_bn=False, activation=False, use_bias=True,
            name="logits",
        )(x)
        return jnp.mean(x, axis=(1, 2, 3))


def load_torch_i3d(state: Dict[str, Any]) -> Dict[str, Any]:
    """Convert the reference rgb_imagenet/kinetics I3D torch state_dict
    (pytorch_i3d naming: e.g. 'Mixed_3b.b0.conv3d.weight', bn '...bn.*')."""

    def to_np(t):
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)

    branch_map = {
        "b0": "Branch_0/Conv3d_0a_1x1",
        "b1a": "Branch_1/Conv3d_0a_1x1",
        "b1b": "Branch_1/Conv3d_0b_3x3",
        "b2a": "Branch_2/Conv3d_0a_1x1",
        "b2b": "Branch_2/Conv3d_0b_3x3",
        "b3b": "Branch_3/Conv3d_0b_1x1",
    }
    params: Dict[str, Any] = {}

    def put(path: list, name: str, leaf):
        # NB: branch names like "Branch_0/Conv3d_0a_1x1" are ONE flax module
        # name (a single scope key containing a slash), not nested scopes —
        # each element of `path` is one scope level.
        d = params
        for part in path:
            d = d.setdefault(part, {})
        d[name] = leaf

    for key, val in state.items():
        v = to_np(val)
        parts = key.split(".")
        # normalize module path
        if parts[0].startswith("Mixed"):
            path = [parts[0], branch_map.get(parts[1], parts[1])]
            rest = parts[2:]
        else:
            path = [parts[0]]
            rest = parts[1:]
        if rest[0] == "conv3d":
            if rest[1] == "weight":  # (out,in,kt,kh,kw) -> (kt,kh,kw,in,out)
                put(path + ["conv3d"], "kernel", np.transpose(v, (2, 3, 4, 1, 0)))
            else:
                put(path + ["conv3d"], "bias", v)
        elif rest[0] == "bn":
            name = {
                "weight": "bn_scale", "bias": "bn_bias",
                "running_mean": "bn_mean", "running_var": "bn_var",
            }.get(rest[1])
            if name:
                put(path, name, v)
    return params
