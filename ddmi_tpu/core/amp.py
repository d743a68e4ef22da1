"""Mixed-precision policy (model.amp -> bf16 compute, fp32 master params).

TPU-native replacement for the reference's `accelerator.autocast()`
(tools/d2c_vae/image.py:184): instead of op-level autocasting, parameters are
cast to bfloat16 at the loss boundary — every conv/matmul then runs bf16 on
the MXU by flax's promotion rules, while the differentiated (master) params
stay fp32 (the cast's transpose accumulates gradients back to fp32).  Loss
reductions and coordinate math stay fp32 (bf16 coordinates lose whole pixels
at plane sizes >= 256 — see ops/resample.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bf16_cast(tree):
    """Cast all fp32 leaves to bf16 (params or activations)."""
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32
        else x,
        tree,
    )


def compute_cast(tree, enabled: bool):
    """Apply the bf16 compute policy when enabled, else pass through."""
    return bf16_cast(tree) if enabled else tree


def f32(x):
    """Promote back to fp32 for loss reductions."""
    return x.astype(jnp.float32)


def amp_denoiser(apply_fn, params, enabled: bool):
    """Wrap a stage-2 denoiser apply into the bf16 compute policy.

    The reference autocasts its WHOLE stage-2 step
    (tools/ldm/image.py:152 `accelerator.autocast()` around encode + UNet +
    loss); here only the denoiser forward is cast — bf16 params + bf16
    input on the MXU, fp32 output — so the noise/schedule math and loss
    reductions in diffusion/process.py stay fp32 (negligible bytes, exact).
    Gradients accumulate back to the fp32 master params through the cast's
    transpose.  `apply_fn(params, x, t, **kw)` is the uncast apply."""
    p = compute_cast(params, enabled)

    def model_fn(x, t, **kw):
        if enabled:
            x = x.astype(jnp.bfloat16)
        return f32(apply_fn(p, x, t, **kw))

    return model_fn
