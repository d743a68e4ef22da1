"""Exponential moving average of a parameter pytree.

Replaces the reference's `ema_pytorch.EMA` module (tools/ldm/image.py:63-65)
with a pure functional update running *replicated inside the jitted train
step* — no rank-0 gating needed under SPMD (every device computes the same
EMA).  Decay warmup follows ema_pytorch semantics:
decay_t = clamp(1 - (1 + t/inv_gamma)^(-power), 0, beta), with updates applied
every `update_every` steps after `update_after_step`.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def ema_decay_schedule(
    updates: jnp.ndarray,
    beta: float = 0.9999,
    inv_gamma: float = 1.0,
    power: float = 2.0 / 3.0,
) -> jnp.ndarray:
    value = 1.0 - (1.0 + updates / inv_gamma) ** (-power)
    return jnp.clip(value, 0.0, beta)


def ema_update(
    ema_params: Any,
    params: Any,
    step: jnp.ndarray,
    beta: float = 0.9999,
    update_every: int = 10,
    update_after_step: int = 100,
) -> Any:
    """Conditionally blend params into ema_params at this step (jit-safe)."""
    eff = jnp.maximum((step - update_after_step) // update_every, 0)
    decay = ema_decay_schedule(eff.astype(jnp.float32), beta=beta)
    # only apply on update_every boundaries after warmup; before
    # update_after_step copy params through (decay schedule yields 0 at eff=0)
    do_update = (step % update_every) == 0
    decay = jnp.where(do_update, decay, 1.0)

    def blend(e, p):
        d = decay.astype(e.dtype) if jnp.issubdtype(e.dtype, jnp.floating) else 1
        return e * d + p * (1 - d)

    return jax.tree_util.tree_map(blend, ema_params, params)
