"""Shared optimizer construction for the stage-2 (LDM) trainers.

Reference: AdamW(lr, wd=0) with host-side gradient accumulation
(tools/ldm/image.py:61, gradient_accumulate_every).  TPU memory notes at
production scale (the celebahq stage-2 UNet is 1.01B params = 3.78 GB fp32):

  * Adam's first moment is stored in bfloat16 (`optax.adamw(mu_dtype=...)`,
    override via model.extra.adam_mu_dtype).  mu refreshes at 10% relative
    per step, well inside bf16 precision; nu and the update math stay fp32.
    Saves 1.9 GB on the celebahq UNet.
  * The EMA must stay fp32: at decay 0.9999 the per-update increment is
    ~1e-4 relative, which rounds to zero in bf16 — a bf16 EMA silently
    freezes.  (bench/serving cast the restored EMA to bf16 at load time,
    which is fine — sampling only reads it.)
  * optax.MultiSteps adds a params-sized fp32 accumulator.  Full fp32
    budget with accumulation: params + EMA + nu + acc (4x) + bf16 mu (0.5x)
    = 17 GB for celebahq stage 2 — one 16 GB v5e cannot hold it; shard with
    `mesh: {fsdp: 2}` (docs/SCALING.md) or drop accumulation.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def stage2_adamw(cfg) -> optax.GradientTransformation:
    m = cfg.model
    accum = max(1, m.lossconfig.gradient_accumulate_every)
    mu_dtype = jnp.dtype(m.extra.get("adam_mu_dtype", "bfloat16"))
    tx = optax.adamw(m.lr, weight_decay=0.0, mu_dtype=mu_dtype)
    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx
