"""Execution-platform gate for Pallas kernel dispatch.

Pallas TPU kernels must only be traced for computations that will EXECUTE
on TPU.  `jax.default_backend()` alone is wrong under a
`jax.default_device(cpu_device)` override (it reports the process-level
backend, not the context): round 5's serve fix builds checkpoint-restore
templates in host memory that way, and the model init's forward pass would
otherwise trace flash-attention for CPU and fail with "Only interpret mode
is supported on CPU backend".
"""

from __future__ import annotations

import jax


def exec_platform() -> str:
    """Platform the next uncommitted computation will run on: honors a
    `jax.default_device` context override, else the default backend."""
    d = jax.config.jax_default_device
    if d is not None:
        return d.platform
    return jax.default_backend()


def on_tpu() -> bool:
    return exec_platform() == "tpu"
