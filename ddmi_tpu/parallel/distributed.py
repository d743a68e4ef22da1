"""Multi-host / multi-process boot.

TPU-native replacement for the reference's `accelerate launch --multi_gpu
--num_processes=4` process-group init (/root/reference/README.md:91,
tools/d2c_vae/image.py:29-33 Accelerator()): `jax.distributed.initialize`
starts the coordination service so all hosts of a pod slice (or a CPU test
fleet) form one SPMD program, and Orbax can coordinate multi-host checkpoint
writes.

Unlike the round-1 docstrings claimed, this is NOT automatic for
multi-process CPU fleets or multi-slice DCN jobs — it must be called before
any backend initialization.  `maybe_initialize()` is env-gated and
idempotent:

  * explicit fleet:   JAX_COORDINATOR_ADDRESS=host:port
                      JAX_NUM_PROCESSES=N  JAX_PROCESS_ID=i
    (the standard jax.distributed CPU/GPU recipe — used by the subprocess
    test tests/test_distributed.py)
  * TPU pod slice:    detected from the TPU runtime's own env
    (TPU_WORKER_HOSTNAMES / MEGASCALE_COORDINATOR_ADDRESS etc.) —
    jax.distributed.initialize() auto-discovers everything.
  * single process:   no env present -> no-op.

Launch line (documented in docs/SCALING.md):
  JAX_COORDINATOR_ADDRESS=host0:9901 JAX_NUM_PROCESSES=4 JAX_PROCESS_ID=$i \
      python -m ddmi_tpu.cli.main --exp ldm --configs configs/ldm/celebahq.yaml
"""

from __future__ import annotations

import os

_initialized = False


def _pod_env_present() -> bool:
    """TPU pod / multi-slice runtimes export worker topology env vars that
    jax.distributed.initialize() can auto-discover.

    A single-entry TPU_WORKER_HOSTNAMES (e.g. "localhost", which
    single-chip tunnel runtimes export) is NOT a pod — initializing the
    coordination service there only produces a failed-connect warning, so
    that key counts only when it lists more than one worker."""
    keys = (
        "TPU_WORKER_ID",
        "MEGASCALE_COORDINATOR_ADDRESS",
        "CLOUD_TPU_TASK_ID",
    )
    if any(k in os.environ for k in keys):
        return True
    return "," in os.environ.get("TPU_WORKER_HOSTNAMES", "")


def maybe_initialize() -> bool:
    """Call jax.distributed.initialize when the environment asks for it.

    Returns True when a multi-process runtime was (or already had been)
    initialized, False for plain single-process runs.  Safe to call more
    than once and safe to call after jax backends exist in the
    single-process case (it only touches jax.distributed before first use).
    """
    global _initialized
    if _initialized:
        return True
    import jax

    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coord:
        nproc = int(os.environ["JAX_NUM_PROCESSES"])
        pid = int(os.environ["JAX_PROCESS_ID"])
        jax.distributed.initialize(
            coordinator_address=coord, num_processes=nproc, process_id=pid
        )
        _initialized = True
        return True
    if _pod_env_present():
        try:
            jax.distributed.initialize()
            _initialized = True
            return True
        except Exception as e:  # pragma: no cover - depends on pod runtime
            import warnings

            warnings.warn(
                f"TPU pod env detected but jax.distributed.initialize "
                f"failed ({e}); continuing single-process"
            )
            return False
    return False
