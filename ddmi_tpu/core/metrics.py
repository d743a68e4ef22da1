"""Metrics logging + profiling hooks.

The reference has no observability beyond print/tqdm (SURVEY.md §5); here:
JSONL metrics stream + stdout lines + optional jax.profiler traces."""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

import jax


class MetricsLogger:
    def __init__(self, directory: str, name: str = "train", stdout_every: int = 50):
        os.makedirs(directory, exist_ok=True)
        self.path = os.path.join(directory, f"{name}.jsonl")
        self._f = open(self.path, "a", buffering=1)
        self.stdout_every = stdout_every
        self._t0 = time.perf_counter()
        self._last_step_time = self._t0
        self._pending = []

    def defer(self, step: int, metrics: Dict[str, Any], prefix: str = "") -> None:
        """Queue a step's metrics WITHOUT materializing device values — no
        host-device sync, so the training loop keeps its dispatch queue deep.
        Call flush() periodically (one sync for the whole chunk)."""
        self._pending.append((step, time.perf_counter(), prefix, metrics))

    def flush(self) -> Optional[Dict[str, Any]]:
        """Materialize all deferred metrics in ONE device_get, write them to
        the jsonl stream, and return the last record (host floats) — the
        caller's hook point for NaN detection."""
        if not self._pending:
            return None
        values = jax.device_get([m for (_, _, _, m) in self._pending])
        rec = None
        for (step, t, prefix, _), mv in zip(self._pending, values):
            rec = self._write(step, t, mv, prefix)
        self._pending.clear()
        return rec

    def log(self, step: int, metrics: Dict[str, Any], prefix: str = "") -> None:
        """Immediate log (materializes device values — one sync per call).
        Hot training loops should prefer defer()+flush()."""
        self._write(step, time.perf_counter(), jax.device_get(metrics), prefix)

    def _write(self, step: int, now: float, metrics, prefix: str) -> Dict[str, Any]:
        # step_time measures host timestamp spacing: true device step time
        # for immediate log(), dispatch cadence for deferred records.
        rec = {
            "step": int(step),
            "time": now - self._t0,
            "step_time": now - self._last_step_time,
        }
        self._last_step_time = now
        for k, v in metrics.items():
            try:
                rec[prefix + k] = float(v)
            except (TypeError, ValueError):
                rec[prefix + k] = str(v)
        self._f.write(json.dumps(rec) + "\n")
        if self.stdout_every and step % self.stdout_every == 0:
            if jax.process_index() == 0:
                pretty = " ".join(
                    f"{k}={v:.4g}" if isinstance(v, float) else f"{k}={v}"
                    for k, v in rec.items()
                    if k not in ("time",)
                )
                print(f"[{prefix or 'train'}] {pretty}", flush=True)
        return rec

    def close(self):
        self._f.close()


class ProfilerHook:
    """Capture a jax.profiler trace for steps [start, start+count)."""

    def __init__(self, logdir: str, start_step: int = 10, num_steps: int = 3):
        self.logdir = logdir
        self.start_step = start_step
        self.stop_step = start_step + num_steps
        self._active = False

    def step(self, step: int) -> None:
        if step == self.start_step and not self._active:
            jax.profiler.start_trace(self.logdir)
            self._active = True
        elif step >= self.stop_step and self._active:
            jax.profiler.stop_trace()
            self._active = False
