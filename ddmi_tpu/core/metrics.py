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

    def log(self, step: int, metrics: Dict[str, Any], prefix: str = "") -> None:
        now = time.perf_counter()
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
