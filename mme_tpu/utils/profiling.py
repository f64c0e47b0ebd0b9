"""Profiling and run logging (the observability the reference lacked).

The reference's tracing story is tqdm bars + a commented-out cProfile
harness (SURVEY.md §5.1). Here: ``jax.profiler`` trace capture around
training windows (inspect with TensorBoard/xprof), a step timer, and a
JSONL run logger standing in for wandb (``wandb.log`` call sites map to
``RunLogger.log``; keys are already wandb-schemed by evals/metrics.py).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace when log_dir is set (env
    ``MME_PROFILE_DIR`` in the CLIs); no-op otherwise."""
    if not log_dir:
        yield
        return
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling steps/sec + utterances/sec, host-side."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times = []

    def tick(self) -> None:
        self._times.append(time.perf_counter())
        if len(self._times) > self.window + 1:
            self._times.pop(0)

    @property
    def steps_per_sec(self) -> float:
        if len(self._times) < 2:
            return 0.0
        dt = self._times[-1] - self._times[0]
        return (len(self._times) - 1) / max(dt, 1e-9)


class RunLogger:
    """JSONL logger with wandb-style keyed dicts; one file per run."""

    def __init__(self, run_dir: str, name: str = "metrics"):
        os.makedirs(run_dir, exist_ok=True)
        self.path = os.path.join(run_dir, f"{name}.jsonl")
        self._step = 0

    def log(self, metrics: Dict[str, Any]) -> None:
        rec = {"_step": self._step, "_time": time.time()}
        for k, v in metrics.items():
            rec[k] = float(v) if hasattr(v, "__float__") else v
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        self._step += 1
