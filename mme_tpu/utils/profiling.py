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
    """JSONL logger with wandb-style keyed dicts; one file per run.

    Optional wandb mirror (the reference's entire observability backend is
    wandb, ``tav_nn.py:104-105,121-122``): with ``MME_WANDB=1`` and wandb
    importable+configured, every logged dict is also sent to ``wandb.log``
    (keys unchanged — the metric scheme already matches the reference's
    ``{split}/multiF1/{label}`` keys, evals/metrics.py). Unavailable or
    failing wandb degrades to JSONL-only with a notice; the JSONL file
    stays the source of truth either way."""

    def __init__(self, run_dir: str, name: str = "metrics"):
        os.makedirs(run_dir, exist_ok=True)
        self.path = os.path.join(run_dir, f"{name}.jsonl")
        self._step = 0
        self._wandb = None
        if os.environ.get("MME_WANDB") == "1":
            try:
                import wandb
                self._wandb = wandb.init(
                    project=os.environ.get("MME_WANDB_PROJECT", "mme_tpu"),
                    name=(os.environ.get("MME_WANDB_NAME")
                          or os.path.basename(os.path.abspath(run_dir))),
                    dir=run_dir, reinit=True)
            except Exception as e:  # noqa: BLE001 — any wandb failure
                print(f"MME_WANDB=1 but wandb unavailable ({e!r}); "
                      "logging JSONL only", flush=True)

    def log(self, metrics: Dict[str, Any]) -> None:
        rec = {"_step": self._step, "_time": time.time()}
        for k, v in metrics.items():
            rec[k] = float(v) if hasattr(v, "__float__") else v
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self._wandb is not None:
            try:
                self._wandb.log(
                    {k: v for k, v in rec.items() if not k.startswith("_")},
                    step=self._step)
            except Exception as e:  # noqa: BLE001
                print(f"wandb.log failed ({e!r}); disabling mirror",
                      flush=True)
                self._wandb = None
        self._step += 1

    def finish(self) -> None:
        if self._wandb is not None:
            try:
                self._wandb.finish()
            except Exception:
                pass
            self._wandb = None
