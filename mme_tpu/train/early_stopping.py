"""Patience-based early stopping with in-memory best state.

Capability parity with ``utils/early_stopping.py:9-93`` (used by the older
single/double-model loops): tracks the best validation metric, keeps a copy
of the best params, optionally persists them, and restores on termination.
The newer loops' global patience counter lives in train/loop.py.
"""

from __future__ import annotations

import pickle
from typing import Any, Optional

import jax


class EarlyStopping:
    def __init__(self, patience: int = 10, min_delta: float = 0.0,
                 mode: str = "min", save_path: Optional[str] = None):
        assert mode in ("min", "max")
        self.patience = patience
        self.min_delta = min_delta
        self.mode = mode
        self.save_path = save_path
        self.counter = 0
        self.best_metric: Optional[float] = None
        self.best_state: Any = None
        self.should_stop = False

    def _improved(self, metric: float) -> bool:
        if self.best_metric is None:
            return True
        if self.mode == "min":
            return metric < self.best_metric - self.min_delta
        return metric > self.best_metric + self.min_delta

    def __call__(self, metric: float, state: Any) -> bool:
        """Update with a new validation metric; returns True if training
        should stop. Keeps a host copy of the best state (the reference's
        ``best_state_dict`` deepcopy + pkl dump)."""
        if self._improved(metric):
            self.best_metric = metric
            self.best_state = jax.device_get(state)
            self.counter = 0
            if self.save_path:
                with open(self.save_path, "wb") as f:
                    pickle.dump(self.best_state, f)
        else:
            self.counter += 1
            if self.counter >= self.patience:
                self.should_stop = True
        return self.should_stop

    def restore_best(self, fallback: Any = None) -> Any:
        if self.best_state is not None:
            return self.best_state
        if self.save_path:
            try:
                with open(self.save_path, "rb") as f:
                    return pickle.load(f)
            except OSError:
                pass
        return fallback
