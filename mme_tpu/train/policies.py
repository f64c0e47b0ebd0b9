"""Training-policy engine: the reference's loop behaviors as pure functions.

Capability parity targets (SURVEY.md §2.6, first-class behaviors):
1. Epoch-parity sampling — even epochs: weighted multinomial WITH replacement;
   odd epochs: sequential identity (``utils/global_functions.py:21-49``
   ``MySampler``).
2. Dialog-aligned gradient accumulation — per-dialog utterance counts and
   prefix sums drive "virtual batches" of one dialog
   (``utils/data_loaders.py:23-25,47-57``, ``train_model/tav_train.py:85-105``).
3. Mid-epoch validate/save/patience every ``log_val`` steps
   (``train_model/tav_train.py:68-80``) — implemented in train/loop.py using
   the schedule helpers here.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import numpy as np


def epoch_order(rng: np.random.Generator, epoch: int, epoch_switch: int,
                weights: np.ndarray, num_samples: int) -> np.ndarray:
    """MySampler parity: even ``epoch % epoch_switch`` → multinomial with
    replacement over ``weights``; odd → arange."""
    if epoch % epoch_switch == 0:
        p = np.asarray(weights, np.float64)
        p = p / p.sum()
        return rng.choice(len(p), size=num_samples, replace=True, p=p)
    return np.arange(num_samples)


def sample_weights_from_labels(labels: Sequence[int],
                               class_weights: np.ndarray) -> np.ndarray:
    """Per-sample sampling weights = class weight of each sample's label
    (``tav_nn.py:41-48``)."""
    return np.asarray(class_weights)[np.asarray(labels, np.int64)]


@dataclasses.dataclass
class DialogAccumulator:
    """Dialog-aligned accumulation state (reference ``retGradAccum``).

    ``counts[d]`` = utterances in dialog d, sorted by dialog id (the
    reference sorts ``value_counts().sort_index()``). ``step(i)`` returns
    (dialog_size, is_boundary) for global sample index i under sequential
    order."""

    counts: List[int]

    def __post_init__(self):
        self.prefix = np.cumsum(self.counts)

    def step(self, i: int) -> Tuple[int, bool]:
        d = int(np.searchsorted(self.prefix, i, side="right"))
        d = min(d, len(self.counts) - 1)
        boundary = (i + 1 == self.prefix[d])
        return int(self.counts[d]), bool(boundary)


def dialog_counts(dialog_ids: Sequence[int]) -> List[int]:
    """value_counts().sort_index() of the dialog column
    (``utils/data_loaders.py:23``)."""
    ids, counts = np.unique(np.asarray(dialog_ids), return_counts=True)
    order = np.argsort(ids)
    return counts[order].tolist()
