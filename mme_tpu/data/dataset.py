"""Host-side dataset: packed numpy arrays + static-shape batch assembly.

TPU-native replacement for the reference's Dataset/DataLoader/collate stack
(``utils/data_loaders.py``, per-model ``collate_batch`` fns): all per-sample
preprocessing happens ONCE at record-build time (tokenize/pad, resample,
decode — see data/records.py); the runtime dataset is a dict of rectangular
arrays, and batch assembly is a pure gather. Partial batches are padded to
the static batch size and carried with a 0/1 ``sample_mask`` so every step
compiles exactly once.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, Optional, Tuple

import numpy as np


@dataclasses.dataclass
class ArrayDataset:
    features: Dict[str, np.ndarray]
    labels: np.ndarray
    dialog_ids: Optional[np.ndarray] = None

    def __post_init__(self):
        n = len(self.labels)
        for k, v in self.features.items():
            assert len(v) == n, f"feature {k} has {len(v)} rows, labels {n}"

    def __len__(self) -> int:
        return len(self.labels)

    def gather(self, indices: np.ndarray
               ) -> Tuple[Dict[str, np.ndarray], np.ndarray]:
        batch = {k: v[indices] for k, v in self.features.items()}
        return batch, self.labels[indices]


def batches(ds: ArrayDataset, order: np.ndarray, batch_size: int
            ) -> Iterator[Tuple[Dict[str, np.ndarray], np.ndarray,
                                np.ndarray, np.ndarray]]:
    """Yield (batch, labels, sample_mask, batch_indices) with static shapes.

    The tail batch is padded by repeating index 0 with sample_mask=0 —
    padded rows contribute to neither loss nor metrics."""
    n = len(order)
    for start in range(0, n, batch_size):
        idx = order[start:start + batch_size]
        mask = np.ones(batch_size, np.int32)
        if len(idx) < batch_size:
            pad = batch_size - len(idx)
            mask[len(idx):] = 0
            idx = np.concatenate([idx, np.full(pad, order[0])])
        batch, labels = ds.gather(idx)
        yield batch, labels, mask, idx


class BucketedBatchIter:
    """Pluggable train-loop batch iterator doing length bucketing.

    Wraps :func:`bucketed_batches` behind the 4-tuple protocol the loop
    expects, and exposes ``epoch_len`` so the loop's end-of-epoch bookkeeping
    stays exact (per-bucket tails make the batch count larger than
    ``ceil(n/batch)``). One compiled step per bucket bound — a handful of
    shapes instead of the reference's per-batch dynamic pad
    (``models/tav.py:228``) or a single wasteful max-length pad."""

    def __init__(self, bucket_bounds: Tuple[int, ...],
                 mask_key: str = "audio_mask",
                 length_keys: Tuple[str, ...] = ("waveform", "audio_mask")):
        self.bucket_bounds = tuple(sorted(bucket_bounds))
        self.mask_key = mask_key
        self.length_keys = length_keys

    def _lengths(self, ds: ArrayDataset) -> np.ndarray:
        return np.asarray(ds.features[self.mask_key]).sum(axis=1)

    def epoch_len(self, ds: ArrayDataset, order: np.ndarray,
                  batch_size: int) -> int:
        bucket_of = np.searchsorted(self.bucket_bounds,
                                    self._lengths(ds)[order])
        counts = np.bincount(bucket_of, minlength=len(self.bucket_bounds))
        # mirror bucketed_batches' tail promotion: every bucket but the
        # last contributes only full batches, its remainder rides up
        total, carry = 0, 0
        for b, c in enumerate(counts):
            rows = int(c) + carry
            if b < len(counts) - 1:
                total += rows // batch_size
                carry = rows % batch_size
            else:
                total += int(np.ceil(rows / batch_size))
        return total

    def __call__(self, ds: ArrayDataset, order: np.ndarray, batch_size: int):
        for batch, labels, mask, idx, _bound in bucketed_batches(
                ds, order, batch_size, self._lengths(ds),
                self.bucket_bounds, self.length_keys):
            yield batch, labels, mask, idx


def bucketed_batches(ds: ArrayDataset, order: np.ndarray, batch_size: int,
                     sample_lengths: np.ndarray,
                     bucket_bounds: Tuple[int, ...],
                     length_keys: Tuple[str, ...] = ("waveform",
                                                     "audio_mask")):
    """Length-bucketed batching: group samples by true length and truncate
    the ragged features of each batch to its bucket bound.

    The reference pads per batch dynamically (``models/tav.py:228``), which
    on TPU would recompile per batch; dataset-level caps waste FLOPs on
    short utterances. Buckets give one compiled shape per bound (a handful)
    while cutting padding compute. Yields (batch, labels, sample_mask,
    indices, bound).

    Tail promotion (round 5): every bucket's sub-batch-size remainder is
    promoted into the NEXT larger bucket instead of padding its own tail
    batch — a promoted row just runs at a larger (still-valid) bound, so
    only the largest bucket ever pays a padded tail. At small epoch sizes
    the per-bucket tails dominated the bucketing win (BASELINE.md
    bucket-count sweep).
    """
    bounds = sorted(bucket_bounds)
    assert sample_lengths.max() <= bounds[-1], (
        f"max length {sample_lengths.max()} exceeds largest bucket "
        f"{bounds[-1]}")
    bucket_of = np.searchsorted(bounds, sample_lengths[order])
    carry = np.empty((0,), dtype=order.dtype)
    for b, bound in enumerate(bounds):
        sel = np.concatenate([carry, order[bucket_of == b]])
        if b < len(bounds) - 1:
            keep = len(sel) - len(sel) % batch_size
            carry = sel[keep:]
            sel = sel[:keep]
        if len(sel) == 0:
            continue
        for batch, labels, mask, idx in batches(ds, sel, batch_size):
            sliced = {k: (v[:, :bound] if k in length_keys else v)
                      for k, v in batch.items()}
            yield sliced, labels, mask, idx, bound
