"""Per-host input sharding: each process feeds its local slice of the
global batch — the implementation of the reference's never-built
"distributed sampler" intent (``tav_nn.py:29-33``; SURVEY.md §5.8).

On a multi-host pod, every process runs the same sampler order (seeded
identically), takes the rows belonging to its host, and device_puts them
onto its addressable devices with a dp sharding; ``jax.make_array_from_
process_local_data`` assembles the global array view.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mme_tpu.data.dataset import ArrayDataset, batches


def host_slice(global_indices: np.ndarray,
               process_index: Optional[int] = None,
               process_count: Optional[int] = None) -> np.ndarray:
    """Contiguous per-host slice of a global batch-index array."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    per = len(global_indices) // pc
    return global_indices[pi * per:(pi + 1) * per]


def shard_batches(src: Iterator, mesh: Mesh, axis: str = "dp"
                  ) -> Iterator[Tuple[Dict[str, jax.Array], jax.Array,
                                      jax.Array, np.ndarray]]:
    """dp-shard an existing (batch, labels, mask, idx) iterator over the
    mesh — composes length bucketing (data/dataset.py::BucketedBatchIter,
    whose tails are already padded to the static batch size) with
    multi-device training; ``idx`` stays host numpy for dialog
    bookkeeping. Single-process only (device_put of host-resident rows)."""
    sharding = NamedSharding(mesh, P(axis))
    for batch, labels, mask, idx in src:
        yield ({k: jax.device_put(v, sharding) for k, v in batch.items()},
               jax.device_put(labels, sharding),
               jax.device_put(mask, sharding), idx)


def global_batches(ds: ArrayDataset, order: np.ndarray, global_batch: int,
                   mesh: Mesh, axis: str = "dp"
                   ) -> Iterator[Tuple[Dict[str, jax.Array], jax.Array,
                                       jax.Array, np.ndarray]]:
    """Yield dp-sharded (batch, labels, sample_mask, host_indices) global
    arrays built from each process's local rows. ``host_indices`` stays a
    host numpy array (the loop's dialog-accumulation bookkeeping)."""
    sharding = NamedSharding(mesh, P(axis))
    pc = jax.process_count()
    local = global_batch // pc

    def put(x: np.ndarray) -> jax.Array:
        if pc == 1:
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(sharding, x)

    for batch, labels, mask, idx in batches(ds, order, global_batch):
        pi = jax.process_index()
        sl = slice(pi * local, (pi + 1) * local)
        local_batch = {k: v[sl] for k, v in batch.items()} \
            if pc > 1 else batch
        yield (
            {k: put(v) for k, v in local_batch.items()},
            put(labels[sl] if pc > 1 else labels),
            put(mask[sl] if pc > 1 else mask),
            idx,
        )
