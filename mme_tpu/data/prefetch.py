"""Double-buffered device prefetch for the host input pipeline.

SURVEY.md §7's host-pipeline design ("double-buffered device_put"): a
background thread uploads the NEXT batch's feature arrays to the device
while the current step computes, so the host→device copy (large through
the remote-tunnel TPU — a fp32 video batch is ~10 MB/sample) overlaps
compute instead of serializing with it. This replaces the reference's
DataLoader worker processes + pin_memory (``tav_nn.py:28,49-55``) with the
TPU-idiomatic equivalent.

Labels / sample-mask / indices stay host-side numpy: the train loop reads
the mask for dialog-accumulation bookkeeping (train/loop.py), and pulling
a device array back would force a queue sync per step.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Dict, Iterator, Tuple

import jax

_SENTINEL = object()


def prefetch_batches(it: Iterator[Tuple[Dict[str, Any], Any, Any, Any]],
                     depth: int = 2
                     ) -> Iterator[Tuple[Dict[str, Any], Any, Any, Any]]:
    """Wrap a (batch_dict, labels, mask, idx) iterator: feature dicts are
    device_put from a producer thread, ``depth`` batches ahead.

    Exceptions in the producer propagate to the consumer; the producer is
    a daemon thread so abandoning the iterator can't hang interpreter
    shutdown."""
    q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))

    def producer():
        try:
            for batch, labels, mask, idx in it:
                dev_batch = {k: jax.device_put(v) for k, v in batch.items()}
                q.put((dev_batch, labels, mask, idx))
            q.put(_SENTINEL)
        except BaseException as e:  # noqa: BLE001 — reraised consumer-side
            q.put(e)

    t = threading.Thread(target=producer, daemon=True,
                         name="mme-prefetch")
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            return
        if isinstance(item, BaseException):
            raise item
        yield item
