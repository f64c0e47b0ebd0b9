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
    stop = threading.Event()

    def _put(item) -> bool:
        """Blocking put that aborts when the consumer is gone (early-stop
        / preemption break out of the batch loop) — otherwise the producer
        would pin ``depth`` device-resident batches forever."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for batch, labels, mask, idx in it:
                if stop.is_set():
                    return
                dev_batch = {k: jax.device_put(v) for k, v in batch.items()}
                if not _put((dev_batch, labels, mask, idx)):
                    return
            _put(_SENTINEL)
        except BaseException as e:  # noqa: BLE001 — reraised consumer-side
            _put(e)

    t = threading.Thread(target=producer, daemon=True,
                         name="mme-prefetch")
    t.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        # consumer closed (normal exhaustion, early break, or error):
        # release the producer and drop its queued device buffers
        stop.set()
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
