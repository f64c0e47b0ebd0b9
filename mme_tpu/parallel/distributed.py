"""Multi-host (DCN) entry: ``jax.distributed.initialize`` wiring.

SURVEY §5.8 names this + per-process input pipelines as the TPU-native
equivalent of the reference's never-built DDP intent (``tav_nn.py:29-33``
builds a DistributedSampler it never uses). On a TPU pod slice each host
process calls :func:`maybe_initialize` before touching the backend; the
dp mesh then spans all hosts' devices, ``parallel/data.py::global_batches``
feeds each process its own row slice, and XLA rides ICI/DCN for the
gradient collectives.

Env contract (all optional — absent on single-host runs, auto-detected by
JAX on real TPU pods):

- ``MME_COORDINATOR``   host:port of process 0
- ``MME_NUM_PROCESSES`` world size
- ``MME_PROCESS_ID``    this process's rank
"""

from __future__ import annotations

import os
from typing import Optional

_initialized = False


def maybe_initialize(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize the JAX distributed runtime when configured; no-op (and
    False) otherwise. Must run before the first backend touch — every CLI
    calls this from ``config_from_args``. Explicit args beat env vars;
    with neither, single-host runs skip initialization entirely (calling
    ``jax.distributed.initialize`` bare would try pod auto-detection and
    fail off-pod)."""
    global _initialized
    if _initialized:
        return True
    coordinator = coordinator or os.environ.get("MME_COORDINATOR")
    if num_processes is None:
        np_env = os.environ.get("MME_NUM_PROCESSES")
        num_processes = int(np_env) if np_env else None
    if process_id is None:
        pid_env = os.environ.get("MME_PROCESS_ID")
        process_id = int(pid_env) if pid_env else None
    if coordinator is None and num_processes is None:
        return False
    import jax
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    _initialized = True
    print(f"distributed runtime: process {jax.process_index()}/"
          f"{jax.process_count()}, {jax.local_device_count()} local / "
          f"{jax.device_count()} global devices", flush=True)
    return True
