"""Device mesh + sharding helpers: the distributed runtime the reference
never built.

The reference imports ``torch.distributed`` but has no working multi-device
path (SURVEY.md §2.9, §5.8 — device is the literal string "cuda", DDP was
attempted and abandoned, ``models/tav.py:358``). Here data parallelism is
first-class and TPU-idiomatic: one ``jax.sharding.Mesh`` over ICI, inputs
sharded along the ``dp`` axis, parameters replicated (or sharded along
``mp`` later), and XLA inserts the gradient all-reduce — the same jitted
train step from train/steps.py runs single-chip or across a pod purely by
changing input shardings.

Per-host input sharding (each process feeds its local devices) implements
the intent of the reference's ``prepare_dataloader`` docstring
(``tav_nn.py:29-33``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, model: int = 1,
              axis_names: Sequence[str] = ("dp", "mp"),
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Create a (data, model) mesh. data=-1 → all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Batch-dim sharding spec: [B, ...] split along the data axis."""
    return NamedSharding(mesh, P(axis))


def shard_batch(batch: Dict[str, Any], mesh: Mesh,
                axis: str = "dp") -> Dict[str, Any]:
    """device_put every array with its leading dim split over ``axis``."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
