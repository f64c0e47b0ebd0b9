"""Tensor-parallel parameter sharding rules.

Megatron-style TP expressed the JAX way (SURVEY.md §2.9 — the reference has
no model parallelism at all): a rule maps each parameter path to a
PartitionSpec over the (dp, mp) mesh, XLA's SPMD partitioner inserts the
collectives. The column→row pattern per transformer block:

- fused qkv kernel [hidden, 3, heads, head_dim] → shard heads on mp
  (column-parallel); attention out kernel [hidden, hidden] → shard the
  input dim (row-parallel, psum on output);
- mlp fc1 [hidden, intermediate] → column-parallel on intermediate;
  fc2 [intermediate, hidden] → row-parallel;
- embeddings/LayerNorms/biases replicated (biases of row-parallel layers
  must be replicated and are added post-reduction).

Works for every encoder family here because they all share the
layers.py module structure.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax._src.mesh import thread_resources


def batch_constraint(x: Any, batch_axis: str = "dp") -> Any:
    """Pin a tensor's leading (batch) dim to the data-parallel mesh axis.

    Model code calls this on intermediates whose sharding the SPMD
    partitioner would otherwise have to guess (the PreFormer concat/mask
    path was compiler-flagged with `[SPMD] Involuntary full
    rematerialization` before these constraints — small s32 mask tensors
    were being sharded along the sequence dim over the whole mesh and then
    resharded batch-wise at the concatenate). Under a mesh WITHOUT a
    ``batch_axis`` axis (pure sp/pp/ep meshes) or with an indivisible
    leading dim, the tensor is pinned fully replicated instead — also a
    voluntary, efficient layout (the partitioner otherwise picks a partial
    batch sharding and pays the flagged involuntary resharding against the
    seq-sharded trunk). No-op when tracing outside any mesh context
    (single-chip, CPU tests)."""
    mesh = thread_resources.env.physical_mesh
    ndim = getattr(x, "ndim", 0)
    if mesh.empty or ndim == 0:
        return x
    if (batch_axis in mesh.axis_names
            and x.shape[0] % mesh.shape[batch_axis] == 0):
        spec = P(batch_axis, *([None] * (ndim - 1)))
    else:
        spec = P()
    return jax.lax.with_sharding_constraint(x, spec)


def tp_spec_for_path(path: tuple, leaf: Any, mp_axis: str = "mp") -> P:
    keys = [getattr(k, "key", str(k)) for k in path]
    name = "/".join(keys)
    ndim = getattr(leaf, "ndim", 0)
    if name.endswith("qkv/kernel") and ndim == 4:
        return P(None, None, mp_axis, None)          # heads column-parallel
    if name.endswith("qkv_bias") and ndim == 3:
        return P(None, mp_axis, None)
    if name.endswith("attention/out/kernel") and ndim == 2:
        return P(mp_axis, None)                      # row-parallel
    if name.endswith("mlp/fc1/kernel") and ndim == 2:
        return P(None, mp_axis)                      # column-parallel
    if name.endswith("mlp/fc1/bias") and ndim == 1:
        return P(mp_axis)
    if name.endswith("mlp/fc2/kernel") and ndim == 2:
        return P(mp_axis, None)                      # row-parallel
    return P()                                       # replicate


def shard_params_tp(params: Any, mesh: Mesh, mp_axis: str = "mp") -> Any:
    """device_put a param tree with TP rules; non-divisible or non-matching
    leaves replicate. A mesh without an ``mp_axis`` axis (e.g. dp×sp or
    dp×pp) replicates everything — TP is simply off."""
    if mp_axis not in mesh.axis_names:
        return jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P())), params)
    mp = mesh.shape[mp_axis]

    def put(path, x):
        spec = tp_spec_for_path(path, x, mp_axis)
        # verify divisibility; fall back to replication otherwise
        for dim, axis_name in enumerate(spec):
            if axis_name == mp_axis and x.shape[dim] % mp != 0:
                spec = P()
                break
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, params)


def shard_state_tp(state: Any, mesh: Mesh, mp_axis: str = "mp") -> Any:
    """Apply TP rules to a TrainState: params, their optimizer moments, and
    the accumulation buffer share the layout; scalars replicate."""
    params = shard_params_tp(state.params, mesh, mp_axis)
    accum = shard_params_tp(state.accum_grads, mesh, mp_axis)

    def put_opt(x):
        return jax.device_put(x, NamedSharding(mesh, P()))

    # optimizer state mirrors the param tree inside adamw's ScaleByAdamState
    def shard_like_params(tree):
        leaves_p, treedef_p = jax.tree_util.tree_flatten(state.params)
        leaves_t, treedef_t = jax.tree_util.tree_flatten(tree)
        if treedef_t == treedef_p:
            return shard_params_tp(tree, mesh, mp_axis)
        return jax.tree.map(put_opt, tree)

    opt_state = jax.tree.map(
        shard_like_params, state.opt_state,
        is_leaf=lambda t: jax.tree_util.tree_structure(t)
        == jax.tree_util.tree_structure(state.params))
    return state.replace(
        params=params, accum_grads=accum, opt_state=opt_state,
        step=jax.device_put(state.step, NamedSharding(mesh, P())),
        accum_count=jax.device_put(state.accum_count,
                                   NamedSharding(mesh, P())),
        batch_stats=(jax.tree.map(put_opt, state.batch_stats)
                     if state.batch_stats is not None else None))
