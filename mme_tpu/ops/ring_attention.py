"""Ring attention: sequence-parallel exact attention over a mesh axis.

The reference has NO sequence parallelism (SURVEY.md §2.9, §5.7) — it copes
with its ~2-3k-token fused sequences via length filters, batch-1 training
and CPU offload. This is the TPU-native lift of that cap: shard the
sequence dimension across chips, keep each chip's K/V block local, and
rotate K/V blocks around the ring with ``ppermute`` while accumulating an
online softmax (exactly the FlashAttention recurrence, distributed). After
``n_shards`` hops every query block has attended to every key block —
results are bitwise-independent of the ring layout up to fp reassociation.

Communication rides the ICI neighbor links (ppermute), overlapping the next
block transfer with the current block's matmuls under XLA's async
collectives. Memory per chip: O(S/n · S/n) scores instead of O(S²).

Use when a single chip can't hold the sequence (e.g. lifting the
``audio_shape`` cap, SURVEY §5.7); below that scale, single-chip flash
attention (ops/flash_attention.py) is faster.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

NEG_INF = -1e30


def _ring_attention_local(q, k, v, kbias, *, axis_name: str, scale: float):
    """Per-shard body. q: [B, H, Sq, D] (local query block), k/v:
    [B, H, Sk, D] (local key block, rotated), kbias: [B, Sk] additive
    fp32 (0 = attend, NEG_INF-scale = masked, anything between = soft)."""
    n = jax.lax.psum(1, axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]

    # derive the carry init from the sharded operand so shard_map's
    # varying-manual-axes types match through the fori_loop
    m = jnp.zeros_like(q[..., :1], jnp.float32) + NEG_INF
    l = jnp.zeros_like(q[..., :1], jnp.float32)
    acc = jnp.zeros_like(q, jnp.float32)

    def body(_, carry):
        k_c, v_c, km_c, m, l, acc = carry
        # inputs stay in their storage dtype (bf16 MXU pass, fp32
        # accumulate) — same numerics contract as ops/attention.py; the
        # probabilities are cast to the value dtype for the PV matmul
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k_c,
                       preferred_element_type=jnp.float32) * scale
        s = s + km_c[:, None, None, :]
        m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + p.sum(axis=-1, keepdims=True)
        acc = acc * alpha + jnp.einsum("bhqk,bhkd->bhqd",
                                       p.astype(v_c.dtype), v_c,
                                       preferred_element_type=jnp.float32)
        m = m_new
        # rotate the K/V block (+mask) to the next chip on the ring
        k_c = jax.lax.ppermute(k_c, axis_name, perm)
        v_c = jax.lax.ppermute(v_c, axis_name, perm)
        km_c = jax.lax.ppermute(km_c, axis_name, perm)
        return k_c, v_c, km_c, m, l, acc

    _, _, _, m, l, acc = jax.lax.fori_loop(
        0, n, body, (k, v, kbias, m, l, acc))
    return (acc / jnp.maximum(l, 1e-30)).astype(q.dtype)


def ring_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                   mesh: Mesh, axis: str = "sp",
                   key_mask: Optional[jax.Array] = None,
                   key_bias: Optional[jax.Array] = None,
                   batch_axis: Optional[str] = None) -> jax.Array:
    """Exact attention with q/k/v sequence-sharded over ``mesh[axis]``.

    q, k, v: [B, H, S, D] (global view; S must divide by the axis size).
    key_mask: optional [B, S] bool/int, 1 = attend (hard mask).
    key_bias: optional [B, S] ADDITIVE fp32 bias — supports soft biases
    with exact dense-path numerics; mutually exclusive with key_mask.
    batch_axis: mesh axis the BATCH dim is sharded over (dp×sp
    composition) — without it a dp-sharded batch would be all-gathered at
    the shard_map boundary. None = batch replicated.
    Returns [B, H, S, D] with the same sequence sharding as the inputs.
    """
    assert key_mask is None or key_bias is None, \
        "pass key_mask OR key_bias, not both"
    if key_bias is None:
        if key_mask is None:
            key_bias = jnp.zeros((q.shape[0], q.shape[2]), jnp.float32)
        else:
            key_bias = jnp.where(key_mask.astype(jnp.bool_), 0.0,
                                 NEG_INF).astype(jnp.float32)
    else:
        key_bias = key_bias.astype(jnp.float32)
    scale = 1.0 / (q.shape[-1] ** 0.5)
    b = batch_axis
    fn = shard_map(
        functools.partial(_ring_attention_local, axis_name=axis,
                          scale=scale),
        mesh=mesh,
        in_specs=(P(b, None, axis, None), P(b, None, axis, None),
                  P(b, None, axis, None), P(b, axis)),
        out_specs=P(b, None, axis, None))
    return fn(q, k, v, key_bias)
