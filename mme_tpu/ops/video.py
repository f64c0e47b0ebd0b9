"""Video-path ops: sinusoid tables, balanced visual masks, patch gathering.

Replaces the reference's CPU-side video mask logic (``models/tav.py:207-217``
balanced random visual mask) and VideoMAE position table with static-shape
jitted ops.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def sinusoid_position_table(n_position: int, d_hid: int) -> np.ndarray:
    """VideoMAE's fixed sinusoidal position encodings [1, N, D] (HF
    ``get_sinusoid_encoding_table``)."""
    position = np.arange(n_position)[:, None]
    dim = np.arange(d_hid)[None, :]
    angle = position / np.power(10000.0, 2 * (dim // 2) / d_hid)
    table = np.zeros((n_position, d_hid), np.float32)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table[None]


def balanced_keep_mask(rng: jax.Array, batch: int, num_tokens: int,
                       keep_k: int) -> jax.Array:
    """Random keep-mask with EXACTLY ``keep_k`` True per row.

    Capability parity with the reference's balanced visual mask
    (``models/tav.py:207-217``): it samples ~1/15 of the 1568 VideoMAE patch
    tokens per row and rebalances so every row keeps the same count (VideoMAE's
    visible-patch gather needs a rectangular result). TPU-native redesign: a
    uniform-scores top-k, which is exactly balanced by construction and fully
    static-shape (the reference's count varies binomially batch to batch,
    which would force recompilation)."""
    scores = jax.random.uniform(rng, (batch, num_tokens))
    kth = jnp.sort(scores, axis=-1)[:, num_tokens - keep_k][:, None]
    return scores >= kth


def uniform_keep_mask(batch: int, num_tokens: int, keep_k: int) -> jax.Array:
    """Deterministic keep-mask: ``keep_k`` evenly-strided True per row.

    The non-random counterpart of :func:`balanced_keep_mask`, used when the
    ``--mask`` flag disables the visual-mask augmentation (the reference
    parses that flag but never reads it, ``tav_nn.py:78`` — here it gates
    this for real). Same static shape/count contract as the random mask."""
    idx = jnp.floor(jnp.arange(keep_k) * (num_tokens / keep_k)).astype(
        jnp.int32)
    row = jnp.zeros((num_tokens,), bool).at[idx].set(True)
    return jnp.broadcast_to(row, (batch, num_tokens))


def gather_visible(x: jax.Array, keep: jax.Array, keep_k: int) -> jax.Array:
    """Select kept tokens in original order: [B, N, D] + keep [B, N] →
    [B, keep_k, D] (HF VideoMAE's ``x[~bool_masked_pos]`` reshape)."""
    # stable argsort of (not keep) puts kept indices first, in order
    order = jnp.argsort(jnp.logical_not(keep), axis=-1, stable=True)
    idx = order[:, :keep_k]
    return jnp.take_along_axis(x, idx[..., None], axis=1)
