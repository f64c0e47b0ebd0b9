"""Audio-path ops: wav2vec2 mask math, SpecAugment, masked pooling.

These replace the per-batch CPU collate math of the reference
(``models/tav.py:308-342`` conv-length/mask formulas, ``models/tav.py:269-306``
SpecAugment via HF ``_compute_mask_indices``, ragged mean-pool at
``models/tav.py:478``) with static-shape jitted ops that run on device.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

# wav2vec2 conv feature-extractor geometry (all reference checkpoints share it)
W2V2_KERNELS = (10, 3, 3, 3, 3, 2, 2)
W2V2_STRIDES = (5, 2, 2, 2, 2, 2, 2)


def conv_output_lengths(input_lengths: jax.Array,
                        kernels: Sequence[int] = W2V2_KERNELS,
                        strides: Sequence[int] = W2V2_STRIDES) -> jax.Array:
    """Output length of the strided conv stack — exact parity with the
    reference's formula (``models/tav.py:315-321``): floor((L-k)/s) + 1 per
    layer."""
    lengths = input_lengths.astype(jnp.int32)
    for k, s in zip(kernels, strides):
        lengths = (lengths - k) // s + 1
    return lengths


def feature_vector_attention_mask(feature_len: int,
                                  attention_mask: jax.Array,
                                  kernels: Sequence[int] = W2V2_KERNELS,
                                  strides: Sequence[int] = W2V2_STRIDES
                                  ) -> jax.Array:
    """Downsample a waveform keep-mask [B, T] to feature space [B, F]
    (reference ``models/tav.py:326-342``): positions before the conv output
    length are attended."""
    lengths = conv_output_lengths(attention_mask.sum(axis=-1), kernels, strides)
    idx = jnp.arange(feature_len)[None, :]
    mask = (idx < lengths[:, None]).astype(jnp.int32)
    # Pin the mask batch-sharded under a dp mesh (no-op otherwise): left
    # unconstrained, the SPMD partitioner shards the iota-compare along the
    # FRAME dim over the whole mesh and pays an involuntary full
    # rematerialization at every batch-sharded consumer (VERDICT r4).
    from mme_tpu.parallel.sharding_rules import batch_constraint
    return batch_constraint(mask)


def spec_augment_mask(rng: jax.Array, batch: int, seq_len: int,
                      mask_prob: float, mask_length: int,
                      attention_mask: jax.Array | None = None,
                      min_masks: int = 0) -> jax.Array:
    """SpecAugment span mask [B, S] (True = masked).

    Capability parity with HF ``_compute_mask_indices`` (used at
    ``models/tav.py:284-290``): expected masked fraction ≈ ``mask_prob``,
    spans of ``mask_length``, no spans beyond each row's real length.
    TPU-native deviation (documented): span starts are sampled with
    replacement from a static-size pool instead of numpy's dynamic
    without-replacement choice — same marginal distribution up to span
    overlaps, fully static shapes.
    """
    if attention_mask is not None:
        lengths = attention_mask.sum(axis=-1).astype(jnp.int32)
    else:
        lengths = jnp.full((batch,), seq_len, jnp.int32)

    # per-row number of spans, with HF's stochastic rounding epsilon
    eps_rng, start_rng = jax.random.split(rng)
    eps = jax.random.uniform(eps_rng, (batch,))
    num_spans = (mask_prob * lengths / mask_length + eps).astype(jnp.int32)
    num_spans = jnp.maximum(num_spans, min_masks)
    num_spans = jnp.minimum(num_spans, lengths // mask_length)

    max_spans = max(int(mask_prob * seq_len / mask_length) + min_masks + 1, 1)
    # sample span starts in [0, len - mask_length]
    hi = jnp.maximum(lengths - mask_length + 1, 1)
    u = jax.random.uniform(start_rng, (batch, max_spans))
    starts = (u * hi[:, None]).astype(jnp.int32)
    # deactivate spans beyond the per-row count
    span_active = jnp.arange(max_spans)[None, :] < num_spans[:, None]

    pos = jnp.arange(seq_len)[None, None, :]
    in_span = (pos >= starts[..., None]) & (pos < (starts + mask_length)[..., None])
    mask = jnp.any(in_span & span_active[..., None], axis=1)
    if attention_mask is not None:
        mask = mask & (jnp.arange(seq_len)[None, :] < lengths[:, None])
    # same rationale as feature_vector_attention_mask: pin the mask's
    # layout so the partitioner doesn't seq-shard the span compares
    from mme_tpu.parallel.sharding_rules import batch_constraint
    return batch_constraint(mask)


def apply_spec_augment(rng: jax.Array, hidden: jax.Array,
                       masked_embed: jax.Array,
                       time_mask_prob: float, time_mask_length: int,
                       feature_mask_prob: float, feature_mask_length: int,
                       attention_mask: jax.Array | None = None,
                       time_min_masks: int = 2,
                       feature_min_masks: int = 0) -> jax.Array:
    """Time masking (replace with learned embedding) + feature masking
    (zero), as in the reference PreFormer (``models/tav.py:269-306``)."""
    b, s, h = hidden.shape
    t_rng, f_rng = jax.random.split(rng)
    out = hidden
    if time_mask_prob > 0:
        tmask = spec_augment_mask(t_rng, b, s, time_mask_prob,
                                  time_mask_length, attention_mask,
                                  time_min_masks)
        out = jnp.where(tmask[..., None], masked_embed.astype(out.dtype), out)
    if feature_mask_prob > 0:
        fmask = spec_augment_mask(f_rng, b, h, feature_mask_prob,
                                  feature_mask_length, None,
                                  feature_min_masks)
        out = jnp.where(fmask[:, None, :], 0.0, out)
    return out


def masked_mean_pool(x: jax.Array, mask: jax.Array | None) -> jax.Array:
    """Mean over real (non-pad) positions — numerically identical to the
    ragged mean the reference gets from per-batch padding
    (``models/tav.py:478``). x: [B, S, H]; mask: [B, S] 1/0."""
    if mask is None:
        return x.mean(axis=1)
    m = mask.astype(x.dtype)[..., None]
    denom = jnp.maximum(m.sum(axis=1), 1.0)
    return (x * m).sum(axis=1) / denom
