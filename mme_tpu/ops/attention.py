"""Attention ops: one dispatcher, two backends.

- ``dot_product_attention``: the numerics contract (softmax(QK^T/sqrt(d) + bias)V
  with fp32 softmax). On TPU, long-sequence calls route to the Pallas flash
  kernel in ``mme_tpu.ops.flash_attention``; everything else (CPU tests, tiny
  shapes) uses the XLA path below, which the flash kernel is tested against.

Replaces the reference's three eager-PyTorch attention implementations
(``utils/TAVFormer.py:10-90`` scratch MHA, ``utils/TAVFormer.py:312-391``
VideoMAE copy, plus every HF-internal attention it calls). Deliberate
deviation from the reference: the VideoMAE copy adds its additive mask AFTER
the softmax (``utils/TAVFormer.py:372-375``) and PreFormer builds the audio
mask with an operator-precedence bug (``models/tav.py:390``); both are bugs,
not capabilities — here masks are always additive pre-softmax biases.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def additive_mask(bool_mask: jax.Array, dtype=jnp.float32) -> jax.Array:
    """[B, S] 1/0 (or bool) keep-mask → [B, 1, 1, S] additive bias."""
    m = bool_mask.astype(dtype)
    return ((1.0 - m) * NEG_INF)[:, None, None, :]


def _xla_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                   bias: Optional[jax.Array],
                   softmax_dtype=jnp.float32) -> jax.Array:
    """Plain XLA attention. q,k,v: [B, H, S, D]; bias broadcastable to
    [B, H, Sq, Sk]."""
    depth = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(depth, softmax_dtype))
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=softmax_dtype)
    logits = logits * scale
    if bias is not None:
        logits = logits + bias.astype(softmax_dtype)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


def _decide_flash(seq: int, head_dim: int, bias) -> bool:
    on_tpu = jax.default_backend() == "tpu"
    bias_ok = bias is None or (bias.ndim == 4 and bias.shape[1] == 1
                               and bias.shape[2] == 1)
    # crossover measured on v5e (scripts/flash_crossover.py, fwd+bwd with
    # q/k/v grads + key bias, head-packed merged-bwd kernel): flash wins
    # at S=473 (fusion trunk, 1.07×) and S=512 (1.24×); XLA wins at
    # S=299 (audio) and S=70 (text). 448 splits the measured points; the
    # flash path also avoids materializing the [B,H,S,S] fp32 probs XLA
    # saves for its backward (~1.3 GB across the 12 fusion layers).
    # Round-1's ≥1024 threshold predates head packing + the merged bwd.
    try:
        min_seq = int(os.environ.get("MME_FLASH_MIN_SEQ", 448))
    except ValueError:
        min_seq = 448
    return (on_tpu and seq >= min_seq and head_dim in (64, 128) and bias_ok
            and os.environ.get("MME_FLASH", "1") != "0")


def dot_product_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                          bias: Optional[jax.Array] = None,
                          *,
                          use_flash: Optional[bool] = None,
                          softmax_dtype=jnp.float32) -> jax.Array:
    """Multi-head attention core. q,k,v: [B, H, S, D].

    ``use_flash=None`` → auto: Pallas flash kernel on TPU when the sequence
    is long enough to pay for it and head_dim is lane-aligned.
    """
    if use_flash is None:
        use_flash = _decide_flash(q.shape[-2], q.shape[-1], bias)
    if use_flash:
        from mme_tpu.ops.flash_attention import flash_attention
        return flash_attention(q, k, v, bias)
    return _xla_attention(q, k, v, bias, softmax_dtype)


def dot_product_attention_shd(q: jax.Array, k: jax.Array, v: jax.Array,
                              bias: Optional[jax.Array] = None,
                              *,
                              use_flash: Optional[bool] = None,
                              softmax_dtype=jnp.float32) -> jax.Array:
    """Head-minor attention core: q,k,v [B, S, H, D] → [B, S, H, D].

    This is the layout the fused QKV projection produces and the output
    projection consumes — using it end-to-end removes two relayouts per
    attention layer on the flash path (the kernel packs head pairs itself,
    see ops/flash_attention.py).
    """
    if use_flash is None:
        use_flash = _decide_flash(q.shape[1], q.shape[-1], bias)
    if use_flash:
        from mme_tpu.ops.flash_attention import flash_attention_shd
        return flash_attention_shd(q, k, v, bias)
    depth = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(depth, softmax_dtype))
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=softmax_dtype) * scale
    if bias is not None:
        logits = logits + bias.astype(softmax_dtype)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)
