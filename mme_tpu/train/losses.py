"""Losses: cross entropy with torch-compatible class weighting and the
epoch-parity switching loss.

Capability parity targets in the reference:
- ``utils/global_functions.py:51-83`` ``NewCrossEntropyLoss`` — even epochs
  use plain CE, odd epochs class-weighted CE (the ``epoch`` is a forward
  argument);
- class weights ``w_c = 1 − n_c/N`` sorted by class id (``tav_nn.py:171``).

torch ``CrossEntropyLoss(weight=w)`` semantics are reproduced exactly:
the batch loss is ``sum_i w[y_i]·nll_i / sum_i w[y_i]`` (weighted mean, not
mean of weighted terms). Implemented as pure functions of an explicit weight
vector so a single compiled train step serves both parities — the epoch
switch selects the weight vector, not a different program.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def class_weights_from_counts(counts: np.ndarray) -> np.ndarray:
    """``w_c = 1 − n_c/N`` (reference ``tav_nn.py:171``)."""
    counts = np.asarray(counts, np.float64)
    return (1.0 - counts / counts.sum()).astype(np.float32)


def cross_entropy(logits: jax.Array, labels: jax.Array,
                  class_weights: Optional[jax.Array] = None,
                  sample_mask: Optional[jax.Array] = None) -> jax.Array:
    """torch-compatible (optionally class-weighted) mean CE.

    ``sample_mask`` (1/0) drops padded batch rows without dynamic shapes.
    """
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32),
                               axis=-1)[:, 0]
    if class_weights is not None:
        w = class_weights[labels]
    else:
        w = jnp.ones_like(nll)
    if sample_mask is not None:
        w = w * sample_mask.astype(w.dtype)
    return (nll * w).sum() / jnp.maximum(w.sum(), 1e-9)


def epoch_parity_weights(class_weights: jax.Array, epoch: jax.Array,
                         epoch_switch: int) -> jax.Array:
    """The NewCrossEntropyLoss switch as a weight-vector select: even
    ``epoch % epoch_switch`` → uniform weights (plain CE), else the class
    weights (``utils/global_functions.py:69-83``)."""
    uniform = jnp.ones_like(class_weights)
    use_weighted = (epoch % epoch_switch) != 0
    return jnp.where(use_weighted, class_weights, uniform)
