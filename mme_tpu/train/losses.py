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


def _soft_pr(logits: jax.Array, labels: jax.Array,
             sample_mask: Optional[jax.Array], epsilon: float):
    """Per-class soft precision/recall from softmax probabilities (the
    reference's F1_Loss prototype, ``notebooks/loss.ipynb`` cell 0 — the
    code its ``TripleModels/tav_nn.py:18`` import expected but never had)."""
    num_classes = logits.shape[-1]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    if sample_mask is not None:
        m = sample_mask.astype(jnp.float32)[:, None]
        probs = probs * m
        onehot = onehot * m
    tp = (onehot * probs).sum(axis=0)
    fp = ((1.0 - onehot) * probs).sum(axis=0)
    fn = (onehot * (1.0 - probs)).sum(axis=0)
    precision = tp / (tp + fp + epsilon)
    recall = tp / (tp + fn + epsilon)
    return precision, recall


def soft_fbeta_loss(logits: jax.Array, labels: jax.Array,
                    class_weights: Optional[jax.Array] = None,
                    sample_mask: Optional[jax.Array] = None,
                    *, beta: float = 1.0,
                    epsilon: float = 1e-7) -> jax.Array:
    """Differentiable 1 − weighted-mean F_beta over classes (``--loss
    FBeta`` + ``--beta``; the search space of record uses beta ∈ {0.5, 1},
    ``hyper_parameter_config/loss.yaml``). The reference prototype summed
    unnormalized per-class F1 (could go negative); here the class weights
    normalize to a mean so the loss stays in [0, 1]."""
    precision, recall = _soft_pr(logits, labels, sample_mask, epsilon)
    b2 = beta * beta
    fbeta = (1.0 + b2) * precision * recall / (b2 * precision + recall
                                               + epsilon)
    fbeta = jnp.clip(fbeta, epsilon, 1.0 - epsilon)
    w = (class_weights.astype(jnp.float32) if class_weights is not None
         else jnp.ones_like(fbeta))
    return 1.0 - (fbeta * w).sum() / jnp.maximum(w.sum(), 1e-9)


def soft_precision_loss(logits: jax.Array, labels: jax.Array,
                        class_weights: Optional[jax.Array] = None,
                        sample_mask: Optional[jax.Array] = None,
                        *, epsilon: float = 1e-7) -> jax.Array:
    """1 − weighted-mean soft precision (``--loss Precision``)."""
    precision, _ = _soft_pr(logits, labels, sample_mask, epsilon)
    precision = jnp.clip(precision, epsilon, 1.0 - epsilon)
    w = (class_weights.astype(jnp.float32) if class_weights is not None
         else jnp.ones_like(precision))
    return 1.0 - (precision * w).sum() / jnp.maximum(w.sum(), 1e-9)


def make_loss_fn(name: str, beta: float = 1.0):
    """Map the ``--loss`` flag (reference ``arg_parse``) to a loss
    callable with the (logits, labels, class_weights, sample_mask)
    signature the train/eval steps expect. "CrossEntropy" and
    "NewCrossEntropy" share cross_entropy — the epoch-parity switching
    lives in the WEIGHT VECTOR (epoch_parity_weights), not the function."""
    if name in ("CrossEntropy", "NewCrossEntropy"):
        return cross_entropy
    if name == "FBeta":
        import functools
        return functools.partial(soft_fbeta_loss, beta=beta)
    if name == "Precision":
        return soft_precision_loss
    raise ValueError(f"unknown loss {name!r} (CrossEntropy, "
                     f"NewCrossEntropy, FBeta, Precision)")
