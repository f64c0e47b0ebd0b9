"""Classification metrics as a single device-resident confusion matrix.

Capability parity with the reference's ``Metrics`` engine
(``utils/global_functions.py:114-188``), which keeps ten separate torchmetrics
objects (per-class + macro + weighted F1/Precision/Recall/Accuracy + confusion
matrix). TPU-native redesign: every one of those statistics is a pure function
of the confusion matrix, so we accumulate exactly one ``[C, C]`` int32 array —
updates are a one-scatter jitted op that can live inside the train step, and
multi-chip reduction is a single ``psum`` over the matrix (the reference had no
multi-device story at all, SURVEY.md §2.9).

Emitted score-dict keys match the reference wandb scheme
(``"{split}/multiF1/{label}"`` etc., ``utils/global_functions.py:188`` and
``train_model/tav_train.py:170-183``).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def confusion_matrix(preds: jax.Array, target: jax.Array,
                     num_classes: int,
                     weights: Optional[jax.Array] = None) -> jax.Array:
    """``cm[t, p]`` counts samples with true class ``t`` predicted ``p``.

    Rows = targets, columns = predictions (torchmetrics convention, so the
    printed matrices line up with the reference's logs). ``weights`` (0/1)
    lets padded batch rows be excluded without dynamic shapes.
    """
    preds = preds.reshape(-1).astype(jnp.int32)
    target = target.reshape(-1).astype(jnp.int32)
    if weights is None:
        w = jnp.ones_like(preds)
    else:
        w = weights.reshape(-1).astype(jnp.int32)
    idx = target * num_classes + preds
    flat = jnp.zeros((num_classes * num_classes,), jnp.int32).at[idx].add(w)
    return flat.reshape(num_classes, num_classes)


def _safe_div(num: jax.Array, den: jax.Array) -> jax.Array:
    return jnp.where(den > 0, num / jnp.where(den > 0, den, 1.0), 0.0)


def scores_from_confusion(cm: jax.Array) -> Dict[str, jax.Array]:
    """All reference statistics from one confusion matrix.

    torchmetrics semantics (validated by tests/test_metrics.py parity tests):
    - per-class accuracy (``average='none'``) equals per-class recall;
    - macro accuracy is the mean of per-class recall;
    - classes absent from both target and prediction score 0;
    - weighted F1 weights per-class F1 by target support.
    """
    cm = cm.astype(jnp.float32)
    tp = jnp.diagonal(cm)
    support = cm.sum(axis=1)       # true count per class
    pred_count = cm.sum(axis=0)    # predicted count per class
    total = cm.sum()

    precision = _safe_div(tp, pred_count)
    recall = _safe_div(tp, support)
    f1 = _safe_div(2 * precision * recall, precision + recall)

    macro_f1 = f1.mean()
    weighted_f1 = _safe_div((f1 * support).sum(), total)
    macro_rec = recall.mean()
    macro_prec = precision.mean()
    macro_acc = recall.mean()  # torchmetrics MulticlassAccuracy(average='macro')
    micro_acc = _safe_div(tp.sum(), total)

    return {
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "accuracy": recall,  # per-class accuracy == per-class recall
        "macro_f1": macro_f1,
        "weighted_f1": weighted_f1,
        "macro_recall": macro_rec,
        "macro_precision": macro_prec,
        "macro_accuracy": macro_acc,
        "micro_accuracy": micro_acc,
    }


class Metrics:
    """Stateful host-side wrapper mirroring the reference ``Metrics`` API
    (``update_metrics`` / ``compute_scores`` / ``reset_metrics``) on top of
    the single-confusion-matrix engine."""

    def __init__(self, num_classes: int, id2label: Dict[int, str]):
        self.num_classes = num_classes
        self.id2label = id2label
        self._update = jax.jit(
            lambda cm, p, t, w: cm + confusion_matrix(p, t, num_classes, w))
        self.reset_metrics()

    def reset_metrics(self) -> None:
        self.cm = jnp.zeros((self.num_classes, self.num_classes), jnp.int32)

    def update_metrics(self, preds: jax.Array, target: jax.Array,
                       weights: Optional[jax.Array] = None) -> None:
        if weights is None:
            weights = jnp.ones(np.shape(preds), jnp.int32).reshape(-1)
        self.cm = self._update(self.cm, preds, target, weights)

    def merge(self, cm: jax.Array) -> None:
        """Fold in a confusion matrix produced inside a jitted/sharded step."""
        self.cm = self.cm + cm.astype(jnp.int32)

    def compute_scores(self, name: str) -> Tuple[Dict[str, float], Dict[str, float],
                                                 Dict[str, float], Dict[str, float],
                                                 float, float, float, float, float,
                                                 np.ndarray]:
        """Returns the reference 10-tuple: four per-class dicts keyed
        ``"{name}/multi{Acc,F1,Rec,Prec}/{label}"``, then scalar macro-acc,
        macro-F1, weighted-F1, macro-recall, macro-precision, and the
        confusion matrix (``utils/global_functions.py:188``)."""
        s = jax.device_get(scores_from_confusion(self.cm))
        lbl = self.id2label
        multi_acc = {f"{name}/multiAcc/{lbl[i]}": float(s["accuracy"][i])
                     for i in range(self.num_classes)}
        multi_f1 = {f"{name}/multiF1/{lbl[i]}": float(s["f1"][i])
                    for i in range(self.num_classes)}
        multi_rec = {f"{name}/multiRec/{lbl[i]}": float(s["recall"][i])
                     for i in range(self.num_classes)}
        multi_prec = {f"{name}/multiPrec/{lbl[i]}": float(s["precision"][i])
                      for i in range(self.num_classes)}
        return (multi_acc, multi_f1, multi_rec, multi_prec,
                float(s["macro_accuracy"]), float(s["macro_f1"]),
                float(s["weighted_f1"]), float(s["macro_recall"]),
                float(s["macro_precision"]), np.asarray(jax.device_get(self.cm)))

    def summary(self, name: str, include_confusion: bool = False
                ) -> Dict[str, float]:
        """Flat scalar dict in the reference's ``log()`` key scheme
        (``train_model/tav_train.py:170-183``). ``include_confusion`` adds
        the matrix (the reference prints it on every log, ``:180``)."""
        (multi_acc, multi_f1, multi_rec, multi_prec,
         acc, f1_macro, f1_weighted, rec, prec, cm) = self.compute_scores(name)
        d = {
            f"{name}/acc": acc,
            f"{name}/precision": prec,
            f"{name}/recall": rec,
            f"{name}/weighted-f1-score": f1_weighted,
            f"{name}/macro-f1-score": f1_macro,
        }
        d.update(multi_f1)
        d.update(multi_rec)
        d.update(multi_prec)
        d.update(multi_acc)
        if include_confusion:
            d[f"{name}/confusion_matrix"] = cm.tolist()
        return d
