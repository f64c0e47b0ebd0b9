"""Parity tests for the confusion-matrix metrics engine.

The reference uses torchmetrics (utils/global_functions.py:114-188); that
wheel is not in this image, so sklearn serves as the independent oracle —
torchmetrics' multiclass F1/P/R with zero_division=0 matches sklearn's
definitions, and per-class 'accuracy' (torchmetrics average='none') equals
per-class recall, which we assert directly.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mme_tpu.evals.metrics import Metrics, confusion_matrix, scores_from_confusion

from sklearn.metrics import (confusion_matrix as sk_confusion,
                             precision_recall_fscore_support)


def _random_case(seed, n, num_classes, missing_class=False):
    rng = np.random.RandomState(seed)
    preds = rng.randint(0, num_classes, size=n)
    target = rng.randint(0, num_classes, size=n)
    if missing_class:
        preds = preds % (num_classes - 1)
        target = target % (num_classes - 1)
    return preds, target


@pytest.mark.parametrize("seed,n,C,missing", [
    (0, 500, 7, False),
    (1, 257, 4, False),
    (2, 300, 6, True),
    (3, 50, 3, False),
])
def test_scores_match_sklearn(seed, n, C, missing):
    preds, target = _random_case(seed, n, C, missing)
    labels = list(range(C))
    cm = confusion_matrix(jnp.asarray(preds), jnp.asarray(target), C)
    s = scores_from_confusion(cm)

    np.testing.assert_array_equal(
        np.asarray(cm), sk_confusion(target, preds, labels=labels))

    prec, rec, f1, _ = precision_recall_fscore_support(
        target, preds, labels=labels, zero_division=0)
    np.testing.assert_allclose(np.asarray(s["precision"]), prec, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s["recall"]), rec, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s["f1"]), f1, atol=1e-6)
    # per-class accuracy == per-class recall (torchmetrics semantics)
    np.testing.assert_allclose(np.asarray(s["accuracy"]), rec, atol=1e-6)

    for avg, key in [("macro", "macro_f1"), ("weighted", "weighted_f1")]:
        _, _, ref_f1, _ = precision_recall_fscore_support(
            target, preds, labels=labels, average=avg, zero_division=0)
        np.testing.assert_allclose(float(s[key]), ref_f1, atol=1e-6,
                                   err_msg=f"mismatch in {key}")

    ref_prec, ref_rec, _, _ = precision_recall_fscore_support(
        target, preds, labels=labels, average="macro", zero_division=0)
    np.testing.assert_allclose(float(s["macro_precision"]), ref_prec, atol=1e-6)
    np.testing.assert_allclose(float(s["macro_recall"]), ref_rec, atol=1e-6)
    np.testing.assert_allclose(float(s["macro_accuracy"]), ref_rec, atol=1e-6)
    np.testing.assert_allclose(float(s["micro_accuracy"]),
                               (preds == target).mean(), atol=1e-6)


def test_metrics_wrapper_accumulates_and_resets():
    C = 5
    m = Metrics(C, {i: f"c{i}" for i in range(C)})
    p1, t1 = _random_case(10, 64, C)
    p2, t2 = _random_case(11, 64, C)
    m.update_metrics(jnp.asarray(p1), jnp.asarray(t1))
    m.update_metrics(jnp.asarray(p2), jnp.asarray(t2))

    both_p = np.concatenate([p1, p2])
    both_t = np.concatenate([t1, t2])
    _, _, ref, _ = precision_recall_fscore_support(
        both_t, both_p, labels=list(range(C)), average="weighted",
        zero_division=0)
    out = m.compute_scores("val")
    assert abs(out[6] - ref) < 1e-6  # weighted F1 is slot 6 of the 10-tuple
    assert "val/multiF1/c0" in out[1]

    m.reset_metrics()
    assert int(np.asarray(m.cm).sum()) == 0


def test_weighted_update_excludes_padding():
    C = 3
    m = Metrics(C, {i: str(i) for i in range(C)})
    preds = jnp.array([0, 1, 2, 2])
    target = jnp.array([0, 1, 1, 0])
    w = jnp.array([1, 1, 0, 0])  # last two rows are padding
    m.update_metrics(preds, target, w)
    cm = np.asarray(m.cm)
    assert cm.sum() == 2 and cm[0, 0] == 1 and cm[1, 1] == 1


def test_summary_key_scheme():
    C = 2
    m = Metrics(C, {0: "neg", 1: "pos"})
    m.update_metrics(jnp.array([0, 1]), jnp.array([0, 1]))
    d = m.summary("test")
    for k in ["test/acc", "test/weighted-f1-score", "test/macro-f1-score",
              "test/precision", "test/recall", "test/multiF1/pos",
              "test/multiAcc/neg"]:
        assert k in d
    assert d["test/acc"] == 1.0
