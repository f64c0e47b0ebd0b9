"""Parity tests for losses, schedules, and loop policies vs torch oracles."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from mme_tpu.train.losses import (class_weights_from_counts, cross_entropy,
                                  epoch_parity_weights)
from mme_tpu.train.schedules import cosine_warm_restarts
from mme_tpu.train.policies import (DialogAccumulator, dialog_counts,
                                    epoch_order)


def test_weighted_ce_matches_torch():
    rng = np.random.RandomState(0)
    logits = rng.randn(16, 5).astype(np.float32)
    labels = rng.randint(0, 5, 16)
    w = rng.rand(5).astype(np.float32) + 0.1

    ref = torch.nn.CrossEntropyLoss(weight=torch.tensor(w))(
        torch.tensor(logits), torch.tensor(labels)).item()
    ours = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                               jnp.asarray(w)))
    assert abs(ref - ours) < 5e-6

    ref_plain = torch.nn.CrossEntropyLoss()(
        torch.tensor(logits), torch.tensor(labels)).item()
    ours_plain = float(cross_entropy(jnp.asarray(logits),
                                     jnp.asarray(labels)))
    assert abs(ref_plain - ours_plain) < 5e-6


def test_sample_mask_drops_padding():
    logits = jnp.asarray(np.random.RandomState(1).randn(4, 3),
                         jnp.float32)
    labels = jnp.asarray([0, 1, 2, 0])
    full = cross_entropy(logits[:2], labels[:2])
    masked = cross_entropy(logits, labels,
                           sample_mask=jnp.asarray([1, 1, 0, 0]))
    assert abs(float(full) - float(masked)) < 1e-6


def test_epoch_parity_weights():
    cw = jnp.asarray([0.9, 0.5, 0.1])
    even = epoch_parity_weights(cw, jnp.asarray(0), 2)
    odd = epoch_parity_weights(cw, jnp.asarray(1), 2)
    np.testing.assert_allclose(np.asarray(even), [1, 1, 1])
    np.testing.assert_allclose(np.asarray(odd), np.asarray(cw))


def test_class_weights_formula():
    counts = np.array([4709, 1743, 683, 1109, 1205, 268, 271])  # MELD-ish
    w = class_weights_from_counts(counts)
    np.testing.assert_allclose(w, 1 - counts / counts.sum(), atol=1e-6)


def test_cosine_warm_restarts_matches_torch():
    base_lr, t0, spe = 1e-3, 2, 7
    sched = cosine_warm_restarts(base_lr, t0, spe)
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([p], lr=base_lr)
    tsched = torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(opt, T_0=t0)
    ref, ours = [], []
    # reference stepping convention: scheduler.step(epoch + batch/iters)
    for epoch in range(5):
        for b in range(spe):
            step = epoch * spe + b
            ours.append(float(sched(step)))
            ref.append(opt.param_groups[0]["lr"])
            tsched.step(epoch + (b + 1) / spe)
    np.testing.assert_allclose(ours[1:], ref[1:], rtol=1e-5)


def test_epoch_order_parity():
    rng = np.random.default_rng(0)
    w = np.array([0.1, 0.1, 10.0, 0.1])
    even = epoch_order(rng, 0, 2, w, 4000)
    # heavily-weighted index 2 dominates the multinomial epoch
    assert (even == 2).mean() > 0.9
    odd = epoch_order(rng, 1, 2, w, 4000)
    np.testing.assert_array_equal(odd, np.arange(4000))


def test_dialog_accumulator_matches_reference_semantics():
    # reference: grad = value_counts().sort_index(); retGradAccum yields
    # (dialog_size, prefix_sum) and flags boundaries at i+1 == prefix
    dialogs = [0, 0, 0, 1, 1, 2, 2, 2, 2]
    counts = dialog_counts(dialogs)
    assert counts == [3, 2, 4]
    acc = DialogAccumulator(counts)
    sizes, bounds = zip(*[acc.step(i) for i in range(len(dialogs))])
    assert sizes == (3, 3, 3, 2, 2, 4, 4, 4, 4)
    assert bounds == (False, False, True, False, True,
                      False, False, False, True)
