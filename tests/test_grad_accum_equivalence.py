"""Dialog-aligned gradient accumulation ≡ batch update.

Round-1 regression: the loop scaled each micro-step loss by 1/dialog_size
AND the boundary update divided the accumulated grads by the micro-step
count — a double division making every odd-epoch update dialog_size× too
small. The reference semantics (``train_model/tav_train.py:96-105``:
loss/size per sample + summed grads, step at the dialog boundary) is exactly
the batch-mean update, which these tests pin down at both the step level and
the loop level.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mme_tpu.core.config import ExperimentConfig
from mme_tpu.data.dataset import ArrayDataset
from mme_tpu.evals.metrics import Metrics
from mme_tpu.train.loop import train_network
from mme_tpu.train.steps import TrainState, make_optimizer, make_train_step


def _linear_apply(variables, batch, deterministic, rngs):
    p = variables["params"]
    return batch["x"] @ p["w"] + p["b"]


def _make_step_and_params(D=6, C=3, lr=0.1, clip=10.0):
    rng = np.random.RandomState(0)
    params = {"w": jnp.asarray(rng.randn(D, C), jnp.float32),
              "b": jnp.zeros((C,), jnp.float32)}
    tx = make_optimizer(lambda step: lr, weight_decay=0.0, clip=clip)
    step = make_train_step(_linear_apply, tx, C, donate=False)
    return step, tx, params


def test_accumulated_dialog_equals_one_batch():
    N, D, C = 4, 6, 3
    rng = np.random.RandomState(1)
    x = rng.randn(N, D).astype(np.float32)
    y = np.array([0, 1, 2, 0])
    step, tx, params = _make_step_and_params(D, C)
    cw = jnp.ones((C,), jnp.float32)
    one = jnp.asarray(1.0, jnp.float32)
    key = jax.random.PRNGKey(0)

    # Path A: the N samples as ONE batch, single update.
    sA = TrainState.create(params, tx)
    sA, loss_a, _, _ = step(sA, {"x": jnp.asarray(x)}, jnp.asarray(y),
                            jnp.ones((N,), jnp.int32), cw, one,
                            jnp.asarray(True), key)

    # Path B: the same N samples accumulated one-at-a-time as one dialog,
    # update applied only at the boundary (what the loop does on odd epochs).
    sB = TrainState.create(params, tx)
    micro_losses = []
    for i in range(N):
        sB, loss_b, _, _ = step(sB, {"x": jnp.asarray(x[i:i + 1])},
                                jnp.asarray(y[i:i + 1]),
                                jnp.ones((1,), jnp.int32), cw, one,
                                jnp.asarray(i == N - 1), key)
        micro_losses.append(float(loss_b))

    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6),
        sA.params, sB.params)
    # and the dialog's mean micro-loss equals the batch loss
    assert abs(np.mean(micro_losses) - float(loss_a)) < 1e-6


def test_partial_dialog_at_epoch_end_uses_its_own_count():
    # A forced update mid-dialog (epoch end) must average over the number of
    # micro-steps actually accumulated, not the full dialog size.
    D, C = 6, 3
    rng = np.random.RandomState(2)
    x = rng.randn(2, D).astype(np.float32)
    y = np.array([1, 2])
    step, tx, params = _make_step_and_params(D, C)
    cw = jnp.ones((C,), jnp.float32)
    one = jnp.asarray(1.0, jnp.float32)
    key = jax.random.PRNGKey(0)

    sA = TrainState.create(params, tx)
    sA, _, _, _ = step(sA, {"x": jnp.asarray(x)}, jnp.asarray(y),
                       jnp.ones((2,), jnp.int32), cw, one,
                       jnp.asarray(True), key)
    sB = TrainState.create(params, tx)
    for i in range(2):
        sB, _, _, _ = step(sB, {"x": jnp.asarray(x[i:i + 1])},
                           jnp.asarray(y[i:i + 1]),
                           jnp.ones((1,), jnp.int32), cw, one,
                           jnp.asarray(i == 1), key)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6),
        sA.params, sB.params)


class _NullCheckpoints:
    def has_best(self):
        return False

    def save_best(self, state, meta):
        pass

    def restore_best(self, state):
        raise AssertionError("unreachable")


class _CaptureState:
    """Duck-typed TrainState standing in for the jitted step's state."""

    def __init__(self):
        self.step = 0
        self.params = None
        self.batch_stats = None


def test_loop_passes_unit_loss_scale_and_dialog_boundaries():
    # dialogs: sizes [3, 2] → boundaries after samples 2 and 4
    dialogs = np.array([0, 0, 0, 1, 1])
    n = len(dialogs)
    ds = ArrayDataset({"x": np.zeros((n, 2), np.float32)},
                      np.zeros(n, np.int64), dialog_ids=dialogs)
    cfg = ExperimentConfig(batch_size=1, epoch=2, epoch_switch=2,
                           log_val=1000, patience=100)
    calls = []

    def fake_train_step(state, batch, labels, mask, cw, loss_scale,
                        apply_update, rng):
        calls.append((float(loss_scale), bool(apply_update)))
        state.step += 1
        return (state, jnp.asarray(1.0), jnp.zeros((3, 3), jnp.int32),
                jnp.asarray(0.0))

    def fake_eval_step(params, batch_stats, batch, labels, mask, cw):
        return (jnp.asarray(1.0), jnp.zeros((3, 3), jnp.int32),
                jnp.zeros_like(labels))

    metric = Metrics(3, {0: "a", 1: "b", 2: "c"})
    train_network(fake_train_step, fake_eval_step, _CaptureState(),
                  ds, ds, cfg, metric,
                  class_weights=np.ones(3, np.float32),
                  sample_weights=np.ones(n, np.float32),
                  rng=jax.random.PRNGKey(0),
                  checkpoints=_NullCheckpoints())

    assert len(calls) == 2 * n
    # every micro-step (both epochs) must use loss_scale == 1.0
    assert all(s == 1.0 for s, _ in calls)
    # epoch 0 (even): update on every step
    assert [u for _, u in calls[:n]] == [True] * n
    # epoch 1 (odd, sequential order): updates only at dialog boundaries
    assert [u for _, u in calls[n:]] == [False, False, True, False, True]


def test_batch_gt_1_closes_virtual_batch_on_contained_boundary():
    # dialogs sized [3, 3]; batch_size=2 → batches cover samples
    # (0,1) (2,3) (4,5): boundaries at samples 2 and 5 land in batches 1,2.
    dialogs = np.array([0, 0, 0, 1, 1, 1])
    n = len(dialogs)
    ds = ArrayDataset({"x": np.zeros((n, 2), np.float32)},
                      np.zeros(n, np.int64), dialog_ids=dialogs)
    cfg = ExperimentConfig(batch_size=2, epoch=2, epoch_switch=2,
                           log_val=1000, patience=100)
    calls = []

    def fake_train_step(state, batch, labels, mask, cw, loss_scale,
                        apply_update, rng):
        calls.append((float(loss_scale), bool(apply_update)))
        state.step += 1
        return (state, jnp.asarray(1.0), jnp.zeros((3, 3), jnp.int32),
                jnp.asarray(0.0))

    def fake_eval_step(params, batch_stats, batch, labels, mask, cw):
        return (jnp.asarray(1.0), jnp.zeros((3, 3), jnp.int32),
                jnp.zeros_like(labels))

    metric = Metrics(3, {0: "a", 1: "b", 2: "c"})
    train_network(fake_train_step, fake_eval_step, _CaptureState(),
                  ds, ds, cfg, metric,
                  class_weights=np.ones(3, np.float32),
                  sample_weights=np.ones(n, np.float32),
                  rng=jax.random.PRNGKey(0),
                  checkpoints=_NullCheckpoints())
    assert all(s == 1.0 for s, _ in calls)
    # epoch 1 (odd): 3 batches, updates where a dialog boundary falls
    assert [u for _, u in calls[3:]] == [False, True, True]
