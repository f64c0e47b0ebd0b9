"""End-to-end loop test: tiny classifier on synthetic data through the full
policy stack (epoch-parity sampling/loss/accum, mid-epoch val, best-ckpt,
patience, best-reload). This is the loop-policy test battery SURVEY.md §4
calls for."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from mme_tpu.core.config import ExperimentConfig
from mme_tpu.data.dataset import ArrayDataset
from mme_tpu.evals.metrics import Metrics
from mme_tpu.train.loop import LoopCallbacks, evaluate, train_network
from mme_tpu.train.losses import class_weights_from_counts
from mme_tpu.train.policies import sample_weights_from_labels
from mme_tpu.train.schedules import cosine_warm_restarts
from mme_tpu.train.steps import TrainState, make_eval_step, make_optimizer, \
    make_train_step


class TinyMLP(nn.Module):
    classes: int = 3

    @nn.compact
    def __call__(self, batch, *, deterministic=True):
        x = batch["x"]
        x = nn.Dense(32)(x)
        x = nn.relu(x)
        x = nn.Dropout(0.1)(x, deterministic=deterministic)
        return nn.Dense(self.classes)(x)


_CENTERS = np.random.RandomState(123).randn(3, 8) * 3


def _synthetic(n=240, d=8, classes=3, seed=0):
    rng = np.random.RandomState(seed)
    labels = rng.randint(0, classes, n)
    x = _CENTERS[labels] + rng.randn(n, d)
    dialogs = np.repeat(np.arange(n // 4), 4)[:n]
    return ArrayDataset({"x": x.astype(np.float32)}, labels.astype(np.int64),
                        dialog_ids=dialogs)


def _setup(tmp_path, **cfg_overrides):
    cfg = ExperimentConfig(epoch=4, batch_size=16, learning_rate=5e-3,
                           epoch_switch=2, patience=50, T_max=2, log_val=5,
                           output_dim=3, checkpoint_dir=str(tmp_path / "ck"))
    cfg = cfg.replace(**cfg_overrides)
    train_ds = _synthetic(seed=0)
    val_ds = _synthetic(n=60, seed=1)
    test_ds = _synthetic(n=60, seed=2)
    model = TinyMLP()
    params = model.init(jax.random.PRNGKey(0),
                        {"x": jnp.zeros((1, 8), jnp.float32)})["params"]

    def apply_fn(variables, batch, deterministic=True, rngs=None,
                 mutable=None):
        return model.apply(variables, batch, deterministic=deterministic,
                           rngs=rngs)

    steps_per_epoch = int(np.ceil(len(train_ds) / cfg.batch_size))
    tx = make_optimizer(
        cosine_warm_restarts(cfg.learning_rate, cfg.T_max, steps_per_epoch),
        cfg.weight_decay, cfg.clip)
    state = TrainState.create(params, tx)
    train_step = make_train_step(apply_fn, tx, num_classes=3)
    eval_step = make_eval_step(apply_fn, num_classes=3)
    return cfg, train_ds, val_ds, test_ds, state, train_step, eval_step


def test_loop_trains_and_evaluates(tmp_path):
    cfg, train_ds, val_ds, test_ds, state, train_step, eval_step = \
        _setup(tmp_path)
    counts = np.bincount(train_ds.labels, minlength=3)
    cw = class_weights_from_counts(counts)
    sw = sample_weights_from_labels(train_ds.labels, cw)
    metric = Metrics(3, {i: str(i) for i in range(3)})
    logs = []
    cb = LoopCallbacks(log=logs.append)

    state = train_network(train_step, eval_step, state, train_ds, val_ds,
                          cfg, metric, cw, sw, jax.random.PRNGKey(0),
                          callbacks=cb)
    summary = evaluate(eval_step, state, test_ds, cfg, metric, callbacks=cb)
    assert summary["test/acc"] > 0.8, summary
    # both loss parities and validation cadence exercised
    assert any("train/loss" in d for d in logs)
    assert any("val/loss" in d for d in logs)


def test_patience_stops_training(tmp_path):
    # lr 0 → val never improves twice
    cfg, train_ds, val_ds, _, state, train_step, eval_step = _setup(
        tmp_path, patience=1.0, epoch=50, log_val=2, learning_rate=0.0)
    counts = np.bincount(train_ds.labels, minlength=3)
    cw = class_weights_from_counts(counts)
    sw = sample_weights_from_labels(train_ds.labels, cw)
    metric = Metrics(3, {i: str(i) for i in range(3)})
    n_vals = []
    cb = LoopCallbacks(log=lambda d: n_vals.append("val/loss" in d and d))
    state = train_network(train_step, eval_step, state, train_ds, val_ds,
                          cfg, metric, cw, sw, jax.random.PRNGKey(0),
                          callbacks=cb)
    vals = [d for d in n_vals if d]
    # patience=1: second non-improving validation breaks; far fewer than 50
    # epochs' worth of validations happened
    assert len(vals) < 10
