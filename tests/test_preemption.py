"""Graceful preemption (train/loop.py SIGTERM drain + latest-slot resume):
the SLURM walltime story the reference had nothing for (SURVEY.md §5.3)."""

import os
import signal

import numpy as np
import pytest

import jax

from mme_tpu.train.checkpoint import CheckpointManager
from mme_tpu.train.loop import evaluate, train_network
from mme_tpu.train.losses import class_weights_from_counts
from mme_tpu.train.policies import sample_weights_from_labels
from mme_tpu.evals.metrics import Metrics

from tests.test_train_loop import _setup, _synthetic


def _train(cfg, train_ds, val_ds, state, train_step, eval_step, ckpts,
           batch_transform=None, resume=False):
    counts = np.bincount(train_ds.labels, minlength=3)
    cw = class_weights_from_counts(counts)
    sw = sample_weights_from_labels(train_ds.labels, cw)
    metric = Metrics(3, {0: "a", 1: "b", 2: "c"})
    kwargs = {}
    if batch_transform is not None:
        kwargs["batch_transform"] = batch_transform
    return train_network(train_step, eval_step, state, train_ds, val_ds,
                         cfg, metric, cw, sw, jax.random.PRNGKey(0),
                         checkpoints=ckpts, resume=resume, **kwargs)


def test_sigterm_saves_latest_and_stops(tmp_path):
    cfg, train_ds, val_ds, test_ds, state, train_step, eval_step = \
        _setup(tmp_path, epoch=50, patience=10_000)
    ckpts = CheckpointManager(cfg.checkpoint_dir)

    fired = {"n": 0}

    def trigger(rng, batch):
        fired["n"] += 1
        if fired["n"] == 7:
            os.kill(os.getpid(), signal.SIGTERM)
        return batch

    # without the drain, 50 epochs × 15 batches = 750 transforms; the
    # SIGTERM at batch 7 must stop the run almost immediately
    _train(cfg, train_ds, val_ds, state, train_step, eval_step, ckpts,
           batch_transform=trigger)
    assert fired["n"] < 40
    assert ckpts.has_latest()
    # the loop stores the stripped structure (no accum buffer)
    stripped = state.replace(accum_grads=None)
    _, meta = ckpts.restore_latest(stripped)
    assert meta["preempted"] is True


def test_resume_prefers_latest_over_best(tmp_path):
    cfg, train_ds, val_ds, test_ds, state, train_step, eval_step = \
        _setup(tmp_path, epoch=3, patience=10_000)
    ckpts = CheckpointManager(cfg.checkpoint_dir)
    # best from epoch 0; latest (preempted) from epoch 2 — checkpoints
    # carry the loop's stripped structure (no accum buffer)
    stripped = state.replace(accum_grads=None)
    ckpts.save_best(stripped, {"epoch": 0, "val_loss": 0.9})
    marked = stripped.replace(step=state.step + 123)
    ckpts.save_latest(marked, {"epoch": 2, "val_loss": 0.8,
                               "preempted": True})

    seen = {"n": 0}

    def count(rng, batch):
        seen["n"] += 1
        return batch

    _train(cfg, train_ds, val_ds, state, train_step, eval_step, ckpts,
           batch_transform=count, resume=True)
    # resumed at epoch 2 of 3 → ONE epoch of train+val batches, not three
    steps_per_epoch = int(np.ceil(len(train_ds) / cfg.batch_size))
    val_per_round = int(np.ceil(len(val_ds) / cfg.batch_size))
    one_epoch_max = steps_per_epoch * (1 + val_per_round)  # loose bound
    assert steps_per_epoch <= seen["n"] <= one_epoch_max
    # a fresh (non-resume) run for comparison sees ≥3× the train batches
    seen["n"] = 0
    cfg2 = cfg.replace(checkpoint_dir=str(tmp_path / "fresh"))
    _train(cfg2, train_ds, val_ds, state, train_step, eval_step,
           CheckpointManager(cfg2.checkpoint_dir),
           batch_transform=count, resume=False)
    assert seen["n"] >= 3 * steps_per_epoch


def test_sigterm_handler_restored_after_training(tmp_path):
    cfg, train_ds, val_ds, test_ds, state, train_step, eval_step = \
        _setup(tmp_path, epoch=1)
    before = signal.getsignal(signal.SIGTERM)
    ckpts = CheckpointManager(cfg.checkpoint_dir)
    _train(cfg, train_ds, val_ds, state, train_step, eval_step, ckpts)
    assert signal.getsignal(signal.SIGTERM) is before


def test_preempt_save_opt_out(tmp_path, monkeypatch):
    monkeypatch.setenv("MME_PREEMPT_SAVE", "0")
    cfg, train_ds, val_ds, test_ds, state, train_step, eval_step = \
        _setup(tmp_path, epoch=1)
    before = signal.getsignal(signal.SIGTERM)
    ckpts = CheckpointManager(cfg.checkpoint_dir)
    _train(cfg, train_ds, val_ds, state, train_step, eval_step, ckpts)
    assert signal.getsignal(signal.SIGTERM) is before
    assert not ckpts.has_latest()
