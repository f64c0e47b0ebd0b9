"""The generic training loop: every reference trainer, one implementation.

Capability parity (reference ``train_model/tav_train.py:15-183`` and the
per-package variants):
- epoch-parity switching of sampler order, loss weighting, and dialog
  accumulation (SURVEY.md §2.6 items 1-2);
- mid-epoch validation every ``log_val`` steps + at epoch end, best-ckpt
  save, patience bump, epoch break at patience (items 3);
- best-checkpoint reload after every epoch (item 4);
- final evaluation pass with criterion=None (``evaluate_tav``).

The loop is host-side Python orchestrating ONE jitted train step and ONE
jitted eval step (train/steps.py) — no retracing across policy phases.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mme_tpu.core.config import ExperimentConfig
from mme_tpu.data.dataset import ArrayDataset, batches
from mme_tpu.evals.metrics import Metrics
from mme_tpu.train.checkpoint import CheckpointManager
from mme_tpu.train.losses import epoch_parity_weights
from mme_tpu.train.policies import DialogAccumulator, dialog_counts, epoch_order
from mme_tpu.train.steps import TrainState

BatchTransform = Callable[[jax.Array, Dict[str, np.ndarray]],
                          Dict[str, Any]]


@dataclasses.dataclass
class LoopCallbacks:
    """Observability hooks (the reference logs to wandb; we emit dicts)."""

    log: Callable[[Dict[str, Any]], None] = lambda d: None


def _identity_transform(rng, batch):
    return batch


def _batch_iter(ds: ArrayDataset, order: np.ndarray, batch_size: int,
                mesh, batch_iter=None) -> Any:
    """Host-gather batches, dp-sharded over the mesh when one is given
    (parallel/data.py — the reference's never-built distributed sampler).
    ``batch_iter`` plugs in a custom iterator (length bucketing,
    data/dataset.py::BucketedBatchIter)."""
    import os

    prefetch = os.environ.get("MME_PREFETCH", "1") != "0"
    if batch_iter is not None:
        src = batch_iter(ds, order, batch_size)
        if mesh is not None:
            # bucketed batches are tail-padded to the static batch size
            # (data/dataset.py::batches) so they dp-shard directly. The
            # prefetch wrapper below still applies: its producer thread
            # drives shard_batches' sharded device_put one batch ahead
            # (device_put on an already-committed sharded array is a
            # no-op), keeping the host→device copy off the step's
            # critical path exactly like the single-device bucketed path.
            from mme_tpu.parallel.data import shard_batches
            src = shard_batches(src, mesh)
    elif mesh is None:
        # feature arrays prefetched to device from a producer thread
        # (data/prefetch.py) so the host→device copy overlaps compute;
        # labels/mask stay host numpy for dialog bookkeeping
        src = batches(ds, order, batch_size)
    else:
        from mme_tpu.parallel.data import global_batches
        src = global_batches(ds, order, batch_size, mesh)
        prefetch = False  # already device-resident + sharded
    if prefetch:
        from mme_tpu.data.prefetch import prefetch_batches
        src = prefetch_batches(src)
    yield from src


def run_validation(eval_step, state: TrainState, ds: ArrayDataset,
                   cfg: ExperimentConfig, metric: Metrics,
                   class_weights: Optional[jax.Array],
                   batch_transform: BatchTransform,
                   rng: jax.Array, name: str,
                   callbacks: LoopCallbacks,
                   dump_path: Optional[str] = None,
                   mesh=None, batch_iter=None) -> float:
    """``dump_path``: append per-sample "label , pred" lines (the
    reference's ResultsFromTest artifact,
    ``SingleModels/train_model/image_training.py:23-28``)."""
    metric.reset_metrics()
    loss_acc, cm_acc, steps = None, None, 0
    order = np.arange(len(ds))
    for batch, labels, mask, _ in _batch_iter(ds, order, cfg.batch_size,
                                              mesh, batch_iter):
        rng, sub = jax.random.split(rng)
        batch = batch_transform(sub, batch)
        loss, cm, preds = eval_step(state.params, state.batch_stats, batch,
                                    labels, mask, class_weights)
        # accumulate on device — a float()/merge here would sync the host
        # into every dispatch
        loss_acc = loss if loss_acc is None else loss_acc + loss
        cm_acc = cm if cm_acc is None else cm_acc + cm
        steps += 1
        if dump_path is not None:
            from mme_tpu.evals.dumps import dump_predictions
            dump_predictions(dump_path, np.asarray(labels),
                             np.asarray(preds), np.asarray(mask))
    if cm_acc is not None:
        metric.merge(cm_acc)
    avg = (float(loss_acc) if loss_acc is not None else 0.0) / max(steps, 1)
    d = metric.summary(name, include_confusion=True)
    d[f"{name}/loss"] = avg
    callbacks.log(d)
    metric.reset_metrics()
    return avg, d


def train_network(train_step, eval_step, state: TrainState,
                  train_ds: ArrayDataset, val_ds: ArrayDataset,
                  cfg: ExperimentConfig, metric: Metrics,
                  class_weights: np.ndarray,
                  sample_weights: np.ndarray,
                  rng: jax.Array,
                  batch_transform: BatchTransform = _identity_transform,
                  checkpoints: Optional[CheckpointManager] = None,
                  callbacks: LoopCallbacks = LoopCallbacks(),
                  use_weighted_loss: bool = True,
                  resume: bool = False,
                  mesh=None, batch_iter=None) -> TrainState:
    """Train with the full reference policy stack; returns the best state.

    ``resume=True`` warm-starts from the best checkpoint in
    ``cfg.checkpoint_dir`` (the reference's resume path is broken by a key
    mismatch, ``train_model/tav_train.py:155`` — here it's the same single
    TrainState round-trip the epoch reload uses)."""
    cw = jnp.asarray(class_weights, jnp.float32)
    host_rng = np.random.default_rng(cfg.seed)
    prev_val_loss = float("inf")
    patience_iter = 0

    accum = None
    if train_ds.dialog_ids is not None:
        accum = DialogAccumulator(dialog_counts(train_ds.dialog_ids))

    def reshard(s: TrainState) -> TrainState:
        if mesh is None:
            return s
        from mme_tpu.parallel.sharding_rules import shard_state_tp
        return shard_state_tp(s, mesh)

    # The accumulation buffer (a params-sized fp32 tree) costs ~19% step
    # time in pure HBM traffic (BASELINE.md) and is only needed on
    # dialog-accum epochs — hydrate it per epoch, strip it everywhere
    # else. Checkpoints always store the STRIPPED structure (the buffer
    # is zeros at every boundary anyway), so save/restore structures
    # agree regardless of which epoch parity they happen on.
    def _strip_accum(s: TrainState) -> TrainState:
        if not isinstance(s, TrainState):
            return s  # test doubles / custom states pass through
        return s.replace(accum_grads=None,
                         accum_count=jnp.zeros((), jnp.int32))

    def _hydrate_accum(s: TrainState) -> TrainState:
        if not isinstance(s, TrainState) or s.accum_grads is not None:
            return s
        return s.replace(
            accum_grads=jax.tree.map(jnp.zeros_like, s.params))

    def _restore_flex(restore_fn, s):
        """Restore with the stripped structure; fall back to the full
        structure for checkpoints written before stripping existed."""
        try:
            return restore_fn(_strip_accum(s))
        except ValueError:
            restored, meta = restore_fn(_hydrate_accum(s))
            return _strip_accum(restored), meta

    if checkpoints is None:
        checkpoints = CheckpointManager(cfg.checkpoint_dir)
    start_epoch = 0
    if resume:
        # prefer the preemption "latest" slot (newer than best) — the
        # graceful-drain checkpoint below; else the best slot
        if getattr(checkpoints, "has_latest", lambda: False)():
            state, meta = _restore_flex(checkpoints.restore_latest, state)
            prev_val_loss = float(meta.get("val_loss", prev_val_loss))
            start_epoch = int(meta.get("epoch", 0))
        elif checkpoints.has_best():
            state, meta = _restore_flex(checkpoints.restore_best, state)
            prev_val_loss = float(meta.get("val_loss", prev_val_loss))
    state = reshard(state)

    # graceful preemption (SLURM sends SIGTERM before the hard kill,
    # reference run_slurm/*.sh walltime): finish the in-flight step, save
    # the full TrainState into the latest slot, stop. MME_PREEMPT_SAVE=0
    # opts out (e.g. when the caller owns signal handling).
    import os as _os
    import signal as _signal
    preempt = {"flag": False}
    old_handler = None
    if _os.environ.get("MME_PREEMPT_SAVE", "1") != "0":
        try:
            old_handler = _signal.signal(
                _signal.SIGTERM,
                lambda sig, frame: preempt.__setitem__("flag", True))
        except ValueError:   # not the main thread
            old_handler = None

    for epoch in range(start_epoch, cfg.epoch):
        order = epoch_order(host_rng, epoch, cfg.epoch_switch,
                            sample_weights, len(train_ds))
        use_dialog_accum = (accum is not None
                            and epoch % cfg.epoch_switch != 0)
        state = (_hydrate_accum(state) if use_dialog_accum
                 else _strip_accum(state))
        if use_weighted_loss:
            step_weights = epoch_parity_weights(cw, jnp.asarray(epoch),
                                                cfg.epoch_switch)
        else:
            step_weights = jnp.ones_like(cw)

        loss_acc, cm_acc, steps_done = None, None, 0
        if batch_iter is not None and hasattr(batch_iter, "epoch_len"):
            iters = batch_iter.epoch_len(train_ds, order, cfg.batch_size)
        else:
            iters = int(np.ceil(len(order) / cfg.batch_size))
        epoch_broken = False
        t0 = time.time()
        for bi, (batch, labels, mask, idx) in enumerate(
                _batch_iter(train_ds, order, cfg.batch_size, mesh,
                            batch_iter)):
            if use_dialog_accum:
                # Odd epochs run in sequential order, so batch position ==
                # dataset index. A "virtual batch" closes when any sample in
                # this batch ends a dialog. Per-micro-step losses stay
                # UNscaled: the boundary update in train/steps.py averages
                # the accumulated grads over the micro-step count, so a
                # dialog of N accumulated at batch_size=1 produces exactly
                # the batch-of-N mean update (reference semantics: loss/size
                # + summed grads, train_model/tav_train.py:96-105; the
                # reference hardcodes batch_size=1 here,
                # TripleModels/tav_nn.py:141). Scaling here as well would
                # divide twice (round-1 bug: updates 1/size too small). With
                # batch_size>1 each micro-batch carries equal weight in the
                # mean — well-defined, exact at batch_size=1.
                apply_update = False
                for j in range(int(np.asarray(mask).sum())):
                    _size, boundary = accum.step(bi * cfg.batch_size + j)
                    apply_update = apply_update or boundary
                apply_update = apply_update or (bi + 1 == iters)
                loss_scale = 1.0
            else:
                loss_scale, apply_update = 1.0, True

            rng, sub = jax.random.split(rng)
            tbatch = batch_transform(sub, batch)
            state, loss, cm, grad_norm = train_step(
                state, tbatch, labels, mask,
                step_weights, jnp.asarray(loss_scale, jnp.float32),
                jnp.asarray(apply_update), rng)
            # accumulate on device; a float()/merge here would block the
            # host on every dispatch (deadly through the remote tunnel)
            loss_acc = loss if loss_acc is None else loss_acc + loss
            cm_acc = cm if cm_acc is None else cm_acc + cm
            steps_done += 1

            if preempt["flag"]:
                checkpoints.save_latest(
                    _strip_accum(state),
                    {"epoch": epoch, "step": int(state.step),
                     "val_loss": prev_val_loss, "preempted": True})
                callbacks.log({"preempted": True, "epoch": epoch,
                               "step": int(state.step)})
                epoch_broken = True
                break

            if ((bi + 1) % cfg.log_val == 0) or (bi + 1 == iters):
                if cm_acc is not None:
                    metric.merge(cm_acc)
                    cm_acc = None
                d = metric.summary("train")
                d["train/loss"] = float(loss_acc) / max(steps_done, 1)
                if isinstance(grad_norm, dict):
                    # per-module norms (make_train_step log_module_norms —
                    # the reference's wandb.watch(log="all") signal)
                    d["train/grad_norm"] = float(grad_norm["total"])
                    for k, v in grad_norm.items():
                        if k == "total":
                            continue
                        if k.startswith("hist/"):
                            # MME_LOG_HISTS magnitude histograms
                            # (steps.magnitude_histogram) — bucket counts
                            d[f"train/{k}"] = np.asarray(v).tolist()
                        else:
                            d[f"train/norms/{k}"] = float(v)
                else:
                    d["train/grad_norm"] = float(grad_norm)
                d["train/steps_per_sec"] = steps_done / max(
                    time.time() - t0, 1e-9)
                d["epoch"] = epoch
                callbacks.log(d)
                metric.reset_metrics()
                rng, sub = jax.random.split(rng)
                # DELIBERATE: validation loss uses the epoch's parity
                # weights, so val/loss (the checkpoint-selection metric)
                # alternates definition with the epoch — faithful to the
                # reference's criterion(..., epoch) call
                # (train_model/tav_train.py:129); documented, not an
                # accident.
                val_loss, _ = run_validation(
                    eval_step, state, val_ds, cfg, metric, step_weights,
                    batch_transform, sub, "val", callbacks, mesh=mesh,
                    batch_iter=batch_iter)
                if val_loss < prev_val_loss:
                    patience_iter = 0
                    prev_val_loss = val_loss
                    checkpoints.save_best(
                        _strip_accum(state),
                        {"epoch": epoch, "step": int(state.step),
                         "val_loss": val_loss})
                else:
                    patience_iter += 1
                    if patience_iter >= cfg.patience:
                        epoch_broken = True
                        break

        # best-checkpoint reload each epoch (train_model/tav_train.py:143)
        if checkpoints.has_best():
            state, _meta = _restore_flex(checkpoints.restore_best, state)
            state = reshard(state)
        if epoch_broken or patience_iter >= cfg.patience:
            break
        if accum is not None:
            accum = DialogAccumulator(accum.counts)  # reset ctr per epoch

    if old_handler is not None:
        _signal.signal(_signal.SIGTERM, old_handler)
    if not preempt["flag"] and hasattr(checkpoints, "clear_latest"):
        # successful completion → drop the preemption slot so a later
        # resume never prefers a stale preempted state over best
        checkpoints.clear_latest()
    if hasattr(checkpoints, "wait"):
        checkpoints.wait()  # async best-save must be durable before return
    return state


def evaluate(eval_step, state: TrainState, test_ds: ArrayDataset,
             cfg: ExperimentConfig, metric: Metrics,
             batch_transform: BatchTransform = _identity_transform,
             rng: Optional[jax.Array] = None,
             callbacks: LoopCallbacks = LoopCallbacks(),
             dump_path: Optional[str] = None,
             mesh=None, batch_iter=None) -> Dict[str, float]:
    """Test pass with criterion=None semantics (``evaluate_tav``)."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    _, summary = run_validation(eval_step, state, test_ds, cfg, metric, None,
                                batch_transform, rng, "test", callbacks,
                                dump_path=dump_path, mesh=mesh,
                                batch_iter=batch_iter)
    return summary
