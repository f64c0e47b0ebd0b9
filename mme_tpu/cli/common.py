"""Shared CLI wiring: the reference's per-entry ``main``/``runModel`` pattern
(``tav_nn.py:20-192`` and the Single/Double variants) as one helper.

Every entry point: parse the reference flag surface → seed → build datasets
(synthetic here; real pickles via data/records.py when media deps exist) →
class weights ``1−n_c/N`` → label maps → train with the full policy stack →
evaluate → print the reference-keyed score dict.
"""

from __future__ import annotations

import json
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mme_tpu.core.config import ExperimentConfig
from mme_tpu.data.dataset import ArrayDataset
from mme_tpu.evals.metrics import Metrics
from mme_tpu.train.checkpoint import CheckpointManager
from mme_tpu.train.loop import LoopCallbacks, evaluate, train_network
from mme_tpu.train.losses import class_weights_from_counts
from mme_tpu.train.policies import sample_weights_from_labels
from mme_tpu.train.schedules import cosine_warm_restarts
from mme_tpu.train.steps import (TrainState, make_eval_step, make_optimizer,
                                 make_train_step)

MELD_EMOTIONS = ["neutral", "joy", "sadness", "anger", "surprise",
                 "fear", "disgust"]
MELD_SENTIMENTS = ["neutral", "positive", "negative"]
IEMOCAP_6 = ["neutral", "frustrated", "angry", "sad", "happy", "excited"]
HATEFUL = ["not_hateful", "hateful"]
# MUStARD++ sarcasm (binary; the reference prepares it in
# notebooks/Mustard++.ipynb / SarcasmVideo.ipynb — "multi-modal-sarcasm"
# mmsd utterances — but ships no trainer for it; here it is a first-class
# --label_task on every entry point)
MUSTARD_SARCASM = ["not_sarcastic", "sarcastic"]


def label_names(dataset: str, label_task: str, output_dim: int):
    # an explicit --label_task always beats dataset-name sniffing:
    # MUStARD++ also ships emotion/sentiment annotations, so
    # `--dataset mustard.pkl --label_task emotion` must NOT be renamed
    # to sarcasm classes (binary sniffing stays for the default task)
    ds = dataset.lower()
    if label_task == "sarcasm":
        names = MUSTARD_SARCASM
    elif label_task == "sentiment":
        names = MELD_SENTIMENTS
    elif "iemocap" in ds:
        names = IEMOCAP_6
    elif ("mustard" in ds or "sarcasm" in ds) and output_dim == 2:
        names = MUSTARD_SARCASM
    elif "hateful" in ds or output_dim == 2:
        names = HATEFUL
    else:
        names = MELD_EMOTIONS
    names = names[:output_dim]
    while len(names) < output_dim:
        names.append(f"class_{len(names)}")
    return {i: n for i, n in enumerate(names)}


def invert_label_map(label_map) -> Optional[Dict[int, str]]:
    """records.build_label_map's name→id (alphabetical) → the id→name map
    Metrics must display. None passes through (integer-labeled data)."""
    if label_map is None:
        return None
    return {i: n for n, i in label_map.items()}


def resolve_pickle(dataset: str) -> Optional[str]:
    """--dataset → pickle path, or None for the synthetic smoke data.
    A NAMED dataset whose pickle is missing raises — falling through to
    synthetic data would train and report metrics on noise with no
    signal that the path was a typo."""
    import os
    if dataset == "synthetic":
        return None
    pkl = dataset if dataset.endswith(".pkl") else f"{dataset}.pkl"
    if not os.path.exists(pkl):
        raise FileNotFoundError(
            f"dataset pickle {pkl!r} not found (--dataset {dataset!r}); "
            "use --dataset synthetic for random smoke data")
    return pkl


def print_log(d: Dict[str, float]) -> None:
    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in d.items()}), flush=True)


def make_bucket_iter(audio_len: int, default_on: bool = True):
    """Shared MME_BUCKETS handling for the audio-bearing CLIs.

    Returns a BucketedBatchIter (one compiled step per length bound) or
    None. Default bounds are quarters of the audio cap —
    (len/4, len/2, 3len/4, len), the configuration `bench.py BENCH_DIST`
    measured at 0.825 padding efficiency — floored at 1000 samples.
    ``MME_BUCKETS="a,b,c"`` overrides, ``MME_BUCKETS=off`` disables,
    ``default_on=False`` only engages when MME_BUCKETS is set
    (fixed-length synthetic runs)."""
    import os as _os

    env = _os.environ.get("MME_BUCKETS", "")
    if env == "off" or (not env and not default_on):
        return None
    from mme_tpu.data.dataset import BucketedBatchIter
    if env:
        bounds = tuple(int(x) for x in env.split(","))
    else:
        bounds = tuple(sorted({max(audio_len * i // 4, 1000)
                               for i in range(1, 4)} | {audio_len}))
    print(f"length buckets: {bounds}", flush=True)
    return BucketedBatchIter(bounds)


def run_classifier(cfg: ExperimentConfig,
                   apply_fn: Callable,
                   init_params,
                   train_ds: ArrayDataset, val_ds: ArrayDataset,
                   test_ds: ArrayDataset,
                   batch_transform=None,
                   batch_stats=None,
                   trainable_mask=None,
                   rng_names: Tuple[str, ...] = ("dropout",),
                   batch_iter=None,
                   has_aux_loss: bool = False,
                   mesh=None,
                   id2label=None) -> Dict[str, float]:
    """The generic runModel: wire optimizer/steps/metrics/loop and train.

    ``mesh``: a caller-built mesh (e.g. cli/tav_nn.py's dp×sp / dp×pp from
    MME_SP/MME_PP) — overrides the auto dp(×mp) mesh below. The batch is
    sharded over its "dp" axis.

    ``id2label``: the ACTUAL id→name map of the loaded dataset. String
    labels factorize alphabetically (records.build_label_map), which need
    not match the hardcoded display orders above — per-class metric names
    would be silently permuted. CLIs that build a label_map must pass its
    inverse here; the name-order heuristics only cover synthetic /
    integer-labeled data."""
    num_classes = cfg.output_dim
    if id2label is None:
        id2label = label_names(cfg.dataset, cfg.label_task, num_classes)
    metric = Metrics(num_classes, id2label)

    counts = np.bincount(train_ds.labels, minlength=num_classes)
    cw = class_weights_from_counts(counts)
    sw = sample_weights_from_labels(train_ds.labels, cw)

    steps_per_epoch = int(np.ceil(len(train_ds) / cfg.batch_size))
    tx = make_optimizer(
        cosine_warm_restarts(cfg.learning_rate, cfg.T_max, steps_per_epoch),
        cfg.weight_decay, cfg.clip, trainable_mask)
    # no accumulation buffer at creation: train_network hydrates the
    # params-sized fp32 tree per dialog-accum epoch and strips it
    # otherwise (allocating it here would only add a transient HBM peak
    # during init/compile — epoch 0 is never a dialog-accum epoch)
    state = TrainState.create(init_params, tx, batch_stats=batch_stats,
                              use_accum=False)
    # --loss flag of record: CrossEntropy/NewCrossEntropy (parity-switched
    # weights), FBeta (+--beta), Precision (hyper_parameter_config/loss.yaml)
    from mme_tpu.train.losses import make_loss_fn
    loss_fn = make_loss_fn(cfg.loss, cfg.beta)
    import os
    train_step = make_train_step(
        apply_fn, tx, num_classes=num_classes, rng_names=rng_names,
        has_batch_stats=batch_stats is not None, has_aux_loss=has_aux_loss,
        loss_fn=loss_fn,
        # MME_LOG_NORMS=1 → per-module grad/weight norms in every train
        # log line (reference wandb.watch(log="all"), tav_nn.py:103-104)
        log_module_norms=os.environ.get("MME_LOG_NORMS") == "1",
        # MME_LOG_HISTS=1 → per-module magnitude histograms too (full
        # wandb.watch(log="all") parity; steps.magnitude_histogram)
        log_histograms=os.environ.get("MME_LOG_HISTS") == "1")
    eval_step = make_eval_step(apply_fn, num_classes=num_classes,
                               has_batch_stats=batch_stats is not None,
                               has_aux_loss=has_aux_loss, loss_fn=loss_fn)

    # every run leaves a JSONL metrics trail next to its checkpoints (the
    # reference's wandb.log stream; MME_RUN_DIR overrides the location)
    import os
    from mme_tpu.utils.profiling import RunLogger
    run_dir = os.environ.get("MME_RUN_DIR", cfg.checkpoint_dir)
    logger = RunLogger(run_dir)

    def _log(d: Dict[str, float]) -> None:
        print_log(d)
        logger.log(d)

    cb = LoopCallbacks(log=_log)
    kwargs = {}
    if batch_transform is not None:
        kwargs["batch_transform"] = batch_transform

    # multi-device: dp(×mp) mesh over all devices when the global batch
    # splits evenly (cfg.mesh; MME_MESH=off disables). The reference's
    # "distributed sampler on each GPU" intent (tav_nn.py:29-33), built.
    n_dev = len(jax.devices())
    if mesh is not None:
        pass  # caller-built (sp/pp) mesh wins
    elif n_dev > 1 and os.environ.get("MME_MESH", "on") != "off":
        mp = max(cfg.mesh.model, 1)
        dp = cfg.mesh.data if cfg.mesh.data != -1 else n_dev // mp
        if dp * mp <= n_dev and dp >= 1 and cfg.batch_size % dp == 0:
            from mme_tpu.parallel.mesh import make_mesh
            mesh = make_mesh(dp, mp,
                             devices=jax.devices()[:dp * mp])
            print(f"mesh: dp={dp} mp={mp} over {dp * mp} devices",
                  flush=True)
        else:
            print(f"mesh disabled: batch_size={cfg.batch_size} not "
                  f"divisible by dp={dp} (devices={n_dev})", flush=True)
    ckpts = CheckpointManager(cfg.checkpoint_dir)
    use_weighted = cfg.loss == "NewCrossEntropy"
    if os.environ.get("MME_EVAL_ONLY"):
        # offline re-evaluation of a saved checkpoint — the capability of
        # the reference's EvaluationScripts/*_eval.ipynb notebooks
        assert ckpts.has_best(), (
            f"MME_EVAL_ONLY set but no checkpoint in {cfg.checkpoint_dir}")
        # checkpoints store the stripped structure (no accum buffer —
        # train/loop.py); eval needs params/batch_stats only
        state, meta = ckpts.restore_best(state.replace(
            accum_grads=None,
            accum_count=jnp.zeros((), jnp.int32)))
        if mesh is not None:
            from mme_tpu.parallel.sharding_rules import shard_state_tp
            state = shard_state_tp(state, mesh)
        print_log({"restored": meta})
    else:
        state = train_network(train_step, eval_step, state, train_ds, val_ds,
                              cfg, metric, cw, sw,
                              jax.random.PRNGKey(cfg.seed),
                              checkpoints=ckpts, callbacks=cb,
                              use_weighted_loss=use_weighted,
                              resume=bool(os.environ.get("MME_RESUME")),
                              mesh=mesh, batch_iter=batch_iter, **kwargs)
    dump_path = None
    if os.environ.get("MME_DUMP_PREDICTIONS"):
        # reference ResultsFromTest/{model}Test.txt artifact
        dump_path = os.path.join(run_dir, f"{cfg.model}Test.txt")
    summary = evaluate(eval_step, state, test_ds, cfg, metric,
                       callbacks=cb, dump_path=dump_path, mesh=mesh,
                       batch_iter=batch_iter, **kwargs)
    print_log(summary)
    predict_out = os.environ.get("MME_PREDICT_OUT")
    if predict_out:
        # serving-shaped prediction log over the test split (mme_tpu.serve):
        # one padded fixed-shape jitted forward, JSONL rows out
        from mme_tpu.serve import Predictor
        predictor = Predictor(apply_fn, state.params,
                              batch_size=cfg.batch_size,
                              batch_stats=state.batch_stats)
        with open(predict_out, "w") as fh:
            for row in predictor.predict_dataset(
                    test_ds, id2label, batch_transform=batch_transform):
                fh.write(json.dumps(row) + "\n")
        print(f"wrote serving predictions: {predict_out}", flush=True)
    export_dir = os.environ.get("MME_EXPORT_BUNDLE")
    if export_dir:
        # standalone StableHLO serving bundle (mme_tpu.serve.load_bundle
        # re-serves it with no model code) — the deployment artifact the
        # reference's notebook-only eval path never had
        from mme_tpu.serve import export_bundle
        example = {k: np.asarray(v[:cfg.batch_size])
                   for k, v in test_ds.features.items()}
        if batch_transform is not None:
            # bundle serves post-transform features (e.g. video already
            # normalized) — apply the same transform the Predictor path
            # runs per chunk so the exported spec matches
            example = {k: np.asarray(v) for k, v in batch_transform(
                jax.random.PRNGKey(0),
                {k: jnp.asarray(v) for k, v in example.items()}).items()}
        export_bundle(apply_fn, state.params, example, export_dir,
                      batch_size=cfg.batch_size,
                      batch_stats=state.batch_stats, id2label=id2label)
        print(f"wrote serving bundle: {export_dir}", flush=True)
    logger.finish()   # closes the wandb mirror run, if any (MME_WANDB=1)
    return summary
