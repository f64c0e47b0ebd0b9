"""Evaluation artifacts: prediction dumps + JSONL run logs actually wired.

Round-1 gap: evals/dumps.py and utils/profiling.py existed but nothing
called them. Now ``evaluate(dump_path=...)`` appends the reference's
"label , pred" lines (``SingleModels/train_model/image_training.py:23-28``)
and every CLI run writes a metrics.jsonl trail via RunLogger.
"""

import json
import os

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from mme_tpu.core.config import ExperimentConfig
from mme_tpu.data.dataset import ArrayDataset
from mme_tpu.evals.dumps import load_dump
from mme_tpu.evals.metrics import Metrics
from mme_tpu.train.loop import evaluate
from mme_tpu.train.steps import TrainState, make_eval_step, make_optimizer


class _Lin(nn.Module):
    @nn.compact
    def __call__(self, batch, *, deterministic=True):
        return nn.Dense(3)(batch["x"])


def _setup():
    ds = ArrayDataset({"x": np.random.RandomState(0).randn(10, 4)
                       .astype(np.float32)},
                      np.arange(10, dtype=np.int64) % 3)
    model = _Lin()
    params = model.init(jax.random.PRNGKey(0),
                        {"x": jnp.zeros((1, 4))})["params"]

    def apply_fn(variables, batch, deterministic=True, rngs=None):
        return model.apply(variables, batch, deterministic=deterministic)

    tx = make_optimizer(lambda s: 0.1, 0.0, 1.0)
    state = TrainState.create(params, tx)
    eval_step = make_eval_step(apply_fn, num_classes=3)
    return ds, state, eval_step


def test_dump_roundtrips_through_load_dump(tmp_path):
    ds, state, eval_step = _setup()
    cfg = ExperimentConfig(batch_size=4, output_dim=3)
    metric = Metrics(3, {i: str(i) for i in range(3)})
    dump = str(tmp_path / "modelTest.txt")
    summary = evaluate(eval_step, state, ds, cfg, metric, dump_path=dump)
    labels, preds = load_dump(dump)
    # padded tail rows excluded: exactly len(ds) lines
    assert len(labels) == len(ds)
    np.testing.assert_array_equal(labels, ds.labels)
    # dump agrees with the confusion matrix (micro accuracy = trace/total;
    # "test/acc" is macro accuracy, a different statistic)
    cm = np.asarray(summary["test/confusion_matrix"])
    acc = (labels == preds).mean()
    assert abs(acc - np.trace(cm) / cm.sum()) < 1e-6


def test_cli_run_writes_metrics_jsonl_and_dump(tmp_path, monkeypatch):
    from mme_tpu.cli import text_nn
    monkeypatch.chdir(tmp_path)  # 'checkpoints' lands in tmp
    monkeypatch.setenv("MME_RUN_DIR", str(tmp_path))
    monkeypatch.setenv("MME_DUMP_PREDICTIONS", "1")
    monkeypatch.setenv("MME_TINY", "1")
    text_nn.main(["-d", "synthetic", "-e", "1", "-b", "16", "-s", "32"])
    jl = os.path.join(str(tmp_path), "metrics.jsonl")
    assert os.path.exists(jl)
    lines = [json.loads(l) for l in open(jl)]
    assert any("val/loss" in d for d in lines)
    assert any("test/acc" in d for d in lines)
    dump = os.path.join(str(tmp_path), "MAE_encoderTest.txt")
    labels, preds = load_dump(dump)
    assert len(labels) == 32  # synthetic test split size
