"""Sweep adapter, early stopping, and prediction-dump tests."""

import numpy as np

from mme_tpu.core.sweep import SweepConfig, iter_trials, run_sweep
from mme_tpu.evals.dumps import dump_predictions, load_dump
from mme_tpu.train.early_stopping import EarlyStopping

REFERENCE_YAML = """
program: ../tav_nn.py
method: bayes
metric:
  goal: minimize
  name: val/loss
parameters:
  epoch:
    values: [6]
  learning_rate:
    distribution: uniform
    max: 1.0e-5
    min: 5.0e-6
  batch_size:
    values: [1]
  seed:
    values: [32, 64, 96]
"""


def test_parse_reference_yaml():
    cfg = SweepConfig.from_yaml(REFERENCE_YAML)
    assert cfg.method == "bayes"
    assert cfg.metric_name == "val/loss" and cfg.metric_goal == "minimize"
    trials = list(iter_trials(cfg, 10, seed=1))
    assert len(trials) == 10
    for t in trials:
        assert t["epoch"] == 6 and t["batch_size"] == 1
        assert 5e-6 <= t["learning_rate"] <= 1e-5
        assert t["seed"] in (32, 64, 96)


def test_grid_sweep():
    cfg = SweepConfig.from_yaml("""
method: grid
metric: {name: "val/loss", goal: minimize}
parameters:
  a: {values: [1, 2]}
  b: {values: [10, 20, 30]}
""")
    trials = list(iter_trials(cfg, 100))
    assert len(trials) == 6
    assert {(t["a"], t["b"]) for t in trials} == {
        (a, b) for a in (1, 2) for b in (10, 20, 30)}


def test_run_sweep_picks_best():
    cfg = SweepConfig.from_yaml("""
method: grid
metric: {name: "val/loss", goal: minimize}
parameters:
  x: {values: [3, 1, 2]}
""")
    best = run_sweep(cfg, lambda p: {"val/loss": p["x"] ** 2}, 10,
                     log=lambda s: None)
    assert best.params["x"] == 1


def test_early_stopping():
    es = EarlyStopping(patience=2, mode="min")
    assert not es(1.0, {"w": 1})
    assert not es(0.9, {"w": 2})
    assert not es(0.95, {"w": 3})   # counter 1
    assert es(0.99, {"w": 4})       # counter 2 → stop
    assert es.restore_best()["w"] == 2


def test_dump_roundtrip(tmp_path):
    p = str(tmp_path / "out" / "imageTest.txt")
    dump_predictions(p, [0, 1, 2, 1], [0, 1, 1, 1], mask=[1, 1, 1, 0])
    labels, preds = load_dump(p)
    np.testing.assert_array_equal(labels, [0, 1, 2])
    np.testing.assert_array_equal(preds, [0, 1, 1])
    dump_predictions(p, [2], [2])
    labels, _ = load_dump(p)
    assert len(labels) == 4
