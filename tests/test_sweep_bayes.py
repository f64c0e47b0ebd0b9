"""TPE Bayesian sweep (core/sweep.py method: bayes — the method every
reference YAML requests, e.g. hyper_parameter_config/tav.yaml)."""

import numpy as np

from mme_tpu.core.sweep import (SweepConfig, TrialResult, run_sweep,
                                tpe_propose)

QUAD_YAML = """
method: bayes
metric:
  name: val/loss
  goal: minimize
parameters:
  x:
    distribution: uniform
    min: -5.0
    max: 5.0
"""

RANDOM_YAML = QUAD_YAML.replace("method: bayes", "method: random")


def quad(params):
    return {"val/loss": float((params["x"] - 2.0) ** 2)}


def run(yaml_str, trials=24, seed=7):
    cfg = SweepConfig.from_yaml(yaml_str)
    return run_sweep(cfg, quad, trials, seed=seed, log=lambda s: None)


def test_bayes_beats_random_on_quadratic():
    best_b = run(QUAD_YAML)
    best_r = run(RANDOM_YAML)
    assert best_b.metrics["val/loss"] <= best_r.metrics["val/loss"] + 1e-9
    # and it actually localized the optimum
    assert abs(best_b.params["x"] - 2.0) < 0.5


def test_bayes_deterministic():
    b1 = run(QUAD_YAML, trials=12, seed=3)
    b2 = run(QUAD_YAML, trials=12, seed=3)
    assert b1.params == b2.params
    assert b1.metrics == b2.metrics


def test_bayes_categorical_concentrates():
    cfg = SweepConfig.from_yaml("""
method: bayes
metric: {name: val/loss, goal: minimize}
parameters:
  c: {values: [0, 1, 2, 3]}
""")
    picks = []

    def f(params):
        picks.append(params["c"])
        return {"val/loss": 0.0 if params["c"] == 3 else 1.0}

    run_sweep(cfg, f, 30, seed=1, log=lambda s: None)
    late = picks[15:]
    assert late.count(3) > len(late) * 0.4  # concentrated vs uniform 25%


def test_bayes_log_uniform_and_int_bounds():
    cfg = SweepConfig.from_yaml("""
method: bayes
metric: {name: val/loss, goal: minimize}
parameters:
  lr: {distribution: log_uniform, min: 1e-6, max: 1e-2}
  layers: {distribution: int_uniform, min: 2, max: 9}
""")
    seen = []

    def f(params):
        seen.append(params)
        return {"val/loss": abs(np.log10(params["lr"]) + 4)
                + abs(params["layers"] - 6)}

    run_sweep(cfg, f, 20, seed=2, log=lambda s: None)
    for p in seen:
        assert 1e-6 <= p["lr"] <= 1e-2
        assert 2 <= p["layers"] <= 9 and isinstance(p["layers"], int)


def test_tpe_propose_respects_maximize():
    cfg = SweepConfig.from_yaml("""
method: bayes
metric: {name: val/acc, goal: maximize}
parameters:
  x: {distribution: uniform, min: 0.0, max: 1.0}
""")
    # good trials cluster high-x when maximizing acc ∝ x
    history = [TrialResult({"x": v}, {"val/acc": v})
               for v in np.linspace(0.05, 0.95, 12)]
    rng = np.random.RandomState(0)
    proposals = [tpe_propose(cfg, history, rng)["x"] for _ in range(16)]
    assert np.mean(proposals) > 0.6


def test_observations_seed_the_model():
    cfg = SweepConfig.from_yaml(QUAD_YAML)
    obs = [TrialResult({"x": v}, quad({"x": v}))
           for v in np.linspace(-5, 5, 10)]
    best = run_sweep(cfg, quad, 6, seed=5, log=lambda s: None,
                     observations=obs)
    # with a pre-seeded model every trial is adaptive → near the optimum
    assert abs(best.params["x"] - 2.0) < 1.0
