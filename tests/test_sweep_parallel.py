"""Parallel sweep launcher: stride partitioning of the global trial
sequence and the one-agent-per-device subprocess mode (reference
``run_slurm/meld_multi.txt:1-2`` — GNU parallel + CUDA_VISIBLE_DEVICES=i)."""

import json

from mme_tpu.core.sweep import SweepConfig, iter_trials

RANDOM_YAML = """
method: random
metric: {name: "val/loss", goal: minimize}
parameters:
  lr: {distribution: log_uniform, min: 1.0e-6, max: 1.0e-3}
  seed: {values: [32, 64, 96]}
"""

GRID_YAML = """
method: grid
metric: {name: "val/loss", goal: minimize}
parameters:
  a: {values: [1, 2, 3]}
  b: {values: [10, 20]}
"""


def test_random_stride_partitions_tile_global_sequence():
    cfg = SweepConfig.from_yaml(RANDOM_YAML)
    full = list(iter_trials(cfg, 12, seed=7))
    workers = 4
    tiled = [None] * 12
    for w in range(workers):
        part = list(iter_trials(cfg, 3, seed=7, trial_offset=w,
                                stride=workers))
        for k, t in enumerate(part):
            tiled[w + k * workers] = t
    assert tiled == full


def test_grid_stride_partitions_tile_global_sequence():
    cfg = SweepConfig.from_yaml(GRID_YAML)
    full = list(iter_trials(cfg, 6, seed=0))
    parts = []
    for w in range(2):
        parts.append(list(iter_trials(cfg, 3, seed=0, trial_offset=w,
                                      stride=2)))
    interleaved = [parts[i % 2][i // 2] for i in range(6)]
    assert interleaved == full
    # uneven worker counts drop nothing
    sets = []
    for w in range(4):
        sets += list(iter_trials(cfg, 2, seed=0, trial_offset=w, stride=4))
    assert {tuple(sorted(t.items())) for t in sets} == {
        tuple(sorted(t.items())) for t in full}


def test_parallel_workers_subprocess(tmp_path, monkeypatch):
    """--workers 2 spawns real agent processes, partitions trials, merges
    results, and pins the --pin_env variable per worker."""
    monkeypatch.setenv("MME_TINY", "1")
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    yaml_path = tmp_path / "sweep.yaml"
    yaml_path.write_text("""
method: grid
metric: {name: "val/loss", goal: minimize}
parameters:
  epoch: {values: [1]}
  batch_size: {values: [8]}
  learning_rate: {values: [1.0e-4, 5.0e-5]}
""")
    from mme_tpu.cli import sweep
    best = sweep.main([str(yaml_path), "--entry", "text_nn",
                       "--dataset", "synthetic", "--trials", "2",
                       "--workers", "2", "--pin_env", "MME_TEST_PIN"])
    assert best.params["learning_rate"] in (1e-4, 5e-5)
    assert "val/loss" in best.metrics


def test_bayes_worker_conditions_on_sibling_results(tmp_path):
    """A bayes worker reads sibling workers' JSONL trials before each
    proposal (the wandb-service sharing pattern): with a sibling history
    locating the optimum, every trial is adaptive from the start."""
    import numpy as np

    from mme_tpu.cli import sweep as sweep_mod

    yaml_path = tmp_path / "sweep.yaml"
    yaml_path.write_text("""
method: bayes
metric: {name: "val/loss", goal: minimize}
parameters:
  x: {distribution: uniform, min: -5.0, max: 5.0}
""")
    # sibling worker already explored broadly; best points near x=2
    sibling = tmp_path / "worker_0.jsonl"
    with open(sibling, "w") as f:
        for v in np.linspace(-5, 5, 12):
            f.write(json.dumps({"params": {"x": float(v)},
                                "metrics": {"val/loss": float((v - 2) ** 2)}
                                }) + "\n")

    seen = []

    class FakeEntry:
        @staticmethod
        def main(argv):
            args = dict(zip(argv[::2], argv[1::2]))
            x = float(args["--x"])
            seen.append(x)
            return {"val/loss": (x - 2.0) ** 2}

    orig = sweep_mod.importlib.import_module
    sweep_mod.importlib.import_module = lambda name: FakeEntry
    try:
        best = sweep_mod.main([str(yaml_path), "--entry", "fake",
                               "--trials", "6", "--seed", "11",
                               "--results", str(tmp_path / "worker_1.jsonl")])
    finally:
        sweep_mod.importlib.import_module = orig
    # conditioned on the sibling's 12 trials, proposals concentrate near 2
    assert abs(best.params["x"] - 2.0) < 1.0
    assert np.mean([abs(x - 2.0) for x in seen]) < 2.0


def test_worker_results_jsonl_roundtrip(tmp_path):
    """Single-agent worker mode writes parseable per-trial JSONL."""
    from mme_tpu.cli import sweep
    yaml_path = tmp_path / "sweep.yaml"
    yaml_path.write_text(GRID_YAML)
    res = tmp_path / "r.jsonl"

    import mme_tpu.cli.sweep as sweep_mod

    class FakeEntry:
        @staticmethod
        def main(argv):
            args = dict(zip(argv[::2], argv[1::2]))
            return {"val/loss": float(args["--a"]) + float(args["--b"])}

    import importlib as _imp
    orig = sweep_mod.importlib.import_module
    sweep_mod.importlib.import_module = lambda name: FakeEntry
    try:
        best = sweep.main([str(yaml_path), "--entry", "fake", "--trials", "3",
                           "--trial_offset", "1", "--stride", "2",
                           "--results", str(res)])
    finally:
        sweep_mod.importlib.import_module = orig
    lines = [json.loads(l) for l in res.read_text().splitlines()]
    assert len(lines) == 3
    # grid trials 1,3,5 of (a,b) product: (1,20),(2,20),(3,20)
    assert [l["params"]["a"] for l in lines] == [1, 2, 3]
    assert all(l["params"]["b"] == 20 for l in lines)
    assert best.metrics["val/loss"] == 21.0
