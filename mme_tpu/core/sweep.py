"""Hyperparameter sweeps: the reference's wandb-sweep YAML contract, run
locally.

The reference launches ``wandb sweep <yaml>`` + ``wandb agent`` under SLURM
(``run_slurm/*.sh``; YAML format in ``hyper_parameter_config/*.yaml``:
``method`` bayes/random/grid, ``metric {name, goal}``, ``parameters`` with
``values`` lists or ``distribution: uniform/log_uniform {min, max}``). This
adapter parses the same YAMLs and drives trials in-process — grid and random
exactly; ``bayes`` maps to random search (the reference's Bayesian layer
lives in the external wandb service, not in its code).

Trial parallelism (the GNU-parallel one-agent-per-GPU pattern,
``run_slurm/meld_multi.txt:1-2``) becomes a deterministic partition of one
global trial sequence: worker ``w`` of ``N`` runs trials
``w, w+N, w+2N, ...`` via ``trial_offset``/``stride`` — the union over
workers is exactly the single-process sequence, so results are
scheduling-independent. ``cli/sweep.py --workers N`` spawns the worker
processes and merges their JSONL results.
"""

from __future__ import annotations

import dataclasses
import itertools
import json
from typing import Any, Callable, Dict, Iterator, List, Optional

import numpy as np
import yaml


@dataclasses.dataclass
class SweepConfig:
    method: str
    metric_name: str
    metric_goal: str
    parameters: Dict[str, Dict[str, Any]]
    program: Optional[str] = None

    @staticmethod
    def from_yaml(path_or_str: str) -> "SweepConfig":
        if "\n" in path_or_str or ":" not in path_or_str.split("\n")[0][:40]:
            try:
                raw = yaml.safe_load(open(path_or_str))
            except (OSError, ValueError):
                raw = yaml.safe_load(path_or_str)
        else:
            raw = yaml.safe_load(path_or_str)
        metric = raw.get("metric", {})
        return SweepConfig(
            method=raw.get("method", "random"),
            metric_name=metric.get("name", "val/loss"),
            metric_goal=metric.get("goal", "minimize"),
            parameters=raw.get("parameters", {}),
            program=raw.get("program"))


def _sample_param(rng: np.random.RandomState, spec: Dict[str, Any]) -> Any:
    if "values" in spec:
        vals = spec["values"]
        return vals[rng.randint(len(vals))]
    if "value" in spec:
        return spec["value"]
    dist = spec.get("distribution", "uniform")
    lo, hi = float(spec["min"]), float(spec["max"])
    if dist in ("uniform",):
        return float(rng.uniform(lo, hi))
    if dist in ("log_uniform", "log_uniform_values"):
        return float(np.exp(rng.uniform(np.log(lo), np.log(hi))))
    if dist in ("int_uniform",):
        return int(rng.randint(int(lo), int(hi) + 1))
    raise ValueError(f"unsupported distribution {dist}")


def iter_trials(cfg: SweepConfig, num_trials: int, seed: int = 0,
                trial_offset: int = 0, stride: int = 1
                ) -> Iterator[Dict[str, Any]]:
    """Trials ``trial_offset, trial_offset+stride, ...`` (``num_trials`` of
    them) of the global sequence defined by ``seed``. Random trials are
    keyed on the trial INDEX, so disjoint (offset, stride) partitions tile
    the identical single-process sequence."""
    if cfg.method == "grid":
        keys = list(cfg.parameters)
        grids = []
        for k in keys:
            spec = cfg.parameters[k]
            grids.append(spec["values"] if "values" in spec
                         else [spec["value"]])
        combos = itertools.islice(itertools.product(*grids), trial_offset,
                                  None, stride)
        for combo in itertools.islice(combos, num_trials):
            yield dict(zip(keys, combo))
    else:  # random / bayes→random
        for k_i in range(num_trials):
            i = trial_offset + k_i * stride
            rng = np.random.RandomState((seed * 1000003 + i) & 0x7FFFFFFF)
            yield {k: _sample_param(rng, spec)
                   for k, spec in cfg.parameters.items()}


@dataclasses.dataclass
class TrialResult:
    params: Dict[str, Any]
    metrics: Dict[str, float]


def best_of(results: List[TrialResult], metric_name: str,
            metric_goal: str) -> TrialResult:
    sign = -1.0 if metric_goal == "minimize" else 1.0
    return max(results,
               key=lambda r: sign * r.metrics.get(metric_name,
                                                  float("-inf") * sign))


def run_sweep(cfg: SweepConfig, trial_fn: Callable[[Dict[str, Any]],
                                                   Dict[str, float]],
              num_trials: int, seed: int = 0,
              log: Callable[[str], None] = print,
              trial_offset: int = 0, stride: int = 1) -> TrialResult:
    """Run trials, return the best by the sweep metric."""
    best: Optional[TrialResult] = None
    sign = -1.0 if cfg.metric_goal == "minimize" else 1.0
    for i, params in enumerate(iter_trials(cfg, num_trials, seed,
                                           trial_offset, stride)):
        metrics = trial_fn(params)
        r = TrialResult(params, metrics)
        score = sign * metrics.get(cfg.metric_name, float("-inf") * sign)
        best_score = (sign * best.metrics.get(cfg.metric_name, float("nan"))
                      if best else float("-inf"))
        if best is None or score > best_score:
            best = r
        log(json.dumps({"trial": i, "params": params,
                        cfg.metric_name: metrics.get(cfg.metric_name)}))
    assert best is not None
    return best
