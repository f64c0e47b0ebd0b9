"""Hyperparameter sweeps: the reference's wandb-sweep YAML contract, run
locally.

The reference launches ``wandb sweep <yaml>`` + ``wandb agent`` under SLURM
(``run_slurm/*.sh``; YAML format in ``hyper_parameter_config/*.yaml``:
``method`` bayes/random/grid, ``metric {name, goal}``, ``parameters`` with
``values`` lists or ``distribution: uniform/log_uniform {min, max}``). This
adapter parses the same YAMLs and drives trials in-process — grid and
random exactly; ``bayes`` (what every reference YAML uses, e.g.
``hyper_parameter_config/tav.yaml:2`` — the optimizer itself lives in the
external wandb service) is a dependency-free TPE (Tree-structured Parzen
Estimator): after a random startup phase, observed trials split into a
best-γ "good" set and the rest, new values are proposed from the good set's
kernel density and scored by the good/bad density ratio. Sequential
(single-agent) sweeps condition on every prior trial; parallel workers
condition on their own trials only (the startup partition stays identical
to random mode, so worker partitions remain deterministic).

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
        return float(min(max(np.exp(rng.uniform(np.log(lo), np.log(hi))),
                             lo), hi))
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


# ---------------------------------------------------------------- TPE bayes

TPE_STARTUP = 5      # random trials before the model kicks in
TPE_GAMMA = 0.25     # fraction of observations labeled "good"
TPE_CANDIDATES = 24  # proposals scored per continuous parameter


def _transform(spec: Dict[str, Any]):
    """(to_internal, from_internal, lo, hi) for a continuous spec."""
    dist = spec.get("distribution", "uniform")
    lo, hi = float(spec["min"]), float(spec["max"])
    if dist in ("log_uniform", "log_uniform_values"):
        return np.log, np.exp, np.log(lo), np.log(hi)
    return (lambda x: x), (lambda x: x), lo, hi


def _kde_logdensity(x: np.ndarray, obs: np.ndarray, lo: float, hi: float
                    ) -> np.ndarray:
    """Gaussian KDE with a range-scaled bandwidth + uniform prior mass."""
    sigma = max((hi - lo) * 0.05, (hi - lo) / max(np.sqrt(len(obs)), 1.0))
    d = (x[:, None] - obs[None, :]) / sigma
    kernel = np.exp(-0.5 * d * d).mean(axis=1) / sigma
    prior = 1.0 / max(hi - lo, 1e-12)
    return np.log(0.5 * kernel + 0.5 * prior + 1e-300)


def _split_good_bad(history: List["TrialResult"], metric: str,
                    minimize: bool):
    scored = [(r.metrics.get(metric), r.params) for r in history
              if r.metrics.get(metric) is not None
              and np.isfinite(r.metrics.get(metric))]
    scored.sort(key=lambda t: t[0], reverse=not minimize)
    n_good = max(1, int(np.ceil(TPE_GAMMA * len(scored))))
    return ([p for _, p in scored[:n_good]],
            [p for _, p in scored[n_good:]])


def _tpe_param(rng: np.random.RandomState, key: str, spec: Dict[str, Any],
               good: List[Dict[str, Any]], bad: List[Dict[str, Any]]) -> Any:
    if "value" in spec:
        return spec["value"]
    if "values" in spec:
        vals = spec["values"]
        idx = {repr(v): i for i, v in enumerate(vals)}
        cg = np.ones(len(vals))
        cb = np.ones(len(vals))
        for p in good:
            if repr(p.get(key)) in idx:
                cg[idx[repr(p.get(key))]] += 1
        for p in bad:
            if repr(p.get(key)) in idx:
                cb[idx[repr(p.get(key))]] += 1
        ratio = (cg / cg.sum()) / (cb / cb.sum())
        probs = ratio / ratio.sum()
        return vals[rng.choice(len(vals), p=probs)]
    to_i, from_i, lo, hi = _transform(spec)
    g_obs = np.asarray([to_i(float(p[key])) for p in good if key in p])
    b_obs = np.asarray([to_i(float(p[key])) for p in bad if key in p])
    if len(g_obs) == 0:
        cand = rng.uniform(lo, hi, TPE_CANDIDATES)
    else:
        centers = g_obs[rng.randint(len(g_obs), size=TPE_CANDIDATES)]
        sigma = max((hi - lo) * 0.05,
                    (hi - lo) / max(np.sqrt(len(g_obs)), 1.0))
        cand = np.clip(centers + rng.randn(TPE_CANDIDATES) * sigma, lo, hi)
    score = _kde_logdensity(cand, g_obs, lo, hi) if len(g_obs) else \
        np.zeros(len(cand))
    if len(b_obs):
        score = score - _kde_logdensity(cand, b_obs, lo, hi)
    x = float(from_i(cand[int(np.argmax(score))]))
    if spec.get("distribution") == "int_uniform":
        return int(np.clip(round(x), int(spec["min"]), int(spec["max"])))
    # exp(log(hi)) can overshoot hi by an ulp — clamp in original space
    return float(min(max(x, float(spec["min"])), float(spec["max"])))


def tpe_propose(cfg: SweepConfig, history: List["TrialResult"],
                rng: np.random.RandomState) -> Dict[str, Any]:
    """Propose one trial from the observed history (TPE, per-parameter
    independent densities — the standard wandb/hyperopt factorization)."""
    minimize = cfg.metric_goal == "minimize"
    good, bad = _split_good_bad(history, cfg.metric_name, minimize)
    return {k: _tpe_param(rng, k, spec, good, bad)
            for k, spec in cfg.parameters.items()}


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
              trial_offset: int = 0, stride: int = 1,
              observations: Optional[List[TrialResult]] = None,
              refresh_observations: Optional[
                  Callable[[], List[TrialResult]]] = None
              ) -> TrialResult:
    """Run trials, return the best by the sweep metric.

    ``method: bayes`` turns adaptive after ``TPE_STARTUP`` observations:
    each next trial is proposed by :func:`tpe_propose` conditioned on this
    agent's history (+ any pre-seeded ``observations``).
    ``refresh_observations`` is polled before every bayes proposal —
    parallel agents pass a loader over the shared results dir so every
    worker conditions on everyone's trials (the wandb-service sharing
    pattern). grid/random keep the index-keyed deterministic sequence."""
    best: Optional[TrialResult] = None
    sign = -1.0 if cfg.metric_goal == "minimize" else 1.0
    history: List[TrialResult] = list(observations or [])
    bayes = cfg.method == "bayes"

    def known():
        external = refresh_observations() if refresh_observations else []
        return external + history

    def trial_params():
        if not bayes:
            yield from iter_trials(cfg, num_trials, seed, trial_offset,
                                   stride)
            return
        for k_i in range(num_trials):
            i = trial_offset + k_i * stride
            rng = np.random.RandomState((seed * 1000003 + i) & 0x7FFFFFFF)
            obs = known()
            if len(obs) >= TPE_STARTUP:
                yield tpe_propose(cfg, obs, rng)
            else:
                # startup: identical to the random sequence, so parallel
                # worker partitions stay deterministic
                yield {k: _sample_param(rng, spec)
                       for k, spec in cfg.parameters.items()}

    for i, params in enumerate(trial_params()):
        metrics = trial_fn(params)
        r = TrialResult(params, metrics)
        history.append(r)
        score = sign * metrics.get(cfg.metric_name, float("-inf") * sign)
        best_score = (sign * best.metrics.get(cfg.metric_name, float("nan"))
                      if best else float("-inf"))
        if best is None or score > best_score:
            best = r
        log(json.dumps({"trial": i, "params": params,
                        cfg.metric_name: metrics.get(cfg.metric_name)}))
    assert best is not None
    return best
