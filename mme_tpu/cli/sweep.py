"""Sweep runner CLI: the local stand-in for ``wandb sweep`` + ``wandb agent``
(reference ``run_slurm/*.sh``).

    python -m mme_tpu.cli.sweep hyper.yaml --entry tav_nn --trials 8
    python -m mme_tpu.cli.sweep hyper.yaml --trials 8 --workers 4 \
        --pin_env JAX_VISIBLE_DEVICES    # one agent per device

Reads the reference's sweep YAML (core/sweep.py), runs each trial through
the chosen entry point's main(), and reports the best trial by the sweep
metric. ``--workers N`` reproduces the reference's one-``wandb agent``-per-
GPU parallelism (``run_slurm/meld_multi.txt:1-2``, GNU ``parallel`` with
``CUDA_VISIBLE_DEVICES=i``) as N subprocesses partitioning one global trial
sequence (worker w runs trials w, w+N, ...); ``--pin_env NAME`` sets
``NAME=<worker-id>`` in each worker's environment, the TPU-host analogue of
the reference's per-agent ``CUDA_VISIBLE_DEVICES``.
"""

from __future__ import annotations

import argparse
import importlib
import json
import os
import subprocess
import sys
import tempfile


def _parse(argv):
    p = argparse.ArgumentParser("mme_tpu sweep agent")
    p.add_argument("yaml", help="sweep config (reference format)")
    p.add_argument("--entry", default=None,
                   help="cli entry module (tav_nn, text_nn, ...); default "
                        "derives from the yaml's `program` field")
    p.add_argument("--trials", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dataset", default=None,
                   help="override dataset (e.g. synthetic)")
    p.add_argument("--workers", type=int, default=1,
                   help="parallel agent processes (1 = in-process)")
    p.add_argument("--pin_env", default=None,
                   help="env var set to the worker id in each worker "
                        "(device pinning, e.g. JAX_VISIBLE_DEVICES)")
    p.add_argument("--trial_offset", type=int, default=0,
                   help="first global trial index this agent runs")
    p.add_argument("--stride", type=int, default=1,
                   help="global-trial-index stride between this agent's "
                        "trials")
    p.add_argument("--results", default=None,
                   help="JSONL path for per-trial results (worker mode)")
    return p.parse_args(argv)


def _entry_from_program(program):
    """Derive the cli module from a sweep yaml's ``program`` field: accepts
    our dotted paths (mme_tpu.cli.tav_nn) and the reference's script paths
    (../tav_nn.py; ../audio_nn.py maps to the README name
    audio_nn_wav2vec)."""
    if not program:
        return "tav_nn"
    name = os.path.basename(str(program))
    if name.endswith(".py"):
        name = name[:-3]
    name = name.split(".")[-1]
    return {"audio_nn": "audio_nn_wav2vec"}.get(name, name)


def _launch_workers(args):
    """Spawn one agent subprocess per worker and merge their results."""
    from mme_tpu.core.sweep import SweepConfig, TrialResult, best_of

    cfg = SweepConfig.from_yaml(args.yaml)
    if args.entry is None:
        args.entry = _entry_from_program(cfg.program)
    workers = max(1, args.workers)
    procs, files = [], []
    tmpdir = tempfile.mkdtemp(prefix="mme_sweep_")
    for w in range(workers):
        n_w = len(range(w, args.trials, workers))
        if n_w == 0:
            continue
        res = os.path.join(tmpdir, f"worker_{w}.jsonl")
        files.append(res)
        cmd = [sys.executable, "-m", "mme_tpu.cli.sweep", args.yaml,
               "--entry", args.entry, "--trials", str(n_w),
               "--seed", str(args.seed),
               "--trial_offset", str(args.trial_offset + w),
               "--stride", str(args.stride * workers),
               "--results", res]
        if args.dataset:
            cmd += ["--dataset", args.dataset]
        env = dict(os.environ)
        env["MME_SWEEP_WORKER"] = str(w)
        if args.pin_env:
            env[args.pin_env] = str(w)
        repo = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        procs.append(subprocess.Popen(cmd, env=env))
    rcs = [p.wait() for p in procs]
    if any(rcs):
        raise RuntimeError(f"sweep worker(s) failed: rc={rcs}")

    results = []
    for res in files:
        with open(res) as f:
            for line in f:
                rec = json.loads(line)
                results.append(TrialResult(rec["params"], rec["metrics"]))
    assert results, "no trial results collected"
    best = best_of(results, cfg.metric_name, cfg.metric_goal)
    print(json.dumps({"best_params": best.params,
                      cfg.metric_name: best.metrics.get(cfg.metric_name),
                      "trials": len(results), "workers": workers}))
    return best


def main(argv=None):
    args = _parse(argv)
    if args.workers > 1:
        return _launch_workers(args)

    from mme_tpu.core.sweep import SweepConfig, TrialResult, run_sweep

    cfg = SweepConfig.from_yaml(args.yaml)
    if args.entry is None:
        args.entry = _entry_from_program(cfg.program)
    entry = importlib.import_module(f"mme_tpu.cli.{args.entry}")
    results_f = open(args.results, "a") if args.results else None

    refresh = None
    if args.results:
        # bayes workers condition on SIBLING workers' finished trials too
        # (own trials live in run_sweep's history — excluded to avoid
        # double counting): the wandb-service sharing pattern, via the
        # shared results dir
        import glob as globlib
        res_dir = os.path.dirname(os.path.abspath(args.results))
        own = os.path.abspath(args.results)

        def refresh():
            out = []
            for path in sorted(globlib.glob(
                    os.path.join(res_dir, "worker_*.jsonl"))):
                if os.path.abspath(path) == own:
                    continue
                try:
                    with open(path) as f:
                        for line in f:
                            rec = json.loads(line)
                            out.append(TrialResult(rec["params"],
                                                   rec["metrics"]))
                except (OSError, ValueError):
                    pass  # sibling mid-write; pick it up next trial
            return out

    trial_counter = [args.trial_offset]

    def trial(params):
        argv_trial = []
        for k, v in params.items():
            argv_trial += [f"--{k}", str(v)]
        if args.dataset:
            argv_trial += ["--dataset", args.dataset]
        # wandb mirror (MME_WANDB=1, utils/profiling.RunLogger): tag each
        # trial as its own named run — the `wandb agent` trial-per-run
        # convention the reference's sweeps produce. Restore the caller's
        # value afterwards (env must not leak past the trial).
        prev_name = os.environ.get("MME_WANDB_NAME")
        os.environ["MME_WANDB_NAME"] = (
            f"sweep-{args.entry}-t{trial_counter[0]}")
        trial_counter[0] += args.stride
        try:
            summary = entry.main(argv_trial)
        finally:
            if prev_name is None:
                os.environ.pop("MME_WANDB_NAME", None)
            else:
                os.environ["MME_WANDB_NAME"] = prev_name
        # sweep metrics key on val/loss; the entry returns the test summary —
        # map the metric name onto whatever split it carries
        name = cfg.metric_name.replace("val/", "test/")
        metrics = {cfg.metric_name: summary.get(cfg.metric_name,
                                                summary.get(name, 0.0)),
                   **summary}
        if results_f is not None:
            results_f.write(json.dumps({"params": params,
                                        "metrics": metrics}) + "\n")
            results_f.flush()
        return metrics

    best = run_sweep(cfg, trial, args.trials, args.seed,
                     trial_offset=args.trial_offset, stride=args.stride,
                     refresh_observations=refresh)
    if results_f is not None:
        results_f.close()
    print(json.dumps({"best_params": best.params,
                      cfg.metric_name: best.metrics.get(cfg.metric_name)}))
    return best


if __name__ == "__main__":
    main()
