"""Sweep runner CLI: the local stand-in for ``wandb sweep`` + ``wandb agent``
(reference ``run_slurm/*.sh``).

    python -m mme_tpu.cli.sweep hyper.yaml --entry tav_nn --trials 8

Reads the reference's sweep YAML (core/sweep.py), runs each trial through
the chosen entry point's main(), and reports the best trial by the sweep
metric.
"""

from __future__ import annotations

import argparse
import importlib
import json


def main(argv=None):
    p = argparse.ArgumentParser("mme_tpu sweep agent")
    p.add_argument("yaml", help="sweep config (reference format)")
    p.add_argument("--entry", default="tav_nn",
                   help="cli entry module (tav_nn, text_nn, ...)")
    p.add_argument("--trials", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dataset", default=None,
                   help="override dataset (e.g. synthetic)")
    args = p.parse_args(argv)

    from mme_tpu.core.sweep import SweepConfig, run_sweep

    cfg = SweepConfig.from_yaml(args.yaml)
    entry = importlib.import_module(f"mme_tpu.cli.{args.entry}")

    def trial(params):
        argv_trial = []
        for k, v in params.items():
            argv_trial += [f"--{k}", str(v)]
        if args.dataset:
            argv_trial += ["--dataset", args.dataset]
        summary = entry.main(argv_trial)
        # sweep metrics key on val/loss; the entry returns the test summary —
        # map the metric name onto whatever split it carries
        name = cfg.metric_name.replace("val/", "test/")
        return {cfg.metric_name: summary.get(cfg.metric_name,
                                             summary.get(name, 0.0)),
                **summary}

    best = run_sweep(cfg, trial, args.trials, args.seed)
    print(json.dumps({"best_params": best.params,
                      cfg.metric_name: best.metrics.get(cfg.metric_name)}))
    return best


if __name__ == "__main__":
    main()
