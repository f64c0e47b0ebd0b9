"""Offline re-evaluation (EvaluationScripts capability) and seed
reproducibility through the real CLI surface."""

import json

import numpy as np
import pytest


def test_eval_only_restores_and_matches(tmp_path, monkeypatch, capsys):
    monkeypatch.setenv("MME_TINY", "1")
    from mme_tpu.cli import text_nn

    ckpt = str(tmp_path / "ck")
    # checkpoint dir flows through ExperimentConfig default; override by
    # chdir so 'checkpoints' lands in tmp
    monkeypatch.chdir(tmp_path)
    args = ["--dataset", "synthetic", "-e", "1", "-b", "16", "-y", "3",
            "-l", "1e-3"]
    s1 = text_nn.main(args)

    monkeypatch.setenv("MME_EVAL_ONLY", "1")
    s2 = text_nn.main(args)
    assert abs(s1["test/acc"] - s2["test/acc"]) < 1e-6
    assert abs(s1["test/weighted-f1-score"]
               - s2["test/weighted-f1-score"]) < 1e-6


def test_seed_reproducibility(tmp_path, monkeypatch):
    monkeypatch.setenv("MME_TINY", "1")
    monkeypatch.chdir(tmp_path)
    from mme_tpu.cli import text_nn
    args = ["--dataset", "synthetic", "-e", "1", "-b", "16", "-y", "3",
            "-l", "1e-3", "-s", "64"]
    s1 = text_nn.main(args)
    import shutil
    shutil.rmtree(tmp_path / "checkpoints", ignore_errors=True)
    s2 = text_nn.main(args)
    assert s1["test/acc"] == s2["test/acc"]
    assert s1["test/weighted-f1-score"] == s2["test/weighted-f1-score"]
