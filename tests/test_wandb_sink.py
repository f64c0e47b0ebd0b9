"""Optional wandb mirror on RunLogger (MME_WANDB=1): the reference's
observability backend is wandb (``tav_nn.py:104-105,121-122``); the JSONL
RunLogger stays the source of truth and mirrors every logged dict when a
wandb module is importable. wandb is NOT installed in this image — the
mirror is exercised through a stub module, and the absent-module path must
degrade to JSONL-only."""

import importlib
import json
import sys
import types

import numpy as np
import pytest


def _stub_wandb(calls):
    mod = types.ModuleType("wandb")

    class Run:
        def log(self, d, step=None):
            calls.append(("log", dict(d), step))

        def finish(self):
            calls.append(("finish",))

    def init(**kw):
        calls.append(("init", kw))
        return Run()

    mod.init = init
    return mod


def test_mirrors_to_wandb_when_enabled(tmp_path, monkeypatch):
    calls = []
    monkeypatch.setitem(sys.modules, "wandb", _stub_wandb(calls))
    monkeypatch.setenv("MME_WANDB", "1")
    monkeypatch.setenv("MME_WANDB_PROJECT", "proj-x")
    monkeypatch.setenv("MME_WANDB_NAME", "run-y")
    from mme_tpu.utils.profiling import RunLogger

    lg = RunLogger(str(tmp_path / "run"))
    lg.log({"train/loss": np.float32(1.5), "epoch": 0})
    lg.log({"val/acc": 0.75})
    lg.finish()

    kinds = [c[0] for c in calls]
    assert kinds == ["init", "log", "log", "finish"]
    assert calls[0][1]["project"] == "proj-x"
    assert calls[0][1]["name"] == "run-y"
    # keys mirrored unchanged (the reference's wandb key scheme), private
    # _step/_time fields stripped, numpy scalars coerced
    assert calls[1][1] == {"train/loss": 1.5, "epoch": 0}
    assert calls[1][2] == 0
    assert calls[2][1] == {"val/acc": 0.75}
    assert calls[2][2] == 1
    # JSONL stays the source of truth
    lines = [json.loads(x) for x in
             open(tmp_path / "run" / "metrics.jsonl")]
    assert len(lines) == 2 and lines[0]["train/loss"] == 1.5


def test_disabled_by_default(tmp_path, monkeypatch):
    calls = []
    monkeypatch.setitem(sys.modules, "wandb", _stub_wandb(calls))
    monkeypatch.delenv("MME_WANDB", raising=False)
    from mme_tpu.utils.profiling import RunLogger

    lg = RunLogger(str(tmp_path / "run"))
    lg.log({"train/loss": 1.0})
    lg.finish()
    assert calls == []


def test_degrades_without_wandb(tmp_path, monkeypatch, capsys):
    """MME_WANDB=1 with no wandb installed (this image's reality): JSONL
    logging proceeds, a notice is printed, nothing raises."""
    if importlib.util.find_spec("wandb") is not None:
        pytest.skip("wandb installed — the absent-module path is not "
                    "reachable in this environment")
    monkeypatch.delitem(sys.modules, "wandb", raising=False)
    monkeypatch.setenv("MME_WANDB", "1")
    from mme_tpu.utils.profiling import RunLogger

    lg = RunLogger(str(tmp_path / "run"))
    lg.log({"train/loss": 2.0})
    lg.finish()
    assert "wandb unavailable" in capsys.readouterr().out
    lines = [json.loads(x) for x in
             open(tmp_path / "run" / "metrics.jsonl")]
    assert lines[0]["train/loss"] == 2.0
