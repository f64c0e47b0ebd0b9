"""The sweep configs of record (configs/*.yaml — the reference's
hyper_parameter_config search spaces) parse, sample inside the recorded
space, resolve their entry points, and drive cli/sweep.py end to end."""

import glob
import importlib
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = sorted(glob.glob(os.path.join(REPO, "configs", "*.yaml")))


def test_configs_exist():
    names = {os.path.basename(p) for p in CONFIGS}
    # the full set of record: root tav/loss + Single + Double variants
    assert {"tav.yaml", "loss.yaml", "bert.yaml", "lstm.yaml", "audio.yaml",
            "transformers_audio.yaml", "image.yaml", "visual.yaml",
            "text_video.yaml", "iemocap_text_video.yaml",
            "text_video_latefusion.yaml", "vbert.yaml"} <= names


@pytest.mark.parametrize("path", CONFIGS, ids=os.path.basename)
def test_config_parses_and_samples_in_space(path):
    from mme_tpu.core.sweep import SweepConfig, iter_trials

    cfg = SweepConfig.from_yaml(path)
    assert cfg.method == "bayes"            # every reference yaml is bayes
    assert cfg.metric_goal == "minimize"
    # entry derivation points at a real cli module
    from mme_tpu.cli.sweep import _entry_from_program
    entry = _entry_from_program(cfg.program)
    importlib.import_module(f"mme_tpu.cli.{entry}")
    # samples stay inside the recorded space
    for trial in iter_trials(cfg, 20, seed=3):
        for k, v in trial.items():
            spec = cfg.parameters[k]
            if "values" in spec:
                assert v in spec["values"], (path, k, v)
            else:
                assert float(spec["min"]) <= v <= float(spec["max"])


def test_tav_config_is_the_recorded_space():
    """Spot-check the flagship space against the recorded values
    (/root/reference/hyper_parameter_config/tav.yaml:15-52)."""
    from mme_tpu.core.sweep import SweepConfig

    cfg = SweepConfig.from_yaml(os.path.join(REPO, "configs", "tav.yaml"))
    p = cfg.parameters
    assert p["epoch"]["values"] == [6]
    assert p["learning_rate"]["min"] == 5.0e-6
    assert p["learning_rate"]["max"] == 1.0e-5
    assert p["dropout"]["values"] == [0.4, 0.5]
    assert p["epoch_switch"]["values"] == [2, 3]
    assert p["seed"]["values"] == [32, 64, 96]
    assert p["num_layers"]["values"] == [6, 9]
    assert p["loss"]["values"] == ["NewCrossEntropy"]
    assert cfg.metric_name == "val/loss"


def test_sweep_cli_consumes_tav_config(tmp_path, monkeypatch):
    """python -m mme_tpu.cli.sweep configs/tav.yaml runs a real (tiny,
    synthetic-data) trial from the recorded space end to end."""
    monkeypatch.chdir(tmp_path)
    from mme_tpu.cli import sweep as sweep_cli

    best = sweep_cli.main([os.path.join(REPO, "configs", "tav.yaml"),
                           "--trials", "1", "--dataset", "synthetic"])
    assert "val/loss" in best.metrics or "test/loss" in best.metrics
    assert best.params["epoch"] == 6
    assert 5.0e-6 <= best.params["learning_rate"] <= 1.0e-5


def test_fbeta_precision_losses():
    """--loss FBeta/Precision (the loss.yaml space): differentiable,
    bounded, minimized by correct confident predictions."""
    from mme_tpu.train.losses import (make_loss_fn, soft_fbeta_loss,
                                      soft_precision_loss)

    rng = np.random.RandomState(0)
    labels = jnp.asarray(rng.randint(0, 4, 32))
    good = jax.nn.one_hot(labels, 4) * 10.0         # confident & right
    bad = jnp.asarray(rng.randn(32, 4), jnp.float32)
    for fn in (soft_fbeta_loss, soft_precision_loss):
        lg = float(fn(good, labels))
        lb = float(fn(bad, labels))
        assert 0.0 <= lg < lb <= 1.0, (fn.__name__, lg, lb)
        g = jax.grad(lambda x: fn(x, labels))(bad)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0
    # beta changes the objective
    l05 = float(make_loss_fn("FBeta", 0.5)(bad, labels, None, None))
    l20 = float(make_loss_fn("FBeta", 2.0)(bad, labels, None, None))
    assert l05 != l20
    # sample_mask drops rows
    m = jnp.zeros((32,)).at[:8].set(1)
    lm = float(soft_fbeta_loss(bad, labels, sample_mask=m))
    l8 = float(soft_fbeta_loss(bad[:8], labels[:8]))
    np.testing.assert_allclose(lm, l8, rtol=1e-5)
    with pytest.raises(ValueError):
        make_loss_fn("NoSuchLoss")


def test_cli_trains_with_fbeta_loss(tmp_path, monkeypatch):
    """--loss FBeta end to end through the TAV entry (the loss.yaml
    workload the reference could never run — its import was broken)."""
    monkeypatch.chdir(tmp_path)
    from mme_tpu.cli import tav_nn

    summary = tav_nn.main(["-d", "synthetic", "-e", "1", "-b", "8",
                           "-y", "7", "-l", "1e-4", "-ls", "FBeta",
                           "-beta", "0.5"])
    assert np.isfinite(summary["test/loss"])
    assert 0.0 <= summary["test/loss"] <= 1.0   # FBeta loss is bounded
