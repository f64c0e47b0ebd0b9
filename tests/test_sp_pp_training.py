"""SP and PP as TRAINING options (round-3 promotion from demos):
a TAV training run (tiny spec) trains under sequence parallelism and under
pipeline parallelism FROM THE CLI (MME_SP / MME_PP) and matches the
plain-data-parallel numerics. Runs on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax


def _run_cli(tmp_path, monkeypatch, tag, env):
    """One tiny-TAV CLI training run in an isolated cwd; returns the test
    summary dict."""
    d = tmp_path / tag
    d.mkdir()
    monkeypatch.chdir(d)
    for k in ("MME_SP", "MME_PP", "MME_PP_MICRO", "MME_MESH", "MME_MP",
              "MME_DP", "MME_SP_TOWER", "MME_PP_TOWER",
              "MME_SHARE_FRONTEND"):
        monkeypatch.delenv(k, raising=False)
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    from mme_tpu.cli import tav_nn
    return tav_nn.main(["-d", "synthetic", "-e", "1", "-b", "8", "-y", "7",
                        "-l", "1e-4", "-p", "50"])


@pytest.fixture(scope="module")
def baseline(tmp_path_factory):
    """Plain run (auto dp mesh off → single-device numerics)."""
    tmp = tmp_path_factory.mktemp("sp_pp_base")
    mp = pytest.MonkeyPatch()
    try:
        return _run_cli(tmp, mp, "base", {"MME_MESH": "off"})
    finally:
        mp.undo()


def _assert_matches(summary, baseline, atol=2e-3):
    assert np.isfinite(summary["test/loss"])
    assert abs(summary["test/loss"] - baseline["test/loss"]) < atol, (
        summary["test/loss"], baseline["test/loss"])
    np.testing.assert_array_equal(
        np.asarray(summary["test/confusion_matrix"]),
        np.asarray(baseline["test/confusion_matrix"]))


def test_cli_trains_under_sp(tmp_path, monkeypatch, baseline):
    """MME_SP=2: fusion trunk ring-attention over sp=2, dp=4 — the fused
    sequence length is NOT a multiple of 2·(anything), exercising the
    ring padding path. Numerics must match the plain run (ring attention
    is exact up to fp reassociation; dropout rng streams are identical)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device CPU mesh")
    summary = _run_cli(tmp_path, monkeypatch, "sp", {"MME_SP": "2"})
    _assert_matches(summary, baseline)


def test_cli_trains_under_pp(tmp_path, monkeypatch, baseline):
    """MME_PP=2: fusion trunk as a 2-stage GPipe pipeline (dp=4,
    2 microbatches) — with the reference's dropout-bearing TAV config (the
    head dropout=0.5 stays active; the trunk itself is dropout-free in the
    flagship spec, so numerics are exact vs the plain run)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device CPU mesh")
    summary = _run_cli(tmp_path, monkeypatch, "pp",
                       {"MME_PP": "2", "MME_PP_MICRO": "2"})
    _assert_matches(summary, baseline)


def test_cli_trains_under_sp_video_tower(tmp_path, monkeypatch, baseline):
    """MME_SP_TOWER=video: the VIDEO tower (the dominant per-step cost —
    126.8 ms/step standalone at bench scale, BASELINE.md) trains with its
    encoder's attention ring-sharded over sp=2 while the fusion trunk runs
    dense. Numerics must match the plain run."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device CPU mesh")
    summary = _run_cli(tmp_path, monkeypatch, "spv",
                       {"MME_SP": "2", "MME_SP_TOWER": "video"})
    _assert_matches(summary, baseline)


def test_cli_trains_under_sp_audio_tower(tmp_path, monkeypatch, baseline):
    """MME_SP_TOWER=audio: the audio tower — SURVEY §5.7's motivating case
    (sequence-sharding exists to lift the reference's audio_shape cap) —
    trains ring-sharded, with its per-key feature mask flowing through the
    ring as an additive bias."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device CPU mesh")
    summary = _run_cli(tmp_path, monkeypatch, "spa",
                       {"MME_SP": "2", "MME_SP_TOWER": "audio"})
    _assert_matches(summary, baseline)


def test_cli_trains_under_pp_audio_tower(tmp_path, monkeypatch, baseline):
    """MME_PP_TOWER=audio: the audio tower's 2 (tiny) layers as a 2-stage
    GPipe pipeline, final stable-LN applied post-pipeline."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device CPU mesh")
    summary = _run_cli(tmp_path, monkeypatch, "ppa",
                       {"MME_PP": "2", "MME_PP_MICRO": "2",
                        "MME_PP_TOWER": "audio"})
    _assert_matches(summary, baseline)


def test_cli_trains_under_tp(tmp_path, monkeypatch, baseline):
    """MME_MP=2: Megatron tensor parallelism from the CLI — the auto mesh
    in cli/common.py becomes dp=4×mp=2 and train/loop.py Megatron-shards
    the params over "mp" (parallel/sharding_rules.py). Numerics must match
    the plain run (TP is exact up to fp reassociation of the sharded
    matmuls)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device CPU mesh")
    summary = _run_cli(tmp_path, monkeypatch, "tp", {"MME_MP": "2"})
    _assert_matches(summary, baseline)


def test_cli_pp_with_trunk_dropout(tmp_path, monkeypatch):
    """The reference's configs train with dropout 0.4-0.5
    (hyper_parameter_config/tav.yaml) — a pipeline that cannot run dropout
    cannot claim the workload. Here the fusion TRUNK itself carries
    dropout through the pipeline schedule: training must run and produce a
    finite loss (rng streams differ from sequential by design)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device CPU mesh")
    import dataclasses
    import mme_tpu.models.fusion as fusion_mod

    orig_tiny = fusion_mod.TAVSpec.tiny

    def tiny_with_trunk_dropout(self):
        s = orig_tiny(self)
        return dataclasses.replace(
            s, fusion=dataclasses.replace(s.fusion, dropout=0.4))

    monkeypatch.setattr(fusion_mod.TAVSpec, "tiny", tiny_with_trunk_dropout)
    summary = _run_cli(tmp_path, monkeypatch, "ppdrop",
                       {"MME_PP": "2", "MME_PP_MICRO": "2"})
    assert np.isfinite(summary["test/loss"])
    assert "test/weighted-f1-score" in summary
