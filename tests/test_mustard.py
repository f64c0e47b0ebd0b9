"""MUStARD++ sarcasm as a first-class task: the preprocess CLI ingests the
sarcasm column, the label map names the binary task, and the text/TAV
entry points train on a sarcasm-labelled pickle via --label_task sarcasm.
The reference only prepared this dataset in notebooks
(``notebooks/Mustard++.ipynb``/``SarcasmVideo.ipynb``) and never shipped a
trainer for it."""

import os
import wave as wavemod

import numpy as np
import pandas as pd
import pytest


def test_label_names_sarcasm():
    from mme_tpu.cli.common import label_names
    assert label_names("mustard_pp", "sarcasm", 2) == {
        0: "not_sarcastic", 1: "sarcastic"}
    assert label_names("anything", "sarcasm", 2)[1] == "sarcastic"


def _mustard_csv(path, n=12):
    rows = ["Utterance,Emotion,Sentiment,Dialogue_ID,Utterance_ID,Sarcasm"]
    for i in range(n):
        rows.append(f"say something {i},neutral,neutral,0,{i},{i % 2}")
    path.write_text("\n".join(rows) + "\n")
    return str(path)


def test_preprocess_sarcasm_column(tmp_path):
    from mme_tpu.cli import preprocess
    csv = _mustard_csv(tmp_path / "train.csv")
    df = preprocess.main([csv, "--out", str(tmp_path / "m.pkl"),
                          "--sarcasm_col", "Sarcasm"])
    assert list(df["sarcasm"][:4]) == [0, 1, 0, 1]
    assert df["sarcasm_label"][1] == "sarcastic"


@pytest.fixture(scope="module")
def mustard_pickle(tmp_path_factory):
    """Learnable sarcasm pickle: sarcastic rows use one word family."""
    d = tmp_path_factory.mktemp("mustard")
    n = 48
    rng = np.random.RandomState(3)
    labels = rng.randint(0, 2, n)
    df = pd.DataFrame({
        "text": [" ".join(["drywit irony deadpan" if l else
                           "plain direct literal"] * 3) for l in labels],
        "sarcasm": labels.astype(np.int64),
        "sarcasm_label": ["sarcastic" if l else "not_sarcastic"
                          for l in labels],
        "split": ["train"] * 32 + ["val"] * 8 + ["test"] * 8,
        "dialog": np.arange(n) // 4,
    })
    pkl = d / "mustard.pkl"
    df.to_pickle(pkl)
    return str(pkl)


def test_text_nn_trains_sarcasm(mustard_pickle, monkeypatch, tmp_path):
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("MME_TINY", "1")
    from mme_tpu.cli import text_nn
    summary = text_nn.main([
        "--dataset", mustard_pickle, "-lt", "sarcasm", "-y", "2",
        "-e", "2", "-b", "8", "-l", "1e-3", "-p", "50"])
    assert "test/weighted-f1-score" in summary
    assert np.isfinite(summary["test/loss"])
