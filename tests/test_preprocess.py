"""Offline preprocess CLI (cli/preprocess.py): MELD CSV + media dirs →
the reference pickle contract, consumable by the entry points end-to-end."""

import os
import wave

import numpy as np
import pandas as pd
import pytest

from mme_tpu.cli import preprocess


@pytest.fixture()
def meld_setup(tmp_path):
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    rows = []
    rng = np.random.RandomState(0)
    emotions = ["neutral", "joy", "anger", "sadness"]
    k = 0
    for split, csvname, n_dialog in (("train", "train_sent_emo.csv", 4),
                                     ("val", "dev_sent_emo.csv", 2),
                                     ("test", "test_sent_emo.csv", 2)):
        recs = []
        for d in range(n_dialog):
            for u in range(3):
                recs.append({
                    "Sr No.": k, "Utterance": f"hello number {k}",
                    "Speaker": "A",
                    "Emotion": emotions[k % 4].capitalize(),
                    "Sentiment": "positive" if k % 2 else "negative",
                    "Dialogue_ID": d, "Utterance_ID": u,
                })
                n_samples = 800 + 160 * (k % 5)
                with wave.open(str(wav_dir / f"dia{d}_utt{u}.wav"),
                               "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(16000)
                    w.writeframes(
                        (rng.randn(n_samples) * 3000).astype(
                            np.int16).tobytes())
                k += 1
        pd.DataFrame(recs).to_csv(tmp_path / csvname, index=False)
    return tmp_path, wav_dir


def test_preprocess_builds_reference_contract(meld_setup, tmp_path):
    root, wav_dir = meld_setup
    out = tmp_path / "meld.pkl"
    df = preprocess.main([
        str(root / "train_sent_emo.csv"), str(root / "dev_sent_emo.csv"),
        str(root / "test_sent_emo.csv"),
        "--out", str(out), "--audio_dir", str(wav_dir)])
    df2 = pd.read_pickle(out)
    assert set(df2.columns) >= {"text", "audio_path", "video_path",
                                "emotion", "emotion_label", "sentiment",
                                "dialog", "utterance", "split",
                                "audio_shape", "timings", "speaker"}
    assert set(df2["split"]) == {"train", "val", "test"}
    # reference emotion int map (pre_process_for_audio.py:14)
    assert df2[df2.emotion_label == "joy"]["emotion"].iloc[0] == 4
    assert df2[df2.emotion_label == "anger"]["emotion"].iloc[0] == 6
    # audio_shape from the WAV header
    row = df2.iloc[0]
    with wave.open(row["audio_path"], "rb") as w:
        assert row["audio_shape"] == w.getnframes()


def test_preprocess_drops_bad_utterances(meld_setup, tmp_path):
    root, wav_dir = meld_setup
    # add the known-bad utterance to the train CSV
    csv = root / "train_sent_emo.csv"
    df = pd.read_csv(csv)
    bad = {"Sr No.": 999, "Utterance": "bad", "Speaker": "A",
           "Emotion": "neutral", "Sentiment": "neutral",
           "Dialogue_ID": 110, "Utterance_ID": 7}
    pd.concat([df, pd.DataFrame([bad])]).to_csv(csv, index=False)
    out = tmp_path / "m.pkl"
    built = preprocess.main([str(csv), "--out", str(out),
                             "--audio_dir", str(wav_dir)])
    assert not ((built.dialog == 110) & (built.utterance == 7)).any()
    kept = preprocess.main([str(csv), "--out", str(out), "--keep_bad",
                            "--audio_dir", str(wav_dir)])
    assert ((kept.dialog == 110) & (kept.utterance == 7)).any()


def test_unknown_labels_get_fresh_ids_not_zero(meld_setup, tmp_path):
    """IEMOCAP-style labels absent from the reference map must NOT all
    collapse onto id 0 (that silently trains on all-neutral labels)."""
    root, wav_dir = meld_setup
    csv = root / "train_sent_emo.csv"
    df = pd.read_csv(csv)
    df.loc[df.index[:2], "Emotion"] = "Frustrated"
    df.loc[df.index[2:4], "Emotion"] = "Excited"
    df.to_csv(csv, index=False)
    out = tmp_path / "iem.pkl"
    built = preprocess.main([str(csv), "--out", str(out),
                             "--audio_dir", str(wav_dir)])
    frus = built[built.emotion_label == "frustrated"]["emotion"].unique()
    exc = built[built.emotion_label == "excited"]["emotion"].unique()
    known_max = 6  # anger, the top of the reference map
    assert len(frus) == 1 and frus[0] > known_max
    assert len(exc) == 1 and exc[0] > known_max
    assert frus[0] != exc[0]


def test_empty_input_refuses_to_write(tmp_path):
    csv = tmp_path / "empty.csv"
    pd.DataFrame(columns=["Utterance", "Emotion", "Sentiment",
                          "Dialogue_ID", "Utterance_ID"]).to_csv(
        csv, index=False)
    out = tmp_path / "nope.pkl"
    with pytest.raises(SystemExit, match="no rows"):
        preprocess.main([str(csv), "--out", str(out)])
    assert not out.exists()


def test_preprocessed_pickle_trains_text_nn(meld_setup, tmp_path,
                                            monkeypatch):
    root, wav_dir = meld_setup
    out = tmp_path / "meld.pkl"
    preprocess.main([
        str(root / "train_sent_emo.csv"), str(root / "dev_sent_emo.csv"),
        str(root / "test_sent_emo.csv"),
        "--out", str(out), "--audio_dir", str(wav_dir)])
    monkeypatch.setenv("MME_TINY", "1")
    monkeypatch.setenv("MME_RUN_DIR", str(tmp_path / "run"))
    from mme_tpu.cli import text_nn
    summary = text_nn.main(["--dataset", str(out), "-e", "1", "-b", "4",
                            "-lt", "emotion", "-y", "7"])
    assert "test/acc" in summary
