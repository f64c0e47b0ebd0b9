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
    # dialogue ids disjoint across splits: real MELD RESTARTS ids per split
    # and preprocess.py now rejects the resulting media collisions (the
    # round-2 advisor's train/test-leakage finding, pinned in
    # test_advice_fixes.py) — a shared flat media dir needs distinct ids
    for split, csvname, base, n_dialog in (
            ("train", "train_sent_emo.csv", 0, 4),
            ("val", "dev_sent_emo.csv", 10, 2),
            ("test", "test_sent_emo.csv", 20, 2)):
        recs = []
        for d in range(base, base + n_dialog):
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


def test_preprocess_media_to_tav_one_chain(tmp_path, monkeypatch):
    """The full offline→train chain with REAL pixels as ONE path (round-2
    review: mp4 ingestion was only tested at the records layer): cv2-write
    tiny mp4s + wavs → cli/preprocess (CSV+media dirs, IEMOCAP speaker
    column) → pickle → cli/tav_nn trains through the raw-decode path with
    the speaker crop applied (reference models/tav.py:51-121 +
    run_scripts/Katna_Proc.py:16-75)."""
    cv2 = pytest.importorskip("cv2")
    media = tmp_path / "media"
    media.mkdir()
    rng = np.random.RandomState(0)
    recs = []
    k = 0
    for d in range(4):
        for u in range(3):
            with wave.open(str(media / f"dia{d}_utt{u}.wav"), "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(16000)
                w.writeframes((rng.randn(1200) * 3000).astype(
                    np.int16).tobytes())
            # wide frame so the IEMOCAP left/right speaker boxes
            # (data/videodec.py:210: width 355 at offset 2/362) exist
            vw = cv2.VideoWriter(str(media / f"dia{d}_utt{u}.mp4"),
                                 cv2.VideoWriter_fourcc(*"mp4v"), 8.0,
                                 (720, 480))
            assert vw.isOpened()
            for f in range(8):
                frame = np.full((480, 720, 3), 30 * (k % 8), np.uint8)
                vw.write(frame)
            vw.release()
            recs.append({"Utterance": f"utt number {k}",
                         "Emotion": ["neutral", "joy", "anger"][k % 3],
                         "Sentiment": "neutral", "Dialogue_ID": d,
                         "Utterance_ID": u, "Left": k % 2 == 0})
            k += 1
    csv = tmp_path / "train_iemo.csv"
    pd.DataFrame(recs).to_csv(csv, index=False)

    out = tmp_path / "iemo.pkl"
    built = preprocess.main([
        str(csv), "--out", str(out), "--audio_dir", str(media),
        "--video_dir", str(media), "--speaker_col", "Left"])
    assert built["speaker"].notna().all()
    assert built["video_path"].str.endswith(".mp4").all()

    # the pickle has only a train split → stratified 75/12.5/12.5 kicks in
    monkeypatch.setenv("MME_TINY", "1")
    monkeypatch.delenv("MME_KEYFRAME_GLOB", raising=False)
    monkeypatch.chdir(tmp_path)
    from mme_tpu.cli import tav_nn
    summary = tav_nn.main(["--dataset", str(out), "-e", "1", "-b", "4",
                           "-y", "7", "-l", "1e-4", "-p", "50"])
    assert "test/acc" in summary and np.isfinite(summary["test/loss"])


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
