"""Record-building tests against the reference pickle contract."""

import os
import wave as wavemod

import numpy as np
import pandas as pd
import pytest

from mme_tpu.data.records import (PickleDatasetConfig, apply_filters,
                                  build_audio_dataset, build_tav_dataset,
                                  build_text_dataset, HashTokenizer,
                                  labels_to_ids, split_dataframe,
                                  tokenize_texts)


def _write_wav(path, seconds, sr=44100):
    t = np.arange(int(sr * seconds)) / sr
    data = (0.3 * np.sin(2 * np.pi * 200 * t)).astype(np.float32)
    with wavemod.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((data * 32767).astype(np.int16).tobytes())


@pytest.fixture(scope="module")
def frame(tmp_path_factory):
    d = tmp_path_factory.mktemp("data")
    n = 12
    rng = np.random.RandomState(0)
    paths = []
    for i in range(3):
        p = d / f"a{i}.wav"
        _write_wav(p, 0.2 + 0.1 * i)
        paths.append(str(p))
    df = pd.DataFrame({
        "text": [f"utterance number {i} about emotions" for i in range(n)],
        "audio_path": [paths[i % 3] for i in range(n)],
        "video_path": ["clip.mp4"] * n,
        "emotion": rng.randint(0, 3, n),
        "emotion_label": [["joy", "anger", "fear"][i % 3] for i in range(n)],
        "split": ["train"] * 8 + ["val"] * 2 + ["test"] * 2,
        "dialog": np.repeat(np.arange(4), 3),
        "audio_shape": rng.randint(5000, 20000, n),
    })
    return df


def test_split_by_column(frame):
    cfg = PickleDatasetConfig()
    tr, va, te = split_dataframe(frame, cfg)
    assert len(tr) == 8 and len(va) == 2 and len(te) == 2


def test_stratified_split_fallback(frame):
    cfg = PickleDatasetConfig()
    df = frame.drop(columns=["split"])
    tr, va, te = split_dataframe(df, cfg)
    assert len(tr) + len(va) + len(te) == len(df)
    assert len(tr) >= len(df) * 0.6


def test_filters(frame):
    cfg = PickleDatasetConfig(min_audio_shape=10000,
                              drop_labels=("fear",))
    out = apply_filters(frame, cfg)
    assert (out["audio_shape"] > 10000).all()
    assert not out["emotion_label"].isin(["fear"]).any()


def test_hash_tokenizer_contract():
    tok = HashTokenizer(500)
    ids, mask = tok("Hello world hello WORLD", max_length=10)
    assert len(ids) == len(mask) == 10
    assert ids[0] == 1 and 2 in ids
    assert mask[:6] == [1] * 6 or sum(mask) >= 5
    # deterministic + case-insensitive
    ids2, _ = tok("hello world hello world", max_length=10)
    assert ids == ids2
    # truncation
    long_ids, long_mask = tok(" ".join(["w"] * 50), max_length=8)
    assert len(long_ids) == 8 and sum(long_mask) == 8


def test_build_text_dataset(frame):
    cfg = PickleDatasetConfig(text_max_len=16)
    ds = build_text_dataset(frame, cfg)
    assert ds.features["input_ids"].shape == (12, 16)
    assert ds.dialog_ids is not None
    labels, id2label = labels_to_ids(frame["emotion"].values)
    assert set(np.unique(labels)) <= {0, 1, 2}


def test_build_audio_dataset(frame):
    cfg = PickleDatasetConfig(audio_max_samples=8000)
    ds = build_audio_dataset(frame, cfg)
    assert ds.features["waveform"].shape == (12, 8000)
    # masks follow true (resampled) lengths: file a0 = 0.2s*16000 = 3200
    lens = ds.features["audio_mask"].sum(axis=1)
    assert lens.min() >= 3000 and lens.max() <= 8000


def test_build_tav_dataset_missing_mp4_raises(frame):
    """mp4 decode is implemented (data/videodec.py); a missing file must
    fail loudly with IOError, not silently produce zero frames (and NOT
    NotImplementedError — that would mean decode regressed to a stub)."""
    cfg = PickleDatasetConfig(text_max_len=8, audio_max_samples=4000)
    with pytest.raises(IOError):
        build_tav_dataset(frame, cfg, video_frames=2, video_size=16)


def test_build_tav_with_keyframes(frame, tmp_path):
    from PIL import Image
    kdir = tmp_path / "frames"
    kdir.mkdir()
    for i in range(3):
        Image.fromarray(
            (np.random.RandomState(i).rand(64, 64, 3) * 255).astype("uint8")
        ).save(kdir / f"f{i}.jpg")
    df = frame.assign(clip=[str(kdir / "*.jpg")] * len(frame))
    cfg = PickleDatasetConfig(text_max_len=8, audio_max_samples=4000)
    ds = build_tav_dataset(df, cfg, video_frames=4, video_size=32,
                           keyframe_glob="{clip}")
    v = ds.features["video"]
    assert v.shape == (12, 4, 32, 32, 3)
    assert np.abs(v[0, :3]).sum() > 0      # 3 real frames
    assert np.abs(v[0, 3]).sum() == 0      # zero-padded 4th


def test_bucketed_batches():
    import numpy as np
    from mme_tpu.data.dataset import ArrayDataset, bucketed_batches
    n, T = 20, 100
    rng = np.random.RandomState(0)
    lengths = rng.randint(10, T + 1, n)
    t = np.arange(T)[None, :]
    mask = (t < lengths[:, None]).astype(np.int32)
    wave = rng.randn(n, T).astype(np.float32) * mask
    ds = ArrayDataset({"waveform": wave, "audio_mask": mask,
                       "other": rng.randn(n, 3).astype(np.float32)},
                      rng.randint(0, 3, n).astype(np.int64))
    seen = set()
    for batch, labels, smask, idx, bound in bucketed_batches(
            ds, np.arange(n), 4, lengths, (32, 64, 100)):
        assert batch["waveform"].shape[1] == bound
        assert batch["other"].shape[1] == 3  # non-length keys untouched
        # every real sample in this batch truly fits the bound
        real = idx[smask.astype(bool)[:len(idx)]]
        assert (lengths[real] <= bound).all()
        seen.update(real.tolist())
    assert seen == set(range(n))  # full coverage, no duplicates lost


def test_split_refuses_heldout_only_frame(frame):
    """train partition empty but official val/test rows exist → raising
    beats silently re-splitting held-out rows into training."""
    cfg = PickleDatasetConfig()
    df = frame[frame["split"] != "train"]
    with pytest.raises(ValueError, match="no train rows"):
        split_dataframe(df, cfg)


def test_carve_never_drains_a_class(frame):
    """A class with a single training row must stay in train when val is
    carved from it (the 12.5% carve used to take max(1, ...) rows — the
    class's ONLY sample)."""
    cfg = PickleDatasetConfig(label_col="emotion_label")
    # official train + test, no val → val carved out of train; make
    # "fear" a singleton in train
    df = frame[frame["split"] != "val"].copy()
    tr_mask = df["split"] == "train"
    fear_train = df.index[tr_mask & (df["emotion_label"] == "fear")]
    df = df.drop(fear_train[1:])
    tr, va, te = split_dataframe(df, cfg)
    assert (tr["emotion_label"] == "fear").sum() == 1
    assert (va["emotion_label"] == "fear").sum() == 0
