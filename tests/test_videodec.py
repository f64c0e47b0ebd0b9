"""Raw video ingestion: mp4 decode, keyframe extraction (Katna-equivalent),
and the end-to-end CLI paths the reference drives from pickles
(models/tav.py:51-160, run_scripts/Katna_Proc.py:16-75)."""

import os
import wave as wavemod

import numpy as np
import pandas as pd
import pytest

cv2 = pytest.importorskip("cv2")

from mme_tpu.data.videodec import (decode_video_frames, extract_keyframes,
                                   speaker_crop_box, IMAGENET_MEAN,
                                   IMAGENET_STD)


def write_mp4(path, n_frames=24, w=64, h=48, fps=8.0, scene_change_at=None):
    """Frames with brightness = 10*i (lossy-codec tolerant); optional hard
    scene change (inverted content) at a frame index."""
    vw = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps,
                         (w, h))
    assert vw.isOpened()
    for i in range(n_frames):
        val = min(10 * i, 255)
        if scene_change_at is not None and i >= scene_change_at:
            val = 255 - val
        vw.write(np.full((h, w, 3), val, np.uint8))
    vw.release()
    return str(path)


def denorm(frames):
    return frames * IMAGENET_STD + IMAGENET_MEAN


def test_decode_shapes_and_uniform_subsample(tmp_path):
    p = write_mp4(tmp_path / "a.mp4", n_frames=24, fps=8.0)
    out = decode_video_frames(p, num_frames=4, size=32)
    assert out.shape == (4, 32, 32, 3)
    # linspace(0, 23, 4) → frames 0, 8, 15, 23 → brightness 0,80,150,230
    got = denorm(out).mean(axis=(1, 2, 3)) * 255.0
    want = np.array([0.0, 80.0, 150.0, 230.0])
    assert np.allclose(got, want, atol=12.0)  # mp4v is lossy


def test_decode_timings_clip(tmp_path):
    p = write_mp4(tmp_path / "b.mp4", n_frames=24, fps=8.0)
    # clip [1.0 s, 2.0 s) @8 fps → frames 8..15 (brightness 80..150)
    out = decode_video_frames(p, num_frames=4, size=32, timings=(1.0, 2.0))
    got = denorm(out).mean(axis=(1, 2, 3)) * 255.0
    assert got.min() > 60.0 and got.max() < 170.0
    # degenerate clip (<0.1 s) falls back to the whole video
    # (reference models/tav.py:58-60)
    out2 = decode_video_frames(p, num_frames=4, size=32, timings=(1.0, 1.01))
    got2 = denorm(out2).mean(axis=(1, 2, 3)) * 255.0
    assert got2[0] < 20.0 and got2[-1] > 200.0


def test_decode_crop_box(tmp_path):
    # left half bright, right half dark; crop selects each half
    p = str(tmp_path / "c.mp4")
    vw = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 8.0, (64, 48))
    frame = np.zeros((48, 64, 3), np.uint8)
    frame[:, :32] = 200
    for _ in range(8):
        vw.write(frame)
    vw.release()
    left = decode_video_frames(p, 2, 16, crop_box=(0, 0, 48, 32))
    right = decode_video_frames(p, 2, 16, crop_box=(0, 32, 48, 32))
    assert denorm(left).mean() * 255.0 > 150.0
    assert denorm(right).mean() * 255.0 < 40.0


def test_speaker_crop_box_numpy_and_nan():
    assert speaker_crop_box(None) is None
    assert speaker_crop_box(float("nan")) is None
    assert speaker_crop_box(np.bool_(True)) == (120, 2, 245, 355)
    assert speaker_crop_box(np.bool_(False)) == (120, 362, 245, 355)
    assert speaker_crop_box(True) == (120, 2, 245, 355)


def test_extract_keyframes_coverage_and_scene_change(tmp_path):
    p = write_mp4(tmp_path / "d.mp4", n_frames=32, scene_change_at=16)
    out_dir = tmp_path / "kf"
    written = extract_keyframes(p, str(out_dir), num_frames=8)
    assert len(written) == 8
    assert all(os.path.exists(w) for w in written)
    # uniform coverage: one pick per 4-frame segment → picks span the
    # brightness ramp on both sides of the scene change
    imgs = [cv2.imread(w).mean() for w in written]
    assert max(imgs) - min(imgs) > 50.0
    # short video: fewer frames than requested → fewer files, no crash
    p2 = write_mp4(tmp_path / "e.mp4", n_frames=3)
    written2 = extract_keyframes(p2, str(tmp_path / "kf2"), num_frames=16)
    assert len(written2) == 3


@pytest.fixture(scope="module")
def av_pickle(tmp_path_factory):
    """Reference-contract pickle: wavs + mp4s + timings + split + dialog."""
    d = tmp_path_factory.mktemp("avtoy")
    n = 12
    rng = np.random.RandomState(0)
    wavs, mp4s = [], []
    for i in range(3):
        wp = d / f"u{i}.wav"
        t = np.arange(int(16000 * 0.2)) / 16000.0
        data = (0.3 * np.sin(2 * np.pi * (200 + 100 * i) * t)).astype(
            np.float32)
        with wavemod.open(str(wp), "wb") as wv:
            wv.setnchannels(1)
            wv.setsampwidth(2)
            wv.setframerate(16000)
            wv.writeframes((data * 32767).astype(np.int16).tobytes())
        wavs.append(str(wp))
        mp4s.append(write_mp4(d / f"v{i}.mp4", n_frames=16, fps=8.0))
    labels = rng.randint(0, 3, n)
    df = pd.DataFrame({
        "text": [f"word{l} some text" for l in labels],
        "audio_path": [wavs[i % 3] for i in range(n)],
        "video_path": [mp4s[i % 3] for i in range(n)],
        "timings": [(0.0, 1.5)] * n,
        "emotion": labels,
        "split": ["train"] * 8 + ["val"] * 2 + ["test"] * 2,
        "dialog": np.repeat(np.arange(3), 4),
        "audio_shape": rng.randint(20000, 50000, n),
    })
    pkl = d / "av.pkl"
    df.to_pickle(pkl)
    return str(pkl), str(d)


def test_build_tav_dataset_mp4(av_pickle):
    pkl, _ = av_pickle
    from mme_tpu.data.records import PickleDatasetConfig, build_tav_dataset
    df = pd.read_pickle(pkl)
    cfg = PickleDatasetConfig(audio_max_samples=2000, text_max_len=16)
    ds = build_tav_dataset(df, cfg, video_frames=4, video_size=32,
                           tokenizer=None)
    vid = ds.features["video"]
    assert vid.shape == (12, 4, 32, 32, 3)
    assert np.abs(vid).sum() > 0  # decoded, not zero-padded


def test_tav_nn_mp4_e2e(av_pickle, monkeypatch):
    """Flagship CLI straight from a pickle with raw mp4 paths."""
    pkl, _ = av_pickle
    monkeypatch.setenv("MME_TINY", "1")
    from mme_tpu.cli import tav_nn
    summary = tav_nn.main([
        "--dataset", pkl, "-e", "1", "-b", "4", "-y", "3", "-l", "1e-4"])
    assert "test/acc" in summary


def test_keyframes_cli_then_tav_e2e(av_pickle, tmp_path, monkeypatch):
    """Katna-equivalent extraction feeding the keyframe ingestion path
    (VERDICT item 10): extract → MME_KEYFRAME_GLOB → tav_nn trains."""
    pkl, _ = av_pickle
    from mme_tpu.cli import keyframes
    out_root = str(tmp_path / "kfroot")
    res = keyframes.main([pkl, "--out_root", out_root, "--num_frames", "4"])
    assert res["done"] == 3 and res["failed"] == 0
    monkeypatch.setenv("MME_TINY", "1")
    monkeypatch.setenv("MME_KEYFRAME_GLOB", res["pattern"])
    from mme_tpu.cli import tav_nn
    summary = tav_nn.main([
        "--dataset", pkl, "-e", "1", "-b", "4", "-y", "3", "-l", "1e-4"])
    assert "test/acc" in summary
