"""Native WAV loader: decode parity with the Python path, resample parity
with ops/resample.py, parallel loading."""

import os
import struct
import wave

import numpy as np
import pytest

from mme_tpu.data import wavio
from mme_tpu.ops.resample import resample_numpy


def _write_wav(path, data, sr, channels=1):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sr)
        ints = np.clip(data * 32767, -32768, 32767).astype(np.int16)
        w.writeframes(ints.tobytes())


@pytest.fixture(scope="module")
def wav_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("wavs")
    rng = np.random.RandomState(0)
    t = np.arange(44100) / 44100.0
    mono = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    _write_wav(d / "mono.wav", mono, 44100)
    stereo = np.stack([mono, 0.5 * mono], axis=1).reshape(-1)
    _write_wav(d / "stereo.wav", stereo, 44100, channels=2)
    short = rng.randn(8000).astype(np.float32) * 0.1
    _write_wav(d / "short16k.wav", short, 16000)
    return d


def test_native_builds():
    assert wavio.native_available(), "libwavio.so failed to build"


def test_native_matches_python_decode(wav_dir):
    for name in ["mono.wav", "stereo.wav"]:
        p = str(wav_dir / name)
        y_native = wavio.load_waveform(p, 16000, use_native=True)
        x, sr = wavio._python_read(p)
        y_py = resample_numpy(x, sr, 16000)
        assert abs(len(y_native) - len(y_py)) <= 1
        n = min(len(y_native), len(y_py))
        np.testing.assert_allclose(y_native[:n], y_py[:n], atol=2e-4,
                                   err_msg=name)


def test_no_resample_passthrough(wav_dir):
    p = str(wav_dir / "short16k.wav")
    y = wavio.load_waveform(p, 16000)
    x, _ = wavio._python_read(p)
    np.testing.assert_allclose(y, x, atol=1e-4)


def test_parallel_load(wav_dir):
    paths = [str(wav_dir / "mono.wav")] * 6 + [str(wav_dir / "stereo.wav")] * 6
    out = wavio.load_waveforms_parallel(paths, 16000, workers=4)
    assert len(out) == 12
    np.testing.assert_allclose(out[0], out[5], atol=0)


def test_max_samples_cap(wav_dir):
    y = wavio.load_waveform(str(wav_dir / "mono.wav"), 16000,
                            max_samples=1000)
    assert len(y) == 1000
