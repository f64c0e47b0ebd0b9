"""Resampler behavior tests: tone preservation, jax/numpy agreement."""

import numpy as np

import jax.numpy as jnp

from mme_tpu.ops.resample import resample_numpy, resample_waveform


def _tone(freq, sr, seconds=0.5):
    t = np.arange(int(sr * seconds)) / sr
    return np.sin(2 * np.pi * freq * t).astype(np.float32)


def test_downsample_preserves_tone():
    sr_in, sr_out, f = 44100, 16000, 440.0
    x = _tone(f, sr_in)
    y = resample_numpy(x, sr_in, sr_out)
    assert abs(len(y) - int(len(x) * sr_out / sr_in)) <= 1
    # dominant FFT bin ≈ 440 Hz
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    peak_hz = np.argmax(spec) * sr_out / len(y)
    assert abs(peak_hz - f) < 5, peak_hz
    # amplitude roughly preserved (interior, away from edges)
    assert 0.9 < np.abs(y[200:-200]).max() < 1.1


def test_upsample_preserves_tone():
    x = _tone(300.0, 8000)
    y = resample_numpy(x, 8000, 16000)
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    peak_hz = np.argmax(spec) * 16000 / len(y)
    assert abs(peak_hz - 300.0) < 5


def test_jax_matches_numpy():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 4410).astype(np.float32)
    y_np = np.stack([resample_numpy(r, 44100, 16000) for r in x])
    y_jx = np.asarray(resample_waveform(jnp.asarray(x), 44100, 16000))
    assert y_jx.shape == y_np.shape
    np.testing.assert_allclose(y_jx, y_np, atol=1e-4)


def test_identity_when_rates_equal():
    x = _tone(100, 16000, 0.1)
    y = resample_numpy(x, 16000, 16000)
    np.testing.assert_allclose(x, y)
