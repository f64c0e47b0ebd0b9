"""Sinc-interpolation audio resampling (torchaudio-compatible algorithm).

Replaces the reference's per-sample CPU ``torchaudio.transforms.Resample``
call inside collate (``models/tav.py:165-169``,
``SingleModels/models/audio.py:20-38``). The kernel construction follows the
standard windowed-sinc polyphase method (the public algorithm behind
torchaudio's ``sinc_interp_hann``): reduce by gcd, build ``new_freq`` phase
filters of width ``2·lowpass_filter_width·orig/band``, apply as one strided
XLA convolution — so resampling can run batched on device, or on host via
numpy with the identical kernel (shared with the C++ loader in native/).
"""

from __future__ import annotations

import math
from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp


@lru_cache(maxsize=32)
def sinc_resample_kernel(orig_freq: int, new_freq: int,
                         lowpass_filter_width: int = 6,
                         rolloff: float = 0.99) -> tuple:
    """Returns (kernel [new_freq_r, 1, width], width, orig_r, new_r)."""
    gcd = math.gcd(orig_freq, new_freq)
    orig_r, new_r = orig_freq // gcd, new_freq // gcd
    base_freq = min(orig_r, new_r) * rolloff
    width = math.ceil(lowpass_filter_width * orig_r / base_freq)
    idx = np.arange(-width, width + orig_r, dtype=np.float64)[None, :] / orig_r
    t = np.arange(0, -new_r, -1, dtype=np.float64)[:, None] / new_r + idx
    t = t * base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)
    window = np.cos(t * np.pi / lowpass_filter_width / 2) ** 2
    t = t * np.pi
    scale = base_freq / orig_r
    kernel = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t))
    kernel = kernel * window * scale
    return kernel.astype(np.float32), width, orig_r, new_r


def resample_waveform(wave: jax.Array, orig_freq: int, new_freq: int,
                      lowpass_filter_width: int = 6,
                      rolloff: float = 0.99) -> jax.Array:
    """Resample [B, T] (or [T]) waveforms. Jittable for fixed lengths."""
    squeeze = wave.ndim == 1
    if squeeze:
        wave = wave[None]
    kernel, width, orig_r, new_r = sinc_resample_kernel(
        orig_freq, new_freq, lowpass_filter_width, rolloff)
    if orig_r == new_r:
        return wave[0] if squeeze else wave
    B, T = wave.shape
    x = jnp.pad(wave, ((0, 0), (width, width + orig_r)))[:, :, None]
    # conv: out[b, t, phase] for t stepped by orig_r
    k = jnp.asarray(kernel).transpose(1, 0)[:, None, :]  # [K, 1, new_r]
    y = jax.lax.conv_general_dilated(
        x, k, window_strides=(orig_r,), padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"))
    y = y.reshape(B, -1)
    target_len = int(math.ceil(new_r * T / orig_r))
    y = y[:, :target_len]
    return y[0] if squeeze else y


def resample_numpy(wave: np.ndarray, orig_freq: int, new_freq: int,
                   lowpass_filter_width: int = 6,
                   rolloff: float = 0.99) -> np.ndarray:
    """Host-side reference path with the identical kernel (used by the data
    pipeline for ragged inputs and by tests against the C++ loader)."""
    kernel, width, orig_r, new_r = sinc_resample_kernel(
        orig_freq, new_freq, lowpass_filter_width, rolloff)
    if orig_r == new_r:
        return wave.astype(np.float32)
    wave = np.asarray(wave, np.float32)
    T = wave.shape[-1]
    x = np.pad(wave, (width, width + orig_r))
    num_windows = (len(x) - kernel.shape[1]) // orig_r + 1
    target_len = int(math.ceil(new_r * T / orig_r))
    out = np.zeros(num_windows * new_r, np.float32)
    for phase in range(new_r):
        strided = np.lib.stride_tricks.sliding_window_view(
            x, kernel.shape[1])[::orig_r]
        out[phase::new_r] = strided @ kernel[phase]
    return out[:target_len]
