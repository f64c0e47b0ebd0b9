"""ctypes wrapper for the native WAV decode+resample library (native/wavio.cpp)
with a pure-Python fallback (stdlib ``wave`` + ops/resample.py).

The C path releases the GIL for the whole decode+resample, so
``load_waveforms_parallel`` gets real multicore decode from a plain thread
pool — the TPU-native replacement for the reference's 2-8 DataLoader worker
processes (``tav_nn.py:28``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import wave as _wave
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional, Sequence, Tuple

import numpy as np

from mme_tpu.ops.resample import resample_numpy

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libwavio.so")
_lib = None


def _load_lib(build_if_missing: bool = True):
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and build_if_missing:
        try:
            subprocess.run(["sh", os.path.join(_NATIVE_DIR, "build.sh")],
                           check=True, capture_output=True)
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.wav_info.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
                             ctypes.POINTER(ctypes.c_int),
                             ctypes.POINTER(ctypes.c_longlong)]
    lib.wav_info.restype = ctypes.c_int
    lib.wav_read_resampled.argtypes = [
        ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_longlong,
        ctypes.POINTER(ctypes.c_longlong)]
    lib.wav_read_resampled.restype = ctypes.c_int
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load_lib() is not None


def _python_read(path: str) -> Tuple[np.ndarray, int]:
    with _wave.open(path, "rb") as w:
        sr = w.getframerate()
        ch = w.getnchannels()
        bits = w.getsampwidth() * 8
        raw = w.readframes(w.getnframes())
    if bits == 16:
        x = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif bits == 32:
        x = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    elif bits == 8:
        x = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128) / 128.0
    else:
        raise ValueError(f"unsupported sample width {bits}")
    return x.reshape(-1, ch).mean(axis=1), sr


def load_waveform(path: str, target_sr: int = 16000,
                  max_samples: Optional[int] = None,
                  use_native: bool = True) -> np.ndarray:
    """Decode + channel-mean + resample one file (reference
    ``speech_file_to_array_fn``, models/tav.py:165-169)."""
    lib = _load_lib() if use_native else None
    if lib is not None:
        cap = max_samples if max_samples else 16000 * 600
        out = np.empty(cap, np.float32)
        out_len = ctypes.c_longlong()
        rc = lib.wav_read_resampled(
            path.encode(), target_sr,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            cap, ctypes.byref(out_len))
        if rc == 0:
            return out[:min(out_len.value, cap)].copy()
    x, sr = _python_read(path)
    y = resample_numpy(x, sr, target_sr)
    if max_samples:
        y = y[:max_samples]
    return y


def load_waveforms_parallel(paths: Sequence[str], target_sr: int = 16000,
                            max_samples: Optional[int] = None,
                            workers: int = 8) -> List[np.ndarray]:
    with ThreadPoolExecutor(max_workers=workers) as ex:
        return list(ex.map(
            lambda p: load_waveform(p, target_sr, max_samples), paths))
