"""ctypes bridge to the native (C++) audio loader.

Builds ``libwavio.so`` from ``native/wavio.cpp`` on first use (g++, cached
next to the source) and exposes the same contract as the pure-Python path
in ``data/audio_io.py``. ``data.audio_io.load_audio_file`` prefers this
implementation when the toolchain is available; set ``LA_TPU_NO_NATIVE=1``
to force the Python fallback.

The FIR prototype for the polyphase resampler is designed host-side with
scipy (matching ``scipy.signal.resample_poly``'s kaiser(5.0) default) and
handed to the C++ hot loop, which runs GIL-free.
"""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess
import sys
from math import gcd
from typing import Dict, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_SRC = os.path.join(_NATIVE_DIR, "wavio.cpp")
_LIB = os.path.join(_NATIVE_DIR, "libwavio.so")

TARGET_SR = 16_000


def _build() -> Optional[str]:
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-funroll-loops", "-shared", "-fPIC", "-o", _LIB, _SRC],
            check=True, capture_output=True,
        )
        return _LIB
    except (OSError, subprocess.CalledProcessError) as e:
        sys.stderr.write(f"native loader build failed, using Python path: {e}\n")
        return None


@functools.lru_cache(maxsize=1)
def _lib() -> Optional[ctypes.CDLL]:
    if os.environ.get("LA_TPU_NO_NATIVE"):
        return None
    path = _build()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.wav_info.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_long),
    ]
    lib.wav_info.restype = ctypes.c_int
    lib.wav_decode.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
        ctypes.c_long, ctypes.c_int,
    ]
    lib.wav_decode.restype = ctypes.c_long
    lib.resample_poly_fir.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
    ]
    lib.resample_poly_fir.restype = ctypes.c_long
    lib.resample_polyphase.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.resample_polyphase.restype = ctypes.c_long
    return lib


def available() -> bool:
    return _lib() is not None


@functools.lru_cache(maxsize=32)
def _fir_taps(up: int, down: int) -> np.ndarray:
    """scipy.resample_poly's default filter: kaiser(5.0) windowed sinc with
    cutoff at min(1/up, 1/down) of the upsampled Nyquist, scaled by up."""
    from scipy.signal import firwin

    max_rate = max(up, down)
    f_c = 1.0 / max_rate
    half_len = 10 * max_rate
    taps = firwin(2 * half_len + 1, f_c, window=("kaiser", 5.0))
    return (taps * up).astype(np.float32)


@functools.lru_cache(maxsize=32)
def _polyphase_bank(up: int, down: int):
    """Reversed contiguous polyphase decomposition of the FIR prototype:
    poly_rev[p, i] = taps[p + (L-1-i)*up], zero-padded. Returns
    (bank f32[up, L], L, half)."""
    taps = _fir_taps(up, down)
    n_taps = len(taps)
    L = -(-n_taps // up)
    padded = np.zeros(up * L, np.float32)
    padded[:n_taps] = taps
    bank = padded.reshape(L, up).T[:, ::-1]  # [up, L], reversed in i
    return np.ascontiguousarray(bank), L, n_taps // 2


def load_audio_file_native(path: str, audio_type: int = 0) -> Dict[str, np.ndarray]:
    """Native decode + resample with the ``audio_io.load_audio_file`` contract."""
    lib = _lib()
    assert lib is not None

    sr = ctypes.c_int()
    channels = ctypes.c_int()
    frames = ctypes.c_long()
    rc = lib.wav_info(path.encode(), ctypes.byref(sr),
                      ctypes.byref(channels), ctypes.byref(frames))
    if rc == -1:
        raise FileNotFoundError(path)
    if rc != 0:
        raise ValueError(f"unreadable WAV: {path}")

    n = frames.value
    pcm = np.empty(n, np.float32)
    got = lib.wav_decode(path.encode(),
                         pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                         n, audio_type)
    if got < 0:
        raise ValueError(f"decode failed ({got}) for {path} audio_type={audio_type}")
    pcm = pcm[:got]

    if sr.value != TARGET_SR:
        g = gcd(sr.value, TARGET_SR)
        up, down = TARGET_SR // g, sr.value // g
        bank, L, half = _polyphase_bank(up, down)
        out_len = -(-len(pcm) * up // down)
        out = np.empty(out_len, np.float32)
        wrote = lib.resample_polyphase(
            pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(pcm),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out_len,
            bank.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), L,
            up, down, half,
        )
        pcm = out[:wrote]

    return {"speech": pcm, "sampling_rate": TARGET_SR}
