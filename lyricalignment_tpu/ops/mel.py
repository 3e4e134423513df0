"""Log-mel spectrogram frontend, Whisper-parity, TPU-first.

Numerically matches the reference pipeline (openai-whisper
``log_mel_spectrogram``, used at `module/align_model.py:84` and
`dataset.py:33-34`): reflect-centered 400-pt STFT with periodic Hann, hop
160 @ 16 kHz, power spectrum, 80-band Slaney-normalized mel filterbank,
log10 clamped at 1e-10, dynamic-range compression to 8 dB below the *batch*
max, then (x + 4) / 4.

TPU design: the DFT is expressed as two real matmuls (frames @ cos / sin
bases) instead of an FFT — a 400x201 contraction rides the MXU and fuses
with the windowing and the mel projection under XLA, which beats the
generic FFT lowering for Whisper's tiny n_fft. Everything is static-shape.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np

from lyricalignment_tpu import HOP_LENGTH, N_FFT, N_MELS, SAMPLE_RATE

# ---------------------------------------------------------------------------
# Mel filterbank (Slaney scale + Slaney area normalization, librosa-default,
# identical to the filters Whisper ships in mel_filters.npz).
# ---------------------------------------------------------------------------

_F_SP = 200.0 / 3.0
_MIN_LOG_HZ = 1000.0
_MIN_LOG_MEL = _MIN_LOG_HZ / _F_SP
_LOGSTEP = np.log(6.4) / 27.0


def _hz_to_mel(hz: np.ndarray) -> np.ndarray:
    hz = np.asarray(hz, dtype=np.float64)
    mel = hz / _F_SP
    with np.errstate(divide="ignore"):
        log_mel = _MIN_LOG_MEL + np.log(np.maximum(hz, 1e-12) / _MIN_LOG_HZ) / _LOGSTEP
    return np.where(hz >= _MIN_LOG_HZ, log_mel, mel)


def _mel_to_hz(mel: np.ndarray) -> np.ndarray:
    mel = np.asarray(mel, dtype=np.float64)
    hz = mel * _F_SP
    return np.where(mel >= _MIN_LOG_MEL, _MIN_LOG_HZ * np.exp(_LOGSTEP * (mel - _MIN_LOG_MEL)), hz)


@functools.lru_cache(maxsize=None)
def mel_filterbank(
    sr: int = SAMPLE_RATE, n_fft: int = N_FFT, n_mels: int = N_MELS
) -> np.ndarray:
    """Slaney mel filterbank, float32 [n_mels, 1 + n_fft // 2]."""
    n_bins = 1 + n_fft // 2
    fft_freqs = np.linspace(0.0, sr / 2.0, n_bins)
    mel_pts = _mel_to_hz(np.linspace(_hz_to_mel(0.0), _hz_to_mel(sr / 2.0), n_mels + 2))

    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    # Slaney normalization: each triangle integrates to ~2 / bandwidth
    enorm = 2.0 / (mel_pts[2:] - mel_pts[:-2])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _dft_bases(n_fft: int = N_FFT) -> tuple:
    """Real-DFT cos/sin bases with the periodic Hann window folded in.

    Returns (cos_basis, sin_basis), each float32 [n_fft, 1 + n_fft // 2],
    so that for a frame x: rfft(x * hann) = x @ cos - 1j * (x @ sin).
    """
    n = np.arange(n_fft)
    window = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / n_fft))  # periodic Hann
    k = np.arange(1 + n_fft // 2)
    angle = 2.0 * np.pi * np.outer(n, k) / n_fft
    cos_b = (np.cos(angle) * window[:, None]).astype(np.float32)
    sin_b = (np.sin(angle) * window[:, None]).astype(np.float32)
    return cos_b, sin_b


def _frame(audio: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """Centered framing with reflect padding: [..., T] -> [..., frames, n_fft].

    Matches torch.stft(center=True, pad_mode='reflect'); the final frame
    (the one Whisper drops) is never materialised.

    Zero-gather construction: with n_fft = 400 = 2*hop + hop//2, reshape the
    padded audio into hop-sized rows R[t] = samples [t*hop, (t+1)*hop); then
    frame t = concat(R[t], R[t+1], R[t+2][:hop//2]) — three static slices
    instead of a T'x400 gather (the gather materialises 2.5x the audio and
    defeats XLA fusion).
    """
    pad = n_fft // 2
    padded = jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(pad, pad)], mode="reflect")
    num_frames = audio.shape[-1] // hop  # after dropping Whisper's last frame

    assert n_fft == 2 * hop + hop // 2, "framing trick needs n_fft = 2.5*hop"
    # pad to a whole number of hop rows covering frame num_frames-1's window
    need = (num_frames + 2) * hop
    if padded.shape[-1] < need:
        padded = jnp.pad(padded, [(0, 0)] * (padded.ndim - 1) + (
            [(0, need - padded.shape[-1])]))
    rows = padded[..., :need].reshape(*padded.shape[:-1], num_frames + 2, hop)
    return jnp.concatenate(
        [rows[..., 0:num_frames, :],
         rows[..., 1:num_frames + 1, :],
         rows[..., 2:num_frames + 2, : hop // 2]],
        axis=-1,
    )


@functools.partial(jax.jit, static_argnames=("n_mels", "per_sample_max"))
def log_mel_spectrogram(
    audio: jnp.ndarray,
    n_mels: int = N_MELS,
    per_sample_max: bool = False,
) -> jnp.ndarray:
    """audio f32[..., T] (16 kHz) -> log-mel f32[..., n_mels, T // 160].

    ``per_sample_max=False`` reproduces the reference's batch-global dynamic
    range clamp (whisper computes ``log_spec.max()`` over the whole tensor,
    including the batch dim when called on a batch as the reference does at
    `module/align_model.py:84`). Set True for per-sample normalization.
    """
    squeeze = audio.ndim == 1
    if squeeze:
        audio = audio[None, :]

    frames = _frame(audio, N_FFT, HOP_LENGTH)  # [B, T', n_fft]
    cos_b, sin_b = _dft_bases(N_FFT)
    # f32 MXU passes: Whisper's 8-decade dynamic-range clamp happens *after*
    # the log, so bf16 matmul error here would leak straight into MAE parity.
    hi = jax.lax.Precision.HIGHEST
    re = jnp.einsum("btn,nk->btk", frames, jnp.asarray(cos_b), precision=hi)
    im = jnp.einsum("btn,nk->btk", frames, jnp.asarray(sin_b), precision=hi)
    power = re * re + im * im  # [B, T', n_bins]

    mel = jnp.asarray(mel_filterbank(SAMPLE_RATE, N_FFT, n_mels))
    mel_spec = jnp.einsum("btk,mk->bmt", power, mel, precision=hi)  # [B, n_mels, T']

    log_spec = jnp.log10(jnp.maximum(mel_spec, 1e-10))
    if per_sample_max:
        peak = jnp.max(log_spec, axis=(-2, -1), keepdims=True)
    else:
        peak = jnp.max(log_spec)
    log_spec = jnp.maximum(log_spec, peak - 8.0)
    log_spec = (log_spec + 4.0) / 4.0

    return log_spec[0] if squeeze else log_spec


def pad_or_trim(
    array: jnp.ndarray, length: int, axis: int = -1
) -> jnp.ndarray:
    """Pad with zeros or trim ``array`` to ``length`` along ``axis``
    (whisper ``pad_or_trim`` parity, used at `module/align_model.py:89,109`
    and `dataset.py:34`)."""
    cur = array.shape[axis]
    if cur > length:
        index = [slice(None)] * array.ndim
        index[axis] = slice(0, length)
        return array[tuple(index)]
    if cur < length:
        pad_widths = [(0, 0)] * array.ndim
        pad_widths[axis] = (0, length - cur)
        return jnp.pad(array, pad_widths)
    return array


def log_mel(audio: jnp.ndarray, per_sample_max: bool = False,
            n_mels: int = N_MELS) -> jnp.ndarray:
    """Backend-dispatching log-mel: the fused Pallas kernel on TPU, the
    einsum path elsewhere (numerically interchangeable to f32 rounding).
    The Pallas kernel is built for the 80-band layout; 128-band models
    (the large-v3 family) take the einsum path on every backend."""
    if not per_sample_max and n_mels == 80 and jax.default_backend() == "tpu":
        from lyricalignment_tpu.ops.mel_pallas import fused_log_mel

        return fused_log_mel(audio)
    return log_mel_spectrogram(audio, n_mels=n_mels,
                               per_sample_max=per_sample_max)
