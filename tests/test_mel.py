"""Mel frontend parity tests vs a torch oracle replicating whisper's exact
log_mel_spectrogram pipeline (whisper/audio.py semantics)."""

import numpy as np
import pytest
import torch

from lyricalignment_tpu import HOP_LENGTH, N_FFT, N_MELS, N_SAMPLES
from lyricalignment_tpu.ops.mel import log_mel_spectrogram, mel_filterbank, pad_or_trim


def torch_oracle_log_mel(audio: np.ndarray, filters: np.ndarray) -> np.ndarray:
    """Reimplementation of whisper's log_mel_spectrogram in torch (oracle)."""
    x = torch.from_numpy(audio)
    window = torch.hann_window(N_FFT)
    stft = torch.stft(x, N_FFT, HOP_LENGTH, window=window, return_complex=True)
    magnitudes = stft[..., :-1].abs() ** 2
    mel_spec = torch.from_numpy(filters) @ magnitudes
    log_spec = torch.clamp(mel_spec, min=1e-10).log10()
    log_spec = torch.maximum(log_spec, log_spec.max() - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    return log_spec.numpy()


@pytest.fixture(scope="module")
def filters():
    return mel_filterbank()


def test_filterbank_properties(filters):
    assert filters.shape == (N_MELS, 1 + N_FFT // 2)
    assert (filters >= 0).all()
    # every filter has support; triangles are contiguous
    assert (filters.sum(axis=1) > 0).all()
    # Slaney normalization: in the linear region (< 1 kHz, bins < 25) the
    # summed response is flat
    total = filters.sum(axis=0)
    linear_region = total[6:23]
    assert linear_region.std() / linear_region.mean() < 0.05


def test_log_mel_matches_torch_oracle(filters, rng):
    audio = rng.standard_normal(SAMPLES := 3 * 16000).astype(np.float32) * 0.1
    expected = torch_oracle_log_mel(audio, filters)
    got = np.asarray(log_mel_spectrogram(audio))
    assert got.shape == expected.shape == (N_MELS, SAMPLES // HOP_LENGTH)
    np.testing.assert_allclose(got, expected, atol=2e-4, rtol=1e-4)


def test_log_mel_batch_global_max(filters, rng):
    # two clips with very different levels: the dynamic-range clamp must use
    # the global batch max (reference calls whisper's mel on a batch)
    a = rng.standard_normal(16000).astype(np.float32)
    b = (rng.standard_normal(16000) * 1e-4).astype(np.float32)
    batch = np.stack([a, b])
    expected = torch_oracle_log_mel(batch, filters)
    got = np.asarray(log_mel_spectrogram(batch))
    np.testing.assert_allclose(got, expected, atol=2e-4, rtol=1e-4)


def test_log_mel_sine_tone(filters):
    # a 440 Hz tone must put its energy in the right mel band
    t = np.arange(2 * 16000) / 16000
    audio = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    got = np.asarray(log_mel_spectrogram(audio))
    band_energy = got.mean(axis=1)
    peak_band = band_energy.argmax()
    # 440 Hz ≈ mel band 10-14 for this filterbank
    assert 8 <= peak_band <= 16
    expected = torch_oracle_log_mel(audio, filters)
    np.testing.assert_allclose(got, expected, atol=2e-4, rtol=1e-4)


def test_pad_or_trim():
    x = np.ones((80, 100), np.float32)
    padded = np.asarray(pad_or_trim(x, 3000))
    assert padded.shape == (80, 3000)
    assert (padded[:, 100:] == 0).all()
    trimmed = np.asarray(pad_or_trim(np.ones((80, 4000), np.float32), 3000))
    assert trimmed.shape == (80, 3000)


def test_fused_pallas_mel_matches_jnp_path(filters, rng):
    import jax.numpy as jnp
    from lyricalignment_tpu.ops.mel_pallas import fused_log_mel

    audio = rng.standard_normal((2, 3 * 16000)).astype(np.float32) * 0.1
    ref = np.asarray(log_mel_spectrogram(jnp.asarray(audio)))
    got = np.asarray(fused_log_mel(jnp.asarray(audio), interpret=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)
