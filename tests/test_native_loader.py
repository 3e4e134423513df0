"""Native C++ loader vs the pure-Python path (decode + resample parity)."""

import numpy as np
import pytest
from scipy.signal import resample_poly as scipy_resample_poly

from lyricalignment_tpu.data import audio_io
from lyricalignment_tpu.data.audio_io import write_wav
from lyricalignment_tpu.data import native_loader


pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason="native toolchain unavailable"
)


def python_load(path, audio_type=0):
    data, sr = audio_io.read_wav(path)
    data = audio_io.resample(data, sr)
    if audio_type == 0:
        speech = data.mean(axis=0) if data.shape[0] > 1 else data[0]
    elif audio_type == 1:
        speech = (data[0] + data[1]) / 2.0
    else:
        speech = data[1]
    return speech.astype(np.float32)


def test_decode_16bit_mono_no_resample(tmp_path, rng):
    sig = (rng.standard_normal(16000) * 0.4).astype(np.float32)
    p = str(tmp_path / "a.wav")
    write_wav(p, sig, 16000)
    out = native_loader.load_audio_file_native(p)["speech"]
    np.testing.assert_allclose(out, python_load(p), atol=1e-6)


def test_decode_stereo_audio_types(tmp_path, rng):
    left = (rng.standard_normal(8000) * 0.3).astype(np.float32)
    right = (rng.standard_normal(8000) * 0.3).astype(np.float32)
    p = str(tmp_path / "s.wav")
    write_wav(p, np.stack([left, right]), 16000)
    for audio_type in (0, 1, 2):
        out = native_loader.load_audio_file_native(p, audio_type)["speech"]
        np.testing.assert_allclose(out, python_load(p, audio_type), atol=1e-6,
                                   err_msg=f"audio_type={audio_type}")


def test_resample_44k_matches_scipy(tmp_path, rng):
    sig = (rng.standard_normal(44100) * 0.4).astype(np.float32)
    p = str(tmp_path / "r.wav")
    write_wav(p, sig, 44100)
    out = native_loader.load_audio_file_native(p)["speech"]
    # same file through the python path (scipy.resample_poly)
    data, sr = audio_io.read_wav(p)
    expected = scipy_resample_poly(data[0], 160, 441).astype(np.float32)
    assert out.shape == expected.shape
    np.testing.assert_allclose(out, expected, atol=2e-5)


def test_missing_file_raises():
    with pytest.raises(FileNotFoundError):
        native_loader.load_audio_file_native("/nope/missing.wav")


def test_dispatch_through_load_audio_file(tmp_path, rng):
    sig = (rng.standard_normal(22050) * 0.2).astype(np.float32)
    p = str(tmp_path / "d.wav")
    write_wav(p, sig, 22050)
    out = audio_io.load_audio_file(p)["speech"]
    assert out.dtype == np.float32
    assert abs(len(out) - 16000) <= 2
