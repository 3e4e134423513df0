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


# ---------------------------------------------------------------------------
# malformed / hostile input: the native parser must reject (ValueError) or
# truncate gracefully — never crash the process (SIGFPE/segfault), since the
# serving path (cli/serve.py) loads caller-supplied paths in-process.

import struct

from tests.conftest import forge_wav_bytes as _wav_bytes


def _write(tmp_path, name, blob):
    p = tmp_path / name
    p.write_bytes(blob)
    return str(p)


@pytest.mark.parametrize("kw", [
    dict(bits=4),           # bits/8 == 0: used to SIGFPE in the frame count
    dict(bits=0),
    dict(bits=12),
    dict(channels=0),
    dict(channels=60000),   # absurd channel count -> giant malloc otherwise
    dict(sr=0),
    dict(sr=100_000_000),   # absurd rate -> unbounded FIR design otherwise
])
def test_malformed_header_raises_not_crashes(tmp_path, kw):
    p = _write(tmp_path, "bad.wav", _wav_bytes(**kw))
    with pytest.raises(ValueError):
        native_loader.load_audio_file_native(p)


def test_garbage_and_empty_files_raise(tmp_path):
    for name, blob in [("garbage.wav", b"not a riff file at all" * 10),
                       ("empty.wav", b""),
                       ("riff_only.wav", b"RIFF\x04\x00\x00\x00WAVE")]:
        with pytest.raises(ValueError):
            native_loader.load_audio_file_native(_write(tmp_path, name, blob))


def test_truncated_data_chunk_clamps_to_real_bytes(tmp_path):
    # header declares 1000 frames but only 100 are present: the loader must
    # report/decode the real 100, not trust the forged length.
    real = struct.pack("<100h", *range(100))
    p = _write(tmp_path, "trunc.wav",
               _wav_bytes(data=real, declared_data_len=2000))
    out = native_loader.load_audio_file_native(p)["speech"]
    assert out.shape == (100,)
    np.testing.assert_allclose(out, np.arange(100, dtype=np.float32) / 32768.0,
                               atol=1e-7)


def test_empty_data_chunk_yields_empty_audio(tmp_path):
    p = _write(tmp_path, "zero.wav", _wav_bytes(data=b""))
    out = native_loader.load_audio_file_native(p)["speech"]
    assert out.shape == (0,)


def test_header_mutation_fuzz_never_crashes(tmp_path, rng):
    """Seeded byte-flip fuzz over a valid WAV: every mutation must either
    load or raise — never kill the process. (A 30k-iteration run of this
    harness validated the hardened parser; this keeps a seeded slice of it
    in CI.)"""
    data = struct.pack("<400h", *rng.integers(-30000, 30000, 400))
    base = bytearray(_wav_bytes(channels=2, sr=22050, data=data))
    p = tmp_path / "fuzz.wav"
    for _ in range(1500):
        blob = bytearray(base)
        for _ in range(int(rng.integers(1, 9))):
            blob[int(rng.integers(0, len(blob)))] = int(rng.integers(0, 256))
        if rng.random() < 0.2:
            blob = blob[: int(rng.integers(0, len(blob)))]
        p.write_bytes(blob)
        try:
            native_loader.load_audio_file_native(str(p), int(rng.integers(0, 3)))
        except (ValueError, FileNotFoundError):
            pass


def test_dispatch_through_load_audio_file(tmp_path, rng):
    sig = (rng.standard_normal(22050) * 0.2).astype(np.float32)
    p = str(tmp_path / "d.wav")
    write_wav(p, sig, 22050)
    out = audio_io.load_audio_file(p)["speech"]
    assert out.dtype == np.float32
    assert abs(len(out) - 16000) <= 2
