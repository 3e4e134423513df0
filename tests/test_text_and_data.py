"""Tests for pinyin table, normalization, records, audio IO, frame labels."""

import json
import os

import numpy as np
import pytest

from lyricalignment_tpu.data.audio_io import load_audio_file, read_wav, resample, write_wav
from lyricalignment_tpu.data.frames import rasterize_frame_labels
from lyricalignment_tpu.data.records import Record, read_data
from lyricalignment_tpu.text.normalize import normalize_for_eval, remove_english, to_simplified
from lyricalignment_tpu.text.pinyin import (
    IGNORE_ID,
    load_pronunciation_table,
    split_syllable,
)


@pytest.fixture(scope="module")
def table():
    return load_pronunciation_table()


def test_table_shape(table):
    assert table.vocab_size == 21128
    assert table.num_classes == 403  # classes 1..402 plus never-emitted 0
    assert table.pinyin_to_class["bad"] == 1
    assert table.token_to_class.min() >= 1
    assert table.token_to_class.max() == 402


def test_map_tokens_vectorized_matches_scalar(table):
    rng = np.random.default_rng(0)
    ids = rng.integers(0, table.vocab_size, size=(4, 7)).astype(np.int32)
    ids[0, 0] = IGNORE_ID
    ids[2, 3] = IGNORE_ID
    out = table.map_tokens(ids)
    for i in range(ids.shape[0]):
        for j in range(ids.shape[1]):
            if ids[i, j] == IGNORE_ID:
                assert out[i, j] == IGNORE_ID
            else:
                expected = table.pinyin_to_class[table.token_pinyin[ids[i, j]]]
                assert out[i, j] == expected


def test_remove_english():
    assert remove_english("abc中文XYZ") == "中文"


def test_to_simplified_passthrough():
    assert to_simplified("简体不变 123") == "简体不变 123"


def test_normalize_for_eval():
    assert normalize_for_eval("Wo 愛你. ") == "爱你" or normalize_for_eval("Wo 愛你. ") == "愛你"
    # 愛 must map (it is in the embedded table)
    assert normalize_for_eval("愛") == "爱"


def test_records_roundtrip(tmp_path):
    data = [
        {"song_path": "/x/a.wav", "lyric": "你好"},
        {"song_path": "/x/b.wav", "lyric": "再见", "on_offset": [[0.0, 0.5], [0.5, 1.0]]},
    ]
    p = tmp_path / "d.json"
    p.write_text(json.dumps(data, ensure_ascii=False))
    records = read_data(str(p))
    assert len(records) == 2
    assert records[0].lyric_onset_offset is None
    assert records[1].lyric_onset_offset == [[0.0, 0.5], [0.5, 1.0]]
    assert records[1].has_alignment


def test_wav_roundtrip_and_resample(tmp_path):
    sr = 44100
    t = np.arange(sr) / sr
    sig = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    path = str(tmp_path / "a.wav")
    write_wav(path, sig, sr)
    data, got_sr = read_wav(path)
    assert got_sr == sr
    assert data.shape == (1, sr)
    np.testing.assert_allclose(data[0], sig, atol=2e-4)

    out = load_audio_file(path)
    assert out["sampling_rate"] == 16000
    # 1 second of audio stays ~1 second after resampling
    assert abs(len(out["speech"]) - 16000) <= 2
    # energy is preserved approximately for a mid-band tone
    assert np.std(out["speech"]) == pytest.approx(np.std(sig), rel=0.05)


def test_wav_stereo_audio_types(tmp_path):
    sr = 16000
    left = np.full(sr, 0.25, dtype=np.float32)
    right = np.full(sr, -0.25, dtype=np.float32)
    path = str(tmp_path / "s.wav")
    write_wav(path, np.stack([left, right]), sr)

    mono = load_audio_file(path, audio_type=0)["speech"]
    np.testing.assert_allclose(mono, np.zeros(sr), atol=1e-3)

    mix = load_audio_file(path, audio_type=1)["speech"]
    np.testing.assert_allclose(mix, np.zeros(sr), atol=1e-3)

    vocal = load_audio_file(path, audio_type=2)["speech"]
    np.testing.assert_allclose(vocal, right, atol=1e-3)


def test_frame_labels_reference_semantics():
    # Oracle: the reference's sequential slice loop (dataset.py:129-145)
    def oracle(tokens, onoff, use_ctc):
        fill = -100 if use_ctc else 0
        n = int(round(onoff[-1][-1] / 0.02)) + 1
        labels = np.full(n, fill, dtype=np.int64)
        for j in range(len(onoff)):
            a = int(round(onoff[j][0] / 0.02))
            b = int(round(onoff[j][1] / 0.02)) + 1
            labels[a:b] = tokens[j]
        return labels

    rng = np.random.default_rng(1)
    for use_ctc in (False, True):
        for _ in range(10):
            n_chars = int(rng.integers(1, 8))
            bounds = np.sort(rng.uniform(0, 5, size=2 * n_chars))
            onoff = [[bounds[2 * i], bounds[2 * i + 1]] for i in range(n_chars)]
            tokens = rng.integers(100, 200, size=n_chars)
            got = rasterize_frame_labels(tokens, onoff, use_ctc=use_ctc)
            np.testing.assert_array_equal(got, oracle(tokens, onoff, use_ctc))


def test_frame_labels_fixed_length_pad_and_clip():
    tokens = np.array([7, 8])
    onoff = [[0.0, 0.1], [0.1, 0.2]]
    out = rasterize_frame_labels(tokens, onoff, use_ctc=True, total_frames=20)
    assert out.shape == (20,)
    assert (out[12:] == -100).all()
    out2 = rasterize_frame_labels(tokens, onoff, total_frames=5)
    assert out2.shape == (5,)


def test_frame_labels_empty_onoffset_raises():
    # explicit precondition (the reference crashes on offsets[-1] instead,
    # dataset.py:132)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="at least one"):
        rasterize_frame_labels(np.array([], np.int32), [])
