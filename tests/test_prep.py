"""Prep-script tests: SNR mixing semantics, path rewriting, table rebuild,
postprocess."""

import json
import math
import os
import random

import numpy as np
import pytest

from lyricalignment_tpu.cli.postprocess import postprocess_entry
from lyricalignment_tpu.prep.get_pronunce_table import build_table
from lyricalignment_tpu.prep.mix_with_musdb import mix_pair, peak_normalize, pick_segment
from lyricalignment_tpu.prep.replace_path import replace_paths


def test_mix_pair_snr_power_ratio(rng):
    vocal = rng.standard_normal(44100).astype(np.float32)
    accomp = rng.standard_normal(44100).astype(np.float32) * 0.3
    for snr in (0.0, -5.0, -10.0):
        mixed = mix_pair(vocal, accomp, snr)
        assert mixed.shape == vocal.shape
        assert np.abs(mixed).max() <= 1.01
        # reconstruct the scaled parts to check the power ratio
        y = peak_normalize(vocal) / 2.0
        inst = peak_normalize(accomp) / 2.0
        ratio = 10.0 ** (snr / 10.0)
        y_pow, i_pow = np.mean(y ** 2), np.mean(inst ** 2)
        if i_pow * ratio > y_pow:
            inst = inst * math.sqrt(y_pow / (i_pow * ratio))
        else:
            y = y * math.sqrt((i_pow * ratio) / y_pow)
        got_ratio = np.mean(y ** 2) / np.mean(inst ** 2)
        assert got_ratio == pytest.approx(ratio, rel=1e-4)
        np.testing.assert_allclose(mixed, y + inst, atol=1e-6)


def test_pick_segment_rejects_silence_and_short_clips(rng):
    silent = np.zeros(50000, np.float32)
    short = rng.standard_normal(100).astype(np.float32)
    good = rng.standard_normal(60000).astype(np.float32)
    seg = pick_segment([silent, short, good], 44100, random.Random(0))
    assert len(seg) == 44100
    assert np.mean(seg ** 2) >= 1e-4


def test_replace_paths(tmp_path):
    data = [{"song_id": "a.wav", "lyric": "x"}, {"song_id": "b.wav", "lyric": "y"}]
    out = replace_paths(data, str(tmp_path))
    assert out[0]["song_path"] == str(tmp_path / "a.wav")
    assert os.path.isabs(out[1]["song_path"])


def test_build_table_matches_reference_format():
    tokens = ["[PAD]", "你", "好", "好", "abc", "##x"]
    char_py = {"你": "ni", "好": "hao"}

    def phonemize(tok):
        if tok in char_py:
            return [char_py[tok]]
        return ["bad", "bad"]

    token_pinyin, reverse, lookup = build_table(tokens, phonemize)
    assert token_pinyin == ["bad", "ni", "hao", "hao", "bad", "bad"]
    assert reverse == {"ni": [1], "hao": [2, 3]}
    # first-seen order, ids from 1 ('bad' first like the reference asset)
    assert lookup == {"bad": 1, "ni": 2, "hao": 3}


def test_shipped_asset_reproducible_by_build_table():
    # rebuilding from the shipped asset's own token_pinyin must reproduce
    # the asset's reverse index and lookup exactly
    from lyricalignment_tpu.text.pinyin import DEFAULT_TABLE_PATH

    with open(DEFAULT_TABLE_PATH, encoding="utf-8") as f:
        token_pinyin, reverse, lookup = json.load(f)

    def phonemize(tok_index_str):
        py = token_pinyin[int(tok_index_str)]
        return [py] if py != "bad" else ["bad", "bad"]

    tp2, rev2, look2 = build_table([str(i) for i in range(len(token_pinyin))], phonemize)
    assert tp2 == token_pinyin
    assert look2 == lookup
    assert {k: v for k, v in rev2.items()} == {k: list(v) for k, v in reverse.items()}


def test_postprocess_entry():
    assert postprocess_entry("Hello 愛 world 你好 ") == "爱你好"
