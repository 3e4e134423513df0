"""Metric tests: CER/PER/MAE vs hand-computed values."""

import numpy as np
import pytest

from lyricalignment_tpu.utils.metrics import cer, edit_ops, mae, per
from lyricalignment_tpu.text.pinyin import split_syllable


def test_cer_identical():
    rate, counts = cer(list("abcd"), list("abcd"))
    assert rate == 0.0
    assert counts["C"] == 4
    assert counts["W"] == 0
    assert counts["N"] == 4


def test_cer_substitution():
    rate, counts = cer(list("abxd"), list("abcd"))
    assert rate == pytest.approx(0.25)
    assert counts["S"] == 1
    assert counts["C"] == 3


def test_cer_insertion_is_hyp_extra():
    # hypothesis has one extra symbol -> 1 insertion
    rate, counts = cer(list("abxcd"), list("abcd"))
    assert rate == pytest.approx(0.25)
    assert counts["I"] == 1
    assert counts["C"] == 4


def test_cer_deletion_is_ref_missing():
    rate, counts = cer(list("abd"), list("abcd"))
    assert rate == pytest.approx(0.25)
    assert counts["D"] == 1
    assert counts["C"] == 3


def test_cer_empty_hypothesis():
    rate, counts = cer([], list("abc"))
    assert rate == pytest.approx(1.0)
    assert counts["W"] == 3


def test_edit_ops_distance_matches_dp():
    # random fuzz against a simple O(HR) reference distance
    rng = np.random.default_rng(0)
    for _ in range(25):
        h = list(rng.integers(0, 4, size=rng.integers(0, 10)))
        r = list(rng.integers(0, 4, size=rng.integers(1, 10)))
        dist, counts = edit_ops(h, r)
        # reference DP
        H, R = len(h), len(r)
        dp = np.zeros((H + 1, R + 1), dtype=int)
        dp[:, 0] = np.arange(H + 1)
        dp[0, :] = np.arange(R + 1)
        for i in range(1, H + 1):
            for j in range(1, R + 1):
                dp[i, j] = min(
                    dp[i - 1, j - 1] + (h[i - 1] != r[j - 1]),
                    dp[i - 1, j] + 1,
                    dp[i, j - 1] + 1,
                )
        assert dist == dp[H, R]


def test_split_syllable():
    assert split_syllable("zhong") == ("zh", "ong")
    assert split_syllable("an") == ("", "an")
    assert split_syllable("yi") == ("y", "i")
    assert split_syllable("wo") == ("w", "o")
    assert split_syllable("shi") == ("sh", "i")
    assert split_syllable("e") == ("", "e")
    # non-pinyin passthrough
    assert split_syllable("。") == ("。", "。")


def test_per_identical_text():
    phonemize = lambda text: {"你": "ni", "好": "hao"}.get(text, [text]) and [
        {"你": "ni", "好": "hao"}[ch] for ch in text
    ]
    rate, _ = per("你好", "你好", phonemize)
    assert rate == 0.0


def test_per_same_final_different_initial():
    table = {"你": "ni", "李": "li", "好": "hao"}
    phonemize = lambda text: [table[ch] for ch in text]
    # ni vs li share the final 'i': 1 sub out of 4 phonemes
    rate, counts = per("你好", "李好", phonemize)
    assert rate == pytest.approx(0.25)
    assert counts["S"] == 1


def test_mae():
    gt = [[[0.0, 1.0], [1.0, 2.0]]]
    pred = [[[0.1, 1.0], [1.0, 2.3]]]
    # errors: 0.1, 0, 0, 0.3 over 4 endpoints
    assert mae(gt, pred) == pytest.approx(0.1)
