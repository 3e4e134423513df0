"""Fast host-only CLI smoke tests (evaluate_transcript, postprocess)."""

import json
import sys

import pytest

from lyricalignment_tpu.cli.evaluate_transcript import compute_cer
from lyricalignment_tpu.cli import postprocess as pp_cli
from lyricalignment_tpu.text.pinyin import CharPhonemizer, load_pronunciation_table


def test_compute_cer_end_to_end(capsys):
    refs = ["你好世界", "再見"]
    preds = ["你好地界", "再見"]  # one substitution; trad 見 -> simp 见 both sides
    rate, ops = compute_cer(refs, preds)
    assert rate == pytest.approx((1 / 4 + 0) / 2)
    assert ops["substitution"] == 1
    assert ops["correct"] == 5
    out = capsys.readouterr().out
    assert "CER:" in out


def test_compute_per_with_phonemizer():
    table = load_pronunciation_table()
    # char->token ids with known pinyin
    vocab = {"你": table.pinyin_reverse["ni"][0], "李": table.pinyin_reverse["li"][0],
             "好": table.pinyin_reverse["hao"][0]}
    phonemize = CharPhonemizer(table, vocab)
    rate, ops = compute_cer(["你好"], ["李好"], phonemize=phonemize, is_per=True)
    # ni vs li: initial differs, final shared -> 1 sub of 4 phonemes
    assert rate == pytest.approx(0.25)
    assert ops["substitution"] == 1


def test_postprocess_cli_rewrites_in_place(tmp_path, monkeypatch):
    f = tmp_path / "r.json"
    f.write_text(json.dumps([{"inference": "Hello 愛你 world"},
                             {"inference": "第二 行."}], ensure_ascii=False),
                 encoding="utf-8")
    monkeypatch.setattr(sys, "argv", ["pp", "-f", str(f)])
    pp_cli.main()
    data = json.loads(f.read_text(encoding="utf-8"))
    assert data[0]["inference"] == "爱你"
    assert data[1]["inference"] == "第二行."  # periods kept (reference keeps '.')


def test_evaluate_empty_prediction_counts_deletions():
    rate, ops = compute_cer(["你好"], [""])
    assert rate == pytest.approx(1.0)
    assert ops["deletion"] == 2
