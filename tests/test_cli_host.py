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


def test_pinyin_phrases_external_asset(tmp_path):
    """--pinyin-phrases merge semantics (VERDICT r4 #5): user entries merge
    OVER the embedded dict, adding new phrases and overriding existing
    ones; a length-mismatched entry is rejected."""
    from lyricalignment_tpu.text.heteronyms import HETERONYM_PHRASES
    from lyricalignment_tpu.text.pinyin import load_phrase_readings

    assert "银行" in HETERONYM_PHRASES  # embedded baseline
    f = tmp_path / "phrases.json"
    f.write_text(json.dumps({"行规": ["hang", "gui"],      # new phrase
                             "银行": ["yin", "HANG"]},      # override
                            ensure_ascii=False), encoding="utf-8")
    merged = load_phrase_readings(str(f))
    assert merged["行规"] == ("hang", "gui")
    assert merged["银行"] == ("yin", "HANG")
    assert merged["音乐"] == HETERONYM_PHRASES["音乐"]  # embedded kept

    table = load_pronunciation_table()
    vocab = {"行": table.pinyin_reverse["xing"][0],
             "规": table.pinyin_reverse["gui"][0]}
    base = CharPhonemizer(table, vocab)
    assert base("行规") == ["xing", "gui"]  # off-dict fallback reading
    ext = CharPhonemizer(table, vocab, phrase_readings=merged)
    assert ext("行规") == ["hang", "gui"]  # external asset closes the gap

    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"行规": ["hang"]}), encoding="utf-8")
    with pytest.raises(ValueError):
        load_phrase_readings(str(bad))

    # an empty phrase key or non-string syllables would crash (or silently
    # corrupt) CharPhonemizer later — rejected at load time
    bad.write_text(json.dumps({"": []}), encoding="utf-8")
    with pytest.raises(ValueError):
        load_phrase_readings(str(bad))
    bad.write_text(json.dumps({"银行": [1, 2]}), encoding="utf-8")
    with pytest.raises(ValueError):
        load_phrase_readings(str(bad))


def test_strict_normalize_flags_unanchored_chars(capsys):
    """The warning fires on a rare traditional char with no t2s entry and
    no table reading (VERDICT r4 #6)."""
    from lyricalignment_tpu.cli.evaluate_transcript import report_gaps
    from lyricalignment_tpu.text.normalize import normalization_gaps, to_simplified

    rare = "龘"  # 龘 — no t2s entry, absent from the tiny test vocab
    assert to_simplified(rare) == rare  # passes through unconverted

    table = load_pronunciation_table()
    vocab = {"你": table.pinyin_reverse["ni"][0],
             "好": table.pinyin_reverse["hao"][0]}
    phonemize = CharPhonemizer(table, vocab)
    gaps = normalization_gaps("你好" + rare, has_reading=phonemize.knows)
    assert gaps == {rare: 1}  # anchored chars not flagged

    found = report_gaps(["你好" + rare + rare], phonemize.knows, None)
    assert found
    err = capsys.readouterr().err
    assert rare in err and "x2" in err

    # without a real vocab (synthetic smoke mode) strict falls back to the
    # conservative rare-block-only check — fully-covered common text must
    # NOT be flagged (with the synthetic phonemizer every char would be)
    assert not report_gaps(["你好"], None, None)

    # without reading info (postprocess), main-block chars never flagged;
    # rare-block ideographs are
    assert normalization_gaps("你好" + rare) == {}
    assert normalization_gaps("㐀") == {"㐀": 1}


def test_postprocess_strict_normalize(tmp_path, monkeypatch, capsys):
    f = tmp_path / "r.json"
    f.write_text(json.dumps([{"inference": "愛㐀"}], ensure_ascii=False),
                 encoding="utf-8")
    monkeypatch.setattr(sys, "argv", ["pp", "-f", str(f), "--strict-normalize"])
    with pytest.raises(SystemExit) as e:
        pp_cli.main()
    assert e.value.code == 2
    assert "㐀" in capsys.readouterr().err
    # conversion still happened before the strict exit
    assert json.loads(f.read_text(encoding="utf-8"))[0]["inference"].startswith("爱")


def test_t2s_overrides_flag(tmp_path, monkeypatch):
    f = tmp_path / "r.json"
    f.write_text(json.dumps([{"inference": "㐀好"}], ensure_ascii=False),
                 encoding="utf-8")
    ov = tmp_path / "t2s.json"
    ov.write_text(json.dumps({"㐀": "一"}, ensure_ascii=False),
                  encoding="utf-8")
    monkeypatch.setattr(sys, "argv", ["pp", "-f", str(f),
                                      "--t2s-overrides", str(ov),
                                      "--strict-normalize"])
    pp_cli.main()  # override closes the gap: no SystemExit
    assert json.loads(f.read_text(encoding="utf-8"))[0]["inference"] == "一好"
