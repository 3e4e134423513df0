"""Tokenizer + data-pipeline tests (self-contained fixtures, zero network)."""

import base64
import json

import numpy as np
import pytest

from lyricalignment_tpu import N_SAMPLES
from lyricalignment_tpu.data.audio_io import write_wav
from lyricalignment_tpu.data.pipeline import (
    MultitaskExampleBuilder,
    MultitaskLoader,
    PipelineConfig,
    collate,
    infinite_batches,
)
from lyricalignment_tpu.data.records import Record
from lyricalignment_tpu.text.bert_tokenizer import (
    BertWordPieceTokenizer,
    make_synthetic_vocab,
)
from lyricalignment_tpu.text.pinyin import load_pronunciation_table
from lyricalignment_tpu.text.whisper_tokenizer import LANGUAGES, WhisperTokenizer


# --------------------------------------------------------------------------
# BERT WordPiece
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def table():
    return load_pronunciation_table()


@pytest.fixture(scope="module")
def bert(table):
    # map a few known chars to token ids whose pinyin we know from the table
    vocab = make_synthetic_vocab(size=300)
    vocab["你"] = table.pinyin_reverse["ni"][0]
    vocab["好"] = table.pinyin_reverse["hao"][0]
    vocab["世"] = table.pinyin_reverse["shi"][0]
    vocab["界"] = table.pinyin_reverse["jie"][0]
    vocab["hello"] = 250
    vocab["##world"] = 251
    return BertWordPieceTokenizer(vocab=vocab)


def test_cjk_chars_tokenize_individually(bert):
    assert bert.tokenize("你好世界") == ["你", "好", "世", "界"]


def test_wordpiece_greedy_longest_match(bert):
    assert bert.tokenize("helloworld") == ["hello", "##world"]
    assert bert.tokenize("xyzzy") == ["[UNK]"]


def test_encode_with_specials_and_batch(bert):
    ids = bert.encode("你好", add_special_tokens=True)
    assert ids[0] == bert.cls_id and ids[-1] == bert.sep_id
    batch = bert.batch_encode(["你好", "你好世界"])
    assert batch.shape == (2, 6)
    assert batch[0, 4] == bert.pad_id  # short row padded


def test_vocab_file_roundtrip(tmp_path, bert):
    # write vocab.txt sorted by id and reload
    inv = {i: t for t, i in bert.vocab.items()}
    lines = [inv.get(i, f"[pad{i}]") for i in range(max(inv) + 1)]
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(lines), encoding="utf-8")
    reloaded = BertWordPieceTokenizer(vocab_path=str(p))
    assert reloaded.encode("你好") == bert.encode("你好")


# --------------------------------------------------------------------------
# Whisper tokenizer
# --------------------------------------------------------------------------

def test_whisper_special_token_layout_multilingual():
    wt = WhisperTokenizer(multilingual=True, language="zh")
    # canonical multilingual ids
    assert wt.eot == 50257
    assert wt.sot == 50258
    assert wt.special_tokens["<|en|>"] == 50259
    assert wt.special_tokens["<|zh|>"] == 50260
    assert wt.transcribe == 50359
    assert wt.no_speech == 50362
    assert wt.no_timestamps == 50363
    assert wt.timestamp_begin == 50364
    assert len(LANGUAGES) == 99
    assert wt.sot_sequence == [50258, 50260, 50359]


def test_whisper_timestamp_token_arithmetic():
    wt = WhisperTokenizer()
    # reference: timestamp_begin + onset * 100 // 2 (dataset.py:73-74)
    assert wt.timestamp_token(0.0) == wt.timestamp_begin
    assert wt.timestamp_token(1.0) == wt.timestamp_begin + 50
    assert wt.timestamp_token(29.98) == wt.timestamp_begin + 1499


def test_whisper_encode_without_bpe_raises():
    wt = WhisperTokenizer()
    with pytest.raises(RuntimeError):
        wt.encode("你好")


@pytest.fixture(scope="module")
def byte_bpe(tmp_path_factory):
    # synthetic byte-level ranks file: every byte is its own token
    p = tmp_path_factory.mktemp("bpe") / "ranks.tiktoken"
    lines = [
        base64.b64encode(bytes([i])).decode() + " " + str(i) for i in range(256)
    ]
    p.write_text("\n".join(lines))
    return str(p)


def test_whisper_encode_decode_with_bpe(byte_bpe):
    wt = WhisperTokenizer(bpe_path=byte_bpe)
    ids = wt.encode("abc")
    assert ids == [97, 98, 99]
    assert wt.decode(ids) == "abc"
    # utf-8 chinese goes through bytes
    ids = wt.encode("你")
    assert wt.decode(ids) == "你"


# --------------------------------------------------------------------------
# Pipeline
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def dataset(tmp_path_factory, bert, table, byte_bpe):
    d = tmp_path_factory.mktemp("ds")
    records = []
    rng = np.random.default_rng(0)
    for i, (text, onoff) in enumerate([
        ("你好", [[0.1, 0.5], [0.6, 1.2]]),
        ("世界", None),
        ("你好世界", [[0.0, 0.3], [0.3, 0.6], [0.7, 1.0], [1.0, 1.4]]),
        ("好你", [[0.2, 0.9], [1.0, 1.5]]),
    ]):
        wav = str(d / f"{i}.wav")
        write_wav(wav, rng.standard_normal(2 * 16000).astype(np.float32) * 0.1)
        records.append(Record(audio_path=wav, text=text, lyric_onset_offset=onoff))
    cfg = PipelineConfig(batch_size=2, max_label_len=8, max_decoder_len=32, use_ctc=True)
    wt = WhisperTokenizer(bpe_path=byte_bpe)
    builder = MultitaskExampleBuilder(bert, wt, table, cfg)
    return records, builder, cfg


def test_example_shapes_and_classes(dataset, table):
    records, builder, cfg = dataset
    ex = builder.build(records[0])
    assert ex["audio"].shape == (N_SAMPLES,)
    assert ex["ctc_labels"].shape == (8,)
    assert ex["frame_labels"].shape == (1500,)
    # 你好 -> ni hao classes
    ni = table.pinyin_to_class["ni"]
    hao = table.pinyin_to_class["hao"]
    assert list(ex["ctc_labels"][:2]) == [ni, hao]
    assert (ex["ctc_labels"][2:] == -100).all()
    # frame labels: 0.1-0.5s -> frames 5..25 hold ni
    assert ex["frame_labels"][10] == ni
    assert ex["frame_labels"][40] == hao
    assert ex["frame_labels"][200] == -100  # ctc fill
    assert ex["has_alignment"]


def test_example_without_alignment(dataset):
    records, builder, _ = dataset
    ex = builder.build(records[1])
    assert not ex["has_alignment"]
    assert (ex["frame_labels"] == -100).all()


def test_decoder_sequences_structure(dataset):
    records, builder, _ = dataset
    ex = builder.build(records[0])
    wt = builder.whisper
    di, do = ex["decoder_input"], ex["decoder_output"]
    assert di[0] == wt.sot
    assert di[1] == wt.special_tokens["<|zh|>"]
    assert di[2] == wt.transcribe
    assert di[3] == wt.no_timestamps
    # output is input shifted left, ending with eot
    text_len = len(wt.encode(records[0].text))
    assert do[3 + text_len] == wt.eot
    np.testing.assert_array_equal(do[: 3 + text_len], di[1: 4 + text_len])


def test_loader_batching_and_determinism(dataset):
    records, builder, cfg = dataset
    loader = MultitaskLoader(records, builder, shuffle=False)
    batches = list(loader)
    assert len(batches) == 2
    b0 = batches[0]
    assert b0.audio.shape == (2, N_SAMPLES)
    assert b0.has_alignment.tolist() == [True, False]

    loader2 = MultitaskLoader(records, builder, shuffle=True, seed=7)
    order1 = [b.texts for b in loader2]
    loader3 = MultitaskLoader(records, builder, shuffle=True, seed=7)
    order2 = [b.texts for b in loader3]
    assert order1 == order2  # same seed, same epoch -> same order

    it = infinite_batches(MultitaskLoader(records, builder, shuffle=True, seed=1))
    seen = [next(it).texts for _ in range(4)]
    assert len(seen) == 4
