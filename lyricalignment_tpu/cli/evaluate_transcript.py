"""Transcript evaluation CLI: CER + PER with op counts.

Re-design of the reference's ``evaluate_transcript.py`` (`:35-109`): read a
result JSON, normalise both sides (strip English/spaces/periods,
traditional -> simplified), and print CER and PER with
substitution/insertion/deletion/correct counts.

The PER phonemizer derives char -> pinyin from the shipped pronunciation
table + a BERT vocab (pypinyin is not required); pass --bert-vocab for
full coverage, or rely on passthrough for unknown characters.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import List

from lyricalignment_tpu.cli.common import add_asset_args
from lyricalignment_tpu.text.bert_tokenizer import BertWordPieceTokenizer, make_synthetic_vocab
from lyricalignment_tpu.text.normalize import normalize_for_eval
from lyricalignment_tpu.text.pinyin import CharPhonemizer, load_pronunciation_table
from lyricalignment_tpu.utils.metrics import cer, per


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-f", "--result-file", type=str, required=True)
    p.add_argument("--ref-text-key", type=str, default="lyric")
    p.add_argument("--pred-text-key", type=str, default="inference")
    add_asset_args(p)
    return p.parse_args()


def compute_cer(reference: List[str], prediction: List[str],
                phonemize=None, is_per: bool = False):
    metric_name = "PER" if is_per else "CER"
    weighted = 0.0
    op_count = {"substitution": 0, "insertion": 0, "deletion": 0, "correct": 0}

    for ref, pred in zip(reference, prediction):
        pred = normalize_for_eval(pred)
        ref = normalize_for_eval(ref)
        if is_per:
            rate, nb = per(pred, ref, phonemize)
        else:
            try:
                rate, nb = cer(list(pred), list(ref))
            except ZeroDivisionError:
                rate, nb = 1.0, {"S": 0, "I": len(pred), "D": 0, "C": 0}
        weighted += rate
        op_count["substitution"] += nb["S"]
        op_count["insertion"] += nb["I"]
        op_count["deletion"] += nb["D"]
        op_count["correct"] += nb["C"]

    print("=" * 30)
    print(f"{metric_name}:", weighted / len(reference))
    print("Wrong Operations:")
    for key, value in op_count.items():
        print(f"{key}: {value}")
    print("=" * 30)
    return weighted / len(reference), op_count


def main():
    args = parse_args()
    assert os.path.exists(args.result_file)
    with open(args.result_file, "r", encoding="utf-8") as f:
        results = json.load(f)

    refs = [r[args.ref_text_key] for r in results]
    preds = [r[args.pred_text_key] for r in results]

    table = load_pronunciation_table()
    if args.bert_vocab:
        bert = BertWordPieceTokenizer(vocab_path=args.bert_vocab)
    else:
        bert = BertWordPieceTokenizer(vocab=make_synthetic_vocab(size=21128))
    phonemize = CharPhonemizer(table, bert.char_to_id_map())

    compute_cer(refs, preds)
    compute_cer(refs, preds, phonemize=phonemize, is_per=True)


if __name__ == "__main__":
    main()
