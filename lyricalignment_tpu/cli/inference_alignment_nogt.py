"""No-ground-truth alignment CLI: print per-song [[onset, offset, char], ...].

Re-design of the reference's ``inference_alignment_nogt.py`` (`:130-205`):
iterates records directly (no ground truth required) and prints the aligned
segments per character.
"""

from __future__ import annotations

import argparse
import json
import os

from lyricalignment_tpu.cli.common import add_asset_args, build_tokenizers, load_model_dir, set_seed
from lyricalignment_tpu.cli.inference_alignment import align_records
from lyricalignment_tpu.data.records import read_data
from lyricalignment_tpu.text.pinyin import load_pronunciation_table


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-f", "--test-data", type=str, required=True)
    p.add_argument("--model-dir", type=str, required=True)
    p.add_argument("--model-name", default="best",
                   choices=["best", "best_align", "best_trans", "last"])
    p.add_argument("--is-mixture", type=int, choices=[0, 1, 2], default=0)
    p.add_argument("--use-ctc-loss", action="store_true")
    p.add_argument("--batch-size", type=int, default=1,
                   help="records aligned per device pass (16 = the measured "
                        "medium-model throughput knee on one chip)")
    p.add_argument("--seed", type=int, default=114514)
    p.add_argument("--bucket-seconds", type=float, default=5.0)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--fast-gelu", action="store_true",
                   help="tanh-approximate encoder GELU (error below "
                        "bf16 rounding); ~15%% faster encoder on TPU")
    p.add_argument("--int8-encoder", action="store_true",
                   help="W8A8 dynamic int8 encoder matmuls (v5e int8 MXU; "
                        "~1%% relative quantization error, inference only)")
    p.add_argument("--max-label-len", type=int, default=128)
    p.add_argument("-o", "--output", type=str, default=None,
                   help="optional JSON output path")
    add_asset_args(p)
    return p.parse_args()


def main():
    args = parse_args()
    set_seed(args.seed)
    assert os.path.exists(args.model_dir)
    assert os.path.exists(args.test_data)

    mcfg, params, _ = load_model_dir(args.model_dir, args.model_name, use_bf16=args.bf16, fast_gelu=args.fast_gelu, int8_encoder=args.int8_encoder)
    bert, _ = build_tokenizers(args)
    table = load_pronunciation_table()
    records = read_data(args.test_data)

    results = []
    for record, segments in align_records(records, params, mcfg, table, bert, args):
        rows = [[on, off, ch] for (on, off), ch in zip(segments, record.text)]
        print(os.path.basename(record.audio_path))
        print(rows)
        results.append({"song_path": record.audio_path, "alignment": rows})

    if args.output:
        os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
        with open(args.output, "w", encoding="utf-8") as f:
            json.dump(results, f, indent=2, ensure_ascii=False)


if __name__ == "__main__":
    main()
