"""Streaming alignment/transcription service (JSONL over stdin/stdout).

Minimal production-serving surface with zero extra dependencies: the model
loads once, then each input line is a JSON request and each output line a
JSON response — compose with a socket server or job queue of your choice.

Request:  {"song_path": "...", "lyric": "..."}            -> alignment
          {"song_path": "...", "task": "transcribe"}      -> transcription
Response: {"song_path": ..., "alignment": [[on, off, char], ...]}
          {"song_path": ..., "inference": "..."}
          {"song_path": ..., "error": "..."} on failure

Usage:
    python -m lyricalignment_tpu.cli.serve --model-dir result \
        --use-ctc-loss --bert-vocab vocab.txt [--whisper-bpe ranks.tiktoken]
"""

from __future__ import annotations

import argparse
import json
import sys

from lyricalignment_tpu.cli.common import add_asset_args


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model-dir", type=str, required=True)
    p.add_argument("--model-name", default="best",
                   choices=["best", "best_align", "best_trans", "last"])
    p.add_argument("--use-ctc-loss", action="store_true")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--bucket-seconds", type=float, default=5.0)
    p.add_argument("--beam-size", type=int, default=5)
    add_asset_args(p)
    return p.parse_args(argv)


def serve(aligner, args, stdin=None, stdout=None):
    stdin = stdin or sys.stdin
    stdout = stdout or sys.stdout
    for line in stdin:
        line = line.strip()
        if not line:
            continue
        req = None
        try:
            req = json.loads(line)
            path = req["song_path"]
            if req.get("task") == "transcribe":
                text = aligner.transcribe(
                    path, whisper_bpe=args.whisper_bpe, beam_size=args.beam_size)
                resp = {"song_path": path, "inference": text}
            else:
                segments = aligner.align(path, req["lyric"])
                resp = {"song_path": path, "alignment": segments}
        except Exception as e:  # keep serving on per-request failures
            resp = {"song_path": req.get("song_path") if isinstance(req, dict) else None,
                    "error": f"{type(e).__name__}: {e}"}
        stdout.write(json.dumps(resp, ensure_ascii=False) + "\n")
        stdout.flush()


def main():
    args = parse_args()
    from lyricalignment_tpu.api import LyricAligner

    aligner = LyricAligner.from_model_dir(
        args.model_dir, model_name=args.model_name,
        bert_vocab=args.bert_vocab, synthetic_vocab=args.synthetic_vocab,
        use_ctc=args.use_ctc_loss, bf16=args.bf16,
        bucket_seconds=args.bucket_seconds,
    )
    print("ready", file=sys.stderr, flush=True)
    serve(aligner, args)


if __name__ == "__main__":
    main()
