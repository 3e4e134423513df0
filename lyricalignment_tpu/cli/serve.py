"""Streaming alignment/transcription service (JSONL over stdin/stdout).

Minimal production-serving surface with zero extra dependencies: the model
loads once, then each input line is a JSON request and each output line a
JSON response — compose with a socket server or job queue of your choice.

Request:  {"song_path": "...", "lyric": "..."}            -> alignment
          {"song_path": "...", "task": "transcribe"}      -> transcription
Response: {"song_path": ..., "alignment": [[on, off, char], ...]}
          {"song_path": ..., "inference": "..."}
          {"song_path": ..., "error": "..."} on failure
An optional request ``"id"`` is echoed verbatim on the response (success
or error) for correlation; responses otherwise come back in request order.

Continuous batching: a reader thread feeds a queue; the serve loop drains
up to ``--max-batch`` queued requests per iteration (waiting at most
``--batch-window-ms`` after the first) and runs all alignment requests of
the batch through ONE device pass (``LyricAligner.align_many`` — length-
bucketed, shared encoder/Viterbi launches). With the default window of 0
no latency is added: batches only form under backlog, which is exactly
when throughput matters. Per-request errors never take down the batch —
a failing batch falls back to per-request processing.

Usage:
    python -m lyricalignment_tpu.cli.serve --model-dir result \
        --use-ctc-loss --bert-vocab vocab.txt [--whisper-bpe ranks.tiktoken]
"""

from __future__ import annotations

import argparse
import json
import queue
import sys
import threading
import time

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
    p.add_argument("--max-new-tokens", type=int, default=224,
                   help="decode token budget per 30 s window")
    p.add_argument("--length-penalty", type=float, default=None,
                   help="Google-NMT beam ranking penalty (default: rank by "
                        "plain length-normalized logprob, whisper's default)")
    p.add_argument("--patience", type=float, default=None,
                   help="beam patience: finished-candidate set holds "
                        "round(beam_size * patience) sequences (whisper "
                        "semantics; values < 1 allowed)")
    p.add_argument("--max-batch", type=int, default=16,
                   help="max queued alignment requests fused into one "
                        "device batch (16 = the measured per-chip "
                        "throughput knee for whisper-medium: +36%% over "
                        "batch 8, flat beyond — PARITY.md batch sweep)")
    p.add_argument("--batch-window-ms", type=float, default=0.0,
                   help="after the first request of a batch, wait up to "
                        "this long for more (0 = only drain the backlog)")
    p.add_argument("--transcribe-batch", type=int, default=None,
                   help="device decode batch for fused transcription "
                        "requests (default: min(--max-batch, 8); 8 = the "
                        "measured beam-5 throughput knee on one v5e chip — "
                        "PARITY.md decode sweep)")
    add_asset_args(p)
    args = p.parse_args(argv)
    # Fail fast on a decode config every transcribe request would reject:
    # whisper's BeamSearchDecoder requires round(beam_size * patience) > 0
    # (decode/beam.py raises per-call; by then the model is already loaded
    # and the server would error forever).
    if args.patience is not None and round(args.beam_size * args.patience) < 1:
        p.error(f"--patience {args.patience} with --beam-size {args.beam_size} "
                "gives round(beam_size * patience) < 1; no finished "
                "candidates could ever be kept")
    return args


def _handle_one(aligner, args, req):
    """Process a single parsed request (also the batch-failure fallback)."""
    try:
        if not isinstance(req, dict):
            raise ValueError("request must be a JSON object")
        path = req["song_path"]
        if req.get("task") == "transcribe":
            text = aligner.transcribe(
                path, whisper_bpe=args.whisper_bpe, beam_size=args.beam_size,
                max_new_tokens=getattr(args, "max_new_tokens", 224),
                length_penalty=getattr(args, "length_penalty", None),
                patience=getattr(args, "patience", None))
            return {"song_path": path, "inference": text}
        segments = aligner.align(path, req["lyric"])
        return {"song_path": path, "alignment": segments}
    except Exception as e:  # keep serving on per-request failures
        return {"song_path": req.get("song_path") if isinstance(req, dict) else None,
                "error": f"{type(e).__name__}: {e}"}


def _reader(stdin, q):
    try:
        for line in stdin:
            q.put(line)
    finally:
        # always deliver EOF — a reader crash (e.g. UnicodeDecodeError on a
        # bad byte stream) must shut the serve loop down, not hang it
        q.put(None)


def serve(aligner, args, stdin=None, stdout=None):
    stdin = stdin or sys.stdin
    stdout = stdout or sys.stdout
    max_batch = max(1, getattr(args, "max_batch", 1))
    window_s = max(0.0, getattr(args, "batch_window_ms", 0.0)) / 1000.0

    q = queue.Queue()
    threading.Thread(target=_reader, args=(stdin, q), daemon=True).start()

    eof = False
    while not eof:
        first = q.get()
        if first is None:
            break
        pending = [first]
        deadline = time.monotonic() + window_s
        while len(pending) < max_batch:
            remaining = deadline - time.monotonic()
            try:
                nxt = q.get(timeout=remaining) if remaining > 0 else q.get_nowait()
            except queue.Empty:
                break
            if nxt is None:
                eof = True
                break
            pending.append(nxt)

        reqs = []
        for line in pending:
            line = line.strip()
            if not line:
                continue
            try:
                reqs.append(json.loads(line))
            except Exception as e:
                reqs.append(e)  # handled as a per-request error below

        responses = [None] * len(reqs)
        # fuse well-formed requests of each task into one device batch
        align_idx = [
            i for i, r in enumerate(reqs)
            if isinstance(r, dict) and r.get("task") != "transcribe"
            and "song_path" in r and "lyric" in r
        ]
        trans_idx = [
            i for i, r in enumerate(reqs)
            if isinstance(r, dict) and r.get("task") == "transcribe"
            and "song_path" in r
        ]
        if len(align_idx) > 1:
            try:
                outs = aligner.align_many(
                    [(reqs[i]["song_path"], reqs[i]["lyric"]) for i in align_idx])
                for i, seg in zip(align_idx, outs):
                    responses[i] = {"song_path": reqs[i]["song_path"],
                                    "alignment": seg}
            except Exception as e:
                # e.g. one bad audio file poisons the fused batch: fall back
                # to per-request processing (which isolates it) but leave an
                # operator-visible trace of the degraded path
                print(f"serve: batched alignment failed "
                      f"({type(e).__name__}: {e}); retrying per-request",
                      file=sys.stderr, flush=True)
        if len(trans_idx) > 1:
            try:
                texts = aligner.transcribe_many(
                    [reqs[i]["song_path"] for i in trans_idx],
                    whisper_bpe=args.whisper_bpe, beam_size=args.beam_size,
                    max_new_tokens=getattr(args, "max_new_tokens", 224),
                    length_penalty=getattr(args, "length_penalty", None),
                    patience=getattr(args, "patience", None),
                    batch_size=getattr(args, "transcribe_batch", None))
                for i, text in zip(trans_idx, texts):
                    responses[i] = {"song_path": reqs[i]["song_path"],
                                    "inference": text}
            except Exception as e:
                print(f"serve: batched transcription failed "
                      f"({type(e).__name__}: {e}); retrying per-request",
                      file=sys.stderr, flush=True)

        for i, r in enumerate(reqs):
            if responses[i] is None:
                if isinstance(r, Exception):
                    responses[i] = {"song_path": None,
                                    "error": f"{type(r).__name__}: {r}"}
                else:
                    responses[i] = _handle_one(aligner, args, r)

        # echo a client-supplied request id on every response (success or
        # error) so callers can correlate without relying on song_path
        # uniqueness or response order
        for i, r in enumerate(reqs):
            if isinstance(r, dict) and "id" in r:
                responses[i]["id"] = r["id"]

        for resp in responses:
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
        batch_size=max(1, args.max_batch),
    )
    print("ready", file=sys.stderr, flush=True)
    serve(aligner, args)


if __name__ == "__main__":
    main()
