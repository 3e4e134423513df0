"""Transcription CLI: batched KV-cached beam search -> result JSON.

Re-design of the reference's ``inference_transcript.py`` (`:72-190`):
loads a fine-tuned AlignModel's whisper (or a pretrained checkpoint with
``--use-pretrained``), transcribes each record with beam search
(default beam 5) and writes ``[{song_id, song_path, lyric?, inference}]``.
Refuses to overwrite an existing output file (reference `:153-157`).

TPU re-design: records that fit one 30 s window are transcribed in
fixed-size batches through one jitted beam-search while_loop (the
reference decodes one song at a time, crossing host<->device every token).
Longer audio goes through whisper's sequential seek decode
(``decode.longform``): timestamp-rule decoding, condition-on-previous-text
prompts, seek to the last complete timestamp pair — matching
``model.transcribe``'s long-form behavior. ``--fast-windows`` switches
long audio to independent batched 30 s windows instead (faster, no
cross-window conditioning).
"""

from __future__ import annotations

import argparse
import os
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from lyricalignment_tpu import N_FRAMES, N_SAMPLES
from lyricalignment_tpu.cli.common import add_asset_args, load_model_dir, set_seed
from lyricalignment_tpu.data.audio_io import load_audio_file
from lyricalignment_tpu.data.records import read_data
from lyricalignment_tpu.decode.beam import beam_search, greedy_decode
from lyricalignment_tpu.models.whisper import encode_audio
from lyricalignment_tpu.ops.mel import log_mel_spectrogram, pad_or_trim


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-f", "--test-data", type=str, required=True)
    p.add_argument("--model-dir", type=str, required=True)
    p.add_argument("--use-pretrained", action="store_true")
    p.add_argument("--use-groundtruth", action="store_true")
    p.add_argument("--beam_size", type=int, default=5)
    p.add_argument("--is-mixture", type=int, choices=[0, 1, 2], default=0)
    p.add_argument("-o", "--output", type=str, default="output/result.json")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--max-new-tokens", type=int, default=224)
    p.add_argument("--temperature-fallback", action="store_true",
                   help="whisper-style quality gates: retry degenerate "
                        "segments with sampling at rising temperatures, "
                        "silence high-no-speech segments")
    p.add_argument("--fast-windows", action="store_true",
                   help="decode >30 s audio as independent batched windows "
                        "instead of whisper's sequential seek loop")
    p.add_argument("--length-penalty", type=float, default=None,
                   help="beam ranking length penalty (Google NMT formula); "
                        "default None = average logprob, whisper's default")
    p.add_argument("--decode-group", type=int, default=1,
                   help="decode steps per while_loop iteration (amortizes "
                        "the loop's fixed per-iteration cost; token "
                        "selection is unchanged — see decode.beam)")
    p.add_argument("--patience", type=float, default=None,
                   help="beam search patience (whisper DecodingOptions): "
                        "keep decoding until round(beam_size * patience) "
                        "finished candidates exist; default None = 1.0")
    p.add_argument("--no-condition-on-previous-text", action="store_true",
                   help="long-form: do not prompt each window with the "
                        "previous window's text")
    p.add_argument("--language", type=str, default="zh")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--int8-cross-kv", action="store_true",
                   help="int8-quantize the decode cache's cross-attention "
                        "K/V (halves the dominant per-step HBM stream; "
                        "~1%% attention-output quantization error — "
                        "measure per deployment, PARITY.md)")
    p.add_argument("--fast-gelu", action="store_true",
                   help="tanh-approximate encoder GELU (error below "
                        "bf16 rounding); ~15%% faster encoder on TPU")
    p.add_argument("--seed", type=int, default=114514)
    p.add_argument("--mesh-data", type=int, default=0,
                   help="shard the batched (<= 30 s) transcription path "
                        "over N chips; batch-size must be divisible by N")
    p.add_argument("--mesh-model", type=int, default=1,
                   help="tensor-shard the whisper backbone over N chips")
    add_asset_args(p)
    return p.parse_args()


def transcribe_records(records, params, wcfg, whisper_tok, args):
    """Transcription dispatcher. Audio fitting one 30 s window is decoded
    in fixed-size batches; longer audio goes through whisper's sequential
    seek loop (``decode.longform``) unless ``--fast-windows`` asks for
    independent batched windows."""
    from lyricalignment_tpu.text.whisper_tokenizer import non_speech_token_ids

    prompt_ids = list(whisper_tok.sot_sequence) + [whisper_tok.no_timestamps]
    suppress_ids = tuple(non_speech_token_ids(whisper_tok))
    begin_suppress_ids = (
        tuple(whisper_tok.encode(" ")) + (whisper_tok.eot,)
        if whisper_tok.has_bpe else ()
    )

    # optional multi-chip batched transcription: params TP-sharded /
    # replicated on a mesh, window batches sharded over the data axis;
    # GSPMD propagates shardings through encode + the decode while_loop
    mesh = None
    mesh_data = getattr(args, "mesh_data", 0)
    mesh_model = getattr(args, "mesh_model", 1)
    if (mesh_data or mesh_model > 1) and wcfg.onepass_encoder:
        # multi-chip runs keep the GSPMD-validated flash path; the pad-once
        # pallas kernel is single-device (see WhisperConfig.onepass_encoder)
        import dataclasses as _dc

        wcfg = _dc.replace(wcfg, onepass_encoder=False)
    if mesh_data or mesh_model > 1:
        from lyricalignment_tpu.parallel.mesh import (
            batch_sharding,
            make_mesh,
            shard_align_params,
        )

        n_dev = (mesh_data or (len(jax.devices()) // mesh_model)) * mesh_model
        mesh = make_mesh(data=mesh_data or -1, model=mesh_model,
                         devices=jax.devices()[:n_dev])
        if args.batch_size % mesh.shape["data"]:
            raise SystemExit(
                f"--batch-size {args.batch_size} not divisible by the data "
                f"axis ({mesh.shape['data']})")
        params = shard_align_params({"whisper": params, "align_head": {}},
                                    mesh, tp=mesh_model > 1)["whisper"]
        data_sharding = batch_sharding(mesh)

    @jax.jit
    def encode(params, audio):
        mel = pad_or_trim(log_mel_spectrogram(audio, n_mels=wcfg.n_mels),
                          N_FRAMES)
        return encode_audio(params, wcfg, mel)

    # expand records into (record_idx, window) work items; long audio is
    # routed to the sequential long-form decoder unless --fast-windows
    work = []
    longform_texts: dict = {}
    longform_items: list = []  # (record_idx, audio) for the batched seek loop
    for ri, r in enumerate(records):
        a = load_audio_file(r.audio_path, args.is_mixture)["speech"]
        if len(a) > N_SAMPLES and not args.fast_windows:
            longform_items.append((ri, a))
            continue
        n_windows = max(1, -(-len(a) // N_SAMPLES))
        for w in range(n_windows):
            seg = a[w * N_SAMPLES: (w + 1) * N_SAMPLES]
            win = np.zeros((N_SAMPLES,), np.float32)
            win[: len(seg)] = seg
            work.append((ri, w, win))

    if longform_items:
        longform_kw = dict(
            max_new_tokens=args.max_new_tokens,  # clamped to the ctx cap
            beam_size=args.beam_size,
            temperatures=((0.0, 0.2, 0.4, 0.6, 0.8, 1.0)
                          if args.temperature_fallback else (0.0,)),
            condition_on_previous_text=not args.no_condition_on_previous_text,
            suppress_ids=suppress_ids,
            begin_suppress_ids=begin_suppress_ids,
            length_penalty=args.length_penalty,
            patience=getattr(args, "patience", None),
            seed=args.seed,
            decode_group=getattr(args, "decode_group", 1),
        )
        if len(longform_items) > 1:
            # many long songs: advance their seek loops in lockstep so every
            # window round is ONE batched decode (continuous batching over
            # the song queue) instead of len(items) batch-1 decodes
            from lyricalignment_tpu.decode.longform import (
                transcribe_longform_batched,
            )

            outs = transcribe_longform_batched(
                params, wcfg, [a for _, a in longform_items], whisper_tok,
                batch_size=min(args.batch_size, len(longform_items)),
                **longform_kw)
            for (ri, _), out in zip(longform_items, outs):
                longform_texts[ri] = out["text"]
        else:
            from lyricalignment_tpu.decode.longform import transcribe_longform

            ri, a = longform_items[0]
            out = transcribe_longform(params, wcfg, a, whisper_tok,
                                      **longform_kw)
            longform_texts[ri] = out["text"]

    texts: dict = {}
    bs = args.batch_size
    for i in range(0, len(work), bs):
        chunk = work[i: i + bs]
        audio = np.stack([w[2] for w in chunk])
        if mesh is not None and audio.shape[0] < bs:
            # keep shards equal-sized; pad rows are dropped by the zips below
            audio = np.concatenate(
                [audio, np.zeros((bs - audio.shape[0], audio.shape[1]),
                                 np.float32)])
        audio_dev = jnp.asarray(audio)
        if mesh is not None:
            audio_dev = jax.device_put(audio_dev, data_sharding)
        xa = encode(params, audio_dev)
        prompt = jnp.asarray(np.tile(prompt_ids, (audio.shape[0], 1)).astype(np.int32))
        if args.temperature_fallback:
            from lyricalignment_tpu.decode.transcribe import decode_with_fallback

            entries = decode_with_fallback(
                params, wcfg, xa, prompt, whisper_tok,
                beam_size=args.beam_size, max_new_tokens=args.max_new_tokens,
                suppress_ids=suppress_ids,
                begin_suppress_ids=begin_suppress_ids,
                group=getattr(args, "decode_group", 1),
            )
            for (ri, w, _), entry in zip(chunk, entries):
                texts.setdefault(ri, {})[w] = entry["text"]
            continue
        if args.beam_size > 1:
            tokens, _ = beam_search(
                params, wcfg, xa, prompt, beam_size=args.beam_size,
                max_new_tokens=args.max_new_tokens, eot=whisper_tok.eot,
                suppress_ids=suppress_ids,
                begin_suppress_ids=begin_suppress_ids,
                length_penalty=args.length_penalty,
                patience=getattr(args, "patience", None),
                group=getattr(args, "decode_group", 1),
            )
        else:
            tokens = greedy_decode(
                params, wcfg, xa, prompt,
                max_new_tokens=args.max_new_tokens, eot=whisper_tok.eot,
                suppress_ids=suppress_ids,
                begin_suppress_ids=begin_suppress_ids,
            )
        tokens = np.asarray(tokens)
        for (ri, w, _), row_tokens in zip(chunk, tokens):
            row = [int(t) for t in row_tokens if int(t) != whisper_tok.eot]
            text = whisper_tok.decode(row) if whisper_tok.has_bpe else json.dumps(row)
            texts.setdefault(ri, {})[w] = text

    results = []
    for ri, r in enumerate(records):
        if ri in longform_texts:
            text = longform_texts[ri]
        else:
            windows = texts.get(ri, {})
            text = "".join(windows[w] for w in sorted(windows))
        entry = {"song_id": Path(r.audio_path).stem, "song_path": r.audio_path}
        if args.use_groundtruth:
            entry["lyric"] = r.text
        entry["inference"] = text
        results.append(entry)
        print(entry["song_id"], "->", text[:60])
    return results


def main():
    args = parse_args()
    set_seed(args.seed)
    if os.path.exists(args.output):
        print("File Exists, Pass")
        return

    from lyricalignment_tpu.text.whisper_tokenizer import WhisperTokenizer

    whisper_tok = WhisperTokenizer(
        multilingual=True, language=args.language, task="transcribe",
        bpe_path=args.whisper_bpe,
    )

    if os.path.exists(args.model_dir) and not args.use_pretrained:
        mcfg, align_params, _ = load_model_dir(
            args.model_dir, "best", use_bf16=args.bf16,
            fast_gelu=args.fast_gelu, int8_cross_kv=args.int8_cross_kv)
        wcfg, params = mcfg.whisper, align_params["whisper"]
    elif args.whisper_checkpoint:
        from lyricalignment_tpu.models.convert import load_openai_checkpoint

        print("Use pretrained model")
        wcfg, params = load_openai_checkpoint(args.whisper_checkpoint)
        import dataclasses

        if args.bf16:
            wcfg = dataclasses.replace(wcfg, compute_dtype=jnp.bfloat16)
        if args.int8_cross_kv:
            wcfg = dataclasses.replace(wcfg, int8_cross_kv=True)
    else:
        raise SystemExit("--model-dir not found; pass --whisper-checkpoint for "
                         "a pretrained run (no network downloads available)")

    # v3-family backbones (n_vocab 51866) carry 100 languages: rebuild the
    # tokenizer with the matching special-token layout
    from lyricalignment_tpu.text.whisper_tokenizer import num_languages_for_vocab

    nl = num_languages_for_vocab(wcfg.n_vocab)
    if nl != whisper_tok.num_languages:
        whisper_tok = WhisperTokenizer(
            multilingual=True, language=args.language, task="transcribe",
            bpe_path=args.whisper_bpe, num_languages=nl,
        )

    records = read_data(args.test_data)
    results = transcribe_records(records, params, wcfg, whisper_tok, args)

    Path(args.output).parent.mkdir(parents=True, exist_ok=True)
    with open(args.output, "w", encoding="utf-8") as f:
        json.dump(results, f, indent=2, ensure_ascii=False)


if __name__ == "__main__":
    main()
