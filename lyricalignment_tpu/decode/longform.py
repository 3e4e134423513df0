"""Sequential long-form transcription: whisper's seek loop, TPU-shaped.

The reference transcribes every song with ``model.transcribe(...,
beam_size=5)`` (`inference_transcript.py:88-91`): audio of any length is
walked 30 s window by 30 s window, each window decoded with timestamp
rules, each next window conditioned on the previous text through a
``<|startofprev|>`` prompt, and the seek offset advanced to the last
complete timestamp pair. This module is an original implementation of that
orchestration around the jitted decode loops:

- the host drives only the seek loop (inherently sequential);
- each window is ONE on-device decode: the conditioned prompt is primed in
  a single batched forward (``prime_decode_cache``) into a static
  ``P_MAX``-slot buffer (no shape churn across windows, so every window
  after the first reuses the compiled executable), then the
  ``lax.while_loop`` beam/greedy/sample loop runs with timestamp rules
  (``decode.timestamps``) applied on device;
- whisper's quality gates (temperature fallback on compression ratio /
  avg-logprob, no-speech skip) run per window on host, exactly as
  ``decode.transcribe`` does for the 30 s path.

Deviations from whisper (documented, both strictly safer):
- generation is capped at ``n_text_ctx - P_MAX`` new tokens (221 at the
  standard 448 context) instead of 224, so a full-length conditioning
  prompt can never overflow the positional-embedding table;
- a window whose parsed seek advance is <= 0 (possible with a degenerate
  zero-duration timestamp pair) advances by the full window instead of
  hanging.
"""

from __future__ import annotations

import functools
import zlib
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lyricalignment_tpu import HOP_LENGTH, N_FRAMES, N_SAMPLES
from lyricalignment_tpu.decode.beam import (
    beam_loop,
    greedy_loop,
    make_processor,
    sample_loop,
)
from lyricalignment_tpu.decode.transcribe import (
    COMPRESSION_RATIO_THRESHOLD,
    LOGPROB_THRESHOLD,
    NO_SPEECH_THRESHOLD,
    TEMPERATURES,
    compression_ratio,
)
from lyricalignment_tpu.decode.timestamps import parse_segments
from lyricalignment_tpu.models.whisper import (
    WhisperConfig,
    encode_audio,
    init_decode_cache,
    prime_decode_cache,
)
from lyricalignment_tpu.ops.mel import log_mel_spectrogram


@functools.partial(jax.jit, static_argnames=("cfg",))
def _encode(params, cfg: WhisperConfig, mel: jnp.ndarray) -> jnp.ndarray:
    return encode_audio(params, cfg, mel)


@functools.partial(jax.jit, static_argnames=(
    "cfg", "beam_size", "max_new_tokens", "eot", "no_speech",
    "suppress_ids", "begin_suppress_ids", "ts_begin", "length_penalty",
    "patience"))
def _beam_window(params, cfg, xa, prompt, length, sot_index,
                 beam_size, max_new_tokens, eot, no_speech,
                 suppress_ids, begin_suppress_ids, ts_begin,
                 length_penalty=None, patience=None):
    """One window: prime conditioned prompt + beam search w/ timestamp rules.

    Returns (tokens [1, max_new], score [1], no_speech_prob [1])."""
    k = beam_size
    prompt_k = jnp.repeat(prompt, k, axis=0)
    cache = init_decode_cache(params, cfg, xa, prompt.shape[1] + max_new_tokens,
                              beam_size=k)
    logits, aux, cache = prime_decode_cache(
        params, cfg, prompt_k, cache, length, aux_index=sot_index)
    ns_prob = jax.nn.softmax(aux[:1], axis=-1)[:, no_speech]
    process = make_processor(cfg, eot, suppress_ids, begin_suppress_ids,
                             timestamp_rules=True, ts_begin=ts_begin)
    tokens, score = beam_loop(params, cfg, logits, cache, process, k,
                              max_new_tokens, eot, length_penalty, patience)
    return tokens, score, ns_prob


@functools.partial(jax.jit, static_argnames=(
    "cfg", "max_new_tokens", "eot", "no_speech",
    "suppress_ids", "begin_suppress_ids", "ts_begin"))
def _greedy_window(params, cfg, xa, prompt, length, sot_index,
                   max_new_tokens, eot, no_speech,
                   suppress_ids, begin_suppress_ids, ts_begin):
    cache = init_decode_cache(params, cfg, xa, prompt.shape[1] + max_new_tokens)
    logits, aux, cache = prime_decode_cache(
        params, cfg, prompt, cache, length, aux_index=sot_index)
    ns_prob = jax.nn.softmax(aux, axis=-1)[:, no_speech]
    process = make_processor(cfg, eot, suppress_ids, begin_suppress_ids,
                             timestamp_rules=True, ts_begin=ts_begin)
    tokens, sum_lp = greedy_loop(params, cfg, logits, cache, process,
                                 max_new_tokens, eot)
    return tokens, sum_lp, ns_prob


@functools.partial(jax.jit, static_argnames=(
    "cfg", "max_new_tokens", "eot", "no_speech", "temperature",
    "suppress_ids", "begin_suppress_ids", "ts_begin"))
def _sample_window(params, cfg, xa, prompt, length, sot_index, rng,
                   temperature, max_new_tokens, eot, no_speech,
                   suppress_ids, begin_suppress_ids, ts_begin):
    cache = init_decode_cache(params, cfg, xa, prompt.shape[1] + max_new_tokens)
    logits, aux, cache = prime_decode_cache(
        params, cfg, prompt, cache, length, aux_index=sot_index)
    ns_prob = jax.nn.softmax(aux, axis=-1)[:, no_speech]
    process = make_processor(cfg, eot, suppress_ids, begin_suppress_ids,
                             timestamp_rules=True, ts_begin=ts_begin)
    tokens, sum_lp = sample_loop(params, cfg, logits, cache, process, rng,
                                 temperature, max_new_tokens, eot)
    return tokens, sum_lp, ns_prob


def _render(tokenizer, toks: Sequence[int]) -> str:
    text_toks = [int(t) for t in toks if int(t) < tokenizer.eot]
    if tokenizer.has_bpe:
        return tokenizer.decode(text_toks)
    return " ".join(map(str, text_toks))


def transcribe_longform(
    params: Dict,
    cfg: WhisperConfig,
    audio: np.ndarray,
    tokenizer,
    *,
    beam_size: int = 5,
    temperatures: Tuple[float, ...] = TEMPERATURES,
    condition_on_previous_text: bool = True,
    suppress_ids: tuple = (),
    begin_suppress_ids: tuple = (),
    length_penalty: Optional[float] = None,
    patience: Optional[float] = None,
    max_new_tokens: Optional[int] = None,
    compression_ratio_threshold: float = COMPRESSION_RATIO_THRESHOLD,
    logprob_threshold: float = LOGPROB_THRESHOLD,
    no_speech_threshold: float = NO_SPEECH_THRESHOLD,
    seed: int = 0,
    verbose: bool = False,
) -> Dict:
    """Transcribe audio of arbitrary length with whisper's sequential seek.

    Returns {"text", "segments": [{start, end, text, tokens, temperature,
    avg_logprob, no_speech_prob, compression_ratio}], "language"}.
    """
    eot = tokenizer.eot
    ts_begin = tokenizer.timestamp_begin
    no_speech = tokenizer.no_speech
    sot_seq = list(tokenizer.sot_sequence)  # timestamp mode: no <|notimestamps|>

    # static prompt buffer: <|startofprev|> + up to n_ctx//2-1 prev + sot_seq
    max_prev = max(cfg.n_text_ctx // 2 - 1, 0)
    p_max = 1 + max_prev + len(sot_seq) if condition_on_previous_text else len(sot_seq)
    ctx_cap = min(cfg.n_text_ctx // 2, cfg.n_text_ctx - p_max)
    # an explicit max_new_tokens is clamped too: prompt + generation must
    # never index past the positional-embedding table
    max_new_tokens = ctx_cap if max_new_tokens is None else min(max_new_tokens, ctx_cap)
    if max_new_tokens < 1:
        raise ValueError(
            f"decoder context {cfg.n_text_ctx} too small for conditioned "
            f"prompts ({p_max} slots)")

    audio = np.asarray(audio, np.float32).reshape(-1)
    content_frames = len(audio) // HOP_LENGTH
    # bucket the padded audio to whole 30 s windows: one mel compile shape
    # per bucket instead of per audio length
    padded_len = ((len(audio) + N_SAMPLES) + N_SAMPLES - 1) // N_SAMPLES * N_SAMPLES
    padded = np.zeros((padded_len,), np.float32)
    padded[: len(audio)] = audio
    mel = np.asarray(log_mel_spectrogram(jnp.asarray(padded)))  # [80, T']

    seek = 0
    all_tokens: List[int] = []
    prompt_reset_since = 0
    segments: List[Dict] = []

    while seek < content_frames:
        segment_size = min(N_FRAMES, content_frames - seek)
        window = mel[:, seek: seek + N_FRAMES]
        if window.shape[1] < N_FRAMES:
            window = np.pad(window, ((0, 0), (0, N_FRAMES - window.shape[1])))
        xa = _encode(params, cfg, jnp.asarray(window[None]))

        prev = all_tokens[prompt_reset_since:]
        if condition_on_previous_text and prev:
            ptoks = [tokenizer.sot_prev] + prev[-max_prev:] + sot_seq
        else:
            ptoks = list(sot_seq)
        buf = np.full((1, p_max), eot, np.int32)
        buf[0, : len(ptoks)] = ptoks
        prompt = jnp.asarray(buf)
        length = jnp.asarray(len(ptoks), jnp.int32)
        sot_index = jnp.asarray(len(ptoks) - len(sot_seq), jnp.int32)

        ns_prob = None
        result = None
        for temperature in temperatures:
            if temperature == 0.0 and beam_size > 1:
                tokens, score, ns = _beam_window(
                    params, cfg, xa, prompt, length, sot_index,
                    beam_size, max_new_tokens, eot, no_speech,
                    suppress_ids, begin_suppress_ids, ts_begin,
                    length_penalty, patience)
                score = float(score[0])
            elif temperature == 0.0:
                tokens, sum_lp, ns = _greedy_window(
                    params, cfg, xa, prompt, length, sot_index,
                    max_new_tokens, eot, no_speech,
                    suppress_ids, begin_suppress_ids, ts_begin)
                n_gen = max(int((np.asarray(tokens)[0] != eot).sum()) + 1, 1)
                score = float(sum_lp[0]) / n_gen
            else:
                rng = jax.random.PRNGKey(seed + int(temperature * 10) + seek)
                tokens, sum_lp, ns = _sample_window(
                    params, cfg, xa, prompt, length, sot_index, rng,
                    temperature, max_new_tokens, eot, no_speech,
                    suppress_ids, begin_suppress_ids, ts_begin)
                n_gen = max(int((np.asarray(tokens)[0] != eot).sum()) + 1, 1)
                score = float(sum_lp[0]) / n_gen
            if ns_prob is None:
                ns_prob = float(np.asarray(ns)[0])

            toks = [int(t) for t in np.asarray(tokens)[0] if int(t) != eot]
            text = _render(tokenizer, toks)
            cr = compression_ratio(text)
            result = {
                "tokens": toks, "avg_logprob": score,
                "compression_ratio": cr, "temperature": temperature,
            }
            if (cr <= compression_ratio_threshold
                    and score >= logprob_threshold):
                break
            # whisper: a confidently-silent window does not retry — the
            # no-speech gate below will skip it
            if ns_prob is not None and ns_prob > no_speech_threshold:
                break

        # whisper's no-speech gate: skip silent windows unless the decode
        # was confident anyway
        should_skip = ns_prob is not None and ns_prob > no_speech_threshold
        if result["avg_logprob"] > logprob_threshold:
            should_skip = False
        if should_skip:
            seek += segment_size
            continue

        segs, advance = parse_segments(
            result["tokens"], seek, segment_size, ts_begin=ts_begin)
        if advance <= 0:
            advance = segment_size
        for s in segs:
            s["text"] = _render(tokenizer, s["tokens"])
            s["temperature"] = result["temperature"]
            s["avg_logprob"] = result["avg_logprob"]
            s["no_speech_prob"] = ns_prob
            s["compression_ratio"] = result["compression_ratio"]
        segments.extend(segs)
        all_tokens.extend(t for s in segs for t in s["tokens"] if t < eot)

        if not condition_on_previous_text or result["temperature"] > 0.5:
            prompt_reset_since = len(all_tokens)

        if verbose:
            for s in segs:
                print(f"[{s['start']:7.2f} -> {s['end']:7.2f}] {s['text']}")
        seek += advance

    return {
        "text": "".join(s["text"] for s in segments),
        "segments": segments,
        "language": tokenizer.language,
    }
