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
    "patience", "group"))
def _beam_window(params, cfg, xa, prompt, length, sot_index,
                 beam_size, max_new_tokens, eot, no_speech,
                 suppress_ids, begin_suppress_ids, ts_begin,
                 length_penalty=None, patience=None, group=1):
    """One window: prime conditioned prompt + beam search w/ timestamp rules.

    ``prompt`` is [B, P] (one row per sample — the split cache stores each
    sample's prompt once, shared by its beams); ``length``/``sot_index``
    are scalars or i32[B] vectors (per-row conditioned prompts — the
    lockstep batched long-form path). Returns
    (tokens [B, max_new], score [B], no_speech_prob [B])."""
    k = beam_size
    cache = init_decode_cache(params, cfg, xa, prompt.shape[1],
                              max_new_tokens, beam_size=k)
    logits, aux, cache = prime_decode_cache(
        params, cfg, prompt, cache, length, aux_index=sot_index)
    ns_prob = jax.nn.softmax(aux, axis=-1)[:, no_speech]
    process = make_processor(cfg, eot, suppress_ids, begin_suppress_ids,
                             timestamp_rules=True, ts_begin=ts_begin)
    tokens, score = beam_loop(params, cfg, jnp.repeat(logits, k, axis=0),
                              cache, process, k,
                              max_new_tokens, eot, length_penalty, patience,
                              group=group)
    return tokens, score, ns_prob


@functools.partial(jax.jit, static_argnames=(
    "cfg", "max_new_tokens", "eot", "no_speech",
    "suppress_ids", "begin_suppress_ids", "ts_begin"))
def _greedy_window(params, cfg, xa, prompt, length, sot_index,
                   max_new_tokens, eot, no_speech,
                   suppress_ids, begin_suppress_ids, ts_begin):
    cache = init_decode_cache(params, cfg, xa, prompt.shape[1], max_new_tokens)
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
    cache = init_decode_cache(params, cfg, xa, prompt.shape[1], max_new_tokens)
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


# ---------------------------------------------------------------------------
# Per-window bookkeeping shared by the single-song and lockstep-batched
# loops (ADVICE r03: the two copies must stay semantically identical, so the
# gate evaluation, prompt construction, and seek/segment updates live here
# once and both loops call them).
# ---------------------------------------------------------------------------


def _context_budget(cfg, sot_seq, condition_on_previous_text,
                    max_new_tokens) -> Tuple[int, int, int]:
    """(max_prev, p_max, max_new_tokens): static prompt buffer size and the
    clamped generation budget — prompt + generation never indexes past the
    positional-embedding table."""
    max_prev = max(cfg.n_text_ctx // 2 - 1, 0)
    p_max = (1 + max_prev + len(sot_seq) if condition_on_previous_text
             else len(sot_seq))
    ctx_cap = min(cfg.n_text_ctx // 2, cfg.n_text_ctx - p_max)
    max_new_tokens = (ctx_cap if max_new_tokens is None
                      else min(max_new_tokens, ctx_cap))
    if max_new_tokens < 1:
        raise ValueError(
            f"decoder context {cfg.n_text_ctx} too small for conditioned "
            f"prompts ({p_max} slots)")
    return max_prev, p_max, max_new_tokens


def _new_song_state(ri: int, mel, frames: int) -> Dict:
    return {"ri": ri, "mel": mel, "frames": frames, "seek": 0,
            "tokens": [], "reset_since": 0, "segments": []}


def _conditioned_prompt(tokenizer, sot_seq, st: Dict,
                        condition_on_previous_text: bool,
                        max_prev: int) -> List[int]:
    """<|startofprev|> + tail of the un-reset history + sot sequence."""
    prev = st["tokens"][st["reset_since"]:]
    if condition_on_previous_text and prev:
        return [tokenizer.sot_prev] + prev[-max_prev:] + sot_seq
    return list(sot_seq)


def _candidate(tokenizer, tok_row, score: float, temperature: float,
               eot: int) -> Dict:
    """One decoded window as a quality-gateable candidate."""
    toks = [int(t) for t in tok_row if int(t) != eot]
    return {
        "tokens": toks,
        "avg_logprob": score,
        "compression_ratio": compression_ratio(_render(tokenizer, toks)),
        "temperature": temperature,
    }


def _settles(result: Dict, ns_prob: Optional[float],
             compression_ratio_threshold: float, logprob_threshold: float,
             no_speech_threshold: float) -> bool:
    """whisper's temperature-fallback stop rule: accept when both quality
    gates pass, or when the window is confidently silent (the no-speech
    gate will skip it — no retry)."""
    if (result["compression_ratio"] <= compression_ratio_threshold
            and result["avg_logprob"] >= logprob_threshold):
        return True
    return ns_prob is not None and ns_prob > no_speech_threshold


def _apply_window_result(st: Dict, result: Dict, ns_prob: Optional[float],
                         segment_size: int, tokenizer, ts_begin: int,
                         eot: int, logprob_threshold: float,
                         no_speech_threshold: float,
                         condition_on_previous_text: bool,
                         verbose: bool, tag: str = "") -> None:
    """whisper's post-decode bookkeeping for one window: no-speech skip,
    timestamp parsing, segment annotation, history/prompt-reset update,
    seek advance. Mutates ``st``."""
    should_skip = ns_prob is not None and ns_prob > no_speech_threshold
    if result["avg_logprob"] > logprob_threshold:
        should_skip = False  # confident decode overrides the silence gate
    if should_skip:
        st["seek"] += segment_size
        return
    segs, advance = parse_segments(
        result["tokens"], st["seek"], segment_size, ts_begin=ts_begin)
    if advance <= 0:
        advance = segment_size
    for s in segs:
        s["text"] = _render(tokenizer, s["tokens"])
        s["temperature"] = result["temperature"]
        s["avg_logprob"] = result["avg_logprob"]
        s["no_speech_prob"] = ns_prob
        s["compression_ratio"] = result["compression_ratio"]
    st["segments"].extend(segs)
    st["tokens"].extend(t for s in segs for t in s["tokens"] if t < eot)
    if not condition_on_previous_text or result["temperature"] > 0.5:
        st["reset_since"] = len(st["tokens"])
    if verbose:
        for s in segs:
            print(f"{tag}[{s['start']:7.2f} -> {s['end']:7.2f}] {s['text']}")
    st["seek"] += advance


def _final_result(st: Dict, tokenizer) -> Dict:
    return {
        "text": "".join(s["text"] for s in st["segments"]),
        "segments": st["segments"],
        "language": tokenizer.language,
    }


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
    decode_group: int = 1,
) -> Dict:
    """Transcribe audio of arbitrary length with whisper's sequential seek.

    Returns {"text", "segments": [{start, end, text, tokens, temperature,
    avg_logprob, no_speech_prob, compression_ratio}], "language"}.
    """
    eot = tokenizer.eot
    ts_begin = tokenizer.timestamp_begin
    no_speech = tokenizer.no_speech
    sot_seq = list(tokenizer.sot_sequence)  # timestamp mode: no <|notimestamps|>

    max_prev, p_max, max_new_tokens = _context_budget(
        cfg, sot_seq, condition_on_previous_text, max_new_tokens)

    # bucket the padded audio to whole 30 s windows: one mel compile shape
    # per bucket instead of per audio length; mel stays on device
    mel, content_frames = _prep_mel(audio, cfg.n_mels)  # device f32[M, T']
    st = _new_song_state(0, mel, content_frames)

    while st["seek"] < content_frames:
        segment_size = min(N_FRAMES, content_frames - st["seek"])
        # whole-window padding guarantees the slice never runs short
        window = _gather_window(mel, jnp.asarray(st["seek"], jnp.int32))
        xa = _encode(params, cfg, window[None])

        ptoks = _conditioned_prompt(tokenizer, sot_seq, st,
                                    condition_on_previous_text, max_prev)
        buf = np.full((1, p_max), eot, np.int32)
        buf[0, : len(ptoks)] = ptoks
        prompt = jnp.asarray(buf)
        length = jnp.asarray(len(ptoks), jnp.int32)
        sot_index = jnp.asarray(len(ptoks) - len(sot_seq), jnp.int32)

        ns_prob = None
        result = None
        for temperature in temperatures:
            if temperature == 0.0 and beam_size > 1:
                tokens, score_d, ns = _beam_window(
                    params, cfg, xa, prompt, length, sot_index,
                    beam_size, max_new_tokens, eot, no_speech,
                    suppress_ids, begin_suppress_ids, ts_begin,
                    length_penalty, patience, group=decode_group)
                # one host sync for all outputs (each fetch is a full round
                # trip over the remote-TPU tunnel)
                tok_np, score_np, ns_np = jax.device_get((tokens, score_d, ns))
                score = float(score_np[0])
            elif temperature == 0.0:
                tokens, sum_lp, ns = _greedy_window(
                    params, cfg, xa, prompt, length, sot_index,
                    max_new_tokens, eot, no_speech,
                    suppress_ids, begin_suppress_ids, ts_begin)
                tok_np, sum_lp_np, ns_np = jax.device_get((tokens, sum_lp, ns))
                n_gen = max(int((tok_np[0] != eot).sum()) + 1, 1)
                score = float(sum_lp_np[0]) / n_gen
            else:
                rng = jax.random.PRNGKey(
                    seed + int(temperature * 10) + st["seek"])
                tokens, sum_lp, ns = _sample_window(
                    params, cfg, xa, prompt, length, sot_index, rng,
                    temperature, max_new_tokens, eot, no_speech,
                    suppress_ids, begin_suppress_ids, ts_begin)
                tok_np, sum_lp_np, ns_np = jax.device_get((tokens, sum_lp, ns))
                n_gen = max(int((tok_np[0] != eot).sum()) + 1, 1)
                score = float(sum_lp_np[0]) / n_gen
            if ns_prob is None:
                ns_prob = float(ns_np[0])

            result = _candidate(tokenizer, tok_np[0], score, temperature, eot)
            if _settles(result, ns_prob, compression_ratio_threshold,
                        logprob_threshold, no_speech_threshold):
                break

        _apply_window_result(
            st, result, ns_prob, segment_size, tokenizer, ts_begin, eot,
            logprob_threshold, no_speech_threshold,
            condition_on_previous_text, verbose)

    return _final_result(st, tokenizer)


@functools.partial(jax.jit, static_argnames=("n_mels",))
def _mel_device(padded_audio: jnp.ndarray, n_mels: int = 80) -> jnp.ndarray:
    return log_mel_spectrogram(padded_audio, n_mels=n_mels)


@jax.jit
def _gather_window(mel: jnp.ndarray, seek: jnp.ndarray) -> jnp.ndarray:
    """Device-side 30 s window slice: mel f32[M, T'] -> f32[M, N_FRAMES].

    Stays on device: over the remote-TPU tunnel, fetching a song's full mel
    to host and re-uploading one window per seek round costs more than the
    decode itself (measured ~230 ms down + ~450 ms up per 90 s song at the
    tunnel's ~17 MB/s, vs ~8 ms of on-device mel compute)."""
    return jax.lax.dynamic_slice(mel, (jnp.int32(0), seek),
                                 (mel.shape[0], N_FRAMES))


def _prep_mel(audio, n_mels: int = 80) -> Tuple[jnp.ndarray, int]:
    """Whole-window-bucketed log-mel for one song: (device mel [n_mels, T'],
    content frames). The mel is computed and kept ON DEVICE (dispatch is
    async — on a directly attached host the upload DMAs overlap the current
    rounds' decode; the remote tunnel serializes transfers with compute,
    see PARITY.md); windows are sliced out on device with
    ``_gather_window``. The whole-window padding guarantees
    T' >= content_frames + N_FRAMES, so a window slice never runs short.

    ``audio`` may already be a prepared ``(mel, content_frames)`` pair from
    ``prepare_longform_audio`` — returned as-is, so callers (serving, the
    bench) can stage uploads off the hot path."""
    if isinstance(audio, tuple):
        return audio
    audio = np.asarray(audio, np.float32).reshape(-1)
    content_frames = len(audio) // HOP_LENGTH
    padded_len = ((len(audio) + N_SAMPLES) + N_SAMPLES - 1) // N_SAMPLES * N_SAMPLES
    padded = np.zeros((padded_len,), np.float32)
    padded[: len(audio)] = audio
    return _mel_device(jnp.asarray(padded), n_mels=n_mels), content_frames


def prepare_longform_audio(audio: np.ndarray,
                           n_mels: int = 80) -> Tuple[jnp.ndarray, int]:
    """Stage one song for ``transcribe_longform_batched``: upload + compute
    its log-mel on device, returning an opaque ``(mel, content_frames)``
    pair accepted anywhere an audio array is. Staging off the hot path lets
    a serving loop (or benchmark) pay host->device ingest once per song,
    decoupled from the lockstep decode rounds. Pass the model's
    ``cfg.n_mels`` for 128-band (large-v3 family) backbones."""
    return _prep_mel(audio, n_mels)


def transcribe_longform_batched(
    params: Dict,
    cfg: WhisperConfig,
    audios: Sequence[np.ndarray],
    tokenizer,
    *,
    batch_size: Optional[int] = None,
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
    overlap_groups: int = 1,
    decode_group: int = 1,
) -> List[Dict]:
    """Transcribe MANY long songs in lockstep: one batched decode per round.

    The reference (and ``transcribe_longform``) walks each song's seek loop
    alone, so every 30 s window pays a full batch-1 beam decode — the chip
    runs at 1/B of its batched-decode throughput. Here B independent songs
    advance their seek loops together: each round gathers one 30 s window
    per active song (each at its OWN seek offset, with its OWN
    conditioned-prompt length — per-row ``pos`` in the KV cache), encodes
    and decodes them as a single batch, then applies whisper's seek/
    timestamp/quality-gate bookkeeping per row on host. Songs that finish
    hand their batch slot to the next queued song (continuous batching), so
    the device batch stays full until the work queue drains.

    ``overlap_groups=G`` runs G independent lockstep groups of
    ``batch_size`` slots each, round-robin: while group A's decode runs on
    device, the host fetches, gates, and re-dispatches group B (and vice
    versa), hiding the per-round host bookkeeping + dispatch latency behind
    the other group's device time — a round's windows/prompts depend on its
    own previous round's text (whisper's conditioned prompts), so the
    overlap must come from INDEPENDENT songs, not from pipelining one
    group. Per-song results are identical for any G (rows are
    batch-independent); only the song -> slot assignment order changes.

    Per-row semantics (prompts, timestamp rules, temperature fallback,
    no-speech gate, seek arithmetic) are token-for-token those of
    ``transcribe_longform`` for the deterministic temperatures; sampled
    fallback retries (temperature > 0) draw from a batch-shared RNG stream
    keyed on (seed, temperature, group round) instead of the single-song
    (seed, temperature, seek) stream, so individual sampled retries may
    differ — both are valid whisper behavior.

    Returns one result dict per input song, in input order.
    """
    eot = tokenizer.eot
    ts_begin = tokenizer.timestamp_begin
    no_speech = tokenizer.no_speech
    sot_seq = list(tokenizer.sot_sequence)

    max_prev, p_max, max_new_tokens = _context_budget(
        cfg, sot_seq, condition_on_previous_text, max_new_tokens)

    n_songs = len(audios)
    bsz = batch_size if batch_size is not None else min(8, max(n_songs, 1))
    n_groups = max(1, overlap_groups)
    results: List[Optional[Dict]] = [None] * n_songs
    queue = list(range(n_songs))

    def _load(idx: int) -> Dict:
        mel, frames = _prep_mel(audios[idx], cfg.n_mels)
        return _new_song_state(idx, mel, frames)

    # prefetch pool: _prep_mel only DISPATCHES the audio upload + on-device
    # mel (async), so loading the next queued songs a few rounds early
    # overlaps their host->device transfer with the current rounds' decode
    # — at steady state the link and the chip run concurrently
    prefetched: Dict[int, Dict] = {}
    n_prefetch = 2 * n_groups

    def _take_next() -> Dict:
        idx = queue.pop(0)
        return prefetched.pop(idx, None) or _load(idx)

    zero_win = jnp.zeros((cfg.n_mels, N_FRAMES), jnp.float32)  # idle slots

    class _Group:
        """One lockstep batch with its dispatch/fetch split for round-robin
        overlap. A round: prepare (windows + prompts + encode dispatch) ->
        [dispatch one temperature attempt -> fetch + gate]* -> bookkeeping
        -> next round's prepare."""

        def __init__(self, gi: int):
            self.gi = gi
            self.slots: List[Optional[Dict]] = [
                _take_next() if queue else None for _ in range(bsz)]
            self.round_idx = 0
            self.pending = None   # (kind, device handles, temperature)
            if self.active():
                self._prepare_round()

        def active(self) -> bool:
            return any(s is not None for s in self.slots)

        def _prepare_round(self):
            for idx in queue[:n_prefetch]:
                if idx not in prefetched:
                    prefetched[idx] = _load(idx)
            wins: List[jnp.ndarray] = [zero_win] * bsz
            self.seg_sizes = [0] * bsz
            buf = np.full((bsz, p_max), eot, np.int32)
            lengths = np.full((bsz,), len(sot_seq), np.int32)
            sots = np.zeros((bsz,), np.int32)
            for i, st in enumerate(self.slots):
                if st is None:
                    buf[i, : len(sot_seq)] = sot_seq
                    continue
                self.seg_sizes[i] = min(N_FRAMES, st["frames"] - st["seek"])
                # device-side slice of the device-resident mel: no mel
                # download, no per-round window re-upload over the tunnel
                wins[i] = _gather_window(
                    st["mel"], jnp.asarray(st["seek"], jnp.int32))
                ptoks = _conditioned_prompt(tokenizer, sot_seq, st,
                                            condition_on_previous_text,
                                            max_prev)
                buf[i, : len(ptoks)] = ptoks
                lengths[i] = len(ptoks)
                sots[i] = len(ptoks) - len(sot_seq)
            self.xa = _encode(params, cfg, jnp.stack(wins))
            self.prompt = jnp.asarray(buf)
            self.length = jnp.asarray(lengths)
            self.sot_index = jnp.asarray(sots)
            self.row_result: List[Optional[Dict]] = [None] * bsz
            self.row_ns: List[Optional[float]] = [None] * bsz
            self.settled = [st is None for st in self.slots]
            self.temp_i = 0

        def dispatch(self):
            """Queue this group's next temperature attempt on the device
            (async — returns as soon as the computation is enqueued)."""
            temperature = temperatures[self.temp_i]
            if temperature == 0.0 and beam_size > 1:
                handles = _beam_window(
                    params, cfg, self.xa, self.prompt, self.length,
                    self.sot_index, beam_size, max_new_tokens, eot,
                    no_speech, suppress_ids, begin_suppress_ids, ts_begin,
                    length_penalty, patience, group=decode_group)
                self.pending = ("beam", handles, temperature)
            elif temperature == 0.0:
                handles = _greedy_window(
                    params, cfg, self.xa, self.prompt, self.length,
                    self.sot_index, max_new_tokens, eot, no_speech,
                    suppress_ids, begin_suppress_ids, ts_begin)
                self.pending = ("greedy", handles, temperature)
            else:
                rng = jax.random.PRNGKey(
                    seed + int(temperature * 10)
                    + self.round_idx * n_groups + self.gi)
                handles = _sample_window(
                    params, cfg, self.xa, self.prompt, self.length,
                    self.sot_index, rng, temperature, max_new_tokens, eot,
                    no_speech, suppress_ids, begin_suppress_ids, ts_begin)
                self.pending = ("sample", handles, temperature)

        def process(self):
            """Fetch the pending attempt (one host sync for all outputs —
            each fetch is a full round trip over the remote-TPU tunnel),
            evaluate quality gates, and either leave the round open for the
            next temperature or complete it (bookkeeping + slot refill +
            next round's prepare)."""
            kind, handles, temperature = self.pending
            self.pending = None
            if kind == "beam":
                tok_np, score_np, ns_np = jax.device_get(handles)
                scores = np.asarray(score_np, np.float64)
            else:
                tok_np, sum_lp_np, ns_np = jax.device_get(handles)
                n_gen = np.maximum((tok_np != eot).sum(axis=1) + 1, 1)
                scores = np.asarray(sum_lp_np, np.float64) / n_gen
            for i, st in enumerate(self.slots):
                if st is None or self.settled[i]:
                    continue
                if self.row_ns[i] is None:
                    self.row_ns[i] = float(ns_np[i])
                self.row_result[i] = _candidate(
                    tokenizer, tok_np[i], float(scores[i]), temperature, eot)
                self.settled[i] = _settles(
                    self.row_result[i], self.row_ns[i],
                    compression_ratio_threshold, logprob_threshold,
                    no_speech_threshold)
            self.temp_i += 1
            if not all(self.settled) and self.temp_i < len(temperatures):
                return  # same round, next temperature (caller re-dispatches)

            for i, st in enumerate(self.slots):
                if st is None:
                    continue
                _apply_window_result(
                    st, self.row_result[i], self.row_ns[i],
                    self.seg_sizes[i], tokenizer, ts_begin, eot,
                    logprob_threshold, no_speech_threshold,
                    condition_on_previous_text, verbose,
                    tag=f"[song {st['ri']}] ")
                if st["seek"] >= st["frames"]:
                    results[st["ri"]] = _final_result(st, tokenizer)
                    self.slots[i] = _take_next() if queue else None
            self.round_idx += 1
            if self.active():
                self._prepare_round()

    groups = [_Group(gi) for gi in range(n_groups)]
    for g in groups:
        if g.active():
            g.dispatch()
    # round-robin: process a group's finished attempt, immediately queue its
    # next work, then move on — with G >= 2 the device is never idle while
    # the host parses segments and builds prompts
    while any(g.pending is not None for g in groups):
        for g in groups:
            if g.pending is None:
                continue
            g.process()
            if g.active():
                g.dispatch()

    return [r for r in results]
