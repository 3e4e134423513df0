"""KV-cached autoregressive decoding: batched greedy + beam search.

TPU-native replacement for the reference's ``model.transcribe(...,
beam_size=5)`` decode loop (`inference_transcript.py:88-91`), which crosses
host<->device every token. Here the whole decode runs inside one
``lax.while_loop`` with a static-shape KV cache (``models.whisper
.decode_step``): beams live as an extra batch dimension, cache rows are
re-gathered on device after each top-k, and the loop exits early once
every beam has emitted <|endoftext|>.

Scoring follows whisper's MaximumLikelihoodRanker: with the default
``length_penalty=None`` finished candidates are ranked by
``sum_logprob / num_generated_tokens``; with a float penalty by the Google
NMT formula ``sum_logprob / ((5 + length) / 6) ** penalty``.

Logit processing per step mirrors whisper's LogitFilters: the special/
non-speech suppress mask, SuppressBlank at the first sampled position
(``begin_suppress_ids``), and optionally ApplyTimestampRules
(``timestamp_rules=True`` — see ``decode.timestamps``).

The ``*_loop`` helpers start from an already-primed cache + first-position
logits, so long-form decoding (``decode.longform``) can prime conditioned
prompts in one batched forward (``models.whisper.prime_decode_cache``) and
reuse the same loops.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from lyricalignment_tpu.decode.timestamps import (
    MAX_INITIAL_TIMESTAMP_INDEX,
    apply_timestamp_rules,
)
from lyricalignment_tpu.models.whisper import (
    WhisperConfig,
    decode_step,
    init_decode_cache,
)

NEG_INF = -1.0e30

Processor = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]


def _suppress_mask(cfg: WhisperConfig, eot: int, n_special_start: int,
                   extra_ids: tuple = (),
                   allow_timestamps_from: Optional[int] = None) -> jnp.ndarray:
    """Additive mask suppressing every special token except <|endoftext|>.

    ``n_special_start`` is the first special id (= eot); everything from
    there on (sot, languages, task, timestamps) is disallowed during
    no-timestamp text generation, except eot itself. ``extra_ids`` adds
    whisper's non-speech symbol suppressions
    (``text.whisper_tokenizer.non_speech_token_ids``). With
    ``allow_timestamps_from`` (= timestamp_begin), timestamp ids stay
    allowed for timestamp-rule decoding.
    """
    mask = jnp.zeros((cfg.n_vocab,), jnp.float32)
    ids = jnp.arange(cfg.n_vocab)
    suppressed = ids >= n_special_start
    if allow_timestamps_from is not None:
        suppressed = suppressed & (ids < allow_timestamps_from)
    mask = jnp.where(suppressed, NEG_INF, mask)
    for i in extra_ids:
        mask = mask.at[int(i)].set(NEG_INF)
    mask = mask.at[eot].set(0.0)
    return mask


def make_processor(
    cfg: WhisperConfig,
    eot: int,
    suppress_ids: tuple = (),
    begin_suppress_ids: tuple = (),
    timestamp_rules: bool = False,
    ts_begin: Optional[int] = None,
    max_initial_ts_index: int = MAX_INITIAL_TIMESTAMP_INDEX,
) -> Processor:
    """Build the per-step logit processor ``(logits[N,V], gen[N,T], i) ->
    logits``. ``gen`` is the generated-token buffer (positions < i valid)."""
    suppress = _suppress_mask(
        cfg, eot, eot, suppress_ids,
        allow_timestamps_from=ts_begin if timestamp_rules else None,
    )
    begin = None
    if begin_suppress_ids:
        begin = jnp.zeros((cfg.n_vocab,), jnp.float32)
        begin = begin.at[jnp.asarray(begin_suppress_ids, jnp.int32)].set(NEG_INF)

    def process(logits, gen, i):
        logits = logits + suppress[None, :]
        if begin is not None:
            logits = logits + jnp.where(i == 0, begin, jnp.zeros_like(begin))[None, :]
        if timestamp_rules:
            logits = apply_timestamp_rules(
                logits, gen, i, ts_begin=ts_begin, eot=eot,
                max_initial_index=max_initial_ts_index)
        return logits

    return process


# ---------------------------------------------------------------------------
# core loops (start from a primed cache + the prompt's last-position logits)
# ---------------------------------------------------------------------------

def greedy_loop(
    params: Dict,
    cfg: WhisperConfig,
    logits0: jnp.ndarray,        # f32[B, V] at the last prompt position
    cache: Dict,                 # primed; pos = prompt length
    process: Processor,
    max_new_tokens: int,
    eot: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy decode from a primed cache.

    Returns (tokens i32[B, max_new_tokens] eot-padded, sum_logprob f32[B]).
    """
    b = logits0.shape[0]
    out0 = jnp.full((b, max_new_tokens), eot, jnp.int32)

    def pick(logits, gen, i, done):
        l = process(logits, gen, i)
        tok = jnp.argmax(l, axis=-1).astype(jnp.int32)
        lp = jax.nn.log_softmax(l, axis=-1)
        lp = jnp.take_along_axis(lp, tok[:, None], axis=1)[:, 0]
        return jnp.where(done, eot, tok), jnp.where(done, 0.0, lp)

    first, lp0 = pick(logits0, out0, jnp.asarray(0), jnp.zeros((b,), bool))
    out0 = out0.at[:, 0].set(first)
    done0 = first == eot

    def cond(state):
        i, _, _, done, _, _ = state
        return (i < max_new_tokens) & ~jnp.all(done)

    def body(state):
        i, tok, cache, done, out, sum_lp = state
        logits, cache = decode_step(params, cfg, tok, cache)
        nxt, lp = pick(logits, out, i, done)
        out = out.at[:, i].set(nxt)
        done = done | (nxt == eot)
        return i + 1, nxt[:, None], cache, done, out, sum_lp + lp

    state = (jnp.asarray(1), first[:, None], cache, done0, out0, lp0)
    _, _, _, _, out, sum_lp = jax.lax.while_loop(cond, body, state)
    return out, sum_lp


def _gather_cache(cache: Dict, idx: jnp.ndarray) -> Dict:
    """Re-select beam rows of the self-attention KV cache (idx i32[B*beam]).

    Cross-attention K/V are deliberately NOT gathered: beam selection only
    permutes rows within a sample, and every beam of a sample shares the
    same audio features — gathering them would move ~GBs of invariant data
    per step at whisper-medium."""
    return {
        "pos": cache["pos"],
        "blocks": [
            {k: (v if k.startswith("cross_") else v[idx]) for k, v in blk.items()}
            for blk in cache["blocks"]
        ],
    }


def beam_loop(
    params: Dict,
    cfg: WhisperConfig,
    logits0: jnp.ndarray,        # f32[B*k, V] (rows of a sample identical)
    cache: Dict,                 # primed for B*k rows
    process: Processor,
    beam_size: int,
    max_new_tokens: int,
    eot: int,
    length_penalty: Optional[float] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Beam search from a primed cache.

    Returns (tokens i32[B, max_new_tokens] of the best beam, avg logprob
    f32[B] of that beam = sum_logprob / num_generated_tokens). Beam
    SELECTION uses whisper's MaximumLikelihoodRanker (the Google-NMT
    formula when ``length_penalty`` is set), but the returned score is
    always the plain average logprob — whisper's quality gates
    (logprob_threshold) are defined on that scale regardless of the
    ranking penalty.
    """
    bk = logits0.shape[0]
    k = beam_size
    b = bk // k

    tokens0 = jnp.full((bk, max_new_tokens), eot, jnp.int32)
    logp0 = jax.nn.log_softmax(process(logits0, tokens0, jnp.asarray(0)), axis=-1)
    # first expansion: take top-k from beam 0 only (all beams identical now)
    first = logp0.reshape(b, k, -1)[:, 0]
    top_lp, top_tok = jax.lax.top_k(first, k)           # [B, k]

    tokens0 = tokens0.at[:, 0].set(top_tok.reshape(-1))
    sum_lp0 = top_lp.reshape(-1)                        # [B*k]
    done0 = top_tok.reshape(-1) == eot
    lengths0 = jnp.ones((bk,), jnp.int32)

    def cond(state):
        i, _, _, _, _, _, done = state
        return (i < max_new_tokens) & ~jnp.all(done)

    def body(state):
        i, tok, cache, sum_lp, lengths, tokens, done = state
        logits, cache = decode_step(params, cfg, tok, cache)
        logp = jax.nn.log_softmax(process(logits, tokens, i), axis=-1)  # [B*k, V]
        v = logp.shape[-1]

        # finished beams: only "emit eot again" at zero cost, everything else
        # forbidden — keeps them competitive without growing their score
        eot_only = jnp.full((v,), NEG_INF).at[eot].set(0.0)
        logp = jnp.where(done[:, None], eot_only[None, :], logp)

        cand = sum_lp[:, None] + logp                    # [B*k, V]
        # two-stage top-k: each global winner is necessarily within the
        # top-k of its source beam, so select per-beam over V first, then
        # over the k*k survivors — identical result (ties included: both
        # stages are beam-major then vocab-id ordered), ~k x narrower sort
        row_lp, row_tok = jax.lax.top_k(cand, k)         # [B*k, k]
        top_lp, flat = jax.lax.top_k(row_lp.reshape(b, k * k), k)  # [B, k]
        beam_idx = flat // k                             # source beam within b
        tok_idx = jnp.take_along_axis(
            row_tok.reshape(b, k * k), flat, axis=1).astype(jnp.int32)

        src = (jnp.arange(b)[:, None] * k + beam_idx).reshape(-1)  # [B*k]
        cache = _gather_cache(cache, src)
        tokens = tokens[src]
        was_done = done[src]
        lengths = lengths[src]

        new_tok = tok_idx.reshape(-1)
        tokens = tokens.at[:, i].set(jnp.where(was_done, eot, new_tok))
        lengths = jnp.where(was_done, lengths, lengths + 1)
        done = was_done | (new_tok == eot)
        # eot emission: token counted in score but not re-added after done
        return i + 1, new_tok[:, None], cache, top_lp.reshape(-1), lengths, tokens, done

    state = (jnp.asarray(1), tokens0[:, 0:1], cache, sum_lp0, lengths0, tokens0, done0)
    _, _, _, sum_lp, lengths, tokens, done = jax.lax.while_loop(cond, body, state)

    # rank: whisper MaximumLikelihoodRanker
    lengths_f = jnp.maximum(lengths.reshape(b, k), 1).astype(jnp.float32)
    if length_penalty is None:
        norm = lengths_f
    else:
        norm = ((5.0 + lengths_f) / 6.0) ** length_penalty
    rank = sum_lp.reshape(b, k) / norm
    best = jnp.argmax(rank, axis=1)
    rows = jnp.arange(b)
    avg = sum_lp.reshape(b, k)[rows, best] / lengths_f[rows, best]
    return tokens[rows * k + best], avg


def sample_loop(
    params: Dict,
    cfg: WhisperConfig,
    logits0: jnp.ndarray,        # f32[B, V]
    cache: Dict,
    process: Processor,
    rng: jax.Array,
    temperature: float,
    max_new_tokens: int,
    eot: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Temperature sampling from a primed cache.

    Returns (tokens i32[B, max_new_tokens], sum_logprob f32[B])."""
    b = logits0.shape[0]
    out0 = jnp.full((b, max_new_tokens), eot, jnp.int32)

    def pick(logits, gen, i, key, done):
        l = process(logits, gen, i)
        tok = jax.random.categorical(key, l / temperature, axis=-1).astype(jnp.int32)
        logp = jax.nn.log_softmax(l, -1)
        lp = jnp.take_along_axis(logp, tok[:, None], axis=1)[:, 0]
        return jnp.where(done, eot, tok), jnp.where(done, 0.0, lp)

    key, sub = jax.random.split(rng)
    first, lp0 = pick(logits0, out0, jnp.asarray(0), sub, jnp.zeros((b,), bool))
    out0 = out0.at[:, 0].set(first)

    def cond(state):
        i, _, _, done, _, _, _ = state
        return (i < max_new_tokens) & ~jnp.all(done)

    def body(state):
        i, tok, cache, done, out, sum_lp, key = state
        logits, cache = decode_step(params, cfg, tok, cache)
        key, sub = jax.random.split(key)
        nxt, lp = pick(logits, out, i, sub, done)
        out = out.at[:, i].set(nxt)
        sum_lp = sum_lp + lp
        done = done | (nxt == eot)
        return i + 1, nxt[:, None], cache, done, out, sum_lp, key

    state = (jnp.asarray(1), first[:, None], cache, first == eot, out0, lp0, key)
    _, _, _, _, out, sum_lp, _ = jax.lax.while_loop(cond, body, state)
    return out, sum_lp


# ---------------------------------------------------------------------------
# public jitted entry points (prompt-of-specials priming, 30 s windows)
# ---------------------------------------------------------------------------

def _prime_cache(params, cfg, prompt, cache):
    """Feed the prompt tokens one-by-one (static unroll over the prompt,
    which is a handful of special tokens)."""
    logits = None
    for i in range(prompt.shape[1]):
        logits, cache = decode_step(params, cfg, prompt[:, i: i + 1], cache)
    return logits, cache


def _check_context(cfg: WhisperConfig, prompt_len: int, max_new_tokens: int):
    if prompt_len + max_new_tokens > cfg.n_text_ctx:
        raise ValueError(
            f"prompt ({prompt_len}) + max_new_tokens ({max_new_tokens}) "
            f"exceeds the decoder context ({cfg.n_text_ctx})"
        )


@functools.partial(jax.jit, static_argnames=(
    "cfg", "max_new_tokens", "eot", "suppress_ids", "begin_suppress_ids"))
def greedy_decode(
    params: Dict,
    cfg: WhisperConfig,
    audio_features: jnp.ndarray,   # [B, 1500, D]
    prompt: jnp.ndarray,           # i32[B, P] (sot sequence)
    max_new_tokens: int = 224,
    eot: int = 50257,
    suppress_ids: tuple = (),
    begin_suppress_ids: tuple = (),
) -> jnp.ndarray:
    """Returns i32[B, max_new_tokens], eot-padded after completion."""
    _check_context(cfg, prompt.shape[1], max_new_tokens)
    cache = init_decode_cache(params, cfg, audio_features,
                              prompt.shape[1] + max_new_tokens)
    logits, cache = _prime_cache(params, cfg, prompt, cache)
    process = make_processor(cfg, eot, suppress_ids, begin_suppress_ids)
    out, _ = greedy_loop(params, cfg, logits, cache, process, max_new_tokens, eot)
    return out


@functools.partial(jax.jit, static_argnames=(
    "cfg", "beam_size", "max_new_tokens", "eot", "suppress_ids",
    "begin_suppress_ids", "length_penalty"))
def beam_search(
    params: Dict,
    cfg: WhisperConfig,
    audio_features: jnp.ndarray,   # [B, 1500, D]
    prompt: jnp.ndarray,           # i32[B, P]
    beam_size: int = 5,
    max_new_tokens: int = 224,
    eot: int = 50257,
    suppress_ids: tuple = (),
    begin_suppress_ids: tuple = (),
    length_penalty: Optional[float] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched beam search.

    Returns (tokens i32[B, max_new_tokens] of the best beam, its average
    logprob f32[B]); selection follows whisper's MaximumLikelihoodRanker
    (Google-NMT normalization when ``length_penalty`` is given).
    """
    k = beam_size
    _check_context(cfg, prompt.shape[1], max_new_tokens)
    # cross K/V computed + streamed once per sample; self cache per beam row
    prompt_k = jnp.repeat(prompt, k, axis=0)
    cache = init_decode_cache(params, cfg, audio_features,
                              prompt.shape[1] + max_new_tokens, beam_size=k)
    logits, cache = _prime_cache(params, cfg, prompt_k, cache)
    process = make_processor(cfg, eot, suppress_ids, begin_suppress_ids)
    return beam_loop(params, cfg, logits, cache, process, k, max_new_tokens,
                     eot, length_penalty)
