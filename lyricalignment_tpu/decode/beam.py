"""KV-cached autoregressive decoding: batched greedy + beam search.

TPU-native replacement for the reference's ``model.transcribe(...,
beam_size=5)`` decode loop (`inference_transcript.py:88-91`), which crosses
host<->device every token. Here the whole decode runs inside one
``lax.while_loop`` with a static-shape KV cache (``models.whisper
.decode_step``): beams live as an extra batch dimension, cache rows are
re-gathered on device after each top-k, and the loop exits early once
every beam has emitted <|endoftext|>.

Scoring follows whisper's MaximumLikelihoodRanker with default
length_penalty=None: finished candidates are ranked by
``sum_logprob / num_generated_tokens``.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from lyricalignment_tpu.models.whisper import (
    WhisperConfig,
    decode_step,
    init_decode_cache,
)

NEG_INF = -1.0e30


def _suppress_mask(cfg: WhisperConfig, eot: int, n_special_start: int,
                   extra_ids: tuple = ()) -> jnp.ndarray:
    """Additive mask suppressing every special token except <|endoftext|>.

    ``n_special_start`` is the first special id (= eot); everything from
    there on (sot, languages, task, timestamps) is disallowed during
    no-timestamp text generation, except eot itself. ``extra_ids`` adds
    whisper's non-speech symbol suppressions
    (``text.whisper_tokenizer.non_speech_token_ids``).
    """
    mask = jnp.zeros((cfg.n_vocab,), jnp.float32)
    ids = jnp.arange(cfg.n_vocab)
    mask = jnp.where(ids >= n_special_start, NEG_INF, mask)
    for i in extra_ids:
        mask = mask.at[int(i)].set(NEG_INF)
    mask = mask.at[eot].set(0.0)
    return mask


def _prime_cache(params, cfg, prompt, cache):
    """Feed the prompt tokens one-by-one (static unroll over the prompt,
    which is a handful of special tokens)."""
    logits = None
    for i in range(prompt.shape[1]):
        logits, cache = decode_step(params, cfg, prompt[:, i: i + 1], cache)
    return logits, cache


@functools.partial(jax.jit, static_argnames=("cfg", "max_new_tokens", "eot", "suppress_ids"))
def greedy_decode(
    params: Dict,
    cfg: WhisperConfig,
    audio_features: jnp.ndarray,   # [B, 1500, D]
    prompt: jnp.ndarray,           # i32[B, P] (sot sequence)
    max_new_tokens: int = 224,
    eot: int = 50257,
    suppress_ids: tuple = (),
) -> jnp.ndarray:
    """Returns i32[B, max_new_tokens], eot-padded after completion."""
    b = audio_features.shape[0]
    max_len = prompt.shape[1] + max_new_tokens
    if max_len > cfg.n_text_ctx:
        raise ValueError(
            f"prompt ({prompt.shape[1]}) + max_new_tokens ({max_new_tokens}) "
            f"exceeds the decoder context ({cfg.n_text_ctx})"
        )
    cache = init_decode_cache(params, cfg, audio_features, max_len)
    logits, cache = _prime_cache(params, cfg, prompt, cache)
    suppress = _suppress_mask(cfg, eot, eot, suppress_ids)

    def cond(state):
        i, _, _, done, _ = state
        return (i < max_new_tokens) & ~jnp.all(done)

    def body(state):
        i, tok, cache, done, out = state
        logits, new_cache = decode_step(params, cfg, tok, cache)
        nxt = jnp.argmax(logits + suppress[None, :], axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, eot, nxt)
        out = out.at[:, i].set(nxt)
        done = done | (nxt == eot)
        return i + 1, nxt[:, None], new_cache, done, out

    first = jnp.argmax(logits + suppress[None, :], axis=-1).astype(jnp.int32)
    out0 = jnp.full((b, max_new_tokens), eot, jnp.int32).at[:, 0].set(first)
    done0 = first == eot
    state = (jnp.asarray(1), first[:, None], cache, done0, out0)
    _, _, _, _, out = jax.lax.while_loop(cond, body, state)
    return out


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


@functools.partial(
    jax.jit, static_argnames=("cfg", "beam_size", "max_new_tokens", "eot", "suppress_ids")
)
def beam_search(
    params: Dict,
    cfg: WhisperConfig,
    audio_features: jnp.ndarray,   # [B, 1500, D]
    prompt: jnp.ndarray,           # i32[B, P]
    beam_size: int = 5,
    max_new_tokens: int = 224,
    eot: int = 50257,
    suppress_ids: tuple = (),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched beam search.

    Returns (tokens i32[B, max_new_tokens] of the best beam, score f32[B] =
    sum logprob / generated length — whisper's default ranking).
    """
    b = audio_features.shape[0]
    k = beam_size
    bk = b * k

    xa = jnp.repeat(audio_features, k, axis=0)          # [B*k, ...]
    prompt_k = jnp.repeat(prompt, k, axis=0)
    max_len = prompt.shape[1] + max_new_tokens
    if max_len > cfg.n_text_ctx:
        raise ValueError(
            f"prompt ({prompt.shape[1]}) + max_new_tokens ({max_new_tokens}) "
            f"exceeds the decoder context ({cfg.n_text_ctx})"
        )
    cache = init_decode_cache(params, cfg, xa, max_len)
    logits, cache = _prime_cache(params, cfg, prompt_k, cache)
    suppress = _suppress_mask(cfg, eot, eot, suppress_ids)

    logp0 = jax.nn.log_softmax(logits + suppress[None, :], axis=-1)  # [B*k, V]
    # first expansion: take top-k from beam 0 only (all beams identical now)
    first = logp0.reshape(b, k, -1)[:, 0]
    top_lp, top_tok = jax.lax.top_k(first, k)           # [B, k]

    tokens0 = jnp.full((bk, max_new_tokens), eot, jnp.int32)
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
        logp = jax.nn.log_softmax(logits + suppress[None, :], axis=-1)  # [B*k, V]
        v = logp.shape[-1]

        # finished beams: only "emit eot again" at zero cost, everything else
        # forbidden — keeps them competitive without growing their score
        eot_only = jnp.full((v,), NEG_INF).at[eot].set(0.0)
        logp = jnp.where(done[:, None], eot_only[None, :], logp)

        cand = sum_lp[:, None] + logp                    # [B*k, V]
        cand = cand.reshape(b, k * v)
        top_lp, flat_idx = jax.lax.top_k(cand, k)        # [B, k]
        beam_idx = flat_idx // v                         # source beam within b
        tok_idx = (flat_idx % v).astype(jnp.int32)

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

    # rank: avg logprob per generated token (length_penalty=None default)
    avg = sum_lp.reshape(b, k) / jnp.maximum(lengths.reshape(b, k), 1)
    best = jnp.argmax(avg, axis=1)
    sel = jnp.arange(b) * k + best
    return tokens[sel], avg[jnp.arange(b), best]
