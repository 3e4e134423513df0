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
    prime_decode_cache,
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
    group: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy decode from a primed cache.

    ``group`` unrolls that many decode steps inside each ``while_loop``
    iteration, amortizing the loop's fixed per-iteration cost (the decode
    loop is bound by per-op/iteration overhead, not HBM traffic — PARITY
    "decode investigation"); the EOT check runs once per group, so up to
    ``group - 1`` masked-out steps run past completion. Token-for-token
    identical to ``group=1``: done rows emit eot with 0 logprob, and a
    scalar ``i < max_new_tokens`` guard freezes the carried stats on
    overshoot sub-steps (their out-of-range token writes drop).

    Returns (tokens i32[B, max_new_tokens] eot-padded, sum_logprob f32[B]).
    """
    if group < 1:
        # group <= 0 would make the while_loop body a no-op and hang the
        # device loop forever; fail loudly at trace time instead.
        raise ValueError(f"decode group must be >= 1, got {group}")
    b = logits0.shape[0]
    t = max_new_tokens
    out0 = jnp.full((b, t), eot, jnp.int32)

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
        return (i < t) & ~jnp.all(done)

    def step_once(state):
        i, tok, cache, done, out, sum_lp = state
        logits, cache = decode_step(params, cfg, tok, cache)
        nxt, lp = pick(logits, out, i, done | (i >= t))
        out = out.at[:, i].set(nxt)          # i >= t: dropped write
        done = done | (nxt == eot)
        return i + 1, nxt[:, None], cache, done, out, sum_lp + lp

    def body(state):
        for _ in range(group):
            state = step_once(state)
        return state

    state = (jnp.asarray(1), first[:, None], cache, done0, out0, lp0)
    _, _, _, _, out, sum_lp = jax.lax.while_loop(cond, body, state)
    return out, sum_lp


def _gather_cache(cache: Dict, idx: jnp.ndarray) -> Dict:
    """Re-select beam rows of the per-row cache sections (idx i32[B*beam]).

    Per-SAMPLE sections are deliberately NOT gathered: beam selection only
    permutes rows within a sample, and every beam of a sample shares the
    same audio features (``cross_*``) and the same conditioned prompt
    (``prompt_*``) — gathering either would move ~GBs of invariant data
    per step at whisper-medium. Only the generated-token K/V (and any
    other per-row entries) are reordered; non-block state (step, length)
    is per-sample or scalar and passes through."""
    return {
        **{k: v for k, v in cache.items() if k != "blocks"},
        "blocks": [
            {k: (v if k.startswith(("cross_", "prompt_")) else v[idx])
             for k, v in blk.items()}
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
    patience: Optional[float] = None,
    group: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Beam search from a primed cache, token-for-token equivalent to
    whisper's BeamSearchDecoder + MaximumLikelihoodRanker (the decode engine
    behind the reference's ``model.transcribe(..., beam_size=5)``,
    `inference_transcript.py:88-91`).

    ``group`` unrolls that many decode steps per ``while_loop`` iteration
    (see ``greedy_loop``): the early-exit check runs once per group, the
    completed-sample freeze makes post-completion sub-steps no-ops, and a
    scalar ``i < max_new_tokens`` guard keeps overshoot sub-steps from
    touching the finished set — results are token-for-token equal to
    ``group=1``.

    Semantics pinned against an independent numpy oracle
    (tests/test_beam_oracle.py):

    - each live beam proposes its top ``k+1`` continuations; the per-sample
      candidate pool is ranked best-first (ties resolve in beam-major,
      per-beam-rank order, matching the reference's dict insertion order)
    - a candidate ending in eot is moved to the finished set; live slots are
      refilled by the best non-eot candidates, so finished sequences never
      block the beam
    - the finished set keeps the FIRST ``max_candidates = round(k *
      patience)`` sequences to finish (within a step, best first) and
      decoding completes when every sample has that many
    - if the token budget runs out first, unfinished beams are appended by
      descending sum-logprob (ties: higher beam index first, matching
      ``reversed(np.argsort(...))``) until ``k`` candidates exist
    - ranking normalizes by the generated text length EXCLUDING eot
      (``sum_logprob / n_text`` or the Google-NMT formula
      ``sum_logprob / ((5 + n_text) / 6) ** length_penalty``)

    Returns (tokens i32[B, max_new_tokens] of the best candidate, eot-padded,
    and its average logprob f32[B] = sum_logprob / (n_text + 1) — whisper's
    ``avg_logprob``, the scale its logprob_threshold quality gate is
    defined on, regardless of the ranking penalty).
    """
    if group < 1:
        # group <= 0 would make the while_loop body a no-op and hang the
        # device loop forever; fail loudly at trace time instead.
        raise ValueError(f"decode group must be >= 1, got {group}")
    bk = logits0.shape[0]
    k = beam_size
    b = bk // k
    t = max_new_tokens
    # whisper's BeamSearchDecoder accepts any patience with
    # round(beam_size * patience) > 0 — patience < 1.0 (fewer finished
    # candidates than beams) is a valid reference configuration
    n_cand = int(round((patience if patience is not None else 1.0) * k))
    if n_cand < 1:
        raise ValueError(
            f"Invalid beam size ({k}) or patience ({patience}): "
            f"round(beam_size * patience) must be > 0")
    # candidate buffer: finalize pads with unfinished beams up to k entries,
    # so it must hold max(n_cand, k) rows even when patience < 1 caps the
    # finished set below k
    n_buf = max(n_cand, k)

    def select(i, cand_lp, cand_tok, cand_src, live_tokens,
               fin_tok, fin_score, fin_ntext, fin_cnt):
        """One BeamSearchDecoder.update: walk the candidate pool best-first,
        routing eot candidates to the finished buffers and the best k non-eot
        candidates to the live slots (in score order).

        cand_* are [B, M] in beam-major, per-beam-rank-minor order; top_k's
        lowest-index tie rule then reproduces the reference's stable sort
        over dict insertion order. live_tokens is the [B, k_src, T] buffer
        the source indices point into."""
        m = cand_lp.shape[1]
        order_lp, order = jax.lax.top_k(cand_lp, m)              # full sort desc
        tok_s = jnp.take_along_axis(cand_tok, order, axis=1)
        src_s = jnp.take_along_axis(cand_src, order, axis=1)
        is_eot = tok_s == eot
        live_rank = jnp.cumsum((~is_eot).astype(jnp.int32), axis=1)   # 1-based
        pos = jnp.arange(m)[None, :]
        # the reference breaks after saving the k-th live candidate; eot
        # candidates ranked above that point finish, later ones are dropped
        pos_k = jnp.argmax(live_rank >= k, axis=1)               # [B]
        new_fin = is_eot & (pos < pos_k[:, None])
        live_sel = (~is_eot) & (live_rank <= k)

        live_pos = jnp.sort(jnp.where(live_sel, pos, m), axis=1)[:, :k]
        new_lp = jnp.take_along_axis(order_lp, live_pos, axis=1)      # [B, k]
        new_tok = jnp.take_along_axis(tok_s, live_pos, axis=1)
        new_src = jnp.take_along_axis(src_s, live_pos, axis=1)

        # append the newly finished (score order) until the buffer holds
        # n_cand sequences; first-come-first-kept, like the reference
        fin_pos = jnp.sort(jnp.where(new_fin, pos, m), axis=1)[:, :k]
        fin_valid = fin_pos < m
        safe = jnp.minimum(fin_pos, m - 1)
        f_lp = jnp.take_along_axis(order_lp, safe, axis=1)            # [B, k]
        f_src = jnp.take_along_axis(src_s, safe, axis=1)
        slot = fin_cnt[:, None] + jnp.cumsum(fin_valid.astype(jnp.int32), axis=1) - 1
        write = fin_valid & (slot < n_cand)
        slot_c = jnp.clip(slot, 0, n_buf - 1)
        onehot = (write[:, :, None]
                  & (slot_c[:, :, None] == jnp.arange(n_buf)[None, None, :]))
        any_w = onehot.any(axis=1)                                    # [B, C]
        oh = onehot.astype(jnp.float32)
        fin_score = jnp.where(any_w, jnp.einsum("bkc,bk->bc", oh, f_lp), fin_score)
        fin_ntext = jnp.where(any_w, i, fin_ntext)
        f_rows = jnp.take_along_axis(
            live_tokens, f_src[:, :, None], axis=1)                   # [B, k, T]
        fin_tok = jnp.where(
            any_w[:, :, None],
            jnp.einsum("bkc,bkt->bct", onehot.astype(jnp.int32), f_rows),
            fin_tok)
        fin_cnt = jnp.minimum(fin_cnt + fin_valid.sum(axis=1), n_cand)
        return new_lp, new_tok, new_src, fin_tok, fin_score, fin_ntext, fin_cnt

    tokens0 = jnp.full((bk, t), eot, jnp.int32)
    fin_tok = jnp.full((b, n_buf, t), eot, jnp.int32)
    fin_score = jnp.full((b, n_buf), NEG_INF, jnp.float32)
    fin_ntext = jnp.ones((b, n_buf), jnp.int32)    # 1 avoids 0/0 in empty slots
    fin_cnt = jnp.zeros((b,), jnp.int32)

    # first expansion: all beams of a sample are identical, so the
    # reference's dict dedups the pool to beam 0's top (k+1) candidates
    logp0 = jax.nn.log_softmax(process(logits0, tokens0, jnp.asarray(0)), axis=-1)
    first = logp0.reshape(b, k, -1)[:, 0]
    row_lp, row_tok = jax.lax.top_k(first, k + 1)                # [B, k+1]
    (sum_lp, new_tok, _, fin_tok, fin_score, fin_ntext, fin_cnt) = select(
        jnp.asarray(0), row_lp, row_tok, jnp.zeros_like(row_tok),
        tokens0.reshape(b, k, t), fin_tok, fin_score, fin_ntext, fin_cnt)
    # cache rows of a sample are identical post-priming: no gather needed
    tokens = tokens0.at[:, 0].set(new_tok.reshape(-1))
    sum_lp = sum_lp.reshape(-1)                                  # [B*k]

    # per-sample completion step (number of generated tokens when the
    # finished set filled): with patience < 1 the finalize pad draws LIVE
    # beams, so a completed sample's live state must freeze at its own
    # completion point — the reference decodes one sample per transcribe()
    # call, and freezing keeps the batched loop batch-invariant (whisper's
    # own n_audio>1 mode would let other samples' runtimes leak into the
    # pad; we deliberately reproduce the per-sample semantics instead)
    i_done = jnp.where(fin_cnt >= n_cand, 1, t)

    def cond(state):
        i = state[0]
        fin_cnt = state[-2]
        return (i < t) & ~jnp.all(fin_cnt >= n_cand)

    def step_once(state):
        (i, tok, cache, sum_lp, tokens,
         fin_tok, fin_score, fin_ntext, fin_cnt, i_done) = state
        valid = i < t               # scalar: False only on group overshoot
        was_done = (fin_cnt >= n_cand) | ~valid                   # [B]
        logits, cache = decode_step(params, cfg, tok, cache)
        logp = jax.nn.log_softmax(process(logits, tokens, i), axis=-1)   # [B*k, V]
        row_lp, row_tok = jax.lax.top_k(logp, k + 1)             # [B*k, k+1]
        cand_lp = (sum_lp[:, None] + row_lp).reshape(b, k * (k + 1))
        cand_tok = row_tok.reshape(b, k * (k + 1))
        cand_src = jnp.broadcast_to(
            jnp.repeat(jnp.arange(k), k + 1)[None, :], (b, k * (k + 1)))

        (new_lp, new_tok, new_src, n_fin_tok, n_fin_score, n_fin_ntext,
         n_fin_cnt) = select(
            i, cand_lp, cand_tok, cand_src, tokens.reshape(b, k, t),
            fin_tok, fin_score, fin_ntext, fin_cnt)
        # overshoot sub-steps (i >= t after the while cond last held) must
        # not touch the finished set; completed samples' fin writes are
        # already no-ops (the slot < n_cand cap)
        fin_tok = jnp.where(valid, n_fin_tok, fin_tok)
        fin_score = jnp.where(valid, n_fin_score, fin_score)
        fin_ntext = jnp.where(valid, n_fin_ntext, fin_ntext)
        fin_cnt = jnp.where(valid, n_fin_cnt, fin_cnt)

        # freeze completed samples: live scores/tokens/cache rows keep the
        # state they had when the sample completed
        new_lp = jnp.where(was_done[:, None], sum_lp.reshape(b, k), new_lp)
        new_tok = jnp.where(was_done[:, None], eot, new_tok)
        new_src = jnp.where(was_done[:, None], jnp.arange(k)[None, :], new_src)
        i_done = jnp.where(~was_done & (fin_cnt >= n_cand), i + 1, i_done)

        src = (jnp.arange(b)[:, None] * k + new_src).reshape(-1)     # [B*k]
        cache = _gather_cache(cache, src)
        tokens = tokens[src].at[:, i].set(new_tok.reshape(-1))
        return (i + 1, new_tok.reshape(-1, 1), cache, new_lp.reshape(-1),
                tokens, fin_tok, fin_score, fin_ntext, fin_cnt, i_done)

    def body(state):
        for _ in range(group):
            state = step_once(state)
        return state

    state = (jnp.asarray(1), tokens[:, 0:1], cache, sum_lp, tokens,
             fin_tok, fin_score, fin_ntext, fin_cnt, i_done)
    (_, _, _, sum_lp, tokens,
     fin_tok, fin_score, fin_ntext, fin_cnt, i_done) = jax.lax.while_loop(
        cond, body, state)

    # finalize: if a sample has fewer than beam_size finished sequences, pad
    # with unfinished beams by descending sum-logprob (reference finalize:
    # reversed(np.argsort) — ties pick the higher beam index first)
    sum_lp_b = sum_lp.reshape(b, k)
    order = jnp.argsort(sum_lp_b, axis=1)[:, ::-1]               # [B, k]
    pad_lp = jnp.take_along_axis(sum_lp_b, order, axis=1)
    pad_rows = jnp.take_along_axis(
        tokens.reshape(b, k, t), order[:, :, None], axis=1)      # [B, k, T]
    slot = fin_cnt[:, None] + jnp.arange(k)[None, :]
    write = slot < k
    slot_c = jnp.clip(slot, 0, n_buf - 1)
    onehot = write[:, :, None] & (slot_c[:, :, None] == jnp.arange(n_buf)[None, None, :])
    any_w = onehot.any(axis=1)
    fin_score = jnp.where(
        any_w, jnp.einsum("bkc,bk->bc", onehot.astype(jnp.float32), pad_lp), fin_score)
    fin_ntext = jnp.where(any_w, i_done[:, None], fin_ntext)
    fin_tok = jnp.where(
        any_w[:, :, None],
        jnp.einsum("bkc,bkt->bct", onehot.astype(jnp.int32), pad_rows), fin_tok)

    # rank: whisper MaximumLikelihoodRanker over text length excluding eot
    lengths_f = fin_ntext.astype(jnp.float32)                    # [B, C]
    if length_penalty is None:
        norm = lengths_f
    else:
        norm = ((5.0 + lengths_f) / 6.0) ** length_penalty
    rank = fin_score / norm                                      # empty slots: -inf
    best = jnp.argmax(rank, axis=1)
    rows = jnp.arange(b)
    avg = fin_score[rows, best] / (fin_ntext[rows, best].astype(jnp.float32) + 1.0)
    return fin_tok[rows, best], avg


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
    """Feed the prompt tokens one-by-one through ``decode_step`` (static
    unroll). Requires a cache built with ``prompt_len=0`` (every token
    lands in the gen section) and a gen section sized for prompt +
    generation. Production paths prime with the single-pass
    ``models.whisper.prime_decode_cache`` instead; this unroll survives as
    the independent cross-check the prime tests compare against."""
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
    "cfg", "max_new_tokens", "eot", "suppress_ids", "begin_suppress_ids",
    "group"))
def greedy_decode(
    params: Dict,
    cfg: WhisperConfig,
    audio_features: jnp.ndarray,   # [B, 1500, D]
    prompt: jnp.ndarray,           # i32[B, P] (sot sequence)
    max_new_tokens: int = 224,
    eot: int = 50257,
    suppress_ids: tuple = (),
    begin_suppress_ids: tuple = (),
    group: int = 1,
) -> jnp.ndarray:
    """Returns i32[B, max_new_tokens], eot-padded after completion."""
    _check_context(cfg, prompt.shape[1], max_new_tokens)
    cache = init_decode_cache(params, cfg, audio_features,
                              prompt.shape[1], max_new_tokens)
    logits, _, cache = prime_decode_cache(params, cfg, prompt, cache)
    process = make_processor(cfg, eot, suppress_ids, begin_suppress_ids)
    out, _ = greedy_loop(params, cfg, logits, cache, process, max_new_tokens,
                         eot, group=group)
    return out


@functools.partial(jax.jit, static_argnames=(
    "cfg", "beam_size", "max_new_tokens", "eot", "suppress_ids",
    "begin_suppress_ids", "length_penalty", "patience", "group"))
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
    patience: Optional[float] = None,
    group: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched beam search.

    Returns (tokens i32[B, max_new_tokens] of the best beam, its average
    logprob f32[B]); selection follows whisper's MaximumLikelihoodRanker
    (Google-NMT normalization when ``length_penalty`` is given).
    """
    k = beam_size
    _check_context(cfg, prompt.shape[1], max_new_tokens)
    # cross K/V and prompt K/V computed + streamed once per sample (the
    # split cache); only generated K/V live per beam row
    cache = init_decode_cache(params, cfg, audio_features,
                              prompt.shape[1], max_new_tokens, beam_size=k)
    logits, _, cache = prime_decode_cache(params, cfg, prompt, cache)
    logits = jnp.repeat(logits, k, axis=0)
    process = make_processor(cfg, eot, suppress_ids, begin_suppress_ids)
    return beam_loop(params, cfg, logits, cache, process, k, max_new_tokens,
                     eot, length_penalty, patience, group=group)
