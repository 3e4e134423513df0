"""Token-for-token beam-search parity against an independent numpy oracle.

The reference's CER flows through whisper's ``model.transcribe(...,
beam_size=5)`` (`/root/reference/inference_transcript.py:88-91`), i.e. the
exact bookkeeping of whisper's BeamSearchDecoder (finished sequences leave
the beam and free live slots, the finished set keeps the first
``round(beam_size * patience)`` arrivals, completion once every sample has
that many), its finalize (pad unfinished beams by descending sum-logprob,
ties to the higher beam index), and MaximumLikelihoodRanker (normalize by
text length EXCLUDING eot; Google-NMT formula under a length penalty).

``oracle_beam_decode`` below is an independent numpy implementation of that
published algorithm (dict-based, per-sample, no JAX). The tests drive
``decode.beam.beam_loop`` through a fake hash-chained model — logits depend
on the FULL token history via a rolling hash carried in the KV-cache slot,
so any error in beam-row cache gathering also surfaces — and assert
token-for-token and score agreement over randomized tables, mixed eot
timing, batch > 1, length penalties, patience > 1, and budget exhaustion.
Integer-valued logits make exact score ties common, exercising the
tie-break rules (candidate insertion order; argsort reversal) on both sides.

A final integration case runs the real tiny-model ``beam_search`` against
the oracle driven by teacher-forced full forwards.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lyricalignment_tpu.decode import beam as beam_mod

HASH_MOD = 997
HASH_MUL = 31


def np_log_softmax(x):
    x = np.asarray(x, np.float32)
    m = x.max(axis=-1, keepdims=True)
    s = x - m
    return s - np.log(np.exp(s).sum(axis=-1, keepdims=True), dtype=np.float32)


# ---------------------------------------------------------------------------
# the oracle: whisper BeamSearchDecoder.update/finalize + ranker, in numpy
# ---------------------------------------------------------------------------

def oracle_beam_decode(logprobs_for, k, max_new, eot,
                       length_penalty=None, patience=None):
    """Decode ONE sample. ``logprobs_for(seq_tuple) -> np.f32[V]`` returns the
    next-token log-probabilities given the generated-token history.

    Returns (tokens list[max_new] eot-padded, avg_logprob float)."""
    max_candidates = int(round((patience if patience is not None else 1.0) * k))
    beams = [()] * k
    sums = np.zeros(k, np.float32)
    finished = {}        # seq tuple (incl. eot) -> sum_logprob, insertion-ordered
    n_steps = 0
    for i in range(max_new):
        scores, sources = {}, {}
        for j in range(k):
            lp = logprobs_for(beams[j])
            order = np.argsort(-lp, kind="stable")[: k + 1]   # ties: lower id
            for tkn in order:
                seq = beams[j] + (int(tkn),)
                scores[seq] = np.float32(sums[j] + lp[tkn])
                sources[seq] = j
        new_beams, new_sums, fin_step = [], [], {}
        for seq in sorted(scores, key=scores.get, reverse=True):
            if seq[-1] == eot:
                fin_step[seq] = scores[seq]
            else:
                new_beams.append(seq)
                new_sums.append(scores[seq])
                if len(new_beams) == k:
                    break
        for seq, sc in fin_step.items():          # already in score order
            if len(finished) >= max_candidates:
                break
            finished[seq] = sc
        beams, sums = new_beams, np.array(new_sums, np.float32)
        n_steps = i + 1
        if len(finished) >= max_candidates:
            break
    if len(finished) < k:
        for j in list(np.argsort(sums))[::-1]:    # desc; ties: higher index
            if len(finished) >= k:
                break
            finished[beams[j] + (eot,)] = np.float32(sums[j])

    def penalty(n):
        if length_penalty is None:
            return float(n)
        return ((5.0 + n) / 6.0) ** length_penalty

    items = list(finished.items())
    ranks = []
    for seq, sc in items:
        p = penalty(len(seq) - 1)
        # the reference raises ZeroDivisionError on empty text; mirror the
        # jax implementation's IEEE semantics instead (sc < 0 -> -inf)
        ranks.append(float(sc) / p if p != 0 else -np.inf)
    best = int(np.argmax(ranks))
    seq, sc = items[best]
    n_text = len(seq) - 1
    out = list(seq[:-1]) + [eot] * (max_new - n_text)
    return out, float(sc) / (n_text + 1)


# ---------------------------------------------------------------------------
# fake hash-chained model shared by oracle and beam_loop
# ---------------------------------------------------------------------------

def make_table(seed, vocab, eot):
    """Integer-valued logit table [HASH_MOD, V]: exact f32 values make score
    ties common, exercising tie-break rules; the eot column is boosted in a
    third of the rows so sequences finish at mixed times."""
    rng = np.random.default_rng(seed)
    table = rng.integers(-4, 5, size=(HASH_MOD, vocab)).astype(np.float32)
    boost = rng.random(HASH_MOD) < 0.33
    table[boost, eot] += 5.0
    table[~boost, eot] -= 3.0
    return table


def run_jax_beam(table, h0_scalar, b, k, max_new, eot, monkeypatch,
                 length_penalty=None, patience=None):
    table_j = jnp.asarray(table)

    def fake_decode_step(params, cfg, tok, cache):
        h = (cache["blocks"][0]["h"] * HASH_MUL + tok[:, 0]) % HASH_MOD
        return table_j[h], {"pos": cache["pos"] + 1, "blocks": [{"h": h}]}

    monkeypatch.setattr(beam_mod, "decode_step", fake_decode_step)
    h0 = jnp.full((b * k,), h0_scalar, jnp.int32)
    cache = {"pos": jnp.asarray(0), "blocks": [{"h": h0}]}
    logits0 = table_j[h0]
    toks, avg = beam_mod.beam_loop(
        None, None, logits0, cache, lambda l, g, i: l, k, max_new, eot,
        length_penalty, patience)
    return np.asarray(toks), np.asarray(avg)


def oracle_for_table(table, h0_scalar, k, max_new, eot, **kw):
    def logprobs_for(seq):
        h = h0_scalar
        for t in seq:
            h = (h * HASH_MUL + t) % HASH_MOD
        return np_log_softmax(table[h])
    return oracle_beam_decode(logprobs_for, k, max_new, eot, **kw)


CASES = [
    # (seed, k, max_new, length_penalty, patience)
    (0, 5, 12, None, None),
    (1, 3, 10, None, None),
    (2, 5, 12, 1.0, None),
    (3, 5, 12, 0.6, None),
    (4, 2, 16, None, None),
    (5, 5, 12, None, 2.0),     # patience: finished set larger than beam
    (6, 4, 6, None, None),     # tight budget: finalize padding path
    (7, 1, 10, None, None),    # beam-1
    (8, 5, 24, None, None),
    (9, 3, 12, 0.8, 1.5),
    (10, 5, 12, None, 0.6),    # patience < 1: finished set SMALLER than
                               # beam (whisper allows round(k*p) >= 1);
                               # finalize pads the remainder with live beams
    (11, 4, 10, 1.0, 0.5),     # patience < 1 with length penalty
    (12, 3, 14, None, 0.34),   # max_candidates == 1: earliest finisher wins
]


@pytest.mark.parametrize("seed,k,max_new,lp,patience", CASES)
def test_beam_loop_matches_whisper_oracle(seed, k, max_new, lp, patience,
                                          monkeypatch):
    vocab, eot = 16, 15
    table = make_table(seed, vocab, eot)
    b = 3
    h0s = [(seed * 7 + s * 13 + 1) % HASH_MOD for s in range(b)]
    # batch the jax side with DIFFERENT start hashes per sample by priming
    # each sample's rows with its own h0
    table_j = jnp.asarray(table)

    def fake_decode_step(params, cfg, tok, cache):
        h = (cache["blocks"][0]["h"] * HASH_MUL + tok[:, 0]) % HASH_MOD
        return table_j[h], {"pos": cache["pos"] + 1, "blocks": [{"h": h}]}

    monkeypatch.setattr(beam_mod, "decode_step", fake_decode_step)
    h0 = jnp.asarray(np.repeat(np.array(h0s, np.int32), k))
    cache = {"pos": jnp.asarray(0), "blocks": [{"h": h0}]}
    logits0 = table_j[h0]
    toks, avg = beam_mod.beam_loop(
        None, None, logits0, cache, lambda l, g, i: l, k, max_new, eot,
        lp, patience)
    toks, avg = np.asarray(toks), np.asarray(avg)

    for s in range(b):
        want_toks, want_avg = oracle_for_table(
            table, h0s[s], k, max_new, eot, length_penalty=lp, patience=patience)
        assert toks[s].tolist() == want_toks, (
            f"sample {s}: got {toks[s].tolist()} want {want_toks}")
        np.testing.assert_allclose(avg[s], want_avg, rtol=1e-5, atol=1e-6)


def test_beam_loop_matches_oracle_all_finish_early(monkeypatch):
    # every row strongly favors eot: finished set fills on the first steps
    vocab, eot = 8, 7
    table = np.zeros((HASH_MOD, vocab), np.float32)
    rng = np.random.default_rng(42)
    table[:] = rng.integers(-2, 3, size=(HASH_MOD, vocab))
    table[:, eot] += 4.0
    toks, avg = run_jax_beam(table, 5, 1, 3, 10, eot, monkeypatch)
    want_toks, want_avg = oracle_for_table(table, 5, 3, 10, eot)
    assert toks[0].tolist() == want_toks
    np.testing.assert_allclose(avg[0], want_avg, rtol=1e-5)


def test_beam_loop_matches_oracle_never_finish(monkeypatch):
    # eot never competitive: budget exhaustion + finalize padding only
    vocab, eot = 8, 7
    rng = np.random.default_rng(43)
    table = rng.integers(-3, 4, size=(HASH_MOD, vocab)).astype(np.float32)
    table[:, eot] = -50.0
    toks, avg = run_jax_beam(table, 11, 1, 4, 8, eot, monkeypatch)
    want_toks, want_avg = oracle_for_table(table, 11, 4, 8, eot)
    assert toks[0].tolist() == want_toks
    np.testing.assert_allclose(avg[0], want_avg, rtol=1e-5)


# ---------------------------------------------------------------------------
# integration: the real tiny model through the public beam_search entry
# ---------------------------------------------------------------------------

def test_beam_search_real_model_matches_oracle():
    from lyricalignment_tpu.models.whisper import (
        WhisperConfig, decoder_logits, encode_audio, init_whisper_params)

    eot = 30
    cfg = WhisperConfig(
        n_mels=80, n_vocab=40, n_audio_ctx=50, n_audio_state=32,
        n_audio_head=4, n_audio_layer=1, n_text_ctx=48, n_text_state=32,
        n_text_head=4, n_text_layer=1)
    params = init_whisper_params(jax.random.PRNGKey(7), cfg)
    rng = np.random.default_rng(1234)
    mel = rng.standard_normal((2, 80, 100)).astype(np.float32)
    xa = encode_audio(params, cfg, jnp.asarray(mel))
    prompt = jnp.asarray(np.array([[eot + 1, eot + 2]] * 2, np.int32))

    from lyricalignment_tpu.decode.beam import beam_search
    toks, avg = beam_search(params, cfg, xa, prompt, beam_size=4,
                            max_new_tokens=10, eot=eot)
    toks, avg = np.asarray(toks), np.asarray(avg)

    for s in range(2):
        def logprobs_for(seq, s=s):
            full = [int(x) for x in np.asarray(prompt)[s]] + list(seq)
            logits = np.asarray(decoder_logits(
                params, cfg, jnp.asarray([full]), xa[s: s + 1]))[0, -1].copy()
            logits[eot + 1:] = beam_mod.NEG_INF     # the default suppress mask
            return np_log_softmax(logits)

        want_toks, want_avg = oracle_beam_decode(logprobs_for, 4, 10, eot)
        assert toks[s].tolist() == want_toks, (
            f"sample {s}: got {toks[s].tolist()} want {want_toks}")
        np.testing.assert_allclose(avg[s], want_avg, rtol=1e-4, atol=1e-5)
