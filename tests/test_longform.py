"""Long-form transcription tests: batched prompt priming, timestamp rules
vs an independent numpy oracle, segment parsing, and the sequential seek
loop on >30 s synthetic audio (reference behavior: model.transcribe via
`inference_transcript.py:88-91`)."""

import pytest as _pytest

pytestmark = _pytest.mark.slow  # sequential-seek integration; minutes on the 1-core host

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lyricalignment_tpu import N_SAMPLES
from lyricalignment_tpu.decode.beam import _prime_cache, greedy_decode
from lyricalignment_tpu.decode.longform import _greedy_window, transcribe_longform
from lyricalignment_tpu.decode.timestamps import parse_segments
from lyricalignment_tpu.models.whisper import (
    WhisperConfig,
    decode_step,
    decoder_logits,
    encode_audio,
    init_decode_cache,
    init_whisper_params,
    prime_decode_cache,
)


class TinyTokenizer:
    """Whisper special-token layout scaled down to a toy vocab."""

    def __init__(self):
        self.eot = 20
        self.sot = 21
        self.lang_id = 22
        self.task_id = 23
        self.sot_lm = 24
        self.sot_prev = 25
        self.no_speech = 26
        self.no_timestamps = 27
        self.timestamp_begin = 28
        self.n_vocab = 88  # 60 timestamp positions
        self.language = "zh"
        self.has_bpe = False

    @property
    def sot_sequence(self):
        return [self.sot, self.lang_id, self.task_id]


@pytest.fixture(scope="module")
def tok():
    return TinyTokenizer()


@pytest.fixture(scope="module")
def tiny(tok):
    cfg = WhisperConfig(
        n_mels=80, n_vocab=tok.n_vocab, n_audio_ctx=50, n_audio_state=32,
        n_audio_head=4, n_audio_layer=1, n_text_ctx=64, n_text_state=32,
        n_text_head=4, n_text_layer=2,
    )
    params = init_whisper_params(jax.random.PRNGKey(7), cfg)
    rng = np.random.default_rng(114514)
    mel = rng.standard_normal((1, 80, 100)).astype(np.float32)
    xa = encode_audio(params, cfg, jnp.asarray(mel))
    return cfg, params, xa


# ---------------------------------------------------------------------------
# prime_decode_cache
# ---------------------------------------------------------------------------

def test_prime_cache_matches_stepwise(tiny):
    cfg, params, xa = tiny
    rng = np.random.default_rng(3)
    L, P = 5, 9
    ptoks = rng.integers(0, 20, (1, L)).astype(np.int32)
    buf = np.full((1, P), 13, np.int32)
    buf[:, :L] = ptoks

    # split cache (prompt section + gen section) vs the all-gen stepwise
    # unroll (prompt_len=0): independent layouts, same math
    cache_a = init_decode_cache(params, cfg, xa, P, 6)
    logits_a, aux_a, cache_a = prime_decode_cache(
        params, cfg, jnp.asarray(buf), cache_a,
        length=jnp.asarray(L, jnp.int32), aux_index=jnp.asarray(2, jnp.int32))

    cache_b = init_decode_cache(params, cfg, xa, 0, P + 6)
    logits_b, cache_b = _prime_cache(params, cfg, jnp.asarray(ptoks), cache_b)

    np.testing.assert_allclose(np.asarray(logits_a), np.asarray(logits_b),
                               rtol=0, atol=2e-4)
    # aux logits match the teacher-forced full forward at that position
    full = np.asarray(decoder_logits(params, cfg, jnp.asarray(ptoks), xa))
    np.testing.assert_allclose(np.asarray(aux_a), full[:, 2], rtol=0, atol=2e-4)

    # continued generation agrees step by step (pad slots never leak)
    tok = jnp.argmax(logits_a, -1).astype(jnp.int32)[:, None]
    for _ in range(4):
        la, cache_a = decode_step(params, cfg, tok, cache_a)
        lb, cache_b = decode_step(params, cfg, tok, cache_b)
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=0, atol=2e-4)
        tok = jnp.argmax(la, -1).astype(jnp.int32)[:, None]


# ---------------------------------------------------------------------------
# timestamp rules vs independent numpy oracle
# ---------------------------------------------------------------------------

def _oracle_rules(row, seq, tok):
    """Independent re-statement of whisper's ApplyTimestampRules."""
    ts_begin, eot = tok.timestamp_begin, tok.eot
    logits = row.astype(np.float64).copy()
    logits[eot + 1: ts_begin] = -np.inf  # specials except eot; ts allowed

    last_was = len(seq) >= 1 and seq[-1] >= ts_begin
    penult_was = len(seq) < 2 or seq[-2] >= ts_begin
    if last_was:
        if penult_was:
            logits[ts_begin:] = -np.inf
        else:
            logits[:eot] = -np.inf
    ts = [t for t in seq if t >= ts_begin]
    if ts:
        floor = ts[-1] if (last_was and not penult_was) else ts[-1] + 1
        logits[ts_begin: floor] = -np.inf
    if len(seq) == 0:
        logits[:ts_begin] = -np.inf
        logits[ts_begin + 51:] = -np.inf  # max_initial_timestamp = 1.0 s
    m = logits.max()
    lp = logits - m - np.log(np.exp(logits - m).sum())
    with np.errstate(divide="ignore"):
        ts_mass = np.log(np.exp(lp[ts_begin:]).sum())
    if ts_mass > lp[:ts_begin].max():
        logits[:ts_begin] = -np.inf
    return int(np.argmax(logits))


def test_timestamp_greedy_matches_oracle(tiny, tok):
    cfg, params, xa = tiny
    sot_seq = tok.sot_sequence
    max_new = 16

    prompt = jnp.asarray(np.array([sot_seq], np.int32))
    got, _, _ = _greedy_window(
        params, cfg, xa, prompt,
        jnp.asarray(len(sot_seq), jnp.int32), jnp.asarray(0, jnp.int32),
        max_new, tok.eot, tok.no_speech, (), (), tok.timestamp_begin)
    got = [int(t) for t in np.asarray(got)[0]]

    # teacher-forced oracle: full decoder forward each step, numpy rules
    seq = []
    toks = list(sot_seq)
    for _ in range(max_new):
        logits = np.asarray(decoder_logits(
            params, cfg, jnp.asarray([toks]), xa))[0, -1]
        nxt = _oracle_rules(logits, seq, tok)
        seq.append(nxt)
        toks.append(nxt)
        if nxt == tok.eot:
            break
    seq += [tok.eot] * (max_new - len(seq))
    assert got == seq


def test_timestamp_structure(tiny, tok):
    """Rules hold on the decoded sequence itself: starts with a timestamp
    <= 1 s, timestamps non-decreasing, no timestamp triples."""
    cfg, params, xa = tiny
    prompt = jnp.asarray(np.array([tok.sot_sequence], np.int32))
    got, _, _ = _greedy_window(
        params, cfg, xa, prompt,
        jnp.asarray(3, jnp.int32), jnp.asarray(0, jnp.int32),
        20, tok.eot, tok.no_speech, (), (), tok.timestamp_begin)
    seq = [int(t) for t in np.asarray(got)[0]]
    gen = seq[: seq.index(tok.eot)] if tok.eot in seq else seq
    assert gen, "decoded nothing"
    assert gen[0] >= tok.timestamp_begin
    assert gen[0] <= tok.timestamp_begin + 50
    ts = [t for t in gen if t >= tok.timestamp_begin]
    assert ts == sorted(ts)
    run = 0
    for t in gen:
        run = run + 1 if t >= tok.timestamp_begin else 0
        assert run <= 2, "three consecutive timestamps"


def test_begin_suppress(tiny, tok):
    cfg, params, xa = tiny
    prompt = jnp.asarray(np.array([[tok.sot]], np.int32))
    base = np.asarray(greedy_decode(params, cfg, xa, prompt,
                                    max_new_tokens=4, eot=tok.eot))
    first = int(base[0, 0])
    sup = np.asarray(greedy_decode(params, cfg, xa, prompt, max_new_tokens=4,
                                   eot=tok.eot, begin_suppress_ids=(first,)))
    assert int(sup[0, 0]) != first
    # only the first position is affected by begin-suppression rules
    later = np.asarray(greedy_decode(params, cfg, xa, prompt, max_new_tokens=4,
                                     eot=tok.eot))
    np.testing.assert_array_equal(later, base)


# ---------------------------------------------------------------------------
# segment parsing / seek arithmetic
# ---------------------------------------------------------------------------

TS = 1000  # stand-in timestamp_begin for parser tests


def test_parse_segments_pairs():
    # <|0.00|> a b <|1.00|><|1.00|> c <|2.00|><|2.00|> d  (trailing open seg)
    toks = [TS + 0, 5, 6, TS + 50, TS + 50, 7, TS + 100, TS + 100, 8]
    segs, adv = parse_segments(toks, seek=0, segment_size=3000, ts_begin=TS)
    assert len(segs) == 2
    assert segs[0]["start"] == 0.0 and segs[0]["end"] == 1.0
    assert segs[1]["start"] == 1.0 and segs[1]["end"] == 2.0
    # seek to the end of the last complete pair: pos 100 * 2 mel frames
    assert adv == 200


def test_parse_segments_single_ending():
    # pair then a single final timestamp: everything consumed, full advance
    toks = [TS + 0, 5, TS + 50, TS + 50, 6, TS + 120]
    segs, adv = parse_segments(toks, seek=100, segment_size=3000, ts_begin=TS)
    assert len(segs) == 2
    assert segs[0]["start"] == pytest.approx(1.0)       # 100 frames offset
    assert segs[1]["end"] == pytest.approx(1.0 + 2.4)
    assert adv == 3000


def test_parse_segments_no_pairs():
    toks = [TS + 10, 4, 5, 6]
    segs, adv = parse_segments(toks, seek=0, segment_size=1500, ts_begin=TS)
    assert len(segs) == 1
    assert segs[0]["start"] == 0.0
    # whisper: duration comes from the LAST timestamp token (here the
    # leading <|0.20|>), falling back to window length only with none
    assert segs[0]["end"] == pytest.approx(0.2)
    assert adv == 1500

    toks = [4, 5, 6]
    segs, adv = parse_segments(toks, seek=0, segment_size=1500, ts_begin=TS)
    assert segs[0]["end"] == pytest.approx(15.0)
    assert adv == 1500

    # with a final timestamp, duration comes from it
    toks = [TS + 10, 4, 5, TS + 200]
    segs, adv = parse_segments(toks, seek=0, segment_size=1500, ts_begin=TS)
    assert segs[0]["end"] == pytest.approx(4.0)
    assert adv == 1500


# ---------------------------------------------------------------------------
# end-to-end sequential seek on > 30 s audio
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def longform_model(tok):
    cfg = WhisperConfig(
        n_mels=80, n_vocab=tok.n_vocab, n_audio_ctx=1500, n_audio_state=32,
        n_audio_head=4, n_audio_layer=1, n_text_ctx=64, n_text_state=32,
        n_text_head=4, n_text_layer=1,
    )
    params = init_whisper_params(jax.random.PRNGKey(11), cfg)
    return cfg, params


@pytest.mark.parametrize("beam_size", [1, 3])
def test_longform_monotonic_over_70s(longform_model, tok, beam_size):
    cfg, params = longform_model
    rng = np.random.default_rng(42)
    audio = (rng.standard_normal(int(2.3 * N_SAMPLES)) * 0.1).astype(np.float32)

    out = transcribe_longform(
        params, cfg, audio, tok, beam_size=beam_size,
        temperatures=(0.0,),  # gates untested here; ladder covered elsewhere
        logprob_threshold=-1e9,  # random weights: accept every window
        no_speech_threshold=2.0,
    )
    segs = out["segments"]
    assert segs, "no segments produced"
    starts = [s["start"] for s in segs]
    for s in segs:
        assert s["end"] >= s["start"] >= 0.0
        assert s["end"] <= len(audio) / 16000 + 30.0
    assert starts == sorted(starts), "segment starts must be monotonic"
    # seek progressed past the first window: audio is 69 s
    assert segs[-1]["end"] > 30.0
    assert out["language"] == "zh"


def test_longform_condition_on_previous_prompt_reset(longform_model, tok):
    """With condition_on_previous_text=False the result must still be valid
    and windows independent (smoke for the prompt-construction branch)."""
    cfg, params = longform_model
    rng = np.random.default_rng(1)
    audio = (rng.standard_normal(int(1.5 * N_SAMPLES)) * 0.1).astype(np.float32)
    out = transcribe_longform(
        params, cfg, audio, tok, beam_size=1, temperatures=(0.0,),
        condition_on_previous_text=False,
        logprob_threshold=-1e9, no_speech_threshold=2.0,
    )
    assert out["segments"]


def test_longform_no_speech_skip(longform_model, tok):
    """Forcing the no-speech gate skips every window: no segments, but the
    seek loop still terminates (whisper's should_skip branch)."""
    cfg, params = longform_model
    rng = np.random.default_rng(5)
    audio = (rng.standard_normal(int(1.2 * N_SAMPLES)) * 0.1).astype(np.float32)
    out = transcribe_longform(
        params, cfg, audio, tok, beam_size=1, temperatures=(0.0,),
        no_speech_threshold=-1.0,     # every window "silent"
        logprob_threshold=1e9,        # confidence can never override
    )
    assert out["segments"] == []
    assert out["text"] == ""


def test_longform_temperature_fallback_ladder(longform_model, tok):
    """An impossible compression-ratio gate pushes every window down the
    ladder to the final temperature rung."""
    cfg, params = longform_model
    rng = np.random.default_rng(6)
    audio = (rng.standard_normal(int(1.2 * N_SAMPLES)) * 0.1).astype(np.float32)
    out = transcribe_longform(
        params, cfg, audio, tok, beam_size=1, temperatures=(0.0, 0.7),
        compression_ratio_threshold=-1.0,  # never acceptable -> fall through
        logprob_threshold=-1e9, no_speech_threshold=2.0,
    )
    assert out["segments"]
    assert all(s["temperature"] == 0.7 for s in out["segments"])


def test_rule5_timestamp_mass_compares_against_eot(tok):
    """Rule 5 compares timestamp mass against the best NON-TIMESTAMP token
    (eot included), exactly as whisper — not just text tokens."""
    from lyricalignment_tpu.decode.timestamps import apply_timestamp_rules

    V = tok.n_vocab
    ts0 = tok.timestamp_begin
    n_ts = V - ts0
    logits = np.full((1, V), -10.0, np.float32)
    logits[0, 5] = 2.0                      # best text token
    logits[0, tok.eot] = 4.0                # best non-timestamp overall
    # timestamp mass ~ 3.0: above best text, below eot
    logits[0, ts0:] = 3.0 - np.log(n_ts)
    gen = np.full((1, 8), 5, np.int32)      # prior text token; i=1

    out = np.asarray(apply_timestamp_rules(
        jnp.asarray(logits), jnp.asarray(gen), jnp.asarray(1),
        ts_begin=ts0, eot=tok.eot))
    assert out[0, 5] > -1e29, "text wrongly suppressed: eot ignored in rule 5"

    # with eot low, the force fires and text IS suppressed
    logits[0, tok.eot] = -10.0
    out2 = np.asarray(apply_timestamp_rules(
        jnp.asarray(logits), jnp.asarray(gen), jnp.asarray(1),
        ts_begin=ts0, eot=tok.eot))
    assert out2[0, 5] < -1e29


def test_longform_explicit_max_new_tokens_clamped(longform_model, tok):
    """An oversized explicit max_new_tokens must be clamped to the context
    cap instead of silently overflowing the positional table."""
    cfg, params = longform_model
    rng = np.random.default_rng(9)
    audio = (rng.standard_normal(int(1.1 * N_SAMPLES)) * 0.1).astype(np.float32)
    out = transcribe_longform(
        params, cfg, audio, tok, beam_size=1, temperatures=(0.0,),
        max_new_tokens=10_000,
        logprob_threshold=-1e9, no_speech_threshold=2.0,
    )
    assert out["segments"]


# ---------------------------------------------------------------------------
# batched lockstep long-form: token-for-token vs the single-song seek loop
# ---------------------------------------------------------------------------

def _seg_key(s):
    return (s["start"], s["end"], tuple(s["tokens"]))


def test_longform_batched_matches_single_beam(longform_model, tok):
    """Two songs of different lengths advanced in lockstep (per-row prompt
    lengths -> per-row KV-cache positions) must produce exactly the
    segments of two independent single-song seek loops (beam search is
    deterministic)."""
    from lyricalignment_tpu.decode.longform import transcribe_longform_batched

    cfg, params = longform_model
    rng = np.random.default_rng(77)
    audios = [
        (rng.standard_normal(int(1.6 * N_SAMPLES)) * 0.1).astype(np.float32),
        (rng.standard_normal(int(2.3 * N_SAMPLES)) * 0.1).astype(np.float32),
    ]
    kw = dict(beam_size=3, temperatures=(0.0,),
              logprob_threshold=-1e9, no_speech_threshold=2.0)

    batched = transcribe_longform_batched(
        params, cfg, audios, tok, batch_size=2, **kw)
    singles = [transcribe_longform(params, cfg, a, tok, **kw) for a in audios]

    for got, want in zip(batched, singles):
        assert got["text"] == want["text"]
        assert [_seg_key(s) for s in got["segments"]] == \
               [_seg_key(s) for s in want["segments"]]


def test_longform_batched_overlap_groups(longform_model, tok):
    """overlap_groups=2 (round-robin lockstep groups hiding host bookkeeping
    behind the other group's device time) produces exactly the single-song
    results for every song, including a queue longer than the slot count."""
    from lyricalignment_tpu.decode.longform import transcribe_longform_batched

    cfg, params = longform_model
    rng = np.random.default_rng(79)
    audios = [
        (rng.standard_normal(int(f * N_SAMPLES)) * 0.1).astype(np.float32)
        for f in (1.6, 2.3, 1.2, 1.9, 1.3)
    ]
    kw = dict(beam_size=3, temperatures=(0.0,),
              logprob_threshold=-1e9, no_speech_threshold=2.0)

    grouped = transcribe_longform_batched(
        params, cfg, audios, tok, batch_size=2, overlap_groups=2, **kw)
    singles = [transcribe_longform(params, cfg, a, tok, **kw) for a in audios]

    for got, want in zip(grouped, singles):
        assert got["text"] == want["text"]
        assert [_seg_key(s) for s in got["segments"]] == \
               [_seg_key(s) for s in want["segments"]]


def test_longform_batched_queue_refill_greedy(longform_model, tok):
    """Three songs over a 2-slot batch: a finished song's slot is refilled
    from the queue (continuous batching) and every result still matches its
    single-song run, in input order."""
    from lyricalignment_tpu.decode.longform import transcribe_longform_batched

    cfg, params = longform_model
    rng = np.random.default_rng(78)
    audios = [
        (rng.standard_normal(int(1.2 * N_SAMPLES)) * 0.1).astype(np.float32),
        (rng.standard_normal(int(2.1 * N_SAMPLES)) * 0.1).astype(np.float32),
        (rng.standard_normal(int(1.4 * N_SAMPLES)) * 0.1).astype(np.float32),
    ]
    kw = dict(beam_size=1, temperatures=(0.0,),
              logprob_threshold=-1e9, no_speech_threshold=2.0)

    batched = transcribe_longform_batched(
        params, cfg, audios, tok, batch_size=2, **kw)
    singles = [transcribe_longform(params, cfg, a, tok, **kw) for a in audios]

    for got, want in zip(batched, singles):
        assert got["text"] == want["text"]
        assert [_seg_key(s) for s in got["segments"]] == \
               [_seg_key(s) for s in want["segments"]]


def test_longform_batched_no_speech_skip(longform_model, tok):
    """The batched no-speech gate: with a threshold every window trips and a
    logprob gate no decode clears, each song's seek loop must skip forward
    window by window and terminate with zero segments — exactly as the
    single-song loop does (whisper's silent-window skip,
    reference model.transcribe semantics)."""
    from lyricalignment_tpu.decode.longform import transcribe_longform_batched

    cfg, params = longform_model
    rng = np.random.default_rng(80)
    audios = [
        (rng.standard_normal(int(1.3 * N_SAMPLES)) * 0.1).astype(np.float32),
        (rng.standard_normal(int(2.2 * N_SAMPLES)) * 0.1).astype(np.float32),
    ]
    kw = dict(beam_size=1, temperatures=(0.0,),
              logprob_threshold=1e9,    # no decode is ever "confident"
              no_speech_threshold=0.0)  # every window reads as silent

    batched = transcribe_longform_batched(
        params, cfg, audios, tok, batch_size=2, **kw)
    singles = [transcribe_longform(params, cfg, a, tok, **kw) for a in audios]

    for got, want in zip(batched, singles):
        assert got["segments"] == [] == want["segments"]
        assert got["text"] == "" == want["text"]


def test_longform_batched_fallback_ladder(longform_model, tok):
    """Per-row temperature fallback in the batched loop: gates that never
    pass must walk every row through the whole temperature ladder and keep
    the final (highest-temperature) attempt — per-row ``settled``
    bookkeeping, the batched analogue of whisper's retry cascade. Sampled
    retries draw from a batch-shared RNG stream (documented deviation), so
    this checks the machinery, not token equality."""
    from lyricalignment_tpu.decode.longform import transcribe_longform_batched

    cfg, params = longform_model
    rng = np.random.default_rng(81)
    audios = [
        (rng.standard_normal(int(1.2 * N_SAMPLES)) * 0.1).astype(np.float32),
        (rng.standard_normal(int(1.7 * N_SAMPLES)) * 0.1).astype(np.float32),
    ]

    outs = transcribe_longform_batched(
        params, cfg, audios, tok, batch_size=2,
        beam_size=2, temperatures=(0.0, 0.4, 0.8),
        compression_ratio_threshold=-1.0,  # never passes: always retry
        logprob_threshold=1e9,
        no_speech_threshold=2.0)           # never silent: never skip

    for out in outs:
        assert out["segments"], "fallback ladder must still emit segments"
        for s in out["segments"]:
            assert s["temperature"] == 0.8  # final rung kept
            assert s["end"] >= s["start"] >= 0.0
