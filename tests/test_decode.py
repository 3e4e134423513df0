"""Decode tests: greedy vs naive reference loop, beam-search properties."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lyricalignment_tpu.decode.beam import beam_search, greedy_decode
from lyricalignment_tpu.models.whisper import (
    WhisperConfig,
    decoder_logits,
    encode_audio,
    init_whisper_params,
)

EOT = 30  # small-vocab stand-in for <|endoftext|>


@pytest.fixture(scope="module")
def cfg():
    # specials live at ids >= EOT, like whisper's layout
    return WhisperConfig(
        n_mels=80, n_vocab=40, n_audio_ctx=50, n_audio_state=32,
        n_audio_head=4, n_audio_layer=1, n_text_ctx=32, n_text_state=32,
        n_text_head=4, n_text_layer=1,
    )


@pytest.fixture(scope="module")
def setup(cfg):
    rng = np.random.default_rng(114514)
    params = init_whisper_params(jax.random.PRNGKey(2), cfg)
    mel = rng.standard_normal((2, 80, 100)).astype(np.float32)
    xa = encode_audio(params, cfg, jnp.asarray(mel))
    prompt = jnp.asarray(np.array([[EOT + 1, EOT + 2], [EOT + 1, EOT + 2]], np.int32))
    return params, xa, prompt


def naive_greedy(params, cfg, xa, prompt, max_new, eot):
    """Teacher-forced re-scoring loop (no cache) as oracle."""
    tokens = np.asarray(prompt).tolist()
    out = [[] for _ in range(len(tokens))]
    done = [False] * len(tokens)
    for _ in range(max_new):
        logits = np.asarray(decoder_logits(params, cfg, jnp.asarray(tokens), xa))
        step = logits[:, -1].copy()
        # suppress specials except eot
        step[:, eot + 1:] = -1e30
        nxt = step.argmax(-1)
        for b in range(len(tokens)):
            tok = eot if done[b] else int(nxt[b])
            out[b].append(tok)
            tokens[b] = tokens[b] + [tok]
            done[b] = done[b] or tok == eot
        if all(done):
            break
    for b in range(len(out)):
        out[b] += [eot] * (max_new - len(out[b]))
    return np.array(out)


def test_greedy_matches_naive_loop(cfg, setup):
    params, xa, prompt = setup
    got = np.asarray(greedy_decode(params, cfg, xa, prompt, max_new_tokens=8, eot=EOT))
    expected = naive_greedy(params, cfg, xa, prompt, 8, EOT)
    np.testing.assert_array_equal(got, expected)


def test_greedy_suppresses_specials(cfg, setup):
    params, xa, prompt = setup
    out = np.asarray(greedy_decode(params, cfg, xa, prompt, max_new_tokens=8, eot=EOT))
    assert ((out <= EOT)).all()


def test_beam_size_1_equals_greedy(cfg, setup):
    params, xa, prompt = setup
    greedy = np.asarray(greedy_decode(params, cfg, xa, prompt, max_new_tokens=6, eot=EOT))
    beam, _ = beam_search(params, cfg, xa, prompt, beam_size=1,
                          max_new_tokens=6, eot=EOT)
    np.testing.assert_array_equal(np.asarray(beam), greedy)


def test_beam_score_not_worse_than_greedy(cfg, setup):
    params, xa, prompt = setup
    max_new = 6

    def seq_avg_logprob(tokens_row, b):
        # score a generated row by teacher-forcing (sum logp / length)
        toks = list(np.asarray(prompt)[b]) + [t for t in tokens_row]
        logits = np.asarray(decoder_logits(params, cfg,
                                           jnp.asarray([toks[:-1]]), xa[b: b + 1]))[0]
        logp = jax.nn.log_softmax(jnp.asarray(logits), -1)
        total, n = 0.0, 0
        start = prompt.shape[1] - 1
        for i in range(start, len(toks) - 1):
            total += float(logp[i, toks[i + 1]])
            n += 1
            if toks[i + 1] == EOT:
                break
        return total / max(n, 1)

    greedy = np.asarray(greedy_decode(params, cfg, xa, prompt,
                                      max_new_tokens=max_new, eot=EOT))
    beam, scores = beam_search(params, cfg, xa, prompt, beam_size=4,
                               max_new_tokens=max_new, eot=EOT)
    beam = np.asarray(beam)
    for b in range(2):
        g = seq_avg_logprob(greedy[b], b)
        bm = seq_avg_logprob(beam[b], b)
        assert bm >= g - 1e-4, (b, bm, g)


def test_beam_batch_independence(cfg, setup):
    params, xa, prompt = setup
    both, _ = beam_search(params, cfg, xa, prompt, beam_size=3,
                          max_new_tokens=6, eot=EOT)
    solo, _ = beam_search(params, cfg, xa[:1], prompt[:1], beam_size=3,
                          max_new_tokens=6, eot=EOT)
    np.testing.assert_array_equal(np.asarray(both)[0], np.asarray(solo)[0])


@pytest.mark.parametrize("group", [2, 3, 4, 7])
def test_grouped_decode_equals_ungrouped(cfg, setup, group):
    """K-grouped while_loop bodies are token-for-token equal to group=1 —
    incl. groups that overshoot max_new_tokens (7 does not divide 8/9) and
    early-eot samples inside a group."""
    params, xa, prompt = setup
    g1 = np.asarray(greedy_decode(params, cfg, xa, prompt,
                                  max_new_tokens=8, eot=EOT))
    gk = np.asarray(greedy_decode(params, cfg, xa, prompt,
                                  max_new_tokens=8, eot=EOT, group=group))
    np.testing.assert_array_equal(gk, g1)

    b1, s1 = beam_search(params, cfg, xa, prompt, beam_size=3,
                         max_new_tokens=9, eot=EOT)
    bk, sk = beam_search(params, cfg, xa, prompt, beam_size=3,
                         max_new_tokens=9, eot=EOT, group=group)
    np.testing.assert_array_equal(np.asarray(bk), np.asarray(b1))
    np.testing.assert_allclose(np.asarray(sk), np.asarray(s1), rtol=1e-6)


@pytest.mark.parametrize("bad", [0, -1])
def test_group_below_one_raises(cfg, setup, bad):
    """group <= 0 would make the while_loop body a no-op and hang the device
    loop forever — rejected at trace time."""
    params, xa, prompt = setup
    with pytest.raises(ValueError, match="decode group"):
        greedy_decode(params, cfg, xa, prompt, max_new_tokens=4, eot=EOT,
                      group=bad)
    with pytest.raises(ValueError, match="decode group"):
        beam_search(params, cfg, xa, prompt, beam_size=3, max_new_tokens=4,
                    eot=EOT, group=bad)


def test_decode_context_overflow_raises(cfg, setup):
    params, xa, prompt = setup
    with pytest.raises(ValueError, match="decoder context"):
        greedy_decode(params, cfg, xa, prompt, max_new_tokens=cfg.n_text_ctx + 1, eot=EOT)
    with pytest.raises(ValueError, match="decoder context"):
        beam_search(params, cfg, xa, prompt, beam_size=2,
                    max_new_tokens=cfg.n_text_ctx + 1, eot=EOT)
