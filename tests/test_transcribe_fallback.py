"""Temperature-fallback / no-speech decoding tests."""

import base64

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lyricalignment_tpu.decode.transcribe import (
    compression_ratio,
    decode_with_fallback,
    no_speech_probs,
    sample_decode,
)
from lyricalignment_tpu.models.whisper import (
    WhisperConfig,
    encode_audio,
    init_whisper_params,
)

EOT = 30


class FakeTokenizer:
    eot = EOT
    sot = EOT + 1
    no_speech = EOT + 5
    has_bpe = False

    def decode(self, ids):
        return " ".join(map(str, ids))


@pytest.fixture(scope="module")
def setup():
    cfg = WhisperConfig(
        n_mels=80, n_vocab=40, n_audio_ctx=50, n_audio_state=32,
        n_audio_head=4, n_audio_layer=1, n_text_ctx=32, n_text_state=32,
        n_text_head=4, n_text_layer=1,
    )
    params = init_whisper_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((2, 80, 100)).astype(np.float32)
    xa = encode_audio(params, cfg, jnp.asarray(mel))
    prompt = jnp.asarray(np.array([[EOT + 1, EOT + 2]] * 2, np.int32))
    return cfg, params, xa, prompt


def test_compression_ratio():
    assert compression_ratio("") == 0.0
    assert compression_ratio("ab" * 60) > 2.4
    assert compression_ratio("The quick brown fox") < 1.5


def test_sample_decode_seed_determinism(setup):
    cfg, params, xa, prompt = setup
    t1, lp1 = sample_decode(params, cfg, xa, prompt, jax.random.PRNGKey(7),
                            temperature=0.8, max_new_tokens=6, eot=EOT)
    t2, lp2 = sample_decode(params, cfg, xa, prompt, jax.random.PRNGKey(7),
                            temperature=0.8, max_new_tokens=6, eot=EOT)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    t3, _ = sample_decode(params, cfg, xa, prompt, jax.random.PRNGKey(8),
                          temperature=0.8, max_new_tokens=6, eot=EOT)
    # different seed at temperature 0.8 should differ (overwhelmingly likely)
    assert not np.array_equal(np.asarray(t1), np.asarray(t3))
    # tokens respect the suppress mask
    assert (np.asarray(t1) <= EOT).all()


def test_no_speech_probs_shape(setup):
    cfg, params, xa, _ = setup
    p = np.asarray(no_speech_probs(params, cfg, xa, EOT + 1, EOT + 5))
    assert p.shape == (2,)
    assert ((p >= 0) & (p <= 1)).all()


def test_decode_with_fallback_structure(setup):
    cfg, params, xa, prompt = setup
    out = decode_with_fallback(params, cfg, xa, prompt, FakeTokenizer(),
                               beam_size=2, max_new_tokens=5,
                               temperatures=(0.0, 0.5))
    assert len(out) == 2
    for entry in out:
        assert set(entry) == {"tokens", "text", "avg_logprob", "no_speech_prob",
                              "compression_ratio", "temperature"}
        assert entry["temperature"] in (0.0, 0.5)
        assert all(t <= EOT for t in entry["tokens"])
