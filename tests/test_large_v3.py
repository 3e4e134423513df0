"""Whisper large-v3 family support: 128-mel frontend, 100-language
tokenizer layout (yue), named configs, checkpoint import.

The reference's WHISPER_DIM stops at ``large`` (`train_multitask.py:145-149`)
— the v3 family is a beyond-reference extension; its layout facts are pinned
against openai-whisper's published constants (eot/sot/timestamp ids)."""

import numpy as np

import jax
import jax.numpy as jnp

from lyricalignment_tpu.models.whisper import (
    WHISPER_CONFIGS,
    WHISPER_DIM,
    WhisperConfig,
    decode_step,
    encode_audio,
    init_decode_cache,
    init_whisper_params,
    prime_decode_cache,
)
from lyricalignment_tpu.ops.mel import log_mel_spectrogram, mel_filterbank
from lyricalignment_tpu.text.whisper_tokenizer import (
    WhisperTokenizer,
    num_languages_for_vocab,
)


def test_v3_configs_registered():
    v3 = WHISPER_CONFIGS["large-v3"]
    assert (v3.n_mels, v3.n_vocab) == (128, 51866)
    assert (v3.n_audio_state, v3.n_audio_head, v3.n_audio_layer) == (1280, 20, 32)
    assert v3.n_text_layer == 32
    turbo = WHISPER_CONFIGS["large-v3-turbo"]
    assert (turbo.n_mels, turbo.n_vocab) == (128, 51866)
    assert turbo.n_audio_layer == 32 and turbo.n_text_layer == 4
    assert WHISPER_DIM["large-v3"] == 1280
    # pre-v3 entries unchanged
    assert WHISPER_CONFIGS["large-v2"].n_mels == 80
    assert WHISPER_CONFIGS["large-v2"].n_vocab == 51865


def test_v3_tokenizer_layout():
    """openai-whisper's published v3 ids: 100 languages shift every special
    token after the language block up by one."""
    t3 = WhisperTokenizer(multilingual=True, language="zh",
                          num_languages=100)
    assert t3.eot == 50257 and t3.sot == 50258
    assert t3.special_tokens["<|yue|>"] == 50358
    assert t3.translate == 50359 and t3.transcribe == 50360
    assert t3.sot_lm == 50361 and t3.sot_prev == 50362
    assert t3.no_speech == 50363 and t3.no_timestamps == 50364
    assert t3.timestamp_begin == 50365
    assert t3.n_vocab == 51866

    # v2 layout unchanged by the num_languages plumbing
    t2 = WhisperTokenizer(multilingual=True, language="zh")
    assert t2.transcribe == 50359 and "<|yue|>" not in t2.special_tokens
    assert t2.timestamp_begin == 50364 and t2.n_vocab == 51865

    # sot sequence uses the shifted transcribe id
    assert t3.sot_sequence == [50258, t3.special_tokens["<|zh|>"], 50360]

    assert num_languages_for_vocab(51865) == 99
    assert num_languages_for_vocab(51866) == 100


def test_128_mel_filterbank_partition_of_unity():
    """Slaney filters (before area normalization) partition interior FFT
    bins: adjacent triangles sum to 1 — an oracle-free invariant that holds
    for librosa/whisper's shipped filters at any n_mels."""
    for n_mels in (80, 128):
        fb = mel_filterbank(16000, 400, n_mels).astype(np.float64)
        mel_pts_span = fb.shape  # (n_mels, 201)
        assert mel_pts_span == (n_mels, 201)
        # undo the 2/(bandwidth) normalization per filter
        from lyricalignment_tpu.ops.mel import _hz_to_mel, _mel_to_hz

        mel_pts = _mel_to_hz(np.linspace(_hz_to_mel(0.0), _hz_to_mel(8000.0),
                                         n_mels + 2))
        enorm = 2.0 / (mel_pts[2:] - mel_pts[:-2])
        tri = fb / enorm[:, None]
        cover = tri.sum(axis=0)
        # interior bins between the first and last triangle centers
        freqs = np.linspace(0, 8000, 201)
        interior = (freqs > mel_pts[1]) & (freqs < mel_pts[-2])
        np.testing.assert_allclose(cover[interior], 1.0, atol=5e-3)


def test_128_mel_spectrogram_shapes():
    rng = np.random.default_rng(0)
    audio = rng.standard_normal(16000).astype(np.float32) * 0.1
    m = log_mel_spectrogram(jnp.asarray(audio), n_mels=128)
    assert m.shape == (128, 100)
    assert np.isfinite(np.asarray(m)).all()
    m80 = log_mel_spectrogram(jnp.asarray(audio))
    assert m80.shape == (80, 100)


def test_v3_micro_model_end_to_end():
    """A v3-shaped micro model (128 mels, asymmetric turbo-style decoder)
    runs mel -> encoder -> primed cache -> decode_step."""
    cfg = WhisperConfig(n_mels=128, n_vocab=128, n_audio_ctx=50,
                        n_audio_state=32, n_audio_head=4, n_audio_layer=2,
                        n_text_ctx=24, n_text_state=32, n_text_head=4,
                        n_text_layer=1)
    params = init_whisper_params(jax.random.PRNGKey(0), cfg)

    rng = np.random.default_rng(1)
    audio = rng.standard_normal(16000).astype(np.float32) * 0.1
    from lyricalignment_tpu.ops.mel import log_mel, pad_or_trim

    mel = pad_or_trim(log_mel(jnp.asarray(audio)[None], n_mels=cfg.n_mels),
                      cfg.n_audio_ctx * 2, axis=-1)
    assert mel.shape == (1, 128, 100)
    xa = encode_audio(params, cfg, mel)
    assert xa.shape == (1, cfg.n_audio_ctx, cfg.n_audio_state)

    cache = init_decode_cache(params, cfg, xa, prompt_len=3,
                              max_new_tokens=4, beam_size=1)
    prompt = jnp.asarray([[5, 7, 9]], jnp.int32)
    logits, _, cache = prime_decode_cache(
        params, cfg, prompt, cache, length=jnp.asarray([3], jnp.int32))
    assert logits.shape == (1, cfg.n_vocab)
    step_logits, cache = decode_step(
        params, cfg, jnp.asarray([[11]], jnp.int32), cache)
    assert step_logits.shape == (1, cfg.n_vocab)
    assert np.isfinite(np.asarray(step_logits)).all()


def test_v3_openai_checkpoint_import(tmp_path):
    """A v3-dims OpenAI checkpoint imports with 128 mels + 51866 vocab
    (micro dims; the dims dict drives the config, not the name)."""
    from tests.test_convert_openai import make_openai_ckpt

    from lyricalignment_tpu.models.convert import load_openai_checkpoint

    cfg = WhisperConfig(n_mels=128, n_vocab=100, n_audio_ctx=50,
                        n_audio_state=32, n_audio_head=4, n_audio_layer=1,
                        n_text_ctx=12, n_text_state=32, n_text_head=4,
                        n_text_layer=1)
    path, original = make_openai_ckpt(tmp_path, cfg)
    loaded_cfg, loaded = load_openai_checkpoint(path)
    assert loaded_cfg.n_mels == 128

    rng = np.random.default_rng(2)
    mel = jnp.asarray(rng.standard_normal((1, 128, 100)).astype(np.float32))
    a = np.asarray(encode_audio(original, cfg, mel))
    b = np.asarray(encode_audio(loaded, loaded_cfg, mel))
    np.testing.assert_allclose(a, b, atol=1e-6)
