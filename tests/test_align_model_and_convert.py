"""AlignModel composition + checkpoint converter round-trip tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lyricalignment_tpu import EMBED_FRAMES, N_SAMPLES
from lyricalignment_tpu.models.align_model import (
    AlignModelConfig,
    apply,
    forward_from_audio,
    init_align_model,
)
from lyricalignment_tpu.models.convert import (
    align_params_from_state_dict,
    align_params_to_state_dict,
    whisper_params_from_state_dict,
)
from lyricalignment_tpu.models.whisper import WhisperConfig, init_whisper_params
from lyricalignment_tpu.ops.mel import log_mel_spectrogram


@pytest.fixture(scope="module")
def cfg():
    whisper = WhisperConfig(
        n_mels=80, n_vocab=64, n_audio_ctx=1500, n_audio_state=32,
        n_audio_head=4, n_audio_layer=1, n_text_ctx=24, n_text_state=32,
        n_text_head=4, n_text_layer=1,
    )
    return AlignModelConfig(whisper=whisper, hidden_dim=8, output_dim=11,
                            train_alignment=True, train_transcript=True)


@pytest.fixture(scope="module")
def params(cfg):
    return init_align_model(jax.random.PRNGKey(0), cfg)


def test_apply_shapes(cfg, params, rng):
    mel = jnp.asarray(rng.standard_normal((2, 80, 3000)).astype(np.float32))
    tokens = jnp.asarray(rng.integers(0, 64, (2, 5)).astype(np.int32))
    align, trans = apply(params, cfg, mel, tokens)
    assert align.shape == (2, 1500, 11)
    assert trans.shape == (2, 5, 64)


def test_forward_from_audio_training_mode(cfg, params, rng):
    audio = jnp.asarray(rng.standard_normal((1, 4 * 16000)).astype(np.float32))
    align, _ = forward_from_audio(params, cfg, audio, trim_to_input_length=False)
    assert align.shape == (1, 1500, 11)


def test_forward_from_audio_trims_to_length(cfg, params, rng):
    # 4 s -> 400 mel frames -> 200 encoder frames
    audio = jnp.asarray(rng.standard_normal((1, 4 * 16000)).astype(np.float32))
    align, _ = forward_from_audio(params, cfg, audio, trim_to_input_length=True)
    assert align.shape == (1, 200, 11)


def test_forward_from_audio_long_chunks(cfg, params, rng):
    # 40 s -> 4000 mel frames -> 2 windows -> 1500 + 500 = 2000 frames
    audio = jnp.asarray(rng.standard_normal((1, 40 * 16000)).astype(np.float32))
    align, trans = forward_from_audio(
        params, cfg, audio,
        y_in=jnp.asarray(rng.integers(0, 64, (1, 4)).astype(np.int32)),
        trim_to_input_length=True,
    )
    assert align.shape == (1, 2000, 11)
    assert trans.shape == (1, 4, 64)


def test_long_chunk_window_batching_matches_sequential(cfg, params, rng):
    # batching every 30 s window through the encoder at once must equal
    # encoding each window separately (the reference's sequential loop,
    # module/align_model.py:94-105)
    from lyricalignment_tpu.models.whisper import encode_audio
    from lyricalignment_tpu.ops.mel import pad_or_trim
    from lyricalignment_tpu import N_FRAMES

    mel = jnp.asarray(rng.standard_normal((1, 80, 4000)).astype(np.float32))
    padded = pad_or_trim(mel, 2 * N_FRAMES)
    windows = padded.reshape(1, 80, 2, N_FRAMES).transpose(0, 2, 1, 3).reshape(2, 80, N_FRAMES)
    batched = np.asarray(encode_audio(params["whisper"], cfg.whisper, windows))
    w0 = np.asarray(encode_audio(params["whisper"], cfg.whisper, padded[:, :, :N_FRAMES]))
    w1 = np.asarray(encode_audio(params["whisper"], cfg.whisper, padded[:, :, N_FRAMES:]))
    np.testing.assert_allclose(batched[0], w0[0], atol=1e-5)
    np.testing.assert_allclose(batched[1], w1[0], atol=1e-5)


def test_freeze_encoder_blocks_gradients(cfg, params, rng):
    frozen_cfg = AlignModelConfig(
        whisper=cfg.whisper, hidden_dim=8, output_dim=11,
        freeze_encoder=True, train_alignment=True, train_transcript=False,
    )
    mel = jnp.asarray(rng.standard_normal((1, 80, 3000)).astype(np.float32))

    def loss(p):
        align, _ = apply(p, frozen_cfg, mel)
        return (align ** 2).mean()

    grads = jax.grad(loss)(params)
    enc_norm = sum(
        float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads["whisper"]["encoder"])
    )
    head_norm = sum(
        float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads["align_head"])
    )
    assert enc_norm == 0.0
    assert head_norm > 0.0


def test_state_dict_round_trip(cfg, params):
    sd = align_params_to_state_dict(params)
    # keys follow the reference's naming
    assert "whisper_model.encoder.conv1.weight" in sd
    assert "align_rnn.rnn.weight_ih_l0_reverse" in sd
    assert "align_rnn.fc.bias" in sd
    restored = align_params_from_state_dict(sd, cfg)

    flat_a, _ = jax.tree_util.tree_flatten_with_path(
        {"whisper": params["whisper"], "align_head": params["align_head"]})
    flat_b, _ = jax.tree_util.tree_flatten_with_path(restored)
    # 'bidirectional' bools compare fine through tree flatten
    assert len(flat_a) == len(flat_b)
    for (pa, va), (pb, vb) in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb), atol=0,
                                   err_msg=str(pa))


def test_openai_style_state_dict_import(cfg, params):
    # whisper-only import path: strip prefix from exported dict
    sd = align_params_to_state_dict(params)
    whisper_sd = {k[len("whisper_model."):]: v for k, v in sd.items()
                  if k.startswith("whisper_model.")}
    restored = whisper_params_from_state_dict(whisper_sd, cfg.whisper)
    np.testing.assert_allclose(
        np.asarray(restored["decoder"]["token_embedding"]),
        np.asarray(params["whisper"]["decoder"]["token_embedding"]),
    )


def test_match_whisper_size_full_architecture():
    """import-{openai,hf} size matching must compare the FULL architecture:
    asymmetric published variants (distil-whisper's 2 decoder layers,
    ``*.en`` vocab 51864) must be refused rather than stored under a
    standard size name whose config later loads would disagree with."""
    import dataclasses

    from lyricalignment_tpu.cli.convert_checkpoint import match_whisper_size
    from lyricalignment_tpu.models.whisper import WHISPER_CONFIGS

    for name, wcfg in WHISPER_CONFIGS.items():
        # large and large-v2 are architecturally identical, so assert the
        # matched name resolves to the same architecture, not the same key
        matched = match_whisper_size(wcfg)
        assert matched is not None and WHISPER_CONFIGS[matched] == wcfg

    distil = dataclasses.replace(WHISPER_CONFIGS["large-v2"], n_text_layer=2)
    assert match_whisper_size(distil) is None
    en = dataclasses.replace(WHISPER_CONFIGS["medium"], n_vocab=51864)
    assert match_whisper_size(en) is None
