"""High-level API test: model dir -> LyricAligner -> alignment."""

import json
import os

import jax
import numpy as np
import pytest

from lyricalignment_tpu.api import LyricAligner
from lyricalignment_tpu.data.audio_io import write_wav
from lyricalignment_tpu.models.align_model import AlignModelConfig, init_align_model
from lyricalignment_tpu.models.whisper import WhisperConfig
from lyricalignment_tpu.train.checkpoints import save_json, save_pytree


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("model")
    # micro model in the on-disk format the train CLI produces
    mcfg = AlignModelConfig(
        whisper=WhisperConfig(n_audio_state=384, n_audio_head=6, n_audio_layer=1,
                              n_text_state=384, n_text_head=6, n_text_layer=1),
        hidden_dim=8, output_dim=21129,
    )
    params = init_align_model(jax.random.PRNGKey(0), mcfg)
    save_json(str(d / "args.json"), {"whisper_model": "tiny", "use_ctc_loss": True})
    save_json(str(d / "model_args.json"), {
        "embed_dim": 384, "hidden_dim": 384, "output_dim": 21129,
        "bidirectional": True, "freeze_encoder": False,
        "train_alignment": True, "train_transcript": False,
    })
    # note: tiny config is 4 layers; our params are 1-layer — so save params
    # for the real tiny shape instead
    tiny_cfg = AlignModelConfig(
        whisper=WhisperConfig(n_audio_state=384, n_audio_head=6, n_audio_layer=4,
                              n_text_state=384, n_text_head=6, n_text_layer=4),
        hidden_dim=384, output_dim=21129,
    )
    params = init_align_model(jax.random.PRNGKey(0), tiny_cfg)
    save_pytree(str(d / "best_model"), {"params": params, "step": 0})
    return str(d)


def test_aligner_from_model_dir(model_dir, tmp_path):
    wav = str(tmp_path / "x.wav")
    rng = np.random.default_rng(0)
    write_wav(wav, (rng.standard_normal(2 * 16000) * 0.1).astype(np.float32))

    aligner = LyricAligner.from_model_dir(model_dir, synthetic_vocab=True,
                                          use_ctc=True, bucket_seconds=2.0)
    segments = aligner.align(wav, "你好")
    assert len(segments) == 2
    for on, off, ch in segments:
        assert 0.0 <= on <= off <= 2.0
    assert segments[0][2] == "你" and segments[1][2] == "好"
    assert segments[0][1] <= segments[1][0] or segments[0][0] <= segments[1][0]

    err = aligner.mae(wav, "你好", [[0.1, 0.5], [0.6, 1.0]])
    assert np.isfinite(err) and err >= 0


def test_aligner_requires_vocab(model_dir):
    with pytest.raises(ValueError):
        LyricAligner.from_model_dir(model_dir)


def test_aligner_transcribe_longform_route(model_dir, tmp_path):
    """>30 s audio goes through the sequential long-form decoder; without a
    BPE ranks file the text is the token-id rendering (still a str)."""
    wav = str(tmp_path / "long35.wav")
    rng = np.random.default_rng(1)
    write_wav(wav, (rng.standard_normal(35 * 16000) * 0.05).astype(np.float32))

    aligner = LyricAligner.from_model_dir(model_dir, synthetic_vocab=True)
    text = aligner.transcribe(wav, beam_size=1, max_new_tokens=12)
    assert isinstance(text, str)

    # independent-window fallback also runs
    text2 = aligner.transcribe(wav, beam_size=1, fast_windows=True,
                               max_new_tokens=8)
    assert isinstance(text2, str)


def test_load_model_dir_bf16_resident_weights(model_dir):
    """--bf16 makes the whisper matmul weights bf16-RESIDENT (half the
    per-forward weight stream; numerics identical to the per-op cast) while
    the decoder embedding tables stay f32 — the unembedding logit matmul
    deliberately runs in f32 (avg_logprob / no-speech gates), so a
    bf16-rounded token_embedding would shift decode scores — and the align
    head stays f32; default load also turns on the one-pass encoder."""
    import jax.numpy as jnp

    from lyricalignment_tpu.cli.common import load_model_dir

    mcfg, params, _ = load_model_dir(model_dir, use_bf16=True)
    assert mcfg.whisper.compute_dtype == jnp.bfloat16
    assert mcfg.whisper.onepass_encoder
    dec = params["whisper"]["decoder"]
    assert dec["token_embedding"].dtype == jnp.float32
    assert dec["positional_embedding"].dtype == jnp.float32
    emb_ids = {id(dec["token_embedding"]), id(dec["positional_embedding"])}
    w_leaves = [x for x in jax.tree_util.tree_leaves(params["whisper"])
                if id(x) not in emb_ids]
    assert all(x.dtype == jnp.bfloat16 for x in w_leaves if x.ndim >= 2)
    h_leaves = jax.tree_util.tree_leaves(params["align_head"])
    assert all(x.dtype != jnp.bfloat16 for x in h_leaves)

    mcfg32, params32, _ = load_model_dir(model_dir)  # no bf16: untouched
    assert mcfg32.whisper.compute_dtype == jnp.float32
    assert all(x.dtype == jnp.float32
               for x in jax.tree_util.tree_leaves(params32["whisper"])
               if x.ndim >= 2)
