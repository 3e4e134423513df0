"""OpenAI whisper checkpoint import + timestamp-token pipeline tests."""

import numpy as np
import pytest
import torch

import jax

from lyricalignment_tpu.models.convert import load_openai_checkpoint
from lyricalignment_tpu.models.whisper import (
    WhisperConfig,
    encode_audio,
    init_whisper_params,
)
from lyricalignment_tpu.models.convert import align_params_to_state_dict


def make_openai_ckpt(tmp_path, cfg: WhisperConfig):
    """Synthesize a checkpoint in OpenAI's {'dims', 'model_state_dict'}
    format from our randomly-initialised params (via the exporter)."""
    params = init_whisper_params(jax.random.PRNGKey(5), cfg)
    sd_ours = align_params_to_state_dict({"whisper": params, "align_head": {
        "gru": {"layers": []}, "fc": {"w": np.zeros((1, 1)), "b": np.zeros(1)}}})
    sd = {k[len("whisper_model."):]: torch.from_numpy(v)
          for k, v in sd_ours.items() if k.startswith("whisper_model.")}
    dims = {
        "n_mels": cfg.n_mels, "n_vocab": cfg.n_vocab,
        "n_audio_ctx": cfg.n_audio_ctx, "n_audio_state": cfg.n_audio_state,
        "n_audio_head": cfg.n_audio_head, "n_audio_layer": cfg.n_audio_layer,
        "n_text_ctx": cfg.n_text_ctx, "n_text_state": cfg.n_text_state,
        "n_text_head": cfg.n_text_head, "n_text_layer": cfg.n_text_layer,
    }
    path = str(tmp_path / "model.pt")
    torch.save({"dims": dims, "model_state_dict": sd}, path)
    return path, params


def test_load_openai_checkpoint_roundtrip(tmp_path, rng):
    cfg = WhisperConfig(n_mels=80, n_vocab=64, n_audio_ctx=50, n_audio_state=32,
                        n_audio_head=4, n_audio_layer=1, n_text_ctx=12,
                        n_text_state=32, n_text_head=4, n_text_layer=1)
    path, original = make_openai_ckpt(tmp_path, cfg)
    loaded_cfg, loaded = load_openai_checkpoint(path)
    assert loaded_cfg.n_audio_state == 32
    assert loaded_cfg.n_vocab == 64

    mel = rng.standard_normal((1, 80, 100)).astype(np.float32)
    import jax.numpy as jnp

    a = np.asarray(encode_audio(original, cfg, jnp.asarray(mel)))
    b = np.asarray(encode_audio(loaded, loaded_cfg, jnp.asarray(mel)))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_timestamp_decoder_sequences(tmp_path):
    # with_timestamps pipeline path: <|t|> tokens around each char
    import base64

    from lyricalignment_tpu.data.pipeline import MultitaskExampleBuilder, PipelineConfig
    from lyricalignment_tpu.data.records import Record
    from lyricalignment_tpu.text.bert_tokenizer import (
        BertWordPieceTokenizer,
        make_synthetic_vocab,
    )
    from lyricalignment_tpu.text.pinyin import load_pronunciation_table
    from lyricalignment_tpu.text.whisper_tokenizer import WhisperTokenizer

    ranks = tmp_path / "ranks.tiktoken"
    ranks.write_text("\n".join(
        base64.b64encode(bytes([i])).decode() + f" {i}" for i in range(256)))
    wt = WhisperTokenizer(bpe_path=str(ranks))
    bert = BertWordPieceTokenizer(vocab=make_synthetic_vocab(size=300))
    table = load_pronunciation_table()
    cfg = PipelineConfig(with_timestamps=True, max_decoder_len=48)
    builder = MultitaskExampleBuilder(bert, wt, table, cfg)

    record = Record("x.wav", "你好", [[0.5, 1.0], [1.2, 2.0]])
    di, do = builder.decoder_sequences(record)
    # prompt: sot, <|zh|>, transcribe (no no_timestamps token)
    assert di[:3] == [wt.sot, wt.special_tokens["<|zh|>"], wt.transcribe]
    assert wt.no_timestamps not in di
    # per-char: <|0.50|> char-bytes <|1.00|> <|1.20|> char-bytes <|2.00|>
    assert di[3] == wt.timestamp_token(0.5)
    i_second = di.index(wt.timestamp_token(1.0))
    assert di[i_second + 1] == wt.timestamp_token(1.2)
    assert do[-1] == wt.eot

    # out-of-range timestamps raise (reference dataset.py:68-71)
    bad = Record("x.wav", "你", [[31.0, 32.0]])
    with pytest.raises(ValueError):
        builder.decoder_sequences(bad)
