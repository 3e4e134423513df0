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


# ---------------------------------------------------------------------------
# Golden key list: de-circularized naming contract (VERDICT r2 #8)
# ---------------------------------------------------------------------------

def _golden_whisper_keys(n_audio_layer, n_text_layer):
    """The exact state-dict key set of a real ``whisper.Whisper`` module,
    hard-coded from the upstream module structure (AudioEncoder /
    TextDecoder / ResidualAttentionBlock / MultiHeadAttention) rather than
    derived from this repo's exporter. ``encoder.positional_embedding`` is a
    persistent registered buffer, so torch includes it."""
    keys = {
        "encoder.conv1.weight", "encoder.conv1.bias",
        "encoder.conv2.weight", "encoder.conv2.bias",
        "encoder.positional_embedding",
        "encoder.ln_post.weight", "encoder.ln_post.bias",
        "decoder.token_embedding.weight",
        "decoder.positional_embedding",
        "decoder.ln.weight", "decoder.ln.bias",
    }

    def attn(prefix):
        return {
            f"{prefix}.query.weight", f"{prefix}.query.bias",
            f"{prefix}.key.weight",                      # no key bias
            f"{prefix}.value.weight", f"{prefix}.value.bias",
            f"{prefix}.out.weight", f"{prefix}.out.bias",
        }

    for i in range(n_audio_layer):
        p = f"encoder.blocks.{i}"
        keys |= attn(f"{p}.attn")
        keys |= {f"{p}.attn_ln.weight", f"{p}.attn_ln.bias",
                 f"{p}.mlp_ln.weight", f"{p}.mlp_ln.bias",
                 f"{p}.mlp.0.weight", f"{p}.mlp.0.bias",
                 f"{p}.mlp.2.weight", f"{p}.mlp.2.bias"}
    for i in range(n_text_layer):
        p = f"decoder.blocks.{i}"
        keys |= attn(f"{p}.attn") | attn(f"{p}.cross_attn")
        keys |= {f"{p}.attn_ln.weight", f"{p}.attn_ln.bias",
                 f"{p}.cross_attn_ln.weight", f"{p}.cross_attn_ln.bias",
                 f"{p}.mlp_ln.weight", f"{p}.mlp_ln.bias",
                 f"{p}.mlp.0.weight", f"{p}.mlp.0.bias",
                 f"{p}.mlp.2.weight", f"{p}.mlp.2.bias"}
    return keys


def _golden_align_rnn_keys(num_layers=2, bidirectional=True):
    """nn.GRU + nn.Linear naming, hard-coded from torch's parameter layout
    (verified against torch.nn.GRU(...).state_dict())."""
    keys = {"align_rnn.fc.weight", "align_rnn.fc.bias"}
    for layer in range(num_layers):
        for sfx in ([f"_l{layer}", f"_l{layer}_reverse"] if bidirectional
                    else [f"_l{layer}"]):
            for part in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
                keys.add(f"align_rnn.rnn.{part}{sfx}")
    return keys


def test_exporter_emits_exact_reference_keys():
    """Exporter output must be byte-for-byte the reference AlignModel's
    state-dict key set (whisper-tiny dims: 4+4 layers) — the contract a
    strict load_state_dict enforces (`inference_alignment.py:120-123`)."""
    cfg = WhisperConfig(n_mels=80, n_vocab=64, n_audio_ctx=1500,
                        n_audio_state=32, n_audio_head=4, n_audio_layer=4,
                        n_text_ctx=12, n_text_state=32, n_text_head=4,
                        n_text_layer=4)
    params = init_whisper_params(jax.random.PRNGKey(0), cfg)
    gru_layers = []
    for _ in range(2):
        dirs = []
        for _ in range(2):
            dirs.append({"w_ih": np.zeros((32, 12)), "w_hh": np.zeros((4, 12)),
                         "b_ih": np.zeros(12), "b_hh": np.zeros(12)})
        gru_layers.append({"dirs": dirs})
    sd = align_params_to_state_dict({
        "whisper": params,
        "align_head": {"gru": {"layers": gru_layers},
                       "fc": {"w": np.zeros((8, 10)), "b": np.zeros(10)}}})

    want = ({f"whisper_model.{k}" for k in _golden_whisper_keys(4, 4)}
            | _golden_align_rnn_keys())
    got = set(sd.keys())
    assert got == want, (
        f"missing={sorted(want - got)} extra={sorted(got - want)}")

    # torch layout conventions on the exported arrays
    assert sd["whisper_model.encoder.conv1.weight"].shape == (32, 80, 3)
    assert sd["whisper_model.encoder.blocks.0.mlp.0.weight"].shape == (128, 32)
    assert sd["whisper_model.encoder.positional_embedding"].shape == (1500, 32)
    assert sd["whisper_model.decoder.positional_embedding"].shape == (12, 32)
    assert sd["align_rnn.rnn.weight_ih_l0"].shape == (12, 32)
    assert sd["align_rnn.fc.weight"].shape == (10, 8)


def test_importer_consumes_exact_reference_keys():
    """Importer must read a state dict containing EXACTLY the golden keys —
    any key the importer looks up under a different name would KeyError."""
    cfg = WhisperConfig(n_mels=80, n_vocab=64, n_audio_ctx=1500,
                        n_audio_state=32, n_audio_head=4, n_audio_layer=4,
                        n_text_ctx=12, n_text_state=32, n_text_head=4,
                        n_text_layer=4)
    from lyricalignment_tpu.models.whisper import sinusoid_position_embedding
    from lyricalignment_tpu.models.convert import whisper_params_from_state_dict

    rng = np.random.default_rng(3)

    def shape_for(key):
        d, mlp = 32, 128
        if key == "encoder.conv1.weight":
            return (d, 80, 3)
        if key == "encoder.conv2.weight":
            return (d, d, 3)
        if key == "encoder.positional_embedding":
            return (1500, d)
        if key == "decoder.positional_embedding":
            return (12, d)
        if key == "decoder.token_embedding.weight":
            return (64, d)
        if key.endswith("mlp.0.weight"):
            return (mlp, d)
        if key.endswith("mlp.0.bias"):
            return (mlp,)
        if key.endswith("mlp.2.weight"):
            return (d, mlp)
        if key.endswith(".weight") and ".ln" not in key and "_ln" not in key:
            return (d, d)
        return (d,)

    sd = {k: rng.standard_normal(shape_for(k)).astype(np.float32)
          for k in _golden_whisper_keys(4, 4)}
    loaded = whisper_params_from_state_dict(sd, cfg)
    assert len(loaded["encoder"]["blocks"]) == 4
    assert len(loaded["decoder"]["blocks"]) == 4
    np.testing.assert_allclose(
        np.asarray(loaded["decoder"]["blocks"][3]["cross_attn"]["q"]["w"]),
        sd["decoder.blocks.3.cross_attn.query.weight"].T)
