"""HF transformers Whisper checkpoint import vs the transformers oracle.

The reference consumes OpenAI-format whisper checkpoints
(`train_multitask.py:647`); fine-tuned whisper weights are just as often
published in the HuggingFace `transformers` format
(WhisperForConditionalGeneration save directories). One slow-lane test
amortizes the ~40 s transformers import across every scenario: oracle
forward parity, the sharded pytorch_model.bin layout, and the loud-failure
guards (untied proj_out, trained encoder positional embedding).
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lyricalignment_tpu.models.convert import (
    load_hf_checkpoint,
    whisper_params_from_hf_state_dict,
)
from lyricalignment_tpu.models.whisper import decoder_logits, encode_audio


@pytest.mark.slow
def test_hf_import_matches_transformers(tmp_path, rng):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    hf_cfg = transformers.WhisperConfig(
        vocab_size=64, num_mel_bins=80, d_model=32,
        encoder_layers=2, encoder_attention_heads=4, encoder_ffn_dim=128,
        decoder_layers=2, decoder_attention_heads=4, decoder_ffn_dim=128,
        max_source_positions=50, max_target_positions=12,
        pad_token_id=0, bos_token_id=0, eos_token_id=1,
        decoder_start_token_id=2,
    )
    torch.manual_seed(0)
    model = transformers.WhisperForConditionalGeneration(hf_cfg).eval()
    save_dir = str(tmp_path / "hf_whisper")
    model.save_pretrained(save_dir)

    mel = rng.standard_normal((2, 80, 100)).astype(np.float32)
    tokens = rng.integers(0, 64, size=(2, 7)).astype(np.int32)
    with torch.no_grad():
        mel_t = torch.from_numpy(mel)
        tok_t = torch.from_numpy(tokens.astype(np.int64))
        enc_hf = model.model.encoder(mel_t).last_hidden_state.numpy()
        logits_hf = model(input_features=mel_t,
                          decoder_input_ids=tok_t).logits.numpy()

    # --- oracle parity through the default (safetensors) layout ---
    cfg, params = load_hf_checkpoint(save_dir)
    assert cfg.n_audio_state == 32 and cfg.n_vocab == 64
    xa = encode_audio(params, cfg, jnp.asarray(mel))
    np.testing.assert_allclose(np.asarray(xa), enc_hf, atol=2e-4, rtol=1e-4)
    got = np.asarray(decoder_logits(params, cfg, jnp.asarray(tokens), xa))
    np.testing.assert_allclose(got, logits_hf, atol=5e-4, rtol=1e-4)

    # --- sharded pytorch_model.bin layout loads to the identical tree ---
    sd = {k: v.detach().cpu() for k, v in model.state_dict().items()}
    keys = sorted(sd)
    half = len(keys) // 2
    shard_dir = str(tmp_path / "hf_sharded")
    os.makedirs(shard_dir)
    with open(os.path.join(save_dir, "config.json")) as f:
        cfg_json = f.read()
    with open(os.path.join(shard_dir, "config.json"), "w") as f:
        f.write(cfg_json)
    shards = {"pytorch_model-00001-of-00002.bin": keys[:half],
              "pytorch_model-00002-of-00002.bin": keys[half:]}
    weight_map = {}
    for fname, ks in shards.items():
        torch.save({k: sd[k] for k in ks}, os.path.join(shard_dir, fname))
        weight_map.update({k: fname for k in ks})
    with open(os.path.join(shard_dir, "pytorch_model.bin.index.json"), "w") as f:
        json.dump({"weight_map": weight_map}, f)
    cfg2, params2 = load_hf_checkpoint(shard_dir)
    assert cfg2 == cfg
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # --- export: transformers loads our save dir and reproduces logits ---
    from lyricalignment_tpu.models.convert import save_hf_checkpoint

    out_dir = str(tmp_path / "hf_exported")
    save_hf_checkpoint(params, cfg, out_dir)
    assert os.path.exists(os.path.join(out_dir, "model.safetensors"))
    reloaded = transformers.WhisperForConditionalGeneration.from_pretrained(
        out_dir).eval()
    with torch.no_grad():
        logits_rt = reloaded(input_features=mel_t,
                             decoder_input_ids=tok_t).logits.numpy()
    np.testing.assert_allclose(logits_rt, logits_hf, atol=5e-4, rtol=1e-4)

    # --- guards fail loudly instead of converting silently wrong ---
    bad = dict(sd)
    bad["proj_out.weight"] = sd["model.decoder.embed_tokens.weight"] + 1.0
    with pytest.raises(ValueError, match="untied proj_out"):
        whisper_params_from_hf_state_dict(bad, cfg)

    bad = dict(sd)
    bad["model.encoder.embed_positions.weight"] = (
        sd["model.encoder.embed_positions.weight"] + 0.5)
    with pytest.raises(ValueError, match="sinusoids"):
        whisper_params_from_hf_state_dict(bad, cfg)

    # --- half-precision saves must not trip the trained-PE guard ---
    # fp16/bf16 save_pretrained rounds the frozen sinusoid table; the
    # guard's tolerance follows the storage width instead of rejecting
    # valid fine-tunes (round-4 review finding)
    for half_dtype in (torch.float16, torch.bfloat16):
        sd_half = {k: v.to(half_dtype) for k, v in sd.items()}
        params_half = whisper_params_from_hf_state_dict(sd_half, cfg)
        np.testing.assert_allclose(
            np.asarray(params_half["decoder"]["token_embedding"]),
            np.asarray(params["decoder"]["token_embedding"]),
            atol=1e-2)
    # ...while a genuinely trained PE still fails loudly even in fp16
    trained = dict(sd)
    trained["model.encoder.embed_positions.weight"] = (
        sd["model.encoder.embed_positions.weight"] + 0.05).half()
    with pytest.raises(ValueError, match="sinusoids"):
        whisper_params_from_hf_state_dict(trained, cfg)
