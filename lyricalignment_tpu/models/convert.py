"""Checkpoint converters: OpenAI / HF / reference PyTorch state dicts <-> pytrees.

Supports importing
  * OpenAI whisper checkpoints (``{"dims": ..., "model_state_dict": ...}``,
    the format ``whisper.load_model`` consumes — reference
    `train_multitask.py:647`),
  * HuggingFace ``transformers`` Whisper checkpoints
    (``WhisperForConditionalGeneration`` / ``WhisperModel`` save
    directories: ``config.json`` + ``model.safetensors`` /
    ``pytorch_model.bin``, optionally index-sharded) — the other common
    publication format for whisper fine-tunes, and
  * the reference's AlignModel checkpoints
    (``torch.save(model.state_dict())``, `train_multitask.py:461-465`) whose
    keys are prefixed ``whisper_model.*`` / ``align_rnn.rnn.*`` /
    ``align_rnn.fc.*`` (`inference_alignment.py:120-123`), e.g. the
    published Zenodo checkpoints,
and exporting back to the reference's naming — and to the HF transformers
layout (``save_hf_checkpoint``) — so checkpoints are round-trippable in
both ecosystems.

Layout transforms: torch Linear weights [out, in] -> ours [in, out]
(transposed); conv weights stay [out, in, k]; GRU weight_ih/hh [3H, in] ->
[in, 3H]; LayerNorm weight/bias -> scale/bias.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Mapping, Tuple

import jax.numpy as jnp
import numpy as np

from lyricalignment_tpu.models.align_model import AlignModelConfig
from lyricalignment_tpu.models.whisper import WhisperConfig

Params = Dict[str, Any]


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu()
        if hasattr(t, "float"):
            t = t.float()  # bf16 torch tensors cannot cross into numpy
        t = t.numpy()
    return np.asarray(t, dtype=np.float32)


def _linear_in(sd: Mapping, prefix: str, bias: bool = True) -> Params:
    p = {"w": jnp.asarray(_np(sd[f"{prefix}.weight"]).T)}
    if bias:
        p["b"] = jnp.asarray(_np(sd[f"{prefix}.bias"]))
    return p


def _ln_in(sd: Mapping, prefix: str) -> Params:
    return {
        "scale": jnp.asarray(_np(sd[f"{prefix}.weight"])),
        "bias": jnp.asarray(_np(sd[f"{prefix}.bias"])),
    }


def _attn_in(sd: Mapping, prefix: str) -> Params:
    return {
        "q": _linear_in(sd, f"{prefix}.query"),
        "k": _linear_in(sd, f"{prefix}.key", bias=False),
        "v": _linear_in(sd, f"{prefix}.value"),
        "out": _linear_in(sd, f"{prefix}.out"),
    }


def _block_in(sd: Mapping, prefix: str, cross: bool) -> Params:
    block = {
        "attn_ln": _ln_in(sd, f"{prefix}.attn_ln"),
        "attn": _attn_in(sd, f"{prefix}.attn"),
        "mlp_ln": _ln_in(sd, f"{prefix}.mlp_ln"),
        "mlp_fc1": _linear_in(sd, f"{prefix}.mlp.0"),
        "mlp_fc2": _linear_in(sd, f"{prefix}.mlp.2"),
    }
    if cross:
        block["cross_attn_ln"] = _ln_in(sd, f"{prefix}.cross_attn_ln")
        block["cross_attn"] = _attn_in(sd, f"{prefix}.cross_attn")
    return block


def whisper_params_from_state_dict(sd: Mapping, cfg: WhisperConfig) -> Params:
    """Un-prefixed whisper state dict (keys ``encoder.*`` / ``decoder.*``)."""
    enc_blocks = [
        _block_in(sd, f"encoder.blocks.{i}", cross=False)
        for i in range(cfg.n_audio_layer)
    ]
    dec_blocks = [
        _block_in(sd, f"decoder.blocks.{i}", cross=True)
        for i in range(cfg.n_text_layer)
    ]
    return {
        "encoder": {
            "conv1": {"w": jnp.asarray(_np(sd["encoder.conv1.weight"])),
                      "b": jnp.asarray(_np(sd["encoder.conv1.bias"]))},
            "conv2": {"w": jnp.asarray(_np(sd["encoder.conv2.weight"])),
                      "b": jnp.asarray(_np(sd["encoder.conv2.bias"]))},
            "blocks": enc_blocks,
            "ln_post": _ln_in(sd, "encoder.ln_post"),
        },
        "decoder": {
            "token_embedding": jnp.asarray(_np(sd["decoder.token_embedding.weight"])),
            "positional_embedding": jnp.asarray(_np(sd["decoder.positional_embedding"])),
            "blocks": dec_blocks,
            "ln": _ln_in(sd, "decoder.ln"),
        },
    }


def config_from_openai_dims(dims: Mapping) -> WhisperConfig:
    return WhisperConfig(
        n_mels=dims["n_mels"],
        n_vocab=dims["n_vocab"],
        n_audio_ctx=dims["n_audio_ctx"],
        n_audio_state=dims["n_audio_state"],
        n_audio_head=dims["n_audio_head"],
        n_audio_layer=dims["n_audio_layer"],
        n_text_ctx=dims["n_text_ctx"],
        n_text_state=dims["n_text_state"],
        n_text_head=dims["n_text_head"],
        n_text_layer=dims["n_text_layer"],
    )


def load_openai_checkpoint(path: str) -> Tuple[WhisperConfig, Params]:
    """Load an OpenAI whisper ``.pt`` checkpoint (requires torch on host)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    cfg = config_from_openai_dims(ckpt["dims"] if isinstance(ckpt["dims"], dict)
                                  else vars(ckpt["dims"]))
    sd = ckpt["model_state_dict"]
    return cfg, whisper_params_from_state_dict(sd, cfg)


# ---------------------------------------------------------------------------
# HuggingFace transformers Whisper checkpoints
# ---------------------------------------------------------------------------

def _hf_attn_in(sd: Mapping, prefix: str) -> Params:
    return {
        "q": _linear_in(sd, f"{prefix}.q_proj"),
        "k": _linear_in(sd, f"{prefix}.k_proj", bias=False),
        "v": _linear_in(sd, f"{prefix}.v_proj"),
        "out": _linear_in(sd, f"{prefix}.out_proj"),
    }


def _hf_block_in(sd: Mapping, prefix: str, cross: bool) -> Params:
    block = {
        "attn_ln": _ln_in(sd, f"{prefix}.self_attn_layer_norm"),
        "attn": _hf_attn_in(sd, f"{prefix}.self_attn"),
        "mlp_ln": _ln_in(sd, f"{prefix}.final_layer_norm"),
        "mlp_fc1": _linear_in(sd, f"{prefix}.fc1"),
        "mlp_fc2": _linear_in(sd, f"{prefix}.fc2"),
    }
    if cross:
        block["cross_attn_ln"] = _ln_in(sd, f"{prefix}.encoder_attn_layer_norm")
        block["cross_attn"] = _hf_attn_in(sd, f"{prefix}.encoder_attn")
    return block


def config_from_hf_config(hf: Mapping) -> WhisperConfig:
    """``WhisperConfig`` from a transformers Whisper ``config.json`` dict."""
    return WhisperConfig(
        n_mels=hf["num_mel_bins"],
        n_vocab=hf["vocab_size"],
        n_audio_ctx=hf["max_source_positions"],
        n_audio_state=hf["d_model"],
        n_audio_head=hf["encoder_attention_heads"],
        n_audio_layer=hf["encoder_layers"],
        n_text_ctx=hf["max_target_positions"],
        n_text_state=hf["d_model"],
        n_text_head=hf["decoder_attention_heads"],
        n_text_layer=hf["decoder_layers"],
    )


def whisper_params_from_hf_state_dict(sd: Mapping, cfg: WhisperConfig) -> Params:
    """Convert a transformers Whisper state dict to this framework's pytree.

    Accepts ``WhisperForConditionalGeneration`` naming (``model.encoder.*``,
    ``model.decoder.*``, tied ``proj_out``) or bare ``WhisperModel`` naming
    (``encoder.*`` / ``decoder.*``). The attention math is equivalent — HF
    scales q by ``head_dim**-0.5`` where OpenAI/this model scale q and k by
    ``head_dim**-0.25`` each — so weights map verbatim (the HF repo itself
    converts OpenAI checkpoints by pure renaming).

    Two structural differences are checked loudly rather than dropped
    silently:
      * HF stores the encoder's sinusoidal positions as a (non-trainable)
        ``embed_positions`` table which this model recomputes in-kernel; if
        a checkpoint's table has drifted from the sinusoids (it would have
        to be forcibly unfrozen), conversion refuses.
      * ``proj_out`` must stay weight-tied to ``decoder.embed_tokens``
        (whisper's unembedding); an untied head cannot be represented.
    """
    if any(k.startswith("model.") for k in sd):
        inner = {k[len("model."):]: v for k, v in sd.items()
                 if k.startswith("model.")}
        if "proj_out.weight" in sd:
            tied = _np(sd["proj_out.weight"])
            emb = _np(inner["decoder.embed_tokens.weight"])
            if not np.allclose(tied, emb):
                raise ValueError(
                    "HF checkpoint has an untied proj_out head; whisper's "
                    "unembedding is the (tied) decoder token embedding and "
                    "an untied head cannot be represented")
        sd = inner

    if "encoder.embed_positions.weight" in sd:
        from lyricalignment_tpu.models.whisper import sinusoid_position_embedding

        raw = sd["encoder.embed_positions.weight"]
        stored = _np(raw)
        want = np.asarray(sinusoid_position_embedding(*stored.shape))
        # fp16/bf16 save_pretrained rounds the frozen sinusoid table by up
        # to ~2e-3 near |1|; a genuinely trained PE drifts far more, so the
        # tolerance follows the checkpoint's storage width
        if hasattr(raw, "element_size"):
            nbytes = raw.element_size()
        else:
            nbytes = getattr(raw, "itemsize", 4)
        atol = 2.5e-3 if nbytes <= 2 else 1e-4
        if not np.allclose(stored, want, atol=atol):
            raise ValueError(
                "HF checkpoint's encoder embed_positions differ from the "
                "whisper sinusoids (transformers keeps them frozen; this "
                "table appears trained) — this model recomputes sinusoids "
                "in-kernel and cannot represent a trained encoder PE")

    enc_blocks = [
        _hf_block_in(sd, f"encoder.layers.{i}", cross=False)
        for i in range(cfg.n_audio_layer)
    ]
    dec_blocks = [
        _hf_block_in(sd, f"decoder.layers.{i}", cross=True)
        for i in range(cfg.n_text_layer)
    ]
    return {
        "encoder": {
            "conv1": {"w": jnp.asarray(_np(sd["encoder.conv1.weight"])),
                      "b": jnp.asarray(_np(sd["encoder.conv1.bias"]))},
            "conv2": {"w": jnp.asarray(_np(sd["encoder.conv2.weight"])),
                      "b": jnp.asarray(_np(sd["encoder.conv2.bias"]))},
            "blocks": enc_blocks,
            "ln_post": _ln_in(sd, "encoder.layer_norm"),
        },
        "decoder": {
            "token_embedding": jnp.asarray(_np(sd["decoder.embed_tokens.weight"])),
            "positional_embedding": jnp.asarray(
                _np(sd["decoder.embed_positions.weight"])),
            "blocks": dec_blocks,
            "ln": _ln_in(sd, "decoder.layer_norm"),
        },
    }


def _load_hf_weight_files(path: str) -> Dict[str, Any]:
    """Merge an HF save directory's weight file(s) into one state dict.

    Handles single-file and index-sharded layouts for both safetensors
    (preferred when the ``safetensors`` package is importable — it ships
    with transformers) and ``pytorch_model.bin`` (torch pickles).
    """
    import json

    def _safetensors_load(p):
        from safetensors import safe_open

        out = {}
        try:
            with safe_open(p, framework="np") as f:
                for k in f.keys():
                    out[k] = f.get_tensor(k)
        except (TypeError, ValueError):
            # framework="np" cannot represent bf16 tensors (common in HF
            # whisper fine-tunes); retry via torch, whose bf16 tensors
            # `_np()` already widens to f32 (ADVICE r4)
            out = {}
            with safe_open(p, framework="pt") as f:
                for k in f.keys():
                    out[k] = f.get_tensor(k)
        return out

    def _torch_load(p):
        import torch

        return torch.load(p, map_location="cpu", weights_only=True)

    candidates = (
        ("model.safetensors.index.json", _safetensors_load),
        ("model.safetensors", _safetensors_load),
        ("pytorch_model.bin.index.json", _torch_load),
        ("pytorch_model.bin", _torch_load),
    )
    for name, loader in candidates:
        full = os.path.join(path, name)
        if not os.path.exists(full):
            continue
        if name.endswith(".index.json"):
            with open(full) as f:
                shards = sorted(set(json.load(f)["weight_map"].values()))
            sd: Dict[str, Any] = {}
            for shard in shards:
                sd.update(loader(os.path.join(path, shard)))
            return sd
        return loader(full)
    raise FileNotFoundError(
        f"no model.safetensors[.index.json] or pytorch_model.bin"
        f"[.index.json] under {path}")


def load_hf_checkpoint(path: str) -> Tuple[WhisperConfig, Params]:
    """Load a transformers Whisper save directory (``save_pretrained``)."""
    import json

    with open(os.path.join(path, "config.json")) as f:
        cfg = config_from_hf_config(json.load(f))
    sd = _load_hf_weight_files(path)
    return cfg, whisper_params_from_hf_state_dict(sd, cfg)


def _hf_linear_out(p: Params, prefix: str, out: Dict[str, np.ndarray]):
    out[f"{prefix}.weight"] = np.asarray(p["w"], dtype=np.float32).T.copy()
    if "b" in p:
        out[f"{prefix}.bias"] = np.asarray(p["b"], dtype=np.float32).copy()


def _hf_ln_out(p: Params, prefix: str, out: Dict[str, np.ndarray]):
    out[f"{prefix}.weight"] = np.asarray(p["scale"], dtype=np.float32).copy()
    out[f"{prefix}.bias"] = np.asarray(p["bias"], dtype=np.float32).copy()


def _hf_attn_out(p: Params, prefix: str, out: Dict[str, np.ndarray]):
    _hf_linear_out(p["q"], f"{prefix}.q_proj", out)
    _hf_linear_out(p["k"], f"{prefix}.k_proj", out)
    _hf_linear_out(p["v"], f"{prefix}.v_proj", out)
    _hf_linear_out(p["out"], f"{prefix}.out_proj", out)


def _hf_block_out(p: Params, prefix: str, out: Dict[str, np.ndarray]):
    _hf_ln_out(p["attn_ln"], f"{prefix}.self_attn_layer_norm", out)
    _hf_attn_out(p["attn"], f"{prefix}.self_attn", out)
    if "cross_attn" in p:
        _hf_ln_out(p["cross_attn_ln"], f"{prefix}.encoder_attn_layer_norm", out)
        _hf_attn_out(p["cross_attn"], f"{prefix}.encoder_attn", out)
    _hf_ln_out(p["mlp_ln"], f"{prefix}.final_layer_norm", out)
    _hf_linear_out(p["mlp_fc1"], f"{prefix}.fc1", out)
    _hf_linear_out(p["mlp_fc2"], f"{prefix}.fc2", out)


def hf_config_dict(cfg: WhisperConfig) -> Dict[str, Any]:
    """transformers Whisper ``config.json`` content for this model's dims.

    Token ids follow HF's published whisper configs (pad = bos = eos =
    ``<|endoftext|>``, decoder_start = ``<|startoftranscript|>``): 50257/
    50258 for the 51865-token multilingual vocab, 50256/50257 for the
    51864-token English vocab; non-whisper (test-sized) vocabs clamp to
    the last id so ``from_pretrained`` never indexes past the embedding.
    """
    if cfg.n_vocab >= 51865:
        eos, dst = 50257, 50258
    elif cfg.n_vocab == 51864:
        eos, dst = 50256, 50257
    else:
        eos, dst = cfg.n_vocab - 1, cfg.n_vocab - 1
    return {
        "pad_token_id": eos,
        "bos_token_id": eos,
        "eos_token_id": eos,
        "decoder_start_token_id": dst,
        "model_type": "whisper",
        "architectures": ["WhisperForConditionalGeneration"],
        "vocab_size": cfg.n_vocab,
        "num_mel_bins": cfg.n_mels,
        "d_model": cfg.n_audio_state,
        "encoder_layers": cfg.n_audio_layer,
        "encoder_attention_heads": cfg.n_audio_head,
        "encoder_ffn_dim": 4 * cfg.n_audio_state,
        "decoder_layers": cfg.n_text_layer,
        "decoder_attention_heads": cfg.n_text_head,
        "decoder_ffn_dim": 4 * cfg.n_text_state,
        "max_source_positions": cfg.n_audio_ctx,
        "max_target_positions": cfg.n_text_ctx,
        "activation_function": "gelu",
        "is_encoder_decoder": True,
        "tie_word_embeddings": True,
    }


def whisper_params_to_hf_state_dict(
    params: Params, cfg: WhisperConfig
) -> Dict[str, np.ndarray]:
    """Export a whisper pytree to transformers naming (f32 numpy arrays).

    Emits ``WhisperForConditionalGeneration`` keys (``model.encoder.*`` /
    ``model.decoder.*``); ``proj_out`` stays tied to ``embed_tokens`` (the
    transformers loader re-ties it from the config), and the encoder's
    frozen sinusoidal ``embed_positions`` table is synthesized since this
    model computes it in-kernel.
    """
    from lyricalignment_tpu.models.whisper import sinusoid_position_embedding

    out: Dict[str, np.ndarray] = {}
    enc, dec = params["encoder"], params["decoder"]
    out["model.encoder.conv1.weight"] = np.asarray(
        enc["conv1"]["w"], dtype=np.float32).copy()
    out["model.encoder.conv1.bias"] = np.asarray(
        enc["conv1"]["b"], dtype=np.float32).copy()
    out["model.encoder.conv2.weight"] = np.asarray(
        enc["conv2"]["w"], dtype=np.float32).copy()
    out["model.encoder.conv2.bias"] = np.asarray(
        enc["conv2"]["b"], dtype=np.float32).copy()
    out["model.encoder.embed_positions.weight"] = np.asarray(
        sinusoid_position_embedding(cfg.n_audio_ctx, cfg.n_audio_state),
        dtype=np.float32)
    for i, block in enumerate(enc["blocks"]):
        _hf_block_out(block, f"model.encoder.layers.{i}", out)
    _hf_ln_out(enc["ln_post"], "model.encoder.layer_norm", out)

    out["model.decoder.embed_tokens.weight"] = np.asarray(
        dec["token_embedding"], dtype=np.float32).copy()
    out["model.decoder.embed_positions.weight"] = np.asarray(
        dec["positional_embedding"], dtype=np.float32).copy()
    for i, block in enumerate(dec["blocks"]):
        _hf_block_out(block, f"model.decoder.layers.{i}", out)
    _hf_ln_out(dec["ln"], "model.decoder.layer_norm", out)
    return out


def save_hf_checkpoint(params: Params, cfg: WhisperConfig, path: str) -> None:
    """Write a transformers-loadable Whisper save directory.

    Produces ``config.json`` + ``model.safetensors`` (or
    ``pytorch_model.bin`` when safetensors is unavailable), consumable by
    ``WhisperForConditionalGeneration.from_pretrained(path)``.
    """
    import json

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(hf_config_dict(cfg), f, indent=2)
    sd = whisper_params_to_hf_state_dict(params, cfg)
    try:
        from safetensors.numpy import save_file

        save_file(sd, os.path.join(path, "model.safetensors"))
    except ImportError:
        import torch

        torch.save({k: torch.from_numpy(v) for k, v in sd.items()},
                   os.path.join(path, "pytorch_model.bin"))


# ---------------------------------------------------------------------------
# Reference AlignModel checkpoints  (whisper_model.* / align_rnn.*)
# ---------------------------------------------------------------------------

def _gru_in(sd: Mapping, prefix: str, num_layers: int, bidirectional: bool) -> Params:
    layers = []
    for layer in range(num_layers):
        dirs = []
        for d in range(2 if bidirectional else 1):
            sfx = f"_l{layer}" + ("_reverse" if d == 1 else "")
            dirs.append({
                "w_ih": jnp.asarray(_np(sd[f"{prefix}.weight_ih{sfx}"]).T),
                "w_hh": jnp.asarray(_np(sd[f"{prefix}.weight_hh{sfx}"]).T),
                "b_ih": jnp.asarray(_np(sd[f"{prefix}.bias_ih{sfx}"])),
                "b_hh": jnp.asarray(_np(sd[f"{prefix}.bias_hh{sfx}"])),
            })
        layers.append({"dirs": dirs})
    return {"layers": layers}


def align_params_from_state_dict(sd: Mapping, cfg: AlignModelConfig) -> Params:
    whisper_sd = {k[len("whisper_model."):]: v for k, v in sd.items()
                  if k.startswith("whisper_model.")}
    return {
        "whisper": whisper_params_from_state_dict(whisper_sd, cfg.whisper),
        "align_head": {
            "gru": _gru_in(sd, "align_rnn.rnn", cfg.num_rnn_layers, cfg.bidirectional),
            "fc": _linear_in(sd, "align_rnn.fc"),
        },
    }


def load_reference_align_checkpoint(path: str, cfg: AlignModelConfig) -> Params:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    return align_params_from_state_dict(sd, cfg)


# ---------------------------------------------------------------------------
# Export back to reference naming (round-trip / interop)
# ---------------------------------------------------------------------------

def _linear_out(p: Params, prefix: str, out: Dict[str, np.ndarray]):
    out[f"{prefix}.weight"] = np.asarray(p["w"]).T.copy()
    if "b" in p:
        out[f"{prefix}.bias"] = np.asarray(p["b"]).copy()


def _ln_out(p: Params, prefix: str, out: Dict[str, np.ndarray]):
    out[f"{prefix}.weight"] = np.asarray(p["scale"]).copy()
    out[f"{prefix}.bias"] = np.asarray(p["bias"]).copy()


def _attn_out(p: Params, prefix: str, out: Dict[str, np.ndarray]):
    _linear_out(p["q"], f"{prefix}.query", out)
    _linear_out(p["k"], f"{prefix}.key", out)
    _linear_out(p["v"], f"{prefix}.value", out)
    _linear_out(p["out"], f"{prefix}.out", out)


def _block_out(p: Params, prefix: str, out: Dict[str, np.ndarray]):
    _ln_out(p["attn_ln"], f"{prefix}.attn_ln", out)
    _attn_out(p["attn"], f"{prefix}.attn", out)
    if "cross_attn" in p:
        _ln_out(p["cross_attn_ln"], f"{prefix}.cross_attn_ln", out)
        _attn_out(p["cross_attn"], f"{prefix}.cross_attn", out)
    _ln_out(p["mlp_ln"], f"{prefix}.mlp_ln", out)
    _linear_out(p["mlp_fc1"], f"{prefix}.mlp.0", out)
    _linear_out(p["mlp_fc2"], f"{prefix}.mlp.2", out)


def align_params_to_state_dict(params: Params,
                               n_audio_ctx: int = 1500) -> Dict[str, np.ndarray]:
    """Export to the reference's ``AlignModel.state_dict()`` naming.

    Includes ``whisper_model.encoder.positional_embedding``: torch registers
    it as a persistent buffer (whisper AudioEncoder), so it is present in
    every real checkpoint and a strict ``load_state_dict`` on the reference
    side requires it. Our params compute the sinusoids in-model, so the
    buffer is synthesized here (``n_audio_ctx`` is 1500 for every published
    whisper size).
    """
    from lyricalignment_tpu.models.whisper import sinusoid_position_embedding

    out: Dict[str, np.ndarray] = {}
    w = params["whisper"]
    out["whisper_model.encoder.conv1.weight"] = np.asarray(w["encoder"]["conv1"]["w"]).copy()
    out["whisper_model.encoder.conv1.bias"] = np.asarray(w["encoder"]["conv1"]["b"]).copy()
    out["whisper_model.encoder.conv2.weight"] = np.asarray(w["encoder"]["conv2"]["w"]).copy()
    out["whisper_model.encoder.conv2.bias"] = np.asarray(w["encoder"]["conv2"]["b"]).copy()
    d_audio = int(np.asarray(w["encoder"]["conv2"]["w"]).shape[0])
    out["whisper_model.encoder.positional_embedding"] = (
        sinusoid_position_embedding(n_audio_ctx, d_audio))
    for i, block in enumerate(w["encoder"]["blocks"]):
        _block_out(block, f"whisper_model.encoder.blocks.{i}", out)
    _ln_out(w["encoder"]["ln_post"], "whisper_model.encoder.ln_post", out)
    out["whisper_model.decoder.token_embedding.weight"] = np.asarray(
        w["decoder"]["token_embedding"]).copy()
    out["whisper_model.decoder.positional_embedding"] = np.asarray(
        w["decoder"]["positional_embedding"]).copy()
    for i, block in enumerate(w["decoder"]["blocks"]):
        _block_out(block, f"whisper_model.decoder.blocks.{i}", out)
    _ln_out(w["decoder"]["ln"], "whisper_model.decoder.ln", out)

    head = params["align_head"]
    for layer, lp in enumerate(head["gru"]["layers"]):
        for d, cell in enumerate(lp["dirs"]):
            sfx = f"_l{layer}" + ("_reverse" if d == 1 else "")
            out[f"align_rnn.rnn.weight_ih{sfx}"] = np.asarray(cell["w_ih"]).T.copy()
            out[f"align_rnn.rnn.weight_hh{sfx}"] = np.asarray(cell["w_hh"]).T.copy()
            out[f"align_rnn.rnn.bias_ih{sfx}"] = np.asarray(cell["b_ih"]).copy()
            out[f"align_rnn.rnn.bias_hh{sfx}"] = np.asarray(cell["b_hh"]).copy()
    _linear_out(head["fc"], "align_rnn.fc", out)
    return out
