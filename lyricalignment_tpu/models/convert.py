"""Checkpoint converters: OpenAI / reference PyTorch state dicts <-> pytrees.

Supports importing
  * OpenAI whisper checkpoints (``{"dims": ..., "model_state_dict": ...}``,
    the format ``whisper.load_model`` consumes — reference
    `train_multitask.py:647`), and
  * the reference's AlignModel checkpoints
    (``torch.save(model.state_dict())``, `train_multitask.py:461-465`) whose
    keys are prefixed ``whisper_model.*`` / ``align_rnn.rnn.*`` /
    ``align_rnn.fc.*`` (`inference_alignment.py:120-123`), e.g. the
    published Zenodo checkpoints,
and exporting back to the reference's naming so checkpoints are
round-trippable.

Layout transforms: torch Linear weights [out, in] -> ours [in, out]
(transposed); conv weights stay [out, in, k]; GRU weight_ih/hh [3H, in] ->
[in, 3H]; LayerNorm weight/bias -> scale/bias.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import jax.numpy as jnp
import numpy as np

from lyricalignment_tpu.models.align_model import AlignModelConfig
from lyricalignment_tpu.models.whisper import WhisperConfig

Params = Dict[str, Any]


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
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
