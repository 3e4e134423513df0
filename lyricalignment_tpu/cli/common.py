"""Shared CLI plumbing: seeding, tokenizer/model/checkpoint loading.

Mirrors the reference's loader helpers (`inference_alignment.py:86-124`,
`inference_transcript.py:112-150`): a model dir holds ``args.json`` +
``model_args.json`` + named checkpoints; loading reconstructs the model
from the persisted configs then restores weights.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import random
from typing import Any, Dict, Optional, Tuple

import numpy as np

from lyricalignment_tpu.models.align_model import AlignModelConfig, init_align_model
from lyricalignment_tpu.models.whisper import WHISPER_CONFIGS
from lyricalignment_tpu.text.bert_tokenizer import (
    BertWordPieceTokenizer,
    make_synthetic_vocab,
)
from lyricalignment_tpu.text.whisper_tokenizer import WhisperTokenizer
from lyricalignment_tpu.train.checkpoints import load_json, restore_pytree


def set_seed(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)


def add_asset_args(parser: argparse.ArgumentParser) -> None:
    parser.add_argument(
        "--bert-vocab", type=str, default=None,
        help="Path to bert-base-chinese vocab.txt (required for id parity; "
             "omit with --synthetic-vocab for offline smoke runs)",
    )
    parser.add_argument(
        "--synthetic-vocab", action="store_true",
        help="Use a tiny synthetic vocabulary (smoke tests only)",
    )
    parser.add_argument(
        "--whisper-bpe", type=str, default=None,
        help="Path to whisper multilingual.tiktoken ranks file (enables "
             "text encode/decode for the transcript task)",
    )
    parser.add_argument(
        "--whisper-checkpoint", type=str, default=None,
        help="Path to an OpenAI whisper .pt checkpoint to initialise the "
             "backbone (random init otherwise)",
    )


def build_tokenizers(
    args, num_languages: int = 99,
) -> Tuple[BertWordPieceTokenizer, WhisperTokenizer]:
    """``num_languages=100`` selects the v3-family special-token layout
    (pass ``num_languages_for_vocab(cfg.n_vocab)`` when the backbone is
    known — v3 backbones carry the extra <|yue|> language token)."""
    if args.bert_vocab:
        bert = BertWordPieceTokenizer(vocab_path=args.bert_vocab)
    elif getattr(args, "synthetic_vocab", False):
        bert = BertWordPieceTokenizer(vocab=make_synthetic_vocab(size=21128))
    else:
        raise SystemExit(
            "Provide --bert-vocab vocab.txt (bert-base-chinese) or pass "
            "--synthetic-vocab for an offline smoke run."
        )
    whisper_tok = WhisperTokenizer(
        multilingual=True, language=getattr(args, "language", "zh"),
        task="transcribe", bpe_path=getattr(args, "whisper_bpe", None),
        num_languages=num_languages,
    )
    return bert, whisper_tok


def build_model_config(
    whisper_model: str,
    output_dim: int,
    use_bf16: bool = False,
    freeze_encoder: bool = False,
    train_alignment: bool = True,
    train_transcript: bool = False,
    fast_gelu: bool = False,
    int8_encoder: bool = False,
    onepass_encoder: bool = False,
    int8_cross_kv: bool = False,
    whisper_dims: Optional[dict] = None,
) -> AlignModelConfig:
    """``whisper_dims`` (the ten architecture ints of ``WhisperConfig``)
    overrides the name lookup — backbones that match no standard size
    (distil-whisper's asymmetric decoder, *.en vocab) are stored in
    args.json as ``whisper_model: "custom"`` + ``whisper_dims``."""
    import jax.numpy as jnp

    if whisper_dims is not None:
        from lyricalignment_tpu.models.whisper import WhisperConfig

        wcfg = WhisperConfig(**whisper_dims)
    else:
        wcfg = WHISPER_CONFIGS[whisper_model]
    if use_bf16:
        wcfg = dataclasses.replace(wcfg, compute_dtype=jnp.bfloat16)
    if fast_gelu:
        wcfg = dataclasses.replace(wcfg, fast_gelu=True)
    if int8_encoder:
        wcfg = dataclasses.replace(wcfg, int8_encoder=True)
    if onepass_encoder:
        wcfg = dataclasses.replace(wcfg, onepass_encoder=True)
    if int8_cross_kv:
        wcfg = dataclasses.replace(wcfg, int8_cross_kv=True)
    return AlignModelConfig(
        whisper=wcfg,
        hidden_dim=384,
        output_dim=output_dim,
        freeze_encoder=freeze_encoder,
        train_alignment=train_alignment,
        train_transcript=train_transcript,
    )


def init_params(args, mcfg: AlignModelConfig, seed: int):
    """Random init, optionally overwriting the backbone from an OpenAI ckpt."""
    import jax

    params = init_align_model(jax.random.PRNGKey(seed), mcfg)
    if getattr(args, "whisper_checkpoint", None):
        from lyricalignment_tpu.models.convert import load_openai_checkpoint

        ckpt_cfg, whisper_params = load_openai_checkpoint(args.whisper_checkpoint)
        if ckpt_cfg.n_audio_state != mcfg.whisper.n_audio_state:
            raise SystemExit(
                f"--whisper-checkpoint dims {ckpt_cfg.n_audio_state} do not "
                f"match --whisper-model ({mcfg.whisper.n_audio_state})"
            )
        params["whisper"] = whisper_params
    return params


def load_model_dir(
    model_dir: str, model_name: str = "best", use_bf16: bool = False,
    fast_gelu: bool = False, int8_encoder: bool = False,
    onepass_encoder: bool = True, int8_cross_kv: bool = False,
) -> Tuple[AlignModelConfig, Any, Dict]:
    """Load a trained model dir (args.json + model_args.json + checkpoints).

    Accepts orbax checkpoint dirs (``{name}_model/``) produced by this
    framework, or reference ``.pt`` state dicts (``{name}_model.pt``)
    converted on the fly.

    ``onepass_encoder`` defaults ON (inference entry point): the pad-once
    single-pass attention path is numerically equivalent to the flash path
    (same bf16-rounding error class vs f32, PARITY.md) and ~20% faster at
    medium B=16. Under ``use_bf16`` the whisper weights are also made
    bf16-RESIDENT (``models.whisper.bf16_resident_params``) — numerics are
    identical to the per-op cast the compute path already does, because the
    decoder embedding table, whose unembedding matmul deliberately runs in
    f32 (avg_logprob / no-speech gates), stays f32-resident; every other
    weight streams half the bytes.
    """
    train_args = load_json(os.path.join(model_dir, "args.json"))
    model_args = load_json(os.path.join(model_dir, "model_args.json"))

    mcfg = build_model_config(
        train_args["whisper_model"],
        output_dim=model_args["output_dim"],
        use_bf16=use_bf16,
        fast_gelu=fast_gelu,
        int8_encoder=int8_encoder,
        onepass_encoder=onepass_encoder,
        int8_cross_kv=int8_cross_kv,
        freeze_encoder=model_args.get("freeze_encoder", False),
        train_alignment=model_args.get("train_alignment", True),
        train_transcript=model_args.get("train_transcript", False),
        whisper_dims=train_args.get("whisper_dims"),
    )

    orbax_path = os.path.join(model_dir, f"{model_name}_model")
    pt_path = orbax_path + ".pt"
    if os.path.isdir(orbax_path):
        tree = restore_pytree(orbax_path)  # raw restore: may be full train state
        params = tree["params"] if isinstance(tree, dict) and "params" in tree else tree
    elif os.path.exists(pt_path):
        from lyricalignment_tpu.models.convert import load_reference_align_checkpoint

        params = load_reference_align_checkpoint(pt_path, mcfg)
    else:
        raise FileNotFoundError(f"No checkpoint {orbax_path}[.pt]")
    if use_bf16 and isinstance(params, dict) and "whisper" in params:
        from lyricalignment_tpu.models.whisper import bf16_resident_params

        params = dict(params)
        params["whisper"] = bf16_resident_params(params["whisper"])
    if int8_encoder and isinstance(params, dict) and "whisper" in params:
        # after bf16 residency: the quantization grid then matches what the
        # dynamic per-call path would see, so numerics are identical while
        # each forward streams int8 weight bytes
        from lyricalignment_tpu.models.whisper import int8_resident_params

        params = dict(params)
        params["whisper"] = int8_resident_params(params["whisper"])
    return mcfg, params, train_args
