"""AlignModel: Whisper backbone + frame-wise alignment head.

Composition parity with the reference's ``AlignModel``
(`module/align_model.py:42-152`):
  * ``apply``                ≙ ``AlignModel.forward`` (mel in, optional
    frozen encoder, returns (align_logits, transcribe_logits))
  * ``forward_from_audio``   ≙ ``AlignModel.frame_manual_forward`` — raw
    audio in; ``trim_to_input_length=True`` (the reference's
    ``get_orig_len``) trims encoder frames to round(mel_len / 2), with the
    >30 s case handled by encoding each 30 s window and concatenating
    (`module/align_model.py:93-105`) — here the windows are batched through
    the encoder in one call instead of a sequential Python loop.

All functions are jit-compatible with static shapes; audio length is a
trace-time constant (the data pipeline buckets lengths).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from lyricalignment_tpu import EMBED_FRAMES, N_FRAMES
from lyricalignment_tpu.models.align_head import (
    align_head_apply,
    align_head_hidden,
    init_align_head,
)
from lyricalignment_tpu.models.whisper import (
    WhisperConfig,
    decoder_logits,
    encode_audio,
    init_whisper_params,
)
from lyricalignment_tpu.ops.mel import log_mel, pad_or_trim

Params = Dict[str, Any]


@dataclass(frozen=True)
class AlignModelConfig:
    whisper: WhisperConfig
    hidden_dim: int = 384
    output_dim: int = 21128
    num_rnn_layers: int = 2
    bidirectional: bool = True
    dropout: float = 0.1
    freeze_encoder: bool = False
    train_alignment: bool = True
    train_transcript: bool = False

    @property
    def embed_dim(self) -> int:
        return self.whisper.n_audio_state


def init_align_model(key: jax.Array, cfg: AlignModelConfig) -> Params:
    k_w, k_h = jax.random.split(key)
    return {
        "whisper": init_whisper_params(k_w, cfg.whisper),
        "align_head": init_align_head(
            k_h,
            input_dim=cfg.embed_dim,
            hidden_dim=cfg.hidden_dim,
            output_dim=cfg.output_dim,
            num_layers=cfg.num_rnn_layers,
            bidirectional=cfg.bidirectional,
        ),
    }


def apply(
    params: Params,
    cfg: AlignModelConfig,
    mel: jnp.ndarray,
    y_in: Optional[jnp.ndarray] = None,
    dropout_rng: Optional[jax.Array] = None,
    remat: bool = False,
) -> Tuple[Optional[jnp.ndarray], Optional[jnp.ndarray]]:
    """mel [B, 80, 3000] (+ optional decoder input tokens) ->
    (align_logits [B, 1500, out], transcribe_logits [B, S, vocab])."""
    embed = encode_audio(params["whisper"], cfg.whisper, mel, remat=remat)
    if cfg.freeze_encoder:
        embed = jax.lax.stop_gradient(embed)

    align_logits = None
    if cfg.train_alignment:
        align_logits = align_head_apply(
            params["align_head"], embed, dropout=cfg.dropout, rng=dropout_rng
        )

    transcribe_logits = None
    if cfg.train_transcript and y_in is not None:
        transcribe_logits = decoder_logits(
            params["whisper"], cfg.whisper, y_in, embed, remat=remat
        )
    return align_logits, transcribe_logits


def forward_from_audio(
    params: Params,
    cfg: AlignModelConfig,
    audio: jnp.ndarray,
    y_in: Optional[jnp.ndarray] = None,
    trim_to_input_length: bool = True,
    dropout_rng: Optional[jax.Array] = None,
    remat: bool = False,
    frame_lengths: Optional[jnp.ndarray] = None,
    mel_lengths: Optional[jnp.ndarray] = None,
    align_head_output: str = "logits",
    encode_fn=None,
    decode_fn=None,
) -> Tuple[Optional[jnp.ndarray], Optional[jnp.ndarray]]:
    """Raw padded audio [B, T_samples] -> (align_logits, transcribe_logits).

    ``align_head_output="hidden"`` returns the pre-classifier hidden states
    in the align slot instead of logits — feed to ``viterbi_align_fused``
    so the [B, T, 21129] logit tensor is never materialised.

    ``encode_fn`` replaces the encoder call — signature
    ``(whisper_params, whisper_cfg, mel, remat=...) -> [B, T', D]``.
    Used for pipeline-parallel encoding (``parallel.pipeline
    .make_pipeline_encode_fn``); defaults to ``encode_audio``.

    ``decode_fn`` replaces the teacher-forced decoder call — signature
    ``(whisper_params, whisper_cfg, tokens, audio_features, remat=...)
    -> logits``. Used for pipeline-parallel decoding (``parallel.pipeline
    .make_pipeline_logits_fn``); defaults to ``decoder_logits``.

    ``trim_to_input_length=False`` reproduces training behavior (pad/trim to
    one 30 s window, keep all 1500 frames, `module/align_model.py:108-115`);
    True reproduces inference behavior (`module/align_model.py:86-105`).

    ``frame_lengths`` (i32[B], optional): per-sample true encoder-frame
    counts; masks the GRU recurrences so length-bucketed batches give the
    reference's exact-trim numerics at valid frames.

    ``mel_lengths`` (i32[B], optional): per-sample true mel-frame counts
    (``n_samples // 160``). Defaults to ``2 * frame_lengths``, which is one
    frame off when the true mel length is odd — pass it explicitly for
    exact parity.
    """
    if encode_fn is None:
        encode_fn = encode_audio
    if decode_fn is None:
        decode_fn = decoder_logits
    # [B, n_mels, T_mel] (fused Pallas kernel on TPU for 80-band models)
    mel = log_mel(audio, n_mels=cfg.whisper.n_mels)
    if frame_lengths is not None:
        # zero mel beyond each sample's true length: the reference computes
        # the mel on exact-length audio and zero-pads the *mel* to 30 s
        # (`module/align_model.py:89` pad_or_trim), whereas bucketed audio
        # padding would otherwise leave mel-of-silence values there
        if mel_lengths is None:
            mel_lengths = 2 * frame_lengths
        t_idx = jnp.arange(mel.shape[-1])
        mel = jnp.where(
            t_idx[None, None, :] < mel_lengths[:, None, None], mel, 0.0)
    t_mel = mel.shape[-1]

    if not trim_to_input_length or t_mel == N_FRAMES:
        mel30 = pad_or_trim(mel, N_FRAMES)
        embed = encode_fn(params["whisper"], cfg.whisper, mel30, remat=remat)
        embed_for_decoder = embed
        align_embed = embed
        if trim_to_input_length:
            align_embed = embed[:, : _half(t_mel)]
    elif t_mel <= N_FRAMES:
        mel30 = pad_or_trim(mel, N_FRAMES)
        embed = encode_fn(params["whisper"], cfg.whisper, mel30, remat=remat)
        align_embed = embed[:, : _half(t_mel)]
        embed_for_decoder = embed
    else:
        # >30 s: batch every window through the encoder at once (the
        # reference loops windows sequentially through the GPU)
        b = mel.shape[0]
        n_chunks = -(-t_mel // N_FRAMES)
        padded = pad_or_trim(mel, n_chunks * N_FRAMES)
        windows = padded.reshape(b, mel.shape[1], n_chunks, N_FRAMES)
        windows = windows.transpose(0, 2, 1, 3).reshape(b * n_chunks, mel.shape[1], N_FRAMES)
        embeds = encode_fn(params["whisper"], cfg.whisper, windows, remat=remat)
        embeds = embeds.reshape(b, n_chunks, EMBED_FRAMES, -1)
        # per-window true length: full windows keep all 1500 frames, the
        # last keeps round(remainder / 2)
        parts = [embeds[:, i] for i in range(n_chunks - 1)]
        last_len = _half(t_mel - (n_chunks - 1) * N_FRAMES)
        parts.append(embeds[:, -1, :last_len])
        align_embed = jnp.concatenate(parts, axis=1)
        embed_for_decoder = align_embed[:, :EMBED_FRAMES]

    if cfg.freeze_encoder:
        # the reference freezes the encoder for BOTH heads (torch.no_grad
        # around embed_audio, `module/align_model.py:137-139`): no gradient
        # reaches the encoder through the align head or through the
        # decoder's cross-attention, which also lets XLA drop the entire
        # encoder backward pass
        align_embed = jax.lax.stop_gradient(align_embed)
        embed_for_decoder = jax.lax.stop_gradient(embed_for_decoder)

    align_logits = None
    if cfg.train_alignment:
        head_fn = (align_head_hidden if align_head_output == "hidden"
                   else align_head_apply)
        align_logits = head_fn(
            params["align_head"], align_embed, dropout=cfg.dropout,
            rng=dropout_rng, lengths=frame_lengths
        )

    transcribe_logits = None
    if cfg.train_transcript and y_in is not None:
        transcribe_logits = decode_fn(
            params["whisper"], cfg.whisper, y_in, embed_for_decoder, remat=remat
        )
    return align_logits, transcribe_logits


def _half(n: int) -> int:
    """round(n / 2) with Python banker's rounding, as the reference's
    ``int(round(mel.shape[-1] / 2.0))`` (`module/align_model.py:88,98`)."""
    return int(round(n / 2.0))
