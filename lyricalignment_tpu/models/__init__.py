from lyricalignment_tpu.models.whisper import (
    WhisperConfig,
    WHISPER_CONFIGS,
    init_whisper_params,
    encode_audio,
    decoder_logits,
)

__all__ = [
    "WhisperConfig",
    "WHISPER_CONFIGS",
    "init_whisper_params",
    "encode_audio",
    "decoder_logits",
]
