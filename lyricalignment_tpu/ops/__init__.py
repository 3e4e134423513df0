from lyricalignment_tpu.ops.mel import log_mel_spectrogram, mel_filterbank, pad_or_trim

__all__ = ["log_mel_spectrogram", "mel_filterbank", "pad_or_trim"]
