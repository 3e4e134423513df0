"""lyricalignment_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for Mandarin
lyric alignment and transcription.

Re-designed from scratch with the capabilities of navi0105/LyricAlignment
(ASRU 2023): joint lyrics alignment (Whisper encoder + frame-wise pinyin
syllable head + Viterbi/CTC forced alignment) and lyrics transcription
(fine-tuned Whisper encoder-decoder with beam search).

Layering (see SURVEY.md §7):
    ops/       — compute kernels: log-mel frontend, scan-GRU, Viterbi scan, CTC
    models/    — pure-functional Whisper + alignment head + composition
    parallel/  — device mesh, sharding rules, pjit helpers
    data/      — host-side records/audio/batching pipeline (static shapes)
    text/      — tokenizers, pinyin tables, normalization
    train/     — jitted multitask trainer, optax optimizers, orbax checkpoints
    decode/    — KV-cached greedy/beam transcription
    utils/     — metrics (MAE/CER/PER), misc host utilities
    cli/       — entry points mirroring the reference's four CLIs
    prep/      — offline dataset preparation scripts
"""

__version__ = "0.1.0"

SAMPLE_RATE = 16_000
N_FFT = 400
HOP_LENGTH = 160
N_MELS = 80
CHUNK_LENGTH = 30  # seconds
N_SAMPLES = CHUNK_LENGTH * SAMPLE_RATE  # 480_000 samples in a 30 s window
N_FRAMES = N_SAMPLES // HOP_LENGTH  # 3000 mel frames in a 30 s window
FRAMES_PER_SECOND = SAMPLE_RATE // HOP_LENGTH  # 100 mel frames / s
EMBED_FRAMES = N_FRAMES // 2  # 1500 encoder frames (20 ms hop)
HOP_SIZE_SECOND = 0.02  # encoder frame hop in seconds
