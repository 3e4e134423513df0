"""Alignment throughput benchmark.

Measures end-to-end alignment speed — raw audio -> log-mel -> Whisper
encoder -> bi-GRU syllable head -> Viterbi forced alignment -> on/offsets —
in audio-seconds processed per wall-second per chip, on synthetic 30 s
clips (Opencpop-like lyric lengths). Prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "audio_sec_per_sec_per_chip",
     "vs_baseline": N}

``vs_baseline`` is the ratio against the 50x-real-time per-chip target from
BASELINE.json (the reference publishes no speed numbers — SURVEY.md §6).

Env knobs: BENCH_MODEL (tiny|base|small|medium, default medium),
BENCH_BATCH (default 8), BENCH_ITERS (default 8), BENCH_SECONDS (clip
length, default 30), BENCH_MODE (align | transcribe | train; transcribe
measures batched beam-5 decoding, train measures the full multitask update
— both in audio-sec/sec/chip).
"""

import dataclasses
import json
import os
import time

import numpy as np

BASELINE_RTF = 50.0  # x real-time per chip (BASELINE.json north star)


def main():
    import jax
    import jax.numpy as jnp

    from lyricalignment_tpu.models.align_head import align_head_hidden
    from lyricalignment_tpu.models.align_model import AlignModelConfig, init_align_model
    from lyricalignment_tpu.models.whisper import WHISPER_CONFIGS, encode_audio
    from lyricalignment_tpu.ops.mel import log_mel, pad_or_trim
    from lyricalignment_tpu.ops.viterbi import frames_to_seconds, viterbi_align_fused
    from lyricalignment_tpu import N_FRAMES

    model_name = os.environ.get("BENCH_MODEL", "medium")
    batch = int(os.environ.get("BENCH_BATCH", "8"))
    iters = int(os.environ.get("BENCH_ITERS", "8"))
    clip_seconds = float(os.environ.get("BENCH_SECONDS", "30"))

    # bf16 compute + tanh GELU: the gelu approximation error (<= 3e-3) is
    # below the bf16 rounding already accepted on this path
    wcfg = dataclasses.replace(WHISPER_CONFIGS[model_name],
                               compute_dtype=jnp.bfloat16, fast_gelu=True)
    mcfg = AlignModelConfig(whisper=wcfg, hidden_dim=384, output_dim=21128 + 1)
    params = init_align_model(jax.random.PRNGKey(0), mcfg)

    n_samples = int(clip_seconds * 16000)
    max_labels = 48  # typical Opencpop utterance length upper bound

    @jax.jit
    def align_batch(params, audio, labels, num_labels):
        mel = pad_or_trim(log_mel(audio), N_FRAMES)
        embed = encode_audio(params["whisper"], mcfg.whisper, mel)
        # fused classifier->Viterbi: the [B, T, 21129] logits never hit HBM
        h = align_head_hidden(params["align_head"], embed)
        t = jnp.full((audio.shape[0],), h.shape[1], jnp.int32)
        on, off = viterbi_align_fused(h, params["align_head"]["fc"],
                                      labels, num_labels, t, mode="ctc")
        return frames_to_seconds(on, off)

    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((batch, n_samples)).astype(np.float32) * 0.1)
    labels = jnp.asarray(rng.integers(2, 400, (batch, max_labels)).astype(np.int32))
    num_labels = jnp.asarray(np.full((batch,), max_labels, np.int32))

    if os.environ.get("BENCH_MODE", "align") == "train":
        from lyricalignment_tpu.train.trainer import (
            TrainConfig, init_train_state, make_train_step)

        mcfg_t = dataclasses.replace(mcfg, train_transcript=True)
        # medium at the reference recipe (batch 2 x accum 8) fits HBM
        # without rematerialisation and runs ~17% faster; set
        # BENCH_TRAIN_REMAT=1 for larger models/batches
        remat = os.environ.get("BENCH_TRAIN_REMAT", "0") != "0"
        tcfg = TrainConfig(accum_grad_steps=8, use_ctc=True, vocab_size=21128,
                           remat=remat, grad_accum_dtype=jnp.bfloat16,
                           adam_mu_dtype=jnp.bfloat16)
        state, tx = init_train_state(params, tcfg)
        step_fn = make_train_step(mcfg_t, tcfg, tx)
        tb = 2  # reference recipe: batch 2 x accum 8
        stacked = {
            "audio": jnp.asarray(rng.standard_normal((8, tb, n_samples)).astype(np.float32) * 0.05),
            "ctc_labels": jnp.asarray(np.pad(
                rng.integers(2, 400, (8, tb, 24)).astype(np.int32),
                ((0, 0), (0, 0), (0, 24)), constant_values=-100)),
            "frame_labels": jnp.asarray(np.where(
                rng.random((8, tb, 1500)) < 0.3,
                rng.integers(2, 400, (8, tb, 1500)), -100).astype(np.int32)),
            "label_lengths": jnp.asarray(np.full((8, tb), 24, np.int32)),
            "has_alignment": jnp.asarray(np.ones((8, tb), bool)),
            "decoder_input": jnp.asarray(rng.integers(0, 51865, (8, tb, 40)).astype(np.int32)),
            "decoder_output": jnp.asarray(rng.integers(0, 51865, (8, tb, 40)).astype(np.int32)),
        }
        key = jax.random.PRNGKey(1)
        state, losses = step_fn(state, stacked, key)
        _ = float(losses["total"])
        t0 = time.perf_counter()
        for _ in range(max(iters // 2, 2)):
            state, losses = step_fn(state, stacked, key)
        _ = float(losses["total"])
        elapsed = time.perf_counter() - t0
        n_steps = max(iters // 2, 2)
        value = n_steps * 8 * tb * clip_seconds / elapsed / jax.device_count()
        print(json.dumps({
            "metric": f"train_throughput_{model_name}",
            "value": round(value, 2),
            "unit": "audio_sec_per_sec_per_chip",
            "vs_baseline": round(value / BASELINE_RTF, 3),
        }))
        return

    if os.environ.get("BENCH_MODE", "align") == "transcribe":
        from lyricalignment_tpu.decode.beam import beam_search
        from lyricalignment_tpu.text.whisper_tokenizer import WhisperTokenizer

        wt = WhisperTokenizer()
        prompt = jnp.asarray(np.tile(
            list(wt.sot_sequence) + [wt.no_timestamps], (batch, 1)).astype(np.int32))

        # store decode weights in bf16: the token-by-token decoder is
        # weight-streaming-bound, and f32-resident params would double the
        # HBM traffic of every step regardless of compute_dtype
        dparams = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 and x.ndim >= 2 else x,
            params["whisper"])

        @jax.jit
        def transcribe_batch(dparams, params, audio):
            mel = pad_or_trim(log_mel(audio), N_FRAMES)
            xa = encode_audio(params["whisper"], mcfg.whisper, mel)
            toks, _ = beam_search(dparams, mcfg.whisper, xa, prompt,
                                  beam_size=5, max_new_tokens=64, eot=wt.eot)
            return toks

        np.asarray(transcribe_batch(dparams, params, audio))
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = transcribe_batch(dparams, params, audio)
        _ = np.asarray(out[0, 0])
        elapsed = time.perf_counter() - t0
        value = iters * batch * clip_seconds / elapsed / jax.device_count()
        print(json.dumps({
            "metric": f"transcription_throughput_{model_name}_beam5",
            "value": round(value, 2),
            "unit": "audio_sec_per_sec_per_chip",
            "vs_baseline": round(value / BASELINE_RTF, 3),
        }))
        return

    # warmup / compile; fetch to host — under the axon relay
    # block_until_ready() returns before remote completion, so a host
    # materialization is the only reliable completion barrier
    np.asarray(align_batch(params, audio, labels, num_labels))

    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = align_batch(params, audio, labels, num_labels)
    _ = np.asarray(out[0, 0])  # FIFO stream: last result fetch waits for all
    elapsed = time.perf_counter() - t0

    audio_seconds = iters * batch * clip_seconds
    value = audio_seconds / elapsed
    n_chips = jax.device_count()
    value_per_chip = value / n_chips

    print(json.dumps({
        "metric": f"alignment_throughput_{model_name}",
        "value": round(value_per_chip, 2),
        "unit": "audio_sec_per_sec_per_chip",
        "vs_baseline": round(value_per_chip / BASELINE_RTF, 3),
    }))


if __name__ == "__main__":
    main()
