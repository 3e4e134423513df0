"""Same-run A/B: fused-direction bi-GRU scan vs per-direction scans.

The alignment head's bi-GRU (2 layers x 2 directions over 1500 frames) is
per-step-overhead bound: each scan step is a tiny [B,H]x[H,3H] matmul. The
fused layer (`ops.gru.gru_layer_bidir`) advances both directions in ONE
scan (step t = fwd position t + bwd position T-1-t, batched einsum over a
stacked [2,H,3H] weight), halving the sequential scan count per layer.

OUTCOME (v5e, 2026-08-19): fusion LOST — isolated head 4.4 ms separate vs
6.3 ms fused; end-to-end 2590 vs 2562 audio-s/s; outputs exactly equal.
Production (`bigru_apply`) stays on per-direction scans (mirrored here by
``bigru_separate``); the fused layer is kept as a tested exhibit.

Two measurements, arms alternated A/B/A/B so tunnel drift cancels
(CLAUDE.md: only same-run pairs are comparable):
  1. isolated head: bi-GRU+Mish over a fixed [B,T,D] embed tensor,
     amortized inside one jit call via lax.fori_loop;
  2. end-to-end alignment batch (mel -> encoder -> head -> fused Viterbi)
     at the production operating point (medium B=16 bf16 onepass).
Cross-checks the two arms' outputs (must match to f32 roundoff).
"""

import dataclasses
import json
import os
import time

import numpy as np

MODEL = os.environ.get("BENCH_MODEL", "medium")
BATCH = int(os.environ.get("BENCH_BATCH", "16"))
ITERS = int(os.environ.get("BENCH_ITERS", "8"))
LOOP = int(os.environ.get("BENCH_LOOP", "32"))  # fori_loop iters, isolated arm
SECONDS = float(os.environ.get("BENCH_SECONDS", "30"))
MAX_LABELS = 48


def bigru_separate(params, x, unroll=4):
    """The pre-fusion composition: one scan per (layer, direction)."""
    import jax.numpy as jnp

    from lyricalignment_tpu.ops.gru import gru_layer

    for layer in params["layers"]:
        outs = [gru_layer(layer["dirs"][0], x, reverse=False, unroll=unroll)]
        if len(layer["dirs"]) == 2:
            outs.append(gru_layer(layer["dirs"][1], x, reverse=True,
                                  unroll=unroll))
        x = jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]
    return x


def main():
    import jax
    import jax.numpy as jnp

    from lyricalignment_tpu import N_FRAMES
    from lyricalignment_tpu.models.align_head import mish
    from lyricalignment_tpu.models.align_model import (
        AlignModelConfig, init_align_model)
    from lyricalignment_tpu.models.whisper import (
        WHISPER_CONFIGS, bf16_resident_params, encode_audio)
    from lyricalignment_tpu.ops.gru import bigru_apply
    from lyricalignment_tpu.ops.mel import log_mel, pad_or_trim
    from lyricalignment_tpu.ops.viterbi import (
        frames_to_seconds, viterbi_align_fused)

    assert jax.devices()[0].platform != "cpu", "needs the TPU"

    wcfg = dataclasses.replace(WHISPER_CONFIGS[MODEL],
                               compute_dtype=jnp.bfloat16, fast_gelu=True,
                               onepass_encoder=True)
    mcfg = AlignModelConfig(whisper=wcfg, hidden_dim=384,
                            output_dim=21128 + 1)
    params = init_align_model(jax.random.PRNGKey(0), mcfg)
    params["whisper"] = bf16_resident_params(params["whisper"])
    gru = params["align_head"]["gru"]

    rng = np.random.default_rng(0)
    T = N_FRAMES // 2
    embed = jnp.asarray(rng.standard_normal(
        (BATCH, T, wcfg.n_audio_state)).astype(np.float32)).astype(jnp.bfloat16)

    # ---- isolated head arm: amortize LOOP iterations inside one jit call
    def looped(head_fn):
        def body(_, carry):
            out = head_fn(gru, carry)
            # feed a scalar of the output back so iterations serialize
            return carry + out[0, 0, :1].astype(carry.dtype) * 0.0

        def run(x):
            x = jax.lax.fori_loop(0, LOOP, body, x)
            return head_fn(gru, x).sum()

        return jax.jit(run)

    iso_sep = looped(lambda p, x: bigru_separate(p, x))
    iso_fused = looped(lambda p, x: bigru_apply(p, x))

    def time_iso(fn):
        np.asarray(fn(embed))  # compile
        t0 = time.perf_counter()
        out = fn(embed)
        np.asarray(out)
        return (time.perf_counter() - t0) / (LOOP + 1) * 1e3  # ms/call

    # outputs parity
    o_sep = np.asarray(jax.jit(bigru_separate)(gru, embed), np.float32)
    o_fus = np.asarray(jax.jit(bigru_apply)(gru, embed), np.float32)
    maxdiff = float(np.abs(o_sep - o_fus).max())

    iso_rows = {"sep": [], "fused": []}
    for _ in range(2):
        iso_rows["sep"].append(time_iso(iso_sep))
        iso_rows["fused"].append(time_iso(iso_fused))

    # ---- end-to-end alignment arm
    def make_align(head_fn):
        def align_batch(params, audio, labels, num_labels):
            mel = pad_or_trim(log_mel(audio), N_FRAMES)
            emb = encode_audio(params["whisper"], mcfg.whisper, mel)
            h = mish(head_fn(params["align_head"]["gru"], emb)).astype(
                jnp.float32)
            t = jnp.full((audio.shape[0],), h.shape[1], jnp.int32)
            on, off = viterbi_align_fused(h, params["align_head"]["fc"],
                                          labels, num_labels, t, mode="ctc")
            return frames_to_seconds(on, off)

        return jax.jit(align_batch)

    n_samples = int(SECONDS * 16000)
    audio = jnp.asarray(
        rng.standard_normal((BATCH, n_samples)).astype(np.float32) * 0.1)
    labels = jnp.asarray(
        rng.integers(2, 400, (BATCH, MAX_LABELS)).astype(np.int32))
    num_labels = jnp.asarray(np.full((BATCH,), MAX_LABELS, np.int32))

    fn_sep = make_align(bigru_separate)
    fn_fused = make_align(bigru_apply)
    out_sep = np.asarray(fn_sep(params, audio, labels, num_labels))
    out_fused = np.asarray(fn_fused(params, audio, labels, num_labels))
    e2e_exact = np.array_equal(out_sep, out_fused)

    def run_e2e(fn):
        t0 = time.perf_counter()
        out = None
        for _ in range(ITERS):
            out = fn(params, audio, labels, num_labels)
        _ = np.asarray(out[0, 0])
        return ITERS * BATCH * SECONDS / (time.perf_counter() - t0)

    e2e_rows = {"sep": [], "fused": []}
    for _ in range(2):
        e2e_rows["sep"].append(run_e2e(fn_sep))
        e2e_rows["fused"].append(run_e2e(fn_fused))

    print(json.dumps({
        "sweep": "gru_fused_ab", "model": MODEL, "batch": BATCH,
        "iso_ms_per_call": {k: [round(v, 2) for v in vs]
                            for k, vs in iso_rows.items()},
        "iso_speedup": round(np.mean(iso_rows["sep"])
                             / np.mean(iso_rows["fused"]), 4),
        "e2e_audio_s_per_s": {k: [round(v, 1) for v in vs]
                              for k, vs in e2e_rows.items()},
        "e2e_speedup": round(np.mean(e2e_rows["fused"])
                             / np.mean(e2e_rows["sep"]), 4),
        "head_outputs_max_abs_diff": maxdiff,
        "e2e_outputs_exact_equal": bool(e2e_exact),
    }))


if __name__ == "__main__":
    main()
