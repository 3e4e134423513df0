"""Same-run A/B: Pallas streaming-lse vs XLA chunked-scan lse in the fused
classifier->Viterbi alignment path (`ops/viterbi._row_lse` dispatch).

Both arms trace the FULL alignment batch (mel -> encoder -> GRU head ->
fused Viterbi) at the production operating point; the only difference is
the class-normaliser backend, toggled via LA_TPU_PALLAS_LSE at trace
time (opt-in; the scan path is the production default after this A/B
measured a wash). Arms alternate A/B/A/B so tunnel drift cancels (CLAUDE.md: only
same-run pairs are comparable). Also cross-checks the two arms' onset/
offset outputs: the kernels must agree exactly after the DP's argmax
(f32 lse differences are ~1e-6, far below tie-breaking sensitivity).
"""

import dataclasses
import os
import time

import numpy as np

MODEL = os.environ.get("BENCH_MODEL", "medium")
BATCH = int(os.environ.get("BENCH_BATCH", "16"))
ITERS = int(os.environ.get("BENCH_ITERS", "8"))
SECONDS = float(os.environ.get("BENCH_SECONDS", "30"))
MAX_LABELS = 48


def build(model_name):
    import jax
    import jax.numpy as jnp

    from lyricalignment_tpu import N_FRAMES
    from lyricalignment_tpu.models.align_head import align_head_hidden
    from lyricalignment_tpu.models.align_model import (
        AlignModelConfig, init_align_model)
    from lyricalignment_tpu.models.whisper import (
        WHISPER_CONFIGS, bf16_resident_params, encode_audio)
    from lyricalignment_tpu.ops.mel import log_mel, pad_or_trim
    from lyricalignment_tpu.ops.viterbi import (
        frames_to_seconds, viterbi_align_fused)

    wcfg = dataclasses.replace(WHISPER_CONFIGS[model_name],
                               compute_dtype=jnp.bfloat16, fast_gelu=True,
                               onepass_encoder=True)
    mcfg = AlignModelConfig(whisper=wcfg, hidden_dim=384,
                            output_dim=21128 + 1)
    params = init_align_model(jax.random.PRNGKey(0), mcfg)
    params["whisper"] = bf16_resident_params(params["whisper"])

    def align_batch(params, audio, labels, num_labels):
        mel = pad_or_trim(log_mel(audio), N_FRAMES)
        embed = encode_audio(params["whisper"], mcfg.whisper, mel)
        h = align_head_hidden(params["align_head"], embed)
        t = jnp.full((audio.shape[0],), h.shape[1], jnp.int32)
        on, off = viterbi_align_fused(h, params["align_head"]["fc"],
                                      labels, num_labels, t, mode="ctc")
        return frames_to_seconds(on, off)

    return params, align_batch


def main():
    import jax
    import jax.numpy as jnp

    assert jax.devices()[0].platform != "cpu", "needs the TPU"
    params, align_batch = build(MODEL)
    rng = np.random.default_rng(0)
    n_samples = int(SECONDS * 16000)
    audio = jnp.asarray(
        rng.standard_normal((BATCH, n_samples)).astype(np.float32) * 0.1)
    labels = jnp.asarray(
        rng.integers(2, 400, (BATCH, MAX_LABELS)).astype(np.int32))
    num_labels = jnp.asarray(np.full((BATCH,), MAX_LABELS, np.int32))

    # trace each arm under its env (read inside _row_lse at trace time);
    # viterbi_align_fused is jitted with static mode/chunk, so clear its
    # cache between traces to force re-dispatch
    from lyricalignment_tpu.ops import viterbi as vmod

    def trace_arm(no_pallas):
        os.environ["LA_TPU_PALLAS_LSE"] = "" if no_pallas else "1"
        vmod.viterbi_align_fused.clear_cache()
        fn = jax.jit(align_batch)
        out = fn(params, audio, labels, num_labels)
        np.asarray(out)  # compile barrier
        return fn, np.asarray(out)

    fn_scan, out_scan = trace_arm(True)
    fn_pallas, out_pallas = trace_arm(False)
    exact = np.array_equal(out_scan, out_pallas)
    maxdiff = float(np.abs(out_scan - out_pallas).max())

    def run(fn):
        t0 = time.perf_counter()
        out = None
        for _ in range(ITERS):
            out = fn(params, audio, labels, num_labels)
        _ = np.asarray(out[0, 0])
        return ITERS * BATCH * SECONDS / (time.perf_counter() - t0)

    rows = []
    for rep in range(2):
        rows.append(("scan", run(fn_scan)))
        rows.append(("pallas", run(fn_pallas)))
    import json
    scan = [v for k, v in rows if k == "scan"]
    pallas = [v for k, v in rows if k == "pallas"]
    print(json.dumps({
        "sweep": "pallas_lse_ab", "model": MODEL, "batch": BATCH,
        "audio_s_per_s": {"scan": [round(v, 1) for v in scan],
                          "pallas": [round(v, 1) for v in pallas]},
        "speedup": round(np.mean(pallas) / np.mean(scan), 4),
        "outputs_exact_equal": bool(exact),
        "outputs_max_abs_diff_s": maxdiff,
    }))


if __name__ == "__main__":
    main()
