"""Same-run A/B: Viterbi DP/backtrace scan unroll factors.

The forced-alignment DP (`ops/viterbi._viterbi_dp`) runs two sequential
scans of ~1500 steps whose bodies are tiny O(K=2L+1) vector updates —
per-iteration loop overhead dominates, exactly like the GRU scans. This
sweeps the trace-time LA_TPU_VITERBI_UNROLL knob on (a) the isolated fused
Viterbi (amortized via lax.fori_loop inside one jit call) and (b) the full
production alignment batch. Arms alternate so tunnel drift cancels; the
onset/offset outputs must be exactly equal across arms.
"""

import dataclasses
import json
import os
import time

import numpy as np

MODEL = os.environ.get("BENCH_MODEL", "medium")
BATCH = int(os.environ.get("BENCH_BATCH", "16"))
ITERS = int(os.environ.get("BENCH_ITERS", "8"))
LOOP = int(os.environ.get("BENCH_LOOP", "32"))
SECONDS = float(os.environ.get("BENCH_SECONDS", "30"))
UNROLLS = [int(u) for u in
           os.environ.get("BENCH_UNROLLS", "1,8,16").split(",")]
MAX_LABELS = 48


def main():
    import jax
    import jax.numpy as jnp

    from lyricalignment_tpu import N_FRAMES
    from lyricalignment_tpu.models.align_head import align_head_hidden
    from lyricalignment_tpu.models.align_model import (
        AlignModelConfig, init_align_model)
    from lyricalignment_tpu.models.whisper import (
        WHISPER_CONFIGS, bf16_resident_params, encode_audio)
    from lyricalignment_tpu.ops.mel import log_mel, pad_or_trim
    from lyricalignment_tpu.ops import viterbi as vmod

    assert jax.devices()[0].platform != "cpu", "needs the TPU"

    wcfg = dataclasses.replace(WHISPER_CONFIGS[MODEL],
                               compute_dtype=jnp.bfloat16, fast_gelu=True,
                               onepass_encoder=True)
    mcfg = AlignModelConfig(whisper=wcfg, hidden_dim=384,
                            output_dim=21128 + 1)
    params = init_align_model(jax.random.PRNGKey(0), mcfg)
    params["whisper"] = bf16_resident_params(params["whisper"])
    fc = params["align_head"]["fc"]

    rng = np.random.default_rng(0)
    T = N_FRAMES // 2
    h_fixed = jnp.asarray(rng.standard_normal(
        (BATCH, T, 768)).astype(np.float32))
    labels = jnp.asarray(
        rng.integers(2, 400, (BATCH, MAX_LABELS)).astype(np.int32))
    num_labels = jnp.asarray(np.full((BATCH,), MAX_LABELS, np.int32))
    num_frames = jnp.full((BATCH,), T, jnp.int32)

    n_samples = int(SECONDS * 16000)
    audio = jnp.asarray(
        rng.standard_normal((BATCH, n_samples)).astype(np.float32) * 0.1)

    def trace_arm(unroll):
        os.environ["LA_TPU_VITERBI_UNROLL"] = str(unroll)
        vmod.viterbi_align_fused.clear_cache()

        # isolated: LOOP fused-viterbi calls inside one jit, serialized by
        # feeding a scalar of the output back into h
        def iso(h):
            def body(_, carry):
                on, off = vmod.viterbi_align_fused(
                    carry, fc, labels, num_labels, num_frames, mode="ctc")
                return carry + (on[0, 0] * 0).astype(carry.dtype)

            h = jax.lax.fori_loop(0, LOOP, body, h)
            return vmod.viterbi_align_fused(h, fc, labels, num_labels,
                                            num_frames, mode="ctc")

        def e2e(params, audio):
            mel = pad_or_trim(log_mel(audio), N_FRAMES)
            embed = encode_audio(params["whisper"], mcfg.whisper, mel)
            h = align_head_hidden(params["align_head"], embed)
            t = jnp.full((audio.shape[0],), h.shape[1], jnp.int32)
            on, off = vmod.viterbi_align_fused(h, fc, labels, num_labels, t,
                                               mode="ctc")
            return vmod.frames_to_seconds(on, off)

        iso_fn, e2e_fn = jax.jit(iso), jax.jit(e2e)
        out = np.asarray(iso_fn(h_fixed)[0])  # compile barrier
        e2e_out = np.asarray(e2e_fn(params, audio))
        return iso_fn, e2e_fn, out, e2e_out

    arms = {u: trace_arm(u) for u in UNROLLS}
    base = arms[UNROLLS[0]]
    exact = all(np.array_equal(base[2], a[2]) and np.array_equal(base[3], a[3])
                for a in arms.values())

    def time_iso(fn):
        t0 = time.perf_counter()
        out = fn(h_fixed)
        np.asarray(out[0])
        return (time.perf_counter() - t0) / (LOOP + 1) * 1e3

    def time_e2e(fn):
        t0 = time.perf_counter()
        out = None
        for _ in range(ITERS):
            out = fn(params, audio)
        _ = np.asarray(out[0, 0])
        return ITERS * BATCH * SECONDS / (time.perf_counter() - t0)

    iso_ms = {u: [] for u in UNROLLS}
    e2e_tp = {u: [] for u in UNROLLS}
    for _ in range(2):
        for u in UNROLLS:
            iso_ms[u].append(time_iso(arms[u][0]))
        for u in UNROLLS:
            e2e_tp[u].append(time_e2e(arms[u][1]))

    print(json.dumps({
        "sweep": "viterbi_unroll", "model": MODEL, "batch": BATCH,
        "iso_ms_per_call": {u: [round(v, 2) for v in vs]
                            for u, vs in iso_ms.items()},
        "e2e_audio_s_per_s": {u: [round(v, 1) for v in vs]
                              for u, vs in e2e_tp.items()},
        "outputs_exact_equal": bool(exact),
    }))


if __name__ == "__main__":
    main()
