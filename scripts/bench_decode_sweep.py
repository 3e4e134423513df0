"""Decode throughput vs batch size (VERDICT r2 #2).

Round 2 established that at B=8 the decode loop is bound by per-op
execution overhead (~0.4 ms fixed per fori_loop iteration), not HBM
bandwidth — which predicts throughput should scale near-linearly with rows
until HBM runs out. This sweep measures medium greedy and beam-5 at
B in {8, 16, 32, 64} in ONE process (same-run numbers are the only
comparable ones on the axon tunnel, CLAUDE.md) and prints one JSON line per
config. OOM configs are recorded as failed rather than killing the sweep.

Run alone on the TPU (never two TPU processes):
    timeout 3600 python scripts/bench_decode_sweep.py
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    import bench as benchmod

    benchmod._wait_for_backend()

    import jax
    import jax.numpy as jnp

    from lyricalignment_tpu import N_FRAMES
    from lyricalignment_tpu.decode.beam import beam_search, greedy_decode
    from lyricalignment_tpu.models.align_model import AlignModelConfig, init_align_model
    from lyricalignment_tpu.models.whisper import WHISPER_CONFIGS, encode_audio
    from lyricalignment_tpu.ops.mel import log_mel, pad_or_trim
    from lyricalignment_tpu.text.whisper_tokenizer import WhisperTokenizer

    model_name = "medium"
    clip_seconds = 30.0
    max_new = 64

    wcfg = dataclasses.replace(WHISPER_CONFIGS[model_name],
                               compute_dtype=jnp.bfloat16, fast_gelu=True)
    mcfg = AlignModelConfig(whisper=wcfg, hidden_dim=384, output_dim=21129)
    params = init_align_model(jax.random.PRNGKey(0), mcfg)
    wt = WhisperTokenizer()
    from lyricalignment_tpu.models.whisper import bf16_resident_params

    dparams = bf16_resident_params(params["whisper"])
    enc_params = params["whisper"]

    def make_fn(batch, beam):
        prompt = np.tile(list(wt.sot_sequence) + [wt.no_timestamps],
                         (batch, 1)).astype(np.int32)
        prompt = jnp.asarray(prompt)

        @jax.jit
        def run(dparams, enc_params, audio):
            mel = pad_or_trim(log_mel(audio), N_FRAMES)
            xa = encode_audio(enc_params, wcfg, mel)
            if beam == 1:
                toks = greedy_decode(dparams, wcfg, xa, prompt,
                                     max_new_tokens=max_new, eot=wt.eot)
            else:
                toks, _ = beam_search(dparams, wcfg, xa, prompt, beam_size=beam,
                                      max_new_tokens=max_new, eot=wt.eot)
            return toks

        return run

    rng = np.random.default_rng(0)
    results = []
    for batch in (8, 16, 32, 64):
        audio = jnp.asarray(
            rng.standard_normal((batch, int(clip_seconds * 16000))).astype(np.float32) * 0.1)
        for beam in (1, 5):
            iters = max(2, 48 // batch)
            label = f"B={batch} {'greedy' if beam == 1 else f'beam{beam}'}"
            try:
                fn = make_fn(batch, beam)
                np.asarray(fn(dparams, enc_params, audio))  # compile
                t0 = time.perf_counter()
                out = None
                for _ in range(iters):
                    out = fn(dparams, enc_params, audio)
                _ = np.asarray(out[0, 0])
                elapsed = time.perf_counter() - t0
                v = iters * batch * clip_seconds / elapsed
                ms = 1000.0 * elapsed / iters
                rec = {"config": label, "batch": batch, "beam": beam,
                       "audio_s_per_s": round(v, 1),
                       "ms_per_batch": round(ms, 1), "iters": iters}
            except Exception as e:  # OOM etc: record, continue
                rec = {"config": label, "batch": batch, "beam": beam,
                       "error": f"{type(e).__name__}: {str(e)[:200]}"}
            results.append(rec)
            print(json.dumps(rec), flush=True)
        del audio

    print(json.dumps({"sweep": "decode_batch", "model": model_name,
                      "max_new_tokens": max_new,
                      "platform": jax.devices()[0].platform,
                      "results": results}))


if __name__ == "__main__":
    sys.exit(main())
