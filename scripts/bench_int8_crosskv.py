"""Same-run A/B: int8-quantized cross-attention K/V in the decode cache.

Cross K/V are the dominant per-step HBM stream of batched autoregressive
decoding (~147 MB/sample/step at medium bf16 — PARITY.md decode-loop
decomposition). The round-2 int8 attempt (inside the Pallas flash-decode
kernel, B=8) showed no gain because at that batch the loop is per-op-
overhead-bound. With the split prompt/gen cache the loop is cross-KV-
bandwidth-bound at B>=16, so halving the stream should now pay — this
script measures it on the production einsum path at the operating points
(beam-5 B in {8, 16, 32}; greedy B=32), plus a 227-token conditioned-prompt
long-form window at B=8 beam-5.

Run alone on the TPU (never two TPU processes):
    timeout 5400 python scripts/bench_int8_crosskv.py
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

    base_cfg = dataclasses.replace(WHISPER_CONFIGS[model_name],
                                   compute_dtype=jnp.bfloat16, fast_gelu=True)
    mcfg = AlignModelConfig(whisper=base_cfg, hidden_dim=384, output_dim=21129)
    params = init_align_model(jax.random.PRNGKey(0), mcfg)
    wt = WhisperTokenizer()
    from lyricalignment_tpu.models.whisper import bf16_resident_params

    dparams = bf16_resident_params(params["whisper"])
    enc_params = params["whisper"]

    def make_fn(wcfg, batch, beam, prompt_len):
        sot = list(wt.sot_sequence) + [wt.no_timestamps]
        if prompt_len > len(sot):
            # long-form-style conditioned prompt: <|startofprev|> + context
            rng_p = np.random.default_rng(1)
            ctx = rng_p.integers(100, 8000, size=prompt_len - len(sot))
            prompt_row = np.concatenate([ctx, np.asarray(sot)])
        else:
            prompt_row = np.asarray(sot)
        prompt = jnp.asarray(np.tile(prompt_row, (batch, 1)).astype(np.int32))

        @jax.jit
        def run(dparams, enc_params, audio):
            mel = pad_or_trim(log_mel(audio), N_FRAMES)
            xa = encode_audio(enc_params, wcfg, mel)
            if beam == 1:
                return greedy_decode(dparams, wcfg, xa, prompt,
                                     max_new_tokens=max_new, eot=wt.eot)
            toks, _ = beam_search(dparams, wcfg, xa, prompt, beam_size=beam,
                                  max_new_tokens=max_new, eot=wt.eot)
            return toks

        return run

    rng = np.random.default_rng(0)
    configs = [  # (batch, beam, prompt_len)
        (8, 5, 4),
        (16, 5, 4),
        (32, 5, 4),
        (32, 1, 4),
        (8, 5, 227),
    ]
    results = []
    for batch, beam, plen in configs:
        audio = jnp.asarray(
            rng.standard_normal((batch, int(clip_seconds * 16000))).astype(np.float32) * 0.1)
        pair = {}
        for tag, q in (("bf16", False), ("int8", True)):
            wcfg = dataclasses.replace(base_cfg, int8_cross_kv=q)
            label = f"B={batch} beam{beam} P={plen} {tag}"
            try:
                fn = make_fn(wcfg, batch, beam, plen)
                np.asarray(fn(dparams, enc_params, audio))  # compile
                iters = max(2, 48 // batch)
                t0 = time.perf_counter()
                out = None
                for _ in range(iters):
                    out = fn(dparams, enc_params, audio)
                _ = np.asarray(out[0, 0])
                elapsed = time.perf_counter() - t0
                ms = 1000.0 * elapsed / iters
                rec = {"config": label,
                       "audio_s_per_s": round(iters * batch * clip_seconds / elapsed, 1),
                       "ms_per_batch": round(ms, 1)}
                pair[tag] = ms
            except Exception as e:
                rec = {"config": label,
                       "error": f"{type(e).__name__}: {str(e)[:200]}"}
            results.append(rec)
            print(json.dumps(rec), flush=True)
        if "bf16" in pair and "int8" in pair:
            print(json.dumps({"config": f"B={batch} beam{beam} P={plen}",
                              "speedup_int8": round(pair["bf16"] / pair["int8"], 3)}),
                  flush=True)
        del audio

    print(json.dumps({"sweep": "int8_cross_kv_ab", "model": model_name,
                      "max_new_tokens": max_new,
                      "platform": jax.devices()[0].platform,
                      "results": results}))


if __name__ == "__main__":
    sys.exit(main())
