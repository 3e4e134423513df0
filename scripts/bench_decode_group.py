"""Same-run A/B: K-grouped decode while_loop bodies vs K=1.

The decode loop carries a fixed per-``while_loop``-iteration cost (~0.4 ms,
PARITY "decode investigation"); ``group=K`` unrolls K token steps per
iteration (token-for-token identical — tests/test_decode.py), paying up to
K-1 masked overshoot steps per song to amortize it. Measures batched beam-5
and greedy transcribe at the bench operating points, alternating arms
within one process so tunnel drift cancels.

Env: BENCH_MODEL (medium), BENCH_BATCH (16), GROUPS (comma list, default
"1,7,3"), BENCH_ITERS (6).
"""

import dataclasses
import json
import os
import time

import numpy as np

MODEL = os.environ.get("BENCH_MODEL", "medium")
BATCH = int(os.environ.get("BENCH_BATCH", "16"))
ITERS = int(os.environ.get("BENCH_ITERS", "6"))
GROUPS = [int(g) for g in os.environ.get("GROUPS", "1,7,3").split(",")]
SECONDS = 30.0
MAX_NEW = 64


def main():
    import jax
    import jax.numpy as jnp

    from bench import _bf16_resident, _mcfg
    from lyricalignment_tpu import N_FRAMES
    from lyricalignment_tpu.decode.beam import beam_search, greedy_decode
    from lyricalignment_tpu.models.align_model import init_align_model
    from lyricalignment_tpu.models.whisper import encode_audio
    from lyricalignment_tpu.ops.mel import log_mel, pad_or_trim
    from lyricalignment_tpu.text.whisper_tokenizer import WhisperTokenizer

    assert jax.devices()[0].platform != "cpu", "needs the TPU"

    mcfg = _mcfg(MODEL)
    params = init_align_model(jax.random.PRNGKey(0), mcfg)
    dparams = _bf16_resident(params["whisper"])
    wt = WhisperTokenizer()
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal(
        (BATCH, int(SECONDS * 16000))).astype(np.float32) * 0.1)
    prompt = jnp.asarray(np.tile(
        list(wt.sot_sequence) + [wt.no_timestamps], (BATCH, 1)).astype(np.int32))

    mel = pad_or_trim(log_mel(audio), N_FRAMES)
    xa = jax.jit(lambda p, m: encode_audio(p, mcfg.whisper, m))(dparams, mel)
    np.asarray(xa[0, 0, 0])

    def run_beam(group):
        toks, _ = beam_search(dparams, mcfg.whisper, xa, prompt, beam_size=5,
                              max_new_tokens=MAX_NEW, eot=wt.eot, group=group)
        return toks

    def run_greedy(group):
        return greedy_decode(dparams, mcfg.whisper, xa, prompt,
                             max_new_tokens=MAX_NEW, eot=wt.eot, group=group)

    results = {"sweep": "decode_group_ab", "model": MODEL, "batch": BATCH,
               "beam5_ms_per_batch": {}, "greedy_ms_per_batch": {},
               "tokens_equal": {}}

    ref_beam = ref_greedy = None
    for mode, runner, key in (("beam", run_beam, "beam5_ms_per_batch"),
                              ("greedy", run_greedy, "greedy_ms_per_batch")):
        for g in GROUPS:
            np.asarray(runner(g))  # compile
        # alternate arms twice each so drift cancels
        for rep in range(2):
            for g in GROUPS:
                t0 = time.perf_counter()
                out = None
                for _ in range(ITERS):
                    out = runner(g)
                out_np = np.asarray(out)
                ms = (time.perf_counter() - t0) / ITERS * 1e3
                results[key].setdefault(str(g), []).append(round(ms, 1))
                if g == GROUPS[0] and rep == 0:
                    if mode == "beam":
                        ref_beam = out_np
                    else:
                        ref_greedy = out_np
                else:
                    ref = ref_beam if mode == "beam" else ref_greedy
                    results["tokens_equal"][f"{mode}_g{g}"] = bool(
                        np.array_equal(out_np, ref))

    print(json.dumps(results))


if __name__ == "__main__":
    main()
