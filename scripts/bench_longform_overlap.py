"""Same-run sweep: long-form lockstep serving — overlap groups x slot count.

``transcribe_longform_batched(overlap_groups=G)`` round-robins G
independent lockstep groups so the host's per-round bookkeeping + dispatch
hides behind the other group's device time (a round's prompts depend on
its own previous round's text, so overlap must come from independent
songs). This measures steady-state serving throughput (audio-s/s/chip)
over the same 48-song workload for each (groups, batch) arm, interleaved
twice so tunnel drift cancels.

Env: BENCH_MODEL (medium), ARMS ("groups:batch:decode_group" comma
list, default "1:8:1,2:8:1,2:8:3,2:12:3"), SONGS (48), SECONDS (90).
"""

import json
import os
import time

import numpy as np

MODEL = os.environ.get("BENCH_MODEL", "medium")
SONGS = int(os.environ.get("SONGS", "48"))
SECONDS = float(os.environ.get("SECONDS", "90"))
ARMS = [tuple(int(x) for x in a.split(":"))
        for a in os.environ.get(
            "ARMS", "1:8:1,2:8:1,2:8:3,2:12:3").split(",")]


def main():
    import jax

    from bench import _bf16_resident, _mcfg, _NoTextTokenizer
    from lyricalignment_tpu.decode.longform import (
        prepare_longform_audio, transcribe_longform_batched)
    from lyricalignment_tpu.models.align_model import init_align_model

    assert jax.devices()[0].platform != "cpu", "needs the TPU"

    mcfg = _mcfg(MODEL)
    params = init_align_model(jax.random.PRNGKey(0), mcfg)
    params["whisper"] = _bf16_resident(params["whisper"])
    tok = _NoTextTokenizer()
    rng = np.random.default_rng(0)
    audios = [(rng.standard_normal(int(SECONDS * 16000)) * 0.1
               ).astype(np.float32) for _ in range(SONGS)]
    staged = [prepare_longform_audio(a) for a in audios]
    for mel, _ in staged:
        np.asarray(mel[0, :1])  # uploads complete before timing

    def run(groups, batch, dgroup):
        return transcribe_longform_batched(
            params["whisper"], mcfg.whisper, staged, tok,
            batch_size=batch, overlap_groups=groups, decode_group=dgroup,
            beam_size=5, temperatures=(0.0,), max_new_tokens=64,
            compression_ratio_threshold=1e9, logprob_threshold=-1e9,
            no_speech_threshold=2.0)

    results = {"sweep": "longform_overlap", "model": MODEL, "songs": SONGS,
               "clip_seconds": SECONDS, "audio_s_per_s": {}}
    for groups, batch, dgroup in ARMS:
        run(groups, batch, dgroup)  # compile this (batch, dgroup) shape
    for rep in range(2):
        for groups, batch, dgroup in ARMS:
            t0 = time.perf_counter()
            run(groups, batch, dgroup)
            rate = SONGS * SECONDS / (time.perf_counter() - t0)
            results["audio_s_per_s"].setdefault(
                f"g{groups}_b{batch}_dg{dgroup}", []).append(round(rate, 1))

    print(json.dumps(results))


if __name__ == "__main__":
    main()
