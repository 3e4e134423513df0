"""Same-run sweep: lockstep slot count for steady-state long-form serving.

The round-3 steady-state long-form number (324 audio-s/s/chip, PARITY.md)
was measured at the transcribe operating point of 8 lockstep slots over a
24-song queue. But the split prompt/gen KV cache changed the decode-loop
balance (the per-step beam-reorder gather no longer scales with the prompt
length), so the best slot count may have moved. This sweep measures
steady-state serving throughput at slots in {4, 8, 12, 16} with a 3x-slots
song queue, all in ONE process (same-run numbers are the only comparable
ones on the axon tunnel, CLAUDE.md), and prints one JSON line per config.

Run alone on the TPU (never two TPU processes):
    timeout 5400 python scripts/bench_longform_slots.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    import jax

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench as benchmod

    from lyricalignment_tpu.decode.longform import (
        prepare_longform_audio,
        transcribe_longform_batched,
    )
    from lyricalignment_tpu.models.align_model import init_align_model

    model_name = os.environ.get("BENCH_MODEL", "medium")
    seconds = float(os.environ.get("BENCH_LONGFORM_SECONDS", "90"))
    max_new = 64
    beam_size = 5

    mcfg = benchmod._mcfg(model_name)
    params = init_align_model(jax.random.PRNGKey(0), mcfg)
    params["whisper"] = benchmod._bf16_resident(params["whisper"])
    tok = benchmod._NoTextTokenizer()

    rng = np.random.default_rng(0)
    results = []
    for slots in (4, 8, 12, 16):
        n_songs = 3 * slots
        audios = [
            (rng.standard_normal(int(seconds * 16000)) * 0.1).astype(np.float32)
            for _ in range(n_songs)
        ]
        staged = [prepare_longform_audio(a) for a in audios]
        for mel, _ in staged:
            np.asarray(mel[0, :1])  # uploads complete before timing

        def run():
            return transcribe_longform_batched(
                params["whisper"], mcfg.whisper, staged, tok,
                batch_size=slots, beam_size=beam_size, temperatures=(0.0,),
                max_new_tokens=max_new,
                compression_ratio_threshold=1e9, logprob_threshold=-1e9,
                no_speech_threshold=2.0)

        try:
            run()  # compile
            n = 2
            t0 = time.perf_counter()
            for _ in range(n):
                run()
            elapsed = time.perf_counter() - t0
            v = n * n_songs * seconds / elapsed / jax.device_count()
            rec = {"slots": slots, "songs": n_songs,
                   "audio_s_per_s": round(v, 1),
                   "s_per_pass": round(elapsed / n, 1)}
        except Exception as e:  # OOM etc: record, continue
            rec = {"slots": slots, "songs": n_songs,
                   "error": f"{type(e).__name__}: {str(e)[:200]}"}
        results.append(rec)
        print(json.dumps(rec), flush=True)
        del staged, audios

    print(json.dumps({"sweep": "longform_slots", "model": model_name,
                      "seconds": seconds, "beam": beam_size,
                      "max_new_tokens": max_new, "results": results}))


if __name__ == "__main__":
    sys.exit(main())
