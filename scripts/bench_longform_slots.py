"""Same-run sweep: lockstep slot count for steady-state long-form serving.

The round-3 steady-state long-form number (324 audio-s/s/chip, PARITY.md)
was measured at the transcribe operating point of 8 lockstep slots over a
24-song queue. But the split prompt/gen KV cache changed the decode-loop
balance (the per-step beam-reorder gather no longer scales with the prompt
length), so the best slot count may have moved. This sweep measures
steady-state serving throughput at slots in {4, 8, 12, 16} with a 3x-slots
song queue, all in ONE process (same-run numbers are the only comparable
ones on the axon tunnel, CLAUDE.md), and prints one JSON line per config.

Each config is exactly ``bench.bench_longform`` (same staging barrier,
same timing loop) so the sweep stays comparable with the headline bench;
only the slot count and queue size vary. Gated on a real accelerator via
``bench._wait_for_backend`` — a down tunnel must fail loudly, not record
1-core-CPU numbers.

Run alone on the TPU (never two TPU processes):
    timeout 5400 python scripts/bench_longform_slots.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    import bench as benchmod

    benchmod._wait_for_backend()
    import jax

    model_name = os.environ.get("BENCH_MODEL", "medium")
    seconds = float(os.environ.get("BENCH_LONGFORM_SECONDS", "90"))
    max_new = 64
    beam_size = 5

    slot_list = tuple(int(s) for s in os.environ.get(
        "BENCH_SLOTS", "4,8,12,16").split(","))
    results = []
    for slots in slot_list:
        n_songs = 3 * slots
        os.environ["BENCH_LONGFORM_SONGS"] = str(n_songs)
        try:
            v = benchmod.bench_longform(
                model_name, seconds, iters=4, beam_size=beam_size,
                max_new_tokens=max_new, batch=slots)
            # bench_longform times 2 passes over the n_songs queue
            s_per_pass = n_songs * seconds / (v * jax.device_count())
            rec = {"slots": slots, "songs": n_songs,
                   "audio_s_per_s": round(v, 1),
                   "s_per_pass": round(s_per_pass, 1)}
        except Exception as e:  # OOM etc: record, continue
            rec = {"slots": slots, "songs": n_songs,
                   "error": f"{type(e).__name__}: {str(e)[:200]}"}
        results.append(rec)
        print(json.dumps(rec), flush=True)

    print(json.dumps({"sweep": "longform_slots", "model": model_name,
                      "seconds": seconds, "beam": beam_size,
                      "max_new_tokens": max_new,
                      "platform": jax.devices()[0].platform,
                      "results": results}))


if __name__ == "__main__":
    sys.exit(main())
