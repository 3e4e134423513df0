"""Tunnel micro-A/B: fetching a 3-tuple vs one packed array per decode round.

The batched long-form loop fetches (tokens, score, no_speech) once per
window round via ``jax.device_get((a, b, c))``. On the axon tunnel each
array materialization may cost its own host round trip (~30-40 ms), i.e.
up to ~2 extra RTTs per round (~10% of a ~600 ms beam round). This script
measures, same-run: (1) device_get of the 3-tuple, (2) device_get of one
packed f32 array (tokens cast to f32 — ids < 2^24 are exact — with score
and ns appended as extra columns), (3) three sequential np.asarray calls
(the naive style), at the long-form shapes (B=8, 64 tokens). If packing
wins, the longform loop adopts it.

Every timed iteration runs a tiny jit step that produces FRESH output
arrays before fetching, mirroring the real loop where each round's
outputs are new arrays. Re-fetching the same ArrayImpl would measure
jax's host-side ``_npy_value`` cache (a no-op after the first fetch on a
remote backend), not the tunnel — all three arms would look free except
the packed one, biasing the A/B toward the status quo.

Run alone on the TPU (never two TPU processes):
    timeout 1200 python scripts/bench_fetch_packing.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    import jax
    import jax.numpy as jnp

    import bench as benchmod

    benchmod._wait_for_backend()

    B, L = 8, 64
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, 50000, (B, L)).astype(np.int32))
    score = jnp.asarray(rng.standard_normal(B).astype(np.float32))
    ns = jnp.asarray(rng.standard_normal(B).astype(np.float32))

    @jax.jit
    def step(t, s, n, i):
        # stand-in for one decode round: produces fresh output arrays
        return t + i, s + i.astype(jnp.float32), n + i.astype(jnp.float32)

    @jax.jit
    def step_packed(t, s, n, i):
        t2, s2, n2 = (t + i, s + i.astype(jnp.float32),
                      n + i.astype(jnp.float32))
        return jnp.concatenate(
            [t2.astype(jnp.float32), s2[:, None], n2[:, None]], axis=1)

    counters = [jnp.asarray(i, dtype=jnp.int32) for i in range(64)]

    # warm up uploads + both executables
    _ = jax.device_get(step(tokens, score, ns, counters[0]))
    _ = np.asarray(step_packed(tokens, score, ns, counters[0]))

    iters = len(counters)
    results = {}

    t0 = time.perf_counter()
    for i in range(iters):
        out = step(tokens, score, ns, counters[i])
        _ = jax.device_get(out)
    results["tuple_device_get_ms"] = round(
        1000 * (time.perf_counter() - t0) / iters, 2)

    t0 = time.perf_counter()
    for i in range(iters):
        p = step_packed(tokens, score, ns, counters[i])
        _ = np.asarray(p)
    results["packed_single_fetch_ms"] = round(
        1000 * (time.perf_counter() - t0) / iters, 2)

    t0 = time.perf_counter()
    for i in range(iters):
        t2, s2, n2 = step(tokens, score, ns, counters[i])
        _ = np.asarray(t2)
        _ = np.asarray(s2)
        _ = np.asarray(n2)
    results["three_asarray_ms"] = round(
        1000 * (time.perf_counter() - t0) / iters, 2)

    results["platform"] = jax.devices()[0].platform
    print(json.dumps({"sweep": "fetch_packing", **results}))


if __name__ == "__main__":
    sys.exit(main())
