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

    B, L = 8, 64
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, 50000, (B, L)).astype(np.int32))
    score = jnp.asarray(rng.standard_normal(B).astype(np.float32))
    ns = jnp.asarray(rng.standard_normal(B).astype(np.float32))

    @jax.jit
    def pack(t, s, n):
        return jnp.concatenate(
            [t.astype(jnp.float32), s[:, None], n[:, None]], axis=1)

    # warm up transfers + the pack executable
    _ = jax.device_get((tokens, score, ns))
    _ = np.asarray(pack(tokens, score, ns))

    iters = 64
    results = {}

    t0 = time.perf_counter()
    for _ in range(iters):
        _ = jax.device_get((tokens, score, ns))
    results["tuple_device_get_ms"] = round(
        1000 * (time.perf_counter() - t0) / iters, 2)

    t0 = time.perf_counter()
    for _ in range(iters):
        p = pack(tokens, score, ns)
        _ = np.asarray(p)
    results["packed_single_fetch_ms"] = round(
        1000 * (time.perf_counter() - t0) / iters, 2)

    t0 = time.perf_counter()
    for _ in range(iters):
        _ = np.asarray(tokens)
        _ = np.asarray(score)
        _ = np.asarray(ns)
    results["three_asarray_ms"] = round(
        1000 * (time.perf_counter() - t0) / iters, 2)

    results["platform"] = jax.devices()[0].platform
    print(json.dumps({"sweep": "fetch_packing", **results}))


if __name__ == "__main__":
    sys.exit(main())
