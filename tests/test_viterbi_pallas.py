"""Pallas Viterbi backend vs the scan backend (interpreter mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from lyricalignment_tpu.ops.viterbi import viterbi_align
from lyricalignment_tpu.ops.viterbi_pallas import viterbi_align_pallas


@pytest.mark.parametrize("mode", ["ce", "ctc"])
def test_pallas_matches_scan_backend(mode, rng):
    B, T, C, L = 3, 40, 12, 5
    logits = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32) * 3)
    labels = np.array([[1, 2, 3, 4, 5],
                       [2, 2, 3, 3, 2],      # repeats: skip transitions banned
                       [5, 1, 5, 0, 0]], np.int32)
    nl = np.array([5, 5, 3], np.int32)
    nf = np.array([T, 30, 25], np.int32)     # per-sample frame masking

    on1, off1 = viterbi_align(logits, jnp.asarray(labels), jnp.asarray(nl),
                              jnp.asarray(nf), mode=mode)
    on2, off2 = viterbi_align_pallas(logits, jnp.asarray(labels), jnp.asarray(nl),
                                     jnp.asarray(nf), mode=mode, interpret=True)
    for b in range(B):
        L_b = nl[b]
        np.testing.assert_array_equal(np.asarray(on1)[b, :L_b], np.asarray(on2)[b, :L_b])
        np.testing.assert_array_equal(np.asarray(off1)[b, :L_b], np.asarray(off2)[b, :L_b])


def test_pallas_odd_batch_and_long_labels(rng):
    # batch not a multiple of 8, labels crossing the 64-char (K>128) boundary
    B, T, C, L = 5, 24, 20, 70
    logits = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32) * 2)
    labels = rng.integers(1, C - 2, (B, L)).astype(np.int32)
    nl = np.array([3, 7, 2, 5, 1], np.int32)
    nf = np.full(B, T, np.int32)
    on1, off1 = viterbi_align(logits, jnp.asarray(labels), jnp.asarray(nl),
                              jnp.asarray(nf), mode="ce")
    on2, off2 = viterbi_align_pallas(logits, jnp.asarray(labels), jnp.asarray(nl),
                                     jnp.asarray(nf), mode="ce", interpret=True)
    for b in range(B):
        L_b = nl[b]
        np.testing.assert_array_equal(np.asarray(on1)[b, :L_b], np.asarray(on2)[b, :L_b])
        np.testing.assert_array_equal(np.asarray(off1)[b, :L_b], np.asarray(off2)[b, :L_b])
