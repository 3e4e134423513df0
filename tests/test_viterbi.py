"""Viterbi scan kernel vs a reference-faithful numpy oracle.

The oracle re-implements the exact DP semantics of the reference's
``run_viterbi_core`` / ``perform_viterbi`` / ``perform_viterbi_ctc``
(utils/alignment.py) in float64, including tie-breaking and the
first/last-occupancy on/offset extraction.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lyricalignment_tpu.ops.viterbi import (
    ce_emissions,
    ctc_emissions,
    frames_to_seconds,
    viterbi_align,
)


def log_softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    return x - np.log(np.exp(x).sum(axis=axis, keepdims=True))


def oracle_viterbi(logits: np.ndarray, labels: list, mode: str, hop=0.02):
    """Single-sample oracle. logits [T, C], labels list of ids >= 1."""
    if mode == "ce":
        lp = np.maximum(log_softmax(logits), -1000.0)
        em_lab = lp  # emission for label l is lp[:, l]
        em_sil = lp[:, 0]
    else:
        word = log_softmax(logits[:, 1:-1])
        sil = 1.0 / (1.0 + np.exp(-logits[:, -1]))
        word = np.maximum(word + np.log(1.0 - sil)[:, None], -1000.0)
        em_lab = np.concatenate([np.full((word.shape[0], 1), -np.inf), word], axis=1)
        em_sil = np.maximum(np.log(sil), -1000.0)

    T = logits.shape[0]
    L = len(labels)
    K = 2 * L + 1
    dp = np.full((T, K), -1e7)
    bt = np.zeros((T, K), dtype=int)
    dp[0][0] = em_sil[0]
    dp[0][1] = em_lab[0][labels[0]] if mode == "ce" else em_lab[0][labels[0]]

    for j in range(1, T):
        for k in range(K):
            if k == 0:
                bt[j][k] = k
                dp[j][k] = dp[j - 1][k] + em_sil[j]
            elif k == 1:
                if dp[j - 1][k] > dp[j - 1][k - 1]:
                    bt[j][k] = k
                    dp[j][k] = dp[j - 1][k] + em_lab[j][labels[0]]
                else:
                    bt[j][k] = k - 1
                    dp[j][k] = dp[j - 1][k - 1] + em_lab[j][labels[0]]
            elif k % 2 == 0:
                if dp[j - 1][k] > dp[j - 1][k - 1]:
                    bt[j][k] = k
                    dp[j][k] = dp[j - 1][k] + em_sil[j]
                else:
                    bt[j][k] = k - 1
                    dp[j][k] = dp[j - 1][k - 1] + em_sil[j]
            else:
                if (dp[j - 1][k - 2] >= dp[j - 1][k - 1] and dp[j - 1][k - 2] >= dp[j - 1][k]
                        and labels[k // 2] != labels[k // 2 - 1]):
                    bt[j][k] = k - 2
                    dp[j][k] = dp[j - 1][k - 2] + em_lab[j][labels[k // 2]]
                elif dp[j - 1][k] > dp[j - 1][k - 1]:
                    bt[j][k] = k
                    dp[j][k] = dp[j - 1][k] + em_lab[j][labels[k // 2]]
                else:
                    bt[j][k] = k - 1
                    dp[j][k] = dp[j - 1][k - 1] + em_lab[j][labels[k // 2]]

    if dp[-1][-1] > dp[-1][-2]:
        path = [K - 1]
        cur = bt[-1][-1]
    else:
        path = [K - 2]
        cur = bt[-1][-2]
    for j in range(T - 2, -1, -1):
        path.append(cur)
        cur = bt[j][cur]
    path.reverse()

    out = []
    for k in range(L):
        first = path.index(2 * k + 1)
        last = len(path) - path[::-1].index(2 * k + 1) - 1
        out.append([first * hop, (last + 1) * hop])
    return out


def run_both(logits, labels, mode, l_pad=0, t_pad=0):
    """Run the JAX kernel with optional extra padding; return seconds array."""
    T, C = logits.shape
    L = len(labels)
    logits_p = np.concatenate([logits, np.zeros((t_pad, C), np.float32)]) if t_pad else logits
    labels_p = np.array(labels + [0] * l_pad, np.int32)
    on, off = viterbi_align(
        jnp.asarray(logits_p[None]),
        jnp.asarray(labels_p[None]),
        jnp.asarray([L], jnp.int32),
        jnp.asarray([T], jnp.int32),
        mode=mode,
    )
    sec = np.asarray(frames_to_seconds(on, off))[0]
    return sec[:L]


@pytest.mark.parametrize("mode", ["ce", "ctc"])
def test_matches_oracle_random(mode, rng):
    for trial in range(8):
        T = int(rng.integers(20, 80))
        C = 12
        L = int(rng.integers(1, 6))
        # labels in 1..C-2 (CTC reserves first/last channels)
        labels = [int(x) for x in rng.integers(1, C - 2, size=L)]
        logits = rng.standard_normal((T, C)).astype(np.float32) * 3.0

        expected = np.array(oracle_viterbi(logits, labels, mode))
        got = run_both(logits, labels, mode)
        np.testing.assert_allclose(got, expected, atol=1e-6, err_msg=f"trial={trial}")


@pytest.mark.parametrize("mode", ["ce", "ctc"])
def test_padding_invariance(mode, rng):
    T, C, L = 40, 12, 4
    labels = [int(x) for x in rng.integers(1, C - 2, size=L)]
    logits = rng.standard_normal((T, C)).astype(np.float32) * 3.0
    base = run_both(logits, labels, mode)
    padded = run_both(logits, labels, mode, l_pad=5, t_pad=17)
    np.testing.assert_allclose(padded, base, atol=1e-6)


def test_clean_signal_recovers_segments(rng):
    # construct logits where the correct class dominates each frame
    T, C = 60, 10
    labels = [2, 5, 2]
    segments = [(5, 15), (20, 35), (42, 55)]  # frames for each char
    logits = np.full((T, C), -5.0, np.float32)
    logits[:, 0] = 5.0  # silence default
    for (a, b), lab in zip(segments, labels):
        logits[a:b, 0] = -5.0
        logits[a:b, lab] = 8.0
    got = run_both(logits, labels, "ce")
    for i, (a, b) in enumerate(segments):
        assert abs(got[i][0] - a * 0.02) < 0.05, (i, got[i])
        assert abs(got[i][1] - b * 0.02) < 0.05, (i, got[i])


def test_repeated_labels_no_skip(rng):
    # identical consecutive labels forbid the skip transition; the oracle
    # encodes that — fuzz specifically with many repeats
    for _ in range(5):
        T = int(rng.integers(25, 60))
        labels = [2, 2, 3, 3, 2]
        logits = rng.standard_normal((T, 8)).astype(np.float32) * 3.0
        expected = np.array(oracle_viterbi(logits, labels, "ce"))
        got = run_both(logits, labels, "ce")
        np.testing.assert_allclose(got, expected, atol=1e-6)


def test_batched_matches_single(rng):
    T, C, L = 30, 10, 3
    logits = rng.standard_normal((4, T, C)).astype(np.float32) * 2.0
    labels = rng.integers(1, C - 2, size=(4, L)).astype(np.int32)
    on, off = viterbi_align(
        jnp.asarray(logits), jnp.asarray(labels),
        jnp.asarray([L] * 4, jnp.int32), jnp.asarray([T] * 4, jnp.int32), mode="ce",
    )
    sec = np.asarray(frames_to_seconds(on, off))
    for b in range(4):
        expected = np.array(oracle_viterbi(logits[b], [int(x) for x in labels[b]], "ce"))
        np.testing.assert_allclose(sec[b, :L], expected, atol=1e-6)
