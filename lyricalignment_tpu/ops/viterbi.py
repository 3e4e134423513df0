"""Forced-alignment Viterbi DP as an XLA scan kernel.

This is the TPU replacement for the reference's only native-compiled
component — the numba ``run_viterbi_core`` (`utils/alignment.py:73-119`) and
its two host-side drivers ``perform_viterbi`` (CE emissions,
`utils/alignment.py:13-71`) and ``perform_viterbi_ctc`` (CTC emissions,
`utils/alignment.py:121-188`).

State space: K = 2L+1 interleaved states for L label tokens —
even states are silence/blank, odd state 2i+1 emits label i. The per-step
transition rules and their exact tie-breaking are preserved:

  * k = 0:        always from k; emit silence
  * even k >= 2:  from k if prev[k] > prev[k-1] else k-1; emit silence
  * k = 1:        from k if prev[1] > prev[0] else 0; emit label 0
  * odd k >= 3:   from k-2 iff prev[k-2] >= max(prev[k-1], prev[k]) AND
                  label[k//2] != label[k//2-1]; elif prev[k] > prev[k-1]
                  from k; else from k-1; emit label k//2

The whole DP is a single ``lax.scan`` over time with an O(K) vectorised
transition (shifts instead of the reference's per-state Python loop),
vmapped over the batch; the backtrace is a second (reverse) scan, and
onset/offset extraction is a masked min/max — everything stays on device
with static shapes (L and T padded to maxima, masked by true lengths).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from lyricalignment_tpu import HOP_SIZE_SECOND

NEG_BIG = -1.0e7       # reference's dp initialisation value
NEG_INF = -1.0e30      # padding for shifted neighbours / invalid states
CLIP_MIN = -1000.0     # reference clips log-probs at -1000


def ce_emissions(logits: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Plain-CE emission prep (`utils/alignment.py:13-21`).

    logits f32[B, T, C] with class 0 = silence. Returns
    (label_logprob [B, T, C], silence_logprob [B, T]); label emissions are
    indexed directly by label id (the reference slices ``[:, :, 1:]`` and
    then indexes ``label - 1`` — net effect: ``logp[..., label]``).
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    clipped = jnp.maximum(logp, CLIP_MIN)
    return clipped, clipped[..., 0]


def ctc_emissions(logits: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """CTC-head emission prep (`utils/alignment.py:121-134`).

    logits f32[B, T, C] where channel 0 is the CTC blank, channels
    1..C-2 are syllable classes, and the last channel is the sigmoid
    silence detector. Word emissions are
    ``log_softmax(logits[..., 1:-1]) + log(1 - sigmoid(sil))`` and the
    silence emission is ``log(sigmoid(sil))``. A leading dummy column keeps
    label ids directly usable as indices (label l -> column l).
    """
    word = jax.nn.log_softmax(logits[..., 1:-1], axis=-1)
    sil_logit = logits[..., -1]
    # log(sigmoid(x)) = -softplus(-x); log(1-sigmoid(x)) = -softplus(x)
    log_sil = -jax.nn.softplus(-sil_logit)
    log_voiced = -jax.nn.softplus(sil_logit)
    word = jnp.maximum(word + log_voiced[..., None], CLIP_MIN)
    log_sil = jnp.maximum(log_sil, CLIP_MIN)
    # dummy column so word_emissions[..., label] works with labels >= 1
    pad = jnp.full(word.shape[:-1] + (1,), NEG_INF, word.dtype)
    return jnp.concatenate([pad, word], axis=-1), log_sil


def _viterbi_single(
    label_logprob: jnp.ndarray,   # [T, C] log-probs, indexed by label id
    sil_logprob: jnp.ndarray,     # [T]
    labels: jnp.ndarray,          # i32[L_max], padded with 0
    num_labels: jnp.ndarray,      # i32 scalar: true L
    num_frames: jnp.ndarray,      # i32 scalar: true T
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (onset_frames i32[L_max], offset_frames i32[L_max])."""
    t_max = label_logprob.shape[0]
    l_max = labels.shape[0]
    k_dim = 2 * l_max + 1

    state_idx = jnp.arange(k_dim)
    is_odd = (state_idx % 2) == 1
    char_idx = state_idx // 2                      # label index for odd states
    # per-state emission columns: odd -> labels[k//2], even -> silence
    label_cols = labels[jnp.clip(char_idx, 0, l_max - 1)]

    # skip-transition legality per odd state: label differs from previous
    prev_char = jnp.clip(char_idx - 1, 0, l_max - 1)
    label_differs = labels[jnp.clip(char_idx, 0, l_max - 1)] != labels[prev_char]
    can_skip = is_odd & (state_idx >= 3) & label_differs

    # emissions per (t, k): [T, K]
    em_lab = label_logprob[:, label_cols]          # [T, K]
    em = jnp.where(is_odd[None, :], em_lab, sil_logprob[:, None])

    # init row (reference `utils/alignment.py:35-36`)
    dp0 = jnp.full((k_dim,), NEG_BIG, jnp.float32)
    dp0 = dp0.at[0].set(sil_logprob[0])
    dp0 = dp0.at[1].set(em_lab[0, 1])

    def shift1(v):
        return jnp.concatenate([jnp.full((1,), NEG_INF, v.dtype), v[:-1]])

    def shift2(v):
        return jnp.concatenate([jnp.full((2,), NEG_INF, v.dtype), v[:-2]])

    def step(prev, xs):
        em_t, t = xs
        p0, p1, p2 = prev, shift1(prev), shift2(prev)

        stay_beats_left = p0 > p1
        base_val = jnp.where(stay_beats_left, p0, p1)
        base_bt = jnp.where(stay_beats_left, state_idx, state_idx - 1)

        skip_wins = can_skip & (p2 >= p1) & (p2 >= p0)
        val = jnp.where(skip_wins, p2, base_val)
        bt = jnp.where(skip_wins, state_idx - 2, base_bt)

        new_dp = val + em_t
        # frames beyond the true length are identity transitions
        live = t < num_frames
        new_dp = jnp.where(live, new_dp, prev)
        bt = jnp.where(live, bt, state_idx)
        return new_dp, bt

    ts = jnp.arange(1, t_max)
    dp_final, bts = jax.lax.scan(step, dp0, (em[1:], ts))
    # bts: [T-1, K]; bts[j] are the backpointers into row j (time j -> j+1)

    # end state: 2L (last silence) if it strictly beats 2L-1, else 2L-1
    end_sil = dp_final[2 * num_labels]
    end_lab = dp_final[2 * num_labels - 1]
    end_state = jnp.where(end_sil > end_lab, 2 * num_labels, 2 * num_labels - 1)

    # bts[i] backpoints time i+1 -> i; walking in reverse emits path[i]
    def back(cur, bt_row):
        prev_state = bt_row[cur]
        return prev_state, prev_state

    _, path_head = jax.lax.scan(back, end_state, bts, reverse=True)
    path = jnp.concatenate([path_head, end_state[None]])  # [T]

    # onset = first frame in state 2i+1, offset = last + 1 (masked to true T)
    tt = jnp.arange(t_max)
    valid_t = tt < num_frames
    occupancy = (path[None, :] == (2 * jnp.arange(l_max) + 1)[:, None]) & valid_t[None, :]
    onset = jnp.min(jnp.where(occupancy, tt[None, :], t_max + 1), axis=1)
    offset = jnp.max(jnp.where(occupancy, tt[None, :], -1), axis=1) + 1
    return onset.astype(jnp.int32), offset.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("mode",))
def viterbi_align(
    logits: jnp.ndarray,       # f32[B, T, C]
    labels: jnp.ndarray,       # i32[B, L_max], 0-padded
    num_labels: jnp.ndarray,   # i32[B]
    num_frames: jnp.ndarray,   # i32[B]
    mode: str = "ce",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched forced alignment.

    Returns (onset_frames, offset_frames), each i32[B, L_max]; entries for
    i >= num_labels[b] are meaningless. Convert to seconds with
    ``frames_to_seconds``.
    """
    if mode == "ce":
        lab_lp, sil_lp = ce_emissions(logits)
    elif mode == "ctc":
        lab_lp, sil_lp = ctc_emissions(logits)
    else:
        raise ValueError(f"unknown mode: {mode}")
    return jax.vmap(_viterbi_single)(lab_lp, sil_lp, labels, num_labels, num_frames)


def frames_to_seconds(
    onset_frames: jnp.ndarray,
    offset_frames: jnp.ndarray,
    hop_size_second: float = HOP_SIZE_SECOND,
) -> jnp.ndarray:
    """Stack to [B, L_max, 2] seconds: [onset*hop, offset*hop]
    (reference emits ``[first*hop, (last+1)*hop]``,
    `utils/alignment.py:65-68`)."""
    return jnp.stack(
        [onset_frames * hop_size_second, offset_frames * hop_size_second], axis=-1
    )
