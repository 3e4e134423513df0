"""Pallas TPU kernel for the forced-alignment Viterbi DP.

Alternative backend to ``ops/viterbi.py``'s ``lax.scan`` formulation (both
replace the reference's numba ``run_viterbi_core``,
`utils/alignment.py:73-119`). One kernel invocation processes the whole
batch: the DP state lives as a (B, K) tile — batch over sublanes, states
over lanes — so every per-step vector op covers all batch items at once:

  * forward DP over T frames with the O(K) shifted-transition update —
    neighbour states come from ``pltpu.roll`` lane shifts, tie-breaking
    identical to the reference;
  * the T x B x K backtrace tensor lives in VMEM scratch (never HBM);
  * the backtrace walk is fully vectorised: the current state is a one-hot
    lane vector per row, "follow the backpointer" is a row-wise masked sum
    + iota compare — no scalar gathers;
  * onset/offset extraction happens during the backward walk (first/last
    occupancy per odd state).

Inputs are pre-padded lane-aligned (K to 128, T to 8, B to 8). Emission
prep (CE/CTC) is shared with the scan backend.

DEMOTED — parity exhibit, not the production kernel. Measured on v5e
(B=8, T=1500, L=48, CTC): exact output parity with the scan backend but
~17-18 ms vs the scan's ~4.9 ms. Two optimization attempts were made and
benchmarked: ``fori_loop(..., unroll=8)`` (Mosaic rejects partial unroll)
and manual 8-step loop blocking (outer loop over T/8 with the inner steps
Python-unrolled) — the blocked variant measured 18.35 ms, *slightly worse*
than the plain loop, showing per-iteration loop control is NOT the
bottleneck; the serial lane-shift recurrence itself is, and XLA's scan
schedules the same dependency chain better. Per the round-2 review this
kernel is therefore explicitly demoted: the ``lax.scan`` backend
(``viterbi_align``) is the production default, and this file is kept as
the exact-parity Pallas formulation of the reference's one native kernel
(tests/test_viterbi_pallas.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lyricalignment_tpu.ops.viterbi import NEG_BIG, NEG_INF, ce_emissions, ctc_emissions

_LANE = 128
_SUB = 8


def _kernel(em_ref, skip_ref, nf_ref, nl_ref, out_on_ref, out_off_ref,
            dp_scr, bt_scr):
    t_pad, bp, kp = em_ref.shape

    lane = jax.lax.broadcasted_iota(jnp.int32, (bp, kp), 1)
    can_skip = skip_ref[:] != 0                   # (B, kp)
    nf = nf_ref[:]                                # (B, 1) int32
    nl = nl_ref[:]                                # (B, 1)

    em0 = em_ref[0]
    dp_scr[:, :] = jnp.where(lane <= 1, em0, jnp.full((bp, kp), NEG_BIG, jnp.float32))
    bt_scr[0] = lane

    def fwd(t, _):
        prev = dp_scr[:, :]
        p1 = jnp.where(lane >= 1, pltpu.roll(prev, 1, 1), NEG_INF)
        p2 = jnp.where(lane >= 2, pltpu.roll(prev, 2, 1), NEG_INF)

        stay = prev > p1
        base_val = jnp.where(stay, prev, p1)
        base_bt = jnp.where(stay, lane, lane - 1)

        skip_wins = can_skip & (p2 >= p1) & (p2 >= prev)
        val = jnp.where(skip_wins, p2, base_val)
        bt = jnp.where(skip_wins, lane - 2, base_bt)

        em_t = em_ref[t]
        new_dp = val + em_t

        live = t < nf                             # (B, 1) broadcast
        new_dp = jnp.where(live, new_dp, prev)
        bt = jnp.where(live, bt, lane)

        dp_scr[:, :] = new_dp
        bt_scr[t] = bt
        return 0

    jax.lax.fori_loop(1, t_pad, fwd, 0)

    # end state per row: 2L if dp[2L] > dp[2L-1] else 2L-1
    dp_final = dp_scr[:, :]
    sil_pick = jnp.sum(jnp.where(lane == 2 * nl, dp_final, 0.0), axis=1, keepdims=True)
    lab_pick = jnp.sum(jnp.where(lane == 2 * nl - 1, dp_final, 0.0), axis=1, keepdims=True)
    end_state = jnp.where(sil_pick > lab_pick, 2 * nl, 2 * nl - 1)  # (B, 1)

    onset = jnp.zeros((bp, kp), jnp.int32)
    offset = jnp.full((bp, kp), -1, jnp.int32)
    # one-hot per row as int32 (Mosaic cannot carry i1 vectors in scf.for)
    cur = (lane == end_state).astype(jnp.int32)

    def back(i, carry):
        cur, onset, offset = carry
        t = t_pad - 1 - i
        active = t < nf
        rec = (cur == 1) & active
        onset = jnp.where(rec, t, onset)
        offset = jnp.where(rec & (offset < 0), t, offset)
        bt_row = bt_scr[t]
        prev_state = jnp.sum(cur * bt_row, axis=1, keepdims=True)  # (B, 1)
        cur = jnp.where(t > 0, (lane == prev_state).astype(jnp.int32), cur)
        return cur, onset, offset

    _, onset, offset = jax.lax.fori_loop(0, t_pad, back, (cur, onset, offset))

    out_on_ref[:, :] = onset
    out_off_ref[:, :] = offset + 1  # reference emits last+1


@functools.partial(jax.jit, static_argnames=("mode", "interpret"))
def viterbi_align_pallas(
    logits: jnp.ndarray,       # f32[B, T, C]
    labels: jnp.ndarray,       # i32[B, L_max], 0-padded
    num_labels: jnp.ndarray,   # i32[B]
    num_frames: jnp.ndarray,   # i32[B]
    mode: str = "ce",
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in for ``ops.viterbi.viterbi_align`` on the Pallas backend.

    Entries at positions >= num_labels[b] are meaningless (same contract).
    """
    if mode == "ce":
        lab_lp, sil_lp = ce_emissions(logits)
    elif mode == "ctc":
        lab_lp, sil_lp = ctc_emissions(logits)
    else:
        raise ValueError(f"unknown mode: {mode}")

    b, t, _ = logits.shape
    l_max = labels.shape[1]
    k = 2 * l_max + 1
    kp = -(-k // _LANE) * _LANE
    t_pad = -(-t // _SUB) * _SUB
    bp = -(-b // _SUB) * _SUB

    # per-(t, state) emissions: odd state 2i+1 emits labels[i], even = silence
    state = np.arange(kp)
    char_idx = np.minimum(state // 2, l_max - 1)
    odd = (state % 2) == 1
    label_cols = jnp.where(jnp.asarray(odd)[None, :],
                           labels[:, jnp.asarray(char_idx)], 0)  # [B, KP]
    em_lab = jnp.take_along_axis(
        lab_lp, label_cols[:, None, :].repeat(t, axis=1), axis=2)
    em = jnp.where(jnp.asarray(odd)[None, None, :], em_lab, sil_lp[:, :, None])
    # layout for the kernel: [T_pad, B_pad, KP]
    em = jnp.pad(em, ((0, bp - b), (0, t_pad - t), (0, 0))).transpose(1, 0, 2)

    prev_char = np.maximum(char_idx - 1, 0)
    ci = jnp.asarray(char_idx)[None, :].repeat(b, 0)
    pi = jnp.asarray(prev_char)[None, :].repeat(b, 0)
    label_differs = (jnp.take_along_axis(labels, ci, 1)
                     != jnp.take_along_axis(labels, pi, 1))
    can_skip = (jnp.asarray(odd & (state >= 3))[None, :] & label_differs).astype(jnp.int32)
    can_skip = jnp.pad(can_skip, ((0, bp - b), (0, 0)))

    nf = jnp.pad(num_frames.astype(jnp.int32), (0, bp - b))[:, None]
    nl = jnp.pad(jnp.maximum(num_labels.astype(jnp.int32), 1), (0, bp - b),
                 constant_values=1)[:, None]

    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    on, off = pl.pallas_call(
        _kernel,
        in_specs=[vmem(), vmem(), vmem(), vmem()],
        out_specs=[vmem(), vmem()],
        out_shape=[
            jax.ShapeDtypeStruct((bp, kp), jnp.int32),
            jax.ShapeDtypeStruct((bp, kp), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bp, kp), jnp.float32),
            pltpu.VMEM((t_pad, bp, kp), jnp.int32),
        ],
        interpret=interpret,
    )(em, can_skip, nf, nl)

    # odd lanes 2i+1 hold char i
    idx = 2 * jnp.arange(l_max) + 1
    return on[:b][:, idx], off[:b][:, idx]
