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
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lyricalignment_tpu import HOP_SIZE_SECOND

NEG_BIG = -1.0e7       # reference's dp initialisation value
NEG_INF = -1.0e30      # padding for shifted neighbours / invalid states
CLIP_MIN = -1000.0     # reference clips log-probs at -1000


def _dp_unroll() -> int:
    """Unroll factor for the DP/backtrace scans, read at trace time.

    MEASURED A WASH (v5e, scripts/bench_viterbi_unroll.py, medium B=16):
    the batched fused Viterbi is only ~1.1 ms/call — unroll 1/8/16 all
    measure 1.08-1.15 ms isolated and ~2589 audio-s/s end-to-end, outputs
    exactly equal. The hypothesis that per-iteration scan overhead matters
    here did not survive: the vmapped step is a [B, K] vector update, large
    enough to hide loop cost. Default stays 1; the knob remains for re-
    measurement on future toolchains.
    """
    return int(os.environ.get("LA_TPU_VITERBI_UNROLL", "1"))


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
    l_max = labels.shape[0]
    char_idx = jnp.arange(2 * l_max + 1) // 2      # label index for odd states
    # per-state emission columns: odd -> labels[k//2], even -> silence
    label_cols = labels[jnp.clip(char_idx, 0, l_max - 1)]
    em_lab = label_logprob[:, label_cols]          # [T, K]
    return _viterbi_dp(em_lab, sil_logprob, labels, num_labels, num_frames)


def _viterbi_single_pos(
    pos_logprob: jnp.ndarray,     # [T, L_max] log-probs, per label *position*
    sil_logprob: jnp.ndarray,     # [T]
    labels: jnp.ndarray,          # i32[L_max], padded with 0
    num_labels: jnp.ndarray,
    num_frames: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Same DP on pre-gathered (per label position) emissions — the fused
    classifier path produces [T, L] directly without a [T, C] table."""
    l_max = labels.shape[0]
    char_idx = jnp.arange(2 * l_max + 1) // 2
    em_lab = pos_logprob[:, jnp.clip(char_idx, 0, l_max - 1)]  # [T, K]
    return _viterbi_dp(em_lab, sil_logprob, labels, num_labels, num_frames)


def _viterbi_dp(
    em_lab: jnp.ndarray,          # [T, K] per-state label emissions
    sil_logprob: jnp.ndarray,     # [T]
    labels: jnp.ndarray,          # i32[L_max]
    num_labels: jnp.ndarray,
    num_frames: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    t_max = em_lab.shape[0]
    l_max = labels.shape[0]
    k_dim = 2 * l_max + 1

    state_idx = jnp.arange(k_dim)
    is_odd = (state_idx % 2) == 1
    char_idx = state_idx // 2

    # skip-transition legality per odd state: label differs from previous
    prev_char = jnp.clip(char_idx - 1, 0, l_max - 1)
    label_differs = labels[jnp.clip(char_idx, 0, l_max - 1)] != labels[prev_char]
    can_skip = is_odd & (state_idx >= 3) & label_differs

    # emissions per (t, k): [T, K]
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
    dp_final, bts = jax.lax.scan(step, dp0, (em[1:], ts), unroll=_dp_unroll())
    # bts: [T-1, K]; bts[j] are the backpointers into row j (time j -> j+1)

    # end state: 2L (last silence) if it strictly beats 2L-1, else 2L-1
    end_sil = dp_final[2 * num_labels]
    end_lab = dp_final[2 * num_labels - 1]
    end_state = jnp.where(end_sil > end_lab, 2 * num_labels, 2 * num_labels - 1)

    # bts[i] backpoints time i+1 -> i; walking in reverse emits path[i]
    def back(cur, bt_row):
        prev_state = bt_row[cur]
        return prev_state, prev_state

    _, path_head = jax.lax.scan(back, end_state, bts, reverse=True,
                                unroll=_dp_unroll())
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


def _chunked_lse(h: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                 chunk: int = 4224) -> jnp.ndarray:
    """logsumexp over the columns of ``h @ w + b`` without materialising the
    [B, T, C] logits: an online (flash-softmax style) running max/sum over
    column chunks, each chunk a [B*T, F] x [F, chunk] MXU matmul.

    h f32[B, T, F], w [F, C], b [C] -> f32[B, T].
    """
    f_dim, c_dim = w.shape
    n = -(-c_dim // chunk)
    pad = n * chunk - c_dim
    wp = jnp.pad(w, ((0, 0), (0, pad)))
    # padding columns contribute exp(NEG_INF - max) == 0 to the sum
    bp = jnp.pad(b, (0, pad), constant_values=NEG_INF)
    ws = wp.reshape(f_dim, n, chunk).transpose(1, 0, 2)   # [n, F, chunk]
    bs = bp.reshape(n, chunk)

    # jax.checkpoint: under autodiff (the fused TRAINING losses reuse this
    # normaliser) the backward pass recomputes each chunk's [B, T, chunk]
    # logits instead of storing them — without it the scan's residuals add
    # up to the very logits tensor the fusion exists to avoid.
    @jax.checkpoint
    def step(carry, wb):
        m, s = carry
        wc, bc = wb
        lg = h @ wc + bc                                   # [B, T, chunk]
        cm = jnp.max(lg, axis=-1)
        nm = jnp.maximum(m, cm)
        s = s * jnp.exp(m - nm) + jnp.sum(jnp.exp(lg - nm[..., None]), axis=-1)
        return (nm, s), None

    m0 = jnp.full(h.shape[:-1], NEG_INF, jnp.float32)
    s0 = jnp.zeros(h.shape[:-1], jnp.float32)
    (m, s), _ = jax.lax.scan(step, (m0, s0), (ws, bs))
    return m + jnp.log(s)


_LSE_BT_BLOCK = 256    # rows of h per kernel invocation
_LSE_C_BLOCK = 2048    # fc columns streamed per step (VMEM ~9 MB at F=768)


def _lse_kernel(h_ref, w_ref, b_ref, o_ref, m_ref, s_ref):
    """One (row-block, column-chunk) step of the streaming logsumexp: the
    [bt, c] logits tile lives only in VMEM; running (max, sum) carry across
    the column grid axis in scratch (flash-softmax recurrence)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full(m_ref.shape, NEG_INF, m_ref.dtype)
        s_ref[:] = jnp.zeros(s_ref.shape, s_ref.dtype)

    logits = jax.lax.dot_general(
        h_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    logits = logits + b_ref[0][None, :]
    cm = jnp.max(logits, axis=-1, keepdims=True)
    m_prev = m_ref[:]
    nm = jnp.maximum(m_prev, cm)
    s_ref[:] = (s_ref[:] * jnp.exp(m_prev - nm)
                + jnp.sum(jnp.exp(logits - nm), axis=-1, keepdims=True))
    m_ref[:] = nm

    @pl.when(j == pl.num_programs(1) - 1)
    def _emit():
        o_ref[:] = m_ref[:] + jnp.log(s_ref[:])


def _chunked_lse_pallas(h: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                        interpret: bool = False) -> jnp.ndarray:
    """Pallas TPU backend for ``_chunked_lse``: same online max/sum
    recurrence with the per-chunk [rows, c_block] logits tile pinned in
    VMEM. Kept as a tested opt-in exhibit — the hypothesis that the scan
    path's chunk outputs round-trip HBM did NOT survive measurement (the
    A/B is a wash; see ``_row_lse``), i.e. XLA already fuses the chunked
    matmul+reduce competitively."""
    bdim, tdim, fdim = h.shape
    hf = h.reshape(bdim * tdim, fdim).astype(jnp.float32)
    bt = bdim * tdim
    bt_pad = -(-bt // _LSE_BT_BLOCK) * _LSE_BT_BLOCK
    if bt_pad != bt:
        hf = jnp.pad(hf, ((0, bt_pad - bt), (0, 0)))
    c_dim = w.shape[1]
    c_pad = -(-c_dim // _LSE_C_BLOCK) * _LSE_C_BLOCK
    wp = jnp.pad(w.astype(jnp.float32), ((0, 0), (0, c_pad - c_dim)))
    # padding columns carry bias NEG_INF -> exp underflows to exactly 0
    bp = jnp.pad(b.astype(jnp.float32), (0, c_pad - c_dim),
                 constant_values=NEG_INF)[None, :]
    out = pl.pallas_call(
        _lse_kernel,
        grid=(bt_pad // _LSE_BT_BLOCK, c_pad // _LSE_C_BLOCK),
        in_specs=[
            pl.BlockSpec((_LSE_BT_BLOCK, fdim), lambda i, j: (i, 0)),
            pl.BlockSpec((fdim, _LSE_C_BLOCK), lambda i, j: (0, j)),
            pl.BlockSpec((1, _LSE_C_BLOCK), lambda i, j: (0, j)),
        ],
        # 2-D [bt, 1] output: a 1-D f32 output picks up an XLA layout tiling
        # (T(1024)) that Mosaic's 256-element block cannot match
        out_specs=pl.BlockSpec((_LSE_BT_BLOCK, 1), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((bt_pad, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((_LSE_BT_BLOCK, 1), jnp.float32),
            pltpu.VMEM((_LSE_BT_BLOCK, 1), jnp.float32),
        ],
        interpret=interpret,
    )(hf, wp, bp)
    return out[:bt, 0].reshape(bdim, tdim)


def _row_lse(h: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
             chunk: int) -> jnp.ndarray:
    """Class-normaliser dispatch. Default: the XLA chunked scan.

    The Pallas streaming kernel (``LA_TPU_PALLAS_LSE=1``) measured a WASH
    at the production operating point (medium B=16, same-run A/B/A/B:
    scan 2588.9/2590.3 vs pallas 2586.5/2585.8 audio-s/s, outputs exactly
    equal — scripts/bench_pallas_lse.py): XLA's consumer fusion already
    keeps the chunked matmul+reduce off the HBM critical path, and the
    normaliser itself is a small share of the batch time next to the
    encoder. The kernel stays as a tested opt-in (it would win only if a
    future XLA regression un-fuses the scan path)."""
    if (jax.default_backend() == "tpu"
            and os.environ.get("LA_TPU_PALLAS_LSE")):
        return _chunked_lse_pallas(h, w, b)
    return _chunked_lse(h, w, b, chunk)


def _gather_label_logits(h: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                         labels: jnp.ndarray) -> jnp.ndarray:
    """Per-position label-column logits [B, T, L]: gather the L needed fc
    weight *rows* from w.T (major-dim gather) and contract with h."""
    w_cols = jnp.take(w.T, labels, axis=0)                 # [B, L, F]
    b_cols = jnp.take(b, labels, axis=0)                   # [B, L]
    return jnp.einsum("btf,blf->btl", h, w_cols) + b_cols[:, None, :]


def ce_emissions_fused(h: jnp.ndarray, fc: dict, labels: jnp.ndarray,
                       chunk: int = 4224) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``ce_emissions(h @ w + b)`` gathered to label positions, fused so the
    [B, T, C] logits never hit HBM. h f32[B, T, F] is the pre-classifier
    hidden (``align_head_hidden``); fc = {"w": [F, C], "b": [C]}.

    Returns (label_logprob [B, T, L] per label *position*, silence [B, T]).
    """
    w, b = fc["w"], fc["b"]
    lse = _row_lse(h, w, b, chunk)                         # [B, T]
    gathered = _gather_label_logits(h, w, b, labels)       # [B, T, L]
    sil = h @ w[:, 0] + b[0]                               # [B, T]
    lab_lp = jnp.maximum(gathered - lse[..., None], CLIP_MIN)
    sil_lp = jnp.maximum(sil - lse, CLIP_MIN)
    return lab_lp, sil_lp


def ctc_emissions_fused(h: jnp.ndarray, fc: dict, labels: jnp.ndarray,
                        chunk: int = 4224) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``ctc_emissions(h @ w + b)`` gathered to label positions, fused.

    CTC head layout (`utils/alignment.py:121-134`): column 0 is the CTC
    blank, 1..C-2 the syllable classes, C-1 the sigmoid silence detector;
    the log-softmax runs over the syllable columns only. Label values index
    the original columns directly (label l -> column l), so the gather uses
    ``labels`` unchanged; 0-padded label positions gather the blank column,
    which the DP never reads (states beyond 2*num_labels are unreachable
    from the end state).
    """
    w, b = fc["w"], fc["b"]
    lse = _row_lse(h, w[:, 1:-1], b[1:-1], chunk)          # [B, T]
    gathered = _gather_label_logits(h, w, b, labels)       # [B, T, L]
    sil_logit = h @ w[:, -1] + b[-1]                       # [B, T]
    # log(sigmoid(x)) = -softplus(-x); log(1-sigmoid(x)) = -softplus(x)
    log_sil = -jax.nn.softplus(-sil_logit)
    log_voiced = -jax.nn.softplus(sil_logit)
    word = gathered - lse[..., None] + log_voiced[..., None]
    return jnp.maximum(word, CLIP_MIN), jnp.maximum(log_sil, CLIP_MIN)


@functools.partial(jax.jit, static_argnames=("mode", "chunk"))
def viterbi_align_fused(
    h: jnp.ndarray,            # f32[B, T, F] pre-classifier hidden
    fc_params: dict,           # {"w": [F, C], "b": [C]} — align head fc
    labels: jnp.ndarray,       # i32[B, L_max], 0-padded
    num_labels: jnp.ndarray,   # i32[B]
    num_frames: jnp.ndarray,   # i32[B]
    mode: str = "ce",
    chunk: int = 4224,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``viterbi_align`` fused with the final classifier.

    Takes the pre-fc hidden states (``align_head_hidden``) and the fc
    weights instead of the [B, T, 21129] logits: the class log-softmax
    normaliser is computed as an online logsumexp over weight-column chunks
    and only the L label columns are ever materialised, removing the two
    dominant HBM streams of the unfused path (the 1 GB logit write and the
    full-vocab softmax read). Numerically identical to
    ``viterbi_align(align_head_apply(...), ...)`` up to f32 reduction
    ordering.
    """
    if mode == "ce":
        lab_lp, sil_lp = ce_emissions_fused(h, fc_params, labels, chunk)
    elif mode == "ctc":
        lab_lp, sil_lp = ctc_emissions_fused(h, fc_params, labels, chunk)
    else:
        raise ValueError(f"unknown mode: {mode}")
    return jax.vmap(_viterbi_single_pos)(lab_lp, sil_lp, labels, num_labels, num_frames)


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
