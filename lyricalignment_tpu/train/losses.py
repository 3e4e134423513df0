"""Multitask losses: frame CE (+ sigmoid silence head), CTC, transcript CE.

Behavioral parity with the reference:
  * ``frame_ce_loss``      ≙ ``compute_ce_loss`` (`train_multitask.py:587-614`)
  * ``ctc_loss``           ≙ ``compute_ctc_loss`` (`train_multitask.py:616-633`,
    torch ``F.ctc_loss`` with mean-over-target-length reduction)
  * ``transcript_ce_loss`` ≙ ``F.cross_entropy(..., ignore_index=-100)``
    (`train_multitask.py:285,308`)

All functions are jit-compatible with static shapes; the -100
ignore-convention is handled with masks instead of dynamic filtering.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

IGNORE_ID = -100


def masked_ce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean cross-entropy over positions where label != -100
    (torch ``F.cross_entropy`` ignore_index semantics).

    logits f32[B, ..., C], labels i32[B, ...].
    """
    all_samples = jnp.ones((logits.shape[0],), bool)
    return masked_ce_grouped(logits, labels, all_samples)


def _reconcile_label_length(frame_labels: jnp.ndarray, t: int) -> jnp.ndarray:
    """Truncate or right-pad labels with -100 to the logit length
    (reference `train_multitask.py:595-601`)."""
    cur = frame_labels.shape[1]
    if cur > t:
        return frame_labels[:, :t]
    if cur < t:
        pad = jnp.full((frame_labels.shape[0], t - cur), IGNORE_ID, frame_labels.dtype)
        return jnp.concatenate([frame_labels, pad], axis=1)
    return frame_labels


def frame_ce_loss(
    logits: jnp.ndarray,        # f32[B, T, C]
    frame_labels: jnp.ndarray,  # i32[B, T_lab]
    with_silence_head: bool = False,
    vocab_size: int = 21128,
) -> jnp.ndarray:
    """Frame-wise alignment CE.

    Plain mode (``with_silence_head=False``): CE over all classes incl.
    silence = class 0, ignoring -100.

    Silence-head mode (the reference's ``compute_sil=True`` used with CTC):
    labels shift down by one, word CE runs over channels [1, vocab_size)
    only, and channel ``vocab_size`` is a sigmoid silence detector trained
    with BCE against (label == -100).
    """
    frame_labels = _reconcile_label_length(frame_labels, logits.shape[1])

    all_samples = jnp.ones((logits.shape[0],), bool)
    return frame_ce_loss_grouped(
        logits, frame_labels, all_samples,
        with_silence_head=with_silence_head, vocab_size=vocab_size,
    )


def ctc_loss(
    logits: jnp.ndarray,   # f32[B, T, K] with blank at channel 0
    labels: jnp.ndarray,   # i32[B, N] left-packed, -100 padded
) -> jnp.ndarray:
    """CTC loss with torch ``F.ctc_loss`` mean semantics: per-sample NLL
    divided by its target length, averaged over the batch. Full input
    lengths (the reference passes no logit paddings)."""
    all_samples = jnp.ones((logits.shape[0],), bool)
    return ctc_loss_grouped(logits, labels, all_samples)


def transcript_ce_loss(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Teacher-forced decoder CE, ignore_index=-100."""
    return masked_ce(logits, targets)


# ---------------------------------------------------------------------------
# Group-masked variants: the reference splits each batch into a "multitask"
# and a "transcript-only" sub-batch and computes each loss as a mean *within
# its sub-batch* (`train_multitask.py:188-211,250-319`). With static shapes
# the split becomes a per-sample mask; each group mean is reproduced exactly,
# and an empty group contributes 0 (the reference's None-batch case).
# ---------------------------------------------------------------------------


def masked_ce_grouped(
    logits: jnp.ndarray,       # f32[B, T, C]
    labels: jnp.ndarray,       # i32[B, T]
    sample_mask: jnp.ndarray,  # bool[B]
) -> jnp.ndarray:
    """CE mean over valid positions of the selected samples (= sub-batch
    ``F.cross_entropy`` with ignore_index)."""
    valid = (labels != IGNORE_ID) & sample_mask[:, None]
    safe = jnp.where(labels == IGNORE_ID, 0, labels)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    total = jnp.sum(jnp.where(valid, nll, 0.0))
    count = jnp.sum(valid)
    return jnp.where(count > 0, total / jnp.maximum(count, 1), 0.0)


def frame_ce_loss_grouped(
    logits: jnp.ndarray,
    frame_labels: jnp.ndarray,
    sample_mask: jnp.ndarray,
    with_silence_head: bool = False,
    vocab_size: int = 21128,
) -> jnp.ndarray:
    """Group-masked version of ``frame_ce_loss``."""
    frame_labels = _reconcile_label_length(frame_labels, logits.shape[1])
    if not with_silence_head:
        return masked_ce_grouped(logits, frame_labels, sample_mask)

    valid = frame_labels != IGNORE_ID
    shifted = jnp.where(valid, frame_labels - 1, IGNORE_ID)
    word_loss = masked_ce_grouped(logits[:, :, 1:vocab_size], shifted, sample_mask)

    silence_label = jnp.where(valid, 0.0, 1.0)
    sil_logit = logits[:, :, vocab_size]
    per_elem = optax.sigmoid_binary_cross_entropy(sil_logit, silence_label)
    m = sample_mask[:, None]
    count = jnp.sum(m) * sil_logit.shape[1]
    sil_loss = jnp.where(
        count > 0, jnp.sum(jnp.where(m, per_elem, 0.0)) / jnp.maximum(count, 1), 0.0
    )
    return word_loss + sil_loss


# ---------------------------------------------------------------------------
# Fused classifier->loss variants: take the PRE-classifier hidden states
# (``align_head_hidden``) + the fc weights instead of [B, T, C] logits, so
# the ~254 MB-per-microbatch logit tensor (and its gradient residuals)
# never reaches HBM — the same TPU large-vocab trick as
# ``ops.viterbi.viterbi_align_fused``. The class normaliser is an online
# chunked logsumexp over fc weight columns (rematerialised in backward);
# only the label columns are gathered. Numerically identical to the
# unfused losses up to f32 reduction ordering (pinned in test_losses).
# ---------------------------------------------------------------------------


def _fc_cols(h: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
             cols: jnp.ndarray, per_frame: bool) -> jnp.ndarray:
    """Logits of selected fc columns via a weight-ROW gather (major-dim
    take on w.T). ``per_frame=True``: cols i32[B, T] (one class per frame,
    CE) -> f32[B, T]. ``per_frame=False``: cols i32[B, N] (a per-sample
    label list, CTC) -> f32[B, T, N]."""
    wg = jnp.take(w.T, cols, axis=0)                       # [B, ..., F]
    bg = jnp.take(b, cols, axis=0)                         # [B, ...]
    if per_frame:
        return jnp.sum(h * wg, axis=-1) + bg
    return jnp.einsum("btf,bnf->btn", h, wg) + bg[:, None, :]


def frame_ce_loss_grouped_fused(
    h: jnp.ndarray,             # f32[B, T, F] pre-classifier hidden
    fc: dict,                   # {"w": [F, C], "b": [C]}
    frame_labels: jnp.ndarray,  # i32[B, T_lab]
    sample_mask: jnp.ndarray,   # bool[B]
    with_silence_head: bool = False,
    vocab_size: int = 21128,
    chunk: int = 4224,
) -> jnp.ndarray:
    """``frame_ce_loss_grouped(h @ w + b, ...)`` without the logits."""
    from lyricalignment_tpu.ops.viterbi import _chunked_lse

    w, b = fc["w"], fc["b"]
    frame_labels = _reconcile_label_length(frame_labels, h.shape[1])
    valid = frame_labels != IGNORE_ID

    if not with_silence_head:
        safe = jnp.where(valid, frame_labels, 0)
        lse = _chunked_lse(h, w, b, chunk)                 # [B, T]
        nll = lse - _fc_cols(h, w, b, safe, per_frame=True)
    else:
        # word CE over channels [1, vocab): original label col == label
        # (the unfused path slices [:, :, 1:vocab] and indexes label-1)
        safe = jnp.clip(jnp.where(valid, frame_labels, 1), 1, vocab_size - 1)
        lse = _chunked_lse(h, w[:, 1:vocab_size], b[1:vocab_size], chunk)
        nll = lse - _fc_cols(h, w, b, safe, per_frame=True)

    m = valid & sample_mask[:, None]
    count = jnp.sum(m)
    word_loss = jnp.where(
        count > 0, jnp.sum(jnp.where(m, nll, 0.0)) / jnp.maximum(count, 1), 0.0)
    if not with_silence_head:
        return word_loss

    silence_label = jnp.where(valid, 0.0, 1.0)
    sil_logit = h @ w[:, vocab_size] + b[vocab_size]
    per_elem = optax.sigmoid_binary_cross_entropy(sil_logit, silence_label)
    sm = sample_mask[:, None]
    scount = jnp.sum(sm) * sil_logit.shape[1]
    sil_loss = jnp.where(
        scount > 0,
        jnp.sum(jnp.where(sm, per_elem, 0.0)) / jnp.maximum(scount, 1), 0.0)
    return word_loss + sil_loss


_CTC_NEG = -1.0e30


def _lse3(a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    m = jnp.maximum(jnp.maximum(a, b), c)
    return m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m) + jnp.exp(c - m))


def _ctc_nll_single(blank_lp: jnp.ndarray,   # f32[T]
                    label_lp: jnp.ndarray,   # f32[T, N] per label position
                    labels: jnp.ndarray,     # i32[N] (clipped-safe values)
                    valid_n: jnp.ndarray     # bool[N]
                    ) -> jnp.ndarray:
    """Standard CTC forward (log-space alpha recursion) on REDUCED
    emissions — per-frame log-probs only for blank + the target's label
    positions (the normaliser over the full vocab is already folded into
    the log-probs). Full input length, as the reference passes
    (`train_multitask.py:616-633`)."""
    n = labels.shape[0]
    s_dim = 2 * n + 1
    state = jnp.arange(s_dim)
    is_lab = (state % 2) == 1
    pos = jnp.clip(state // 2, 0, n - 1)

    # emissions per (t, state); invalid label positions are unreachable
    em = jnp.where(is_lab[None, :],
                   label_lp[:, pos],
                   blank_lp[:, None])
    em = jnp.where(is_lab[None, :] & ~valid_n[pos][None, :], _CTC_NEG, em)

    prev_pos = jnp.clip(pos - 1, 0, n - 1)
    can_skip = is_lab & (state >= 3) & (labels[pos] != labels[prev_pos])

    def shift(v, k):
        return jnp.concatenate([jnp.full((k,), _CTC_NEG, v.dtype), v[:-k]])

    alpha0 = jnp.full((s_dim,), _CTC_NEG, jnp.float32)
    alpha0 = alpha0.at[0].set(em[0, 0])
    alpha0 = alpha0.at[1].set(em[0, 1])

    def step(alpha, em_t):
        skip = jnp.where(can_skip, shift(alpha, 2), _CTC_NEG)
        alpha = em_t + _lse3(alpha, shift(alpha, 1), skip)
        return alpha, None

    alpha_t, _ = jax.lax.scan(step, alpha0, em[1:])
    tlen = jnp.sum(valid_n)
    # tlen==0 (all-padding target): the only end state is the first blank;
    # without the guard both reads land on alpha_t[0] and the lse double
    # counts it (-log 2 offset vs optax.ctc_loss — ADVICE r4)
    end_lab = jnp.where(tlen > 0,
                        alpha_t[jnp.maximum(2 * tlen - 1, 0)], _CTC_NEG)
    end_blank = alpha_t[2 * tlen]
    m = jnp.maximum(end_lab, end_blank)
    return -(m + jnp.log(jnp.exp(end_lab - m) + jnp.exp(end_blank - m)))


def ctc_loss_grouped_fused(
    h: jnp.ndarray,            # f32[B, T, F]
    fc: dict,                  # {"w": [F, C], "b": [C]}
    labels: jnp.ndarray,       # i32[B, N] left-packed, -100 padded
    sample_mask: jnp.ndarray,  # bool[B]
    vocab_size: int = 21128,
    chunk: int = 4224,
) -> jnp.ndarray:
    """``ctc_loss_grouped(logits[..., :vocab_size], ...)`` without the
    logits: log-probs are (gathered column logits - chunked lse over the
    vocab columns), and the alpha recursion runs on the reduced
    [T, blank + N] emission set (CTC only ever reads those columns)."""
    from lyricalignment_tpu.ops.viterbi import _chunked_lse

    w, b = fc["w"], fc["b"]
    valid_n = labels != IGNORE_ID
    safe = jnp.where(valid_n, labels, 0)

    lse = _chunked_lse(h, w[:, :vocab_size], b[:vocab_size], chunk)  # [B, T]
    blank_lp = (h @ w[:, 0] + b[0]) - lse
    label_lp = _fc_cols(h, w, b, safe, per_frame=False) - lse[..., None]              # [B, T, N]

    per_example = jax.vmap(_ctc_nll_single)(blank_lp, label_lp, safe, valid_n)
    target_len = jnp.maximum(jnp.sum(valid_n, axis=1), 1)
    per_example = per_example / target_len
    count = jnp.sum(sample_mask)
    total = jnp.sum(jnp.where(sample_mask, per_example, 0.0))
    return jnp.where(count > 0, total / jnp.maximum(count, 1), 0.0)


def ctc_loss_grouped(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    sample_mask: jnp.ndarray,
) -> jnp.ndarray:
    """Group-masked CTC with torch mean semantics within the group."""
    b, t, _ = logits.shape
    label_padding = (labels == IGNORE_ID).astype(jnp.float32)
    safe_labels = jnp.where(labels == IGNORE_ID, 0, labels)
    logit_padding = jnp.zeros((b, t), jnp.float32)
    per_example = optax.ctc_loss(logits, logit_padding, safe_labels, label_padding, blank_id=0)
    target_len = jnp.maximum(jnp.sum(labels != IGNORE_ID, axis=1), 1)
    per_example = per_example / target_len
    count = jnp.sum(sample_mask)
    total = jnp.sum(jnp.where(sample_mask, per_example, 0.0))
    return jnp.where(count > 0, total / jnp.maximum(count, 1), 0.0)
