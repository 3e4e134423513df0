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
