"""Loss parity vs torch oracles (F.cross_entropy / BCEWithLogits / F.ctc_loss)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from lyricalignment_tpu.train.losses import (
    ctc_loss,
    frame_ce_loss,
    masked_ce,
    transcript_ce_loss,
)


def test_masked_ce_matches_torch(rng):
    logits = rng.standard_normal((3, 7, 9)).astype(np.float32)
    labels = rng.integers(0, 9, (3, 7)).astype(np.int64)
    labels[0, :2] = -100
    labels[2, 5:] = -100
    got = float(masked_ce(jnp.asarray(logits), jnp.asarray(labels)))
    expected = float(F.cross_entropy(
        torch.from_numpy(logits).permute(0, 2, 1), torch.from_numpy(labels)))
    assert got == pytest.approx(expected, rel=1e-5)


def test_frame_ce_plain_with_length_reconcile(rng):
    # labels longer than logits -> truncated; shorter -> padded with -100
    logits = rng.standard_normal((2, 10, 5)).astype(np.float32)
    labels_long = rng.integers(0, 5, (2, 14)).astype(np.int64)
    got = float(frame_ce_loss(jnp.asarray(logits), jnp.asarray(labels_long)))
    expected = float(F.cross_entropy(
        torch.from_numpy(logits).permute(0, 2, 1),
        torch.from_numpy(labels_long[:, :10])))
    assert got == pytest.approx(expected, rel=1e-5)

    labels_short = rng.integers(0, 5, (2, 6)).astype(np.int64)
    got = float(frame_ce_loss(jnp.asarray(logits), jnp.asarray(labels_short)))
    padded = np.concatenate([labels_short, np.full((2, 4), -100)], axis=1)
    expected = float(F.cross_entropy(
        torch.from_numpy(logits).permute(0, 2, 1), torch.from_numpy(padded)))
    assert got == pytest.approx(expected, rel=1e-5)


def test_frame_ce_silence_head_matches_reference_formula(rng):
    vocab = 8  # stand-in for 21128; head dim = vocab + 1
    logits = rng.standard_normal((2, 6, vocab + 1)).astype(np.float32)
    labels = rng.integers(1, vocab, (2, 6)).astype(np.int64)
    labels[0, 0] = -100
    labels[1, 4:] = -100

    got = float(frame_ce_loss(jnp.asarray(logits), jnp.asarray(labels),
                              with_silence_head=True, vocab_size=vocab))

    # torch oracle replicating compute_ce_loss compute_sil branch
    tl = torch.from_numpy(logits)
    lab = torch.from_numpy(labels.copy())
    lab[lab != -100] -= 1
    word = F.cross_entropy(tl[:, :, 1:vocab].transpose(1, 2), lab)
    sil_label = torch.where(lab == -100, 1.0, 0.0)
    sil = F.binary_cross_entropy_with_logits(tl[:, :, vocab], sil_label)
    assert got == pytest.approx(float(word + sil), rel=1e-5)


def test_ctc_loss_matches_torch(rng):
    b, t, k, n = 3, 20, 7, 5
    logits = rng.standard_normal((b, t, k)).astype(np.float32)
    labels = rng.integers(1, k, (b, n)).astype(np.int64)
    lens = np.array([5, 3, 4])
    for i, l in enumerate(lens):
        labels[i, l:] = -100

    got = float(ctc_loss(jnp.asarray(logits), jnp.asarray(labels)))

    log_probs = F.log_softmax(torch.from_numpy(logits), dim=2).transpose(0, 1)
    targets = torch.from_numpy(np.where(labels == -100, 0, labels))
    expected = float(F.ctc_loss(
        log_probs, targets,
        input_lengths=torch.full((b,), t, dtype=torch.long),
        target_lengths=torch.from_numpy(lens),
    ))
    assert got == pytest.approx(expected, rel=1e-4)


def test_ctc_loss_gradient_flows(rng):
    import jax
    logits = jnp.asarray(rng.standard_normal((2, 15, 6)).astype(np.float32))
    labels = jnp.asarray(np.array([[1, 2, -100], [3, 3, 4]], np.int32))
    g = jax.grad(lambda l: ctc_loss(l, labels))(logits)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_transcript_ce_is_masked_ce(rng):
    logits = rng.standard_normal((2, 4, 10)).astype(np.float32)
    targets = rng.integers(0, 10, (2, 4)).astype(np.int64)
    targets[1, 3] = -100
    a = float(transcript_ce_loss(jnp.asarray(logits), jnp.asarray(targets)))
    b_ = float(masked_ce(jnp.asarray(logits), jnp.asarray(targets)))
    assert a == b_


# ---------------------------------------------------------------------------
# Fused classifier->loss parity: values AND gradients must match the
# unfused path applied to h @ w + b (up to f32 reduction ordering).
# ---------------------------------------------------------------------------


def _fused_setup(rng, b=2, t=12, f=8, c=17):
    import jax

    h = jnp.asarray(rng.standard_normal((b, t, f)).astype(np.float32))
    fc = {"w": jnp.asarray(rng.standard_normal((f, c)).astype(np.float32)),
          "b": jnp.asarray(rng.standard_normal((c,)).astype(np.float32))}
    return jax, h, fc


@pytest.mark.parametrize("silence_head", [False, True])
def test_fused_frame_ce_matches_unfused(rng, silence_head):
    from lyricalignment_tpu.train.losses import (
        frame_ce_loss_grouped, frame_ce_loss_grouped_fused)

    vocab = 16  # head output dim 17 = vocab + silence channel
    jax, h, fc = _fused_setup(rng, c=17)
    lo = 1 if silence_head else 0
    labels = rng.integers(lo, vocab, (2, 12)).astype(np.int64)
    labels[0, 3:5] = -100
    labels[1, 0] = -100
    labels = jnp.asarray(labels.astype(np.int32))
    mask = jnp.asarray([True, True])

    def unfused(h, fc):
        logits = h @ fc["w"] + fc["b"]
        return frame_ce_loss_grouped(logits, labels, mask,
                                     with_silence_head=silence_head,
                                     vocab_size=vocab)

    def fused(h, fc):
        return frame_ce_loss_grouped_fused(h, fc, labels, mask,
                                           with_silence_head=silence_head,
                                           vocab_size=vocab, chunk=5)

    v_u, g_u = jax.value_and_grad(unfused, argnums=(0, 1))(h, fc)
    v_f, g_f = jax.value_and_grad(fused, argnums=(0, 1))(h, fc)
    np.testing.assert_allclose(float(v_f), float(v_u), rtol=1e-5, atol=1e-6)
    for a, b_ in zip(jax.tree_util.tree_leaves(g_u), jax.tree_util.tree_leaves(g_f)):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_fused_ctc_matches_optax(rng):
    from lyricalignment_tpu.train.losses import (
        ctc_loss_grouped, ctc_loss_grouped_fused)

    vocab = 16
    jax, h, fc = _fused_setup(rng, t=14, c=17)
    # repeated labels included: exercises the no-skip transition rule
    labels = np.asarray([[3, 3, 7, 2, -100], [5, 1, -100, -100, -100]],
                        np.int32)
    labels = jnp.asarray(labels)
    mask = jnp.asarray([True, True])

    def unfused(h, fc):
        logits = h @ fc["w"] + fc["b"]
        return ctc_loss_grouped(logits[:, :, :vocab], labels, mask)

    def fused(h, fc):
        return ctc_loss_grouped_fused(h, fc, labels, mask, vocab_size=vocab,
                                      chunk=5)

    v_u, g_u = jax.value_and_grad(unfused, argnums=(0, 1))(h, fc)
    v_f, g_f = jax.value_and_grad(fused, argnums=(0, 1))(h, fc)
    np.testing.assert_allclose(float(v_f), float(v_u), rtol=1e-4, atol=1e-5)
    # fc grads: the unfused path has no gradient into the silence column
    # (sliced off) and neither does the fused one (never touched)
    for a, b_ in zip(jax.tree_util.tree_leaves(g_u), jax.tree_util.tree_leaves(g_f)):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=1e-3, atol=1e-4)


def test_fused_ctc_group_mask_and_empty_group(rng):
    from lyricalignment_tpu.train.losses import (
        ctc_loss_grouped, ctc_loss_grouped_fused)

    vocab = 16
    jax, h, fc = _fused_setup(rng, t=10, c=17)
    labels = jnp.asarray(np.asarray([[2, 9, -100], [4, -100, -100]], np.int32))
    logits = h @ fc["w"] + fc["b"]
    for mask in ([True, False], [False, False]):
        m = jnp.asarray(mask)
        v_u = float(ctc_loss_grouped(logits[:, :, :vocab], labels, m))
        v_f = float(ctc_loss_grouped_fused(h, fc, labels, m, vocab_size=vocab,
                                           chunk=5))
        np.testing.assert_allclose(v_f, v_u, rtol=1e-4, atol=1e-6)


def test_fused_ctc_empty_target(rng):
    """An unmasked all-padding target (tlen==0) must match optax: the only
    end state is the first blank; the pre-fix fused path read alpha_t[0]
    as both end states (-log 2 offset — ADVICE r4)."""
    from lyricalignment_tpu.train.losses import (
        ctc_loss_grouped, ctc_loss_grouped_fused)

    vocab = 16
    jax, h, fc = _fused_setup(rng, t=10, c=17)
    labels = jnp.asarray(
        np.asarray([[-100, -100, -100], [4, 7, -100]], np.int32))
    logits = h @ fc["w"] + fc["b"]
    m = jnp.asarray([True, True])
    v_u = float(ctc_loss_grouped(logits[:, :, :vocab], labels, m))
    v_f = float(ctc_loss_grouped_fused(h, fc, labels, m, vocab_size=vocab,
                                       chunk=5))
    np.testing.assert_allclose(v_f, v_u, rtol=1e-4, atol=1e-6)
