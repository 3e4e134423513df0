"""Fused classifier->Viterbi path vs the unfused logits path.

``viterbi_align_fused(h, fc, ...)`` must reproduce
``viterbi_align(align_head_apply -> logits, ...)`` — the fused path computes
the class-softmax normaliser as an online chunked logsumexp over fc weight
columns and gathers only the label columns, so the full [B, T, C] logits are
never formed. Reference semantics: `utils/alignment.py:13-21` (CE
emissions), `utils/alignment.py:121-134` (CTC emissions).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lyricalignment_tpu.ops.viterbi import (
    ce_emissions,
    ce_emissions_fused,
    ctc_emissions,
    ctc_emissions_fused,
    viterbi_align,
    viterbi_align_fused,
)


@pytest.fixture
def rng():
    return np.random.default_rng(20240817)


def _mk(rng, B=3, T=40, F=16, C=23, L=5):
    h = (rng.standard_normal((B, T, F)) * 0.7).astype(np.float32)
    fc = {
        "w": (rng.standard_normal((F, C)) * 0.4).astype(np.float32),
        "b": (rng.standard_normal((C,)) * 0.1).astype(np.float32),
    }
    # valid ids 1..C-2 in both modes (CTC reserves blank=0 and silence=C-1)
    labels = rng.integers(1, C - 2, size=(B, L)).astype(np.int32)
    num_labels = np.full((B,), L, np.int32)
    num_frames = np.full((B,), T, np.int32)
    return h, fc, labels, num_labels, num_frames


@pytest.mark.parametrize("mode", ["ce", "ctc"])
@pytest.mark.parametrize("chunk", [7, 64])  # 7 forces multi-chunk + padding
def test_fused_emissions_match_unfused(mode, chunk, rng):
    h, fc, labels, _, _ = _mk(rng)
    logits = jnp.asarray(h) @ fc["w"] + fc["b"]
    if mode == "ce":
        lab_full, sil = ce_emissions(logits)
        lab_f, sil_f = ce_emissions_fused(jnp.asarray(h), fc, jnp.asarray(labels), chunk)
    else:
        lab_full, sil = ctc_emissions(logits)
        lab_f, sil_f = ctc_emissions_fused(jnp.asarray(h), fc, jnp.asarray(labels), chunk)
    # gather the unfused [B, T, C] table at the label columns
    lab_pos = jnp.take_along_axis(
        lab_full, jnp.asarray(labels)[:, None, :], axis=-1)
    np.testing.assert_allclose(np.asarray(lab_f), np.asarray(lab_pos),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sil_f), np.asarray(sil),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("mode", ["ce", "ctc"])
def test_fused_viterbi_matches_unfused(mode, rng):
    for trial in range(4):
        B = 2 + trial % 2
        T = int(rng.integers(25, 60))
        L = int(rng.integers(2, 7))
        h, fc, labels, num_labels, num_frames = _mk(
            rng, B=B, T=T, F=12, C=19, L=L)
        # exercise padding/masking: last sample shorter in both axes
        num_labels[-1] = max(1, L - 1)
        num_frames[-1] = T - 5

        logits = jnp.asarray(h) @ fc["w"] + fc["b"]
        on_u, off_u = viterbi_align(
            logits, jnp.asarray(labels), jnp.asarray(num_labels),
            jnp.asarray(num_frames), mode=mode)
        on_f, off_f = viterbi_align_fused(
            jnp.asarray(h), fc, jnp.asarray(labels), jnp.asarray(num_labels),
            jnp.asarray(num_frames), mode=mode, chunk=8)

        for b in range(B):
            Lb = int(num_labels[b])
            np.testing.assert_array_equal(
                np.asarray(on_f)[b, :Lb], np.asarray(on_u)[b, :Lb],
                err_msg=f"mode={mode} trial={trial} b={b}")
            np.testing.assert_array_equal(
                np.asarray(off_f)[b, :Lb], np.asarray(off_u)[b, :Lb],
                err_msg=f"mode={mode} trial={trial} b={b}")


def test_fused_hidden_entrypoint(rng):
    """align_head_hidden + fc == align_head_apply (refactor guard)."""
    import jax
    from lyricalignment_tpu.models.align_head import (
        align_head_apply, align_head_hidden, init_align_head)

    params = init_align_head(jax.random.PRNGKey(0), input_dim=8,
                             hidden_dim=6, output_dim=17)
    x = jnp.asarray(rng.standard_normal((2, 11, 8)).astype(np.float32))
    lengths = jnp.asarray([11, 7], jnp.int32)
    logits = align_head_apply(params, x, lengths=lengths)
    h = align_head_hidden(params, x, lengths=lengths)
    recomposed = h @ params["fc"]["w"] + params["fc"]["b"]
    np.testing.assert_allclose(np.asarray(recomposed), np.asarray(logits),
                               rtol=1e-6, atol=1e-6)


def test_pallas_lse_matches_scan_lse(rng):
    """The Pallas streaming-logsumexp backend (TPU production path for the
    fused emissions' class normaliser) must match the XLA chunked-scan
    path bit-closely: padded fc columns carry a NEG_INF bias and must
    contribute exactly zero, including for the CTC slice's odd width."""
    from lyricalignment_tpu.ops.viterbi import _chunked_lse, _chunked_lse_pallas

    b, t, f, c = 2, 37, 768, 21129
    h = jnp.asarray(rng.standard_normal((b, t, f)).astype(np.float32) * 0.3)
    w = jnp.asarray(rng.standard_normal((f, c)).astype(np.float32) * 0.05)
    bias = jnp.asarray(rng.standard_normal((c,)).astype(np.float32) * 0.1)

    ref = np.asarray(_chunked_lse(h, w, bias, 4224))
    got = np.asarray(_chunked_lse_pallas(h, w, bias, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-5)

    # CTC-head slice: odd column count exercises the padding path
    ref = np.asarray(_chunked_lse(h, w[:, 1:-1], bias[1:-1], 4224))
    got = np.asarray(_chunked_lse_pallas(h, w[:, 1:-1], bias[1:-1],
                                         interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-5)
