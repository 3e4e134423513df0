"""Scan-GRU parity vs torch.nn.GRU (the reference head's cuDNN numerics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from lyricalignment_tpu.models.align_head import align_head_apply, init_align_head, mish
from lyricalignment_tpu.ops.gru import bigru_apply, gru_layer, init_bigru, init_gru_cell


def load_cell_into_torch(gru: torch.nn.GRU, params, layer: int, direction: int):
    """Copy our [in,3H] cell params into a torch GRU's layer/direction slots."""
    suffix = f"_l{layer}" + ("_reverse" if direction == 1 else "")
    cell = params["layers"][layer]["dirs"][direction]
    getattr(gru, f"weight_ih{suffix}").data = torch.from_numpy(np.asarray(cell["w_ih"]).T.copy())
    getattr(gru, f"weight_hh{suffix}").data = torch.from_numpy(np.asarray(cell["w_hh"]).T.copy())
    getattr(gru, f"bias_ih{suffix}").data = torch.from_numpy(np.asarray(cell["b_ih"]).copy())
    getattr(gru, f"bias_hh{suffix}").data = torch.from_numpy(np.asarray(cell["b_hh"]).copy())


@pytest.mark.parametrize("bidirectional", [False, True])
def test_bigru_matches_torch(bidirectional, rng):
    n_in, n_hidden, layers = 12, 16, 2
    params = init_bigru(jax.random.PRNGKey(3), n_in, n_hidden, layers, bidirectional)
    x = rng.standard_normal((3, 9, n_in)).astype(np.float32)

    tgru = torch.nn.GRU(n_in, n_hidden, num_layers=layers, batch_first=True,
                        bidirectional=bidirectional)
    for l in range(layers):
        for d in range(2 if bidirectional else 1):
            load_cell_into_torch(tgru, params, l, d)

    expected, _ = tgru(torch.from_numpy(x))
    got = np.asarray(bigru_apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, expected.detach().numpy(), atol=1e-5, rtol=1e-5)


def test_reverse_direction_is_time_flip(rng):
    cell = init_gru_cell(jax.random.PRNGKey(0), 8, 8)
    x = rng.standard_normal((2, 6, 8)).astype(np.float32)
    rev = np.asarray(gru_layer(cell, jnp.asarray(x), reverse=True))
    flip = np.asarray(gru_layer(cell, jnp.asarray(x[:, ::-1]), reverse=False))[:, ::-1]
    np.testing.assert_allclose(rev, flip, atol=1e-6)


def test_mish_matches_torch(rng):
    x = rng.standard_normal(100).astype(np.float32)
    got = np.asarray(mish(jnp.asarray(x)))
    expected = torch.nn.functional.mish(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_align_head_shapes_and_dropout(rng):
    params = init_align_head(jax.random.PRNGKey(1), input_dim=32, hidden_dim=16, output_dim=21)
    x = jnp.asarray(rng.standard_normal((2, 10, 32)).astype(np.float32))
    logits = align_head_apply(params, x)
    assert logits.shape == (2, 10, 21)
    assert logits.dtype == jnp.float32
    # dropout changes outputs only when an rng is passed
    d1 = align_head_apply(params, x, dropout=0.5, rng=jax.random.PRNGKey(9))
    d0 = align_head_apply(params, x, dropout=0.5, rng=None)
    np.testing.assert_allclose(np.asarray(d0), np.asarray(logits))
    assert np.abs(np.asarray(d1) - np.asarray(logits)).max() > 1e-4


def test_length_masked_bigru_equals_exact_trim(rng):
    """Padded batch + lengths mask == per-sample exact-trim run (the
    reference's `module/align_model.py:86-92` numerics), bit-for-bit at
    valid positions."""
    n_in, n_hidden, layers = 12, 16, 2
    params = init_bigru(jax.random.PRNGKey(9), n_in, n_hidden, layers, True)
    t_pad = 20
    lengths = np.array([13, 20, 7], np.int32)
    x = rng.standard_normal((3, t_pad, n_in)).astype(np.float32)
    # poison the padding region: it must not leak into valid outputs
    for b, L in enumerate(lengths):
        x[b, L:] = 1e3

    got = np.asarray(bigru_apply(params, jnp.asarray(x),
                                 lengths=jnp.asarray(lengths)))
    for b, L in enumerate(lengths):
        exact = np.asarray(bigru_apply(params, jnp.asarray(x[b:b + 1, :L])))
        np.testing.assert_allclose(got[b:b + 1, :L], exact, atol=1e-6, rtol=1e-6)


def test_length_mask_none_is_unmasked(rng):
    params = init_bigru(jax.random.PRNGKey(4), 8, 8, 1, True)
    x = rng.standard_normal((2, 9, 8)).astype(np.float32)
    full = np.asarray(bigru_apply(params, jnp.asarray(x)))
    masked = np.asarray(bigru_apply(params, jnp.asarray(x),
                                    lengths=jnp.asarray([9, 9], np.int32)))
    np.testing.assert_allclose(masked, full, atol=1e-6)


def test_fused_bidir_layer_matches_separate_scans(rng):
    """gru_layer_bidir (measured-negative exhibit) == two gru_layer scans,
    with and without length masking."""
    from lyricalignment_tpu.ops.gru import gru_layer_bidir

    n_in, n_hidden = 12, 16
    key = jax.random.PRNGKey(3)
    cf = init_gru_cell(jax.random.fold_in(key, 0), n_in, n_hidden)
    cb = init_gru_cell(jax.random.fold_in(key, 1), n_in, n_hidden)
    x = jnp.asarray(rng.standard_normal((3, 11, n_in)).astype(np.float32))

    sep = jnp.concatenate(
        [gru_layer(cf, x), gru_layer(cb, x, reverse=True)], axis=-1)
    fused = gru_layer_bidir(cf, cb, x)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(sep),
                               atol=1e-6, rtol=1e-6)

    lengths = jnp.asarray([11, 7, 4], jnp.int32)
    sep_m = jnp.concatenate(
        [gru_layer(cf, x, lengths=lengths),
         gru_layer(cb, x, reverse=True, lengths=lengths)], axis=-1)
    fused_m = gru_layer_bidir(cf, cb, x, lengths=lengths)
    np.testing.assert_allclose(np.asarray(fused_m), np.asarray(sep_m),
                               atol=1e-6, rtol=1e-6)
