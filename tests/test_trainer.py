"""Trainer tests: jitted update, grad accumulation, schedule parity,
data-parallel execution on the 8-device virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lyricalignment_tpu.models.align_model import AlignModelConfig, init_align_model
from lyricalignment_tpu.models.whisper import WhisperConfig
from lyricalignment_tpu.parallel.mesh import batch_sharding, make_mesh, shard_align_params
from lyricalignment_tpu.train.schedule import linear_warmup_decay
from lyricalignment_tpu.train.trainer import (
    TrainConfig,
    init_train_state,
    make_eval_step,
    make_train_step,
    multitask_losses,
)

VOCAB = 10  # tiny stand-in for 21128


@pytest.fixture(scope="module")
def mcfg():
    return AlignModelConfig(
        whisper=WhisperConfig(
            n_mels=80, n_vocab=32, n_audio_ctx=1500, n_audio_state=16,
            n_audio_head=2, n_audio_layer=1, n_text_ctx=16, n_text_state=16,
            n_text_head=2, n_text_layer=1,
        ),
        hidden_dim=8, output_dim=VOCAB + 1, train_alignment=True, train_transcript=True,
    )


@pytest.fixture(scope="module")
def tcfg():
    return TrainConfig(accum_grad_steps=2, use_ctc=True, vocab_size=VOCAB,
                       total_steps=10, warmup_steps=2)


def make_batch(rng, accum=None, batch=2):
    def one():
        return {
            "audio": rng.standard_normal((batch, 480000)).astype(np.float32) * 0.05,
            "ctc_labels": np.where(
                np.arange(6)[None, :] < 3,
                rng.integers(1, VOCAB - 1, (batch, 6)), -100).astype(np.int32),
            "frame_labels": np.where(
                rng.random((batch, 1500)) < 0.3,
                rng.integers(1, VOCAB - 1, (batch, 1500)), -100).astype(np.int32),
            "label_lengths": np.full((batch,), 3, np.int32),
            "has_alignment": np.array([True, False] * (batch // 2), np.bool_),
            "decoder_input": rng.integers(0, 32, (batch, 5)).astype(np.int32),
            "decoder_output": rng.integers(0, 32, (batch, 5)).astype(np.int32),
        }
    if accum is None:
        return one()
    batches = [one() for _ in range(accum)]
    return {k: np.stack([b[k] for b in batches]) for k in batches[0]}


def test_schedule_matches_hf_formula():
    sched = linear_warmup_decay(5e-3, warmup_steps=200, total_steps=2000)
    # HF: lr * step/warmup during warmup; lr * (total-step)/(total-warmup) after
    assert float(sched(0)) == 0.0
    assert float(sched(100)) == pytest.approx(5e-3 * 0.5)
    assert float(sched(200)) == pytest.approx(5e-3)
    assert float(sched(1100)) == pytest.approx(5e-3 * 900 / 1800)
    assert float(sched(2000)) == pytest.approx(0.0)
    assert float(sched(2500)) == 0.0  # clamped


def test_losses_structure_and_group_masking(mcfg, tcfg, rng):
    params = init_align_model(jax.random.PRNGKey(0), mcfg)
    batch = make_batch(rng)
    total, losses = multitask_losses(params, mcfg, tcfg,
                                     {k: jnp.asarray(v) for k, v in batch.items()},
                                     dropout_rng=None)
    assert set(losses) == {"total", "align_ce", "align_ctc", "trans_ce", "trans_ctc"}
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert float(losses["align_ce"]) > 0
    assert float(losses["trans_ce"]) > 0
    assert float(total) == pytest.approx(
        sum(float(losses[k]) for k in ("align_ce", "align_ctc", "trans_ce", "trans_ctc")),
        rel=1e-5,
    )


def test_train_step_updates_and_loss_decreases(mcfg, tcfg, rng):
    params = init_align_model(jax.random.PRNGKey(0), mcfg)
    state, tx = init_train_state(params, tcfg)
    step_fn = make_train_step(mcfg, tcfg, tx)
    stacked = make_batch(rng, accum=tcfg.accum_grad_steps)
    key = jax.random.PRNGKey(1)

    first = None
    for i in range(4):
        state, losses = step_fn(state, {k: jnp.asarray(v) for k, v in stacked.items()}, key)
        if first is None:
            first = float(losses["total"])
    assert int(state.step) == 4
    # same batch 4x: loss must drop
    assert float(losses["total"]) < first


def test_eval_step_no_dropout_deterministic(mcfg, tcfg, rng):
    params = init_align_model(jax.random.PRNGKey(0), mcfg)
    eval_fn = make_eval_step(mcfg, tcfg)
    batch = {k: jnp.asarray(v) for k, v in make_batch(rng).items()}
    a = eval_fn(params, batch)
    b = eval_fn(params, batch)
    assert float(a["total"]) == float(b["total"])


@pytest.mark.slow
def test_data_parallel_matches_single_device(mcfg, tcfg, rng):
    assert jax.device_count() == 8
    params = init_align_model(jax.random.PRNGKey(0), mcfg)
    eval_fn = make_eval_step(mcfg, tcfg)
    batch = make_batch(rng, batch=8)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    single = eval_fn(params, jb)

    mesh = make_mesh(data=8, model=1)
    sharded_params = shard_align_params(params, mesh, tp=False)
    bs = batch_sharding(mesh)
    sharded_batch = {k: jax.device_put(v, bs) for k, v in batch.items()}
    dp = eval_fn(sharded_params, sharded_batch)
    # identical math, just sharded over the data axis
    assert float(dp["total"]) == pytest.approx(float(single["total"]), rel=1e-4)


@pytest.mark.slow
def test_tensor_parallel_matches_single_device(mcfg, tcfg, rng):
    params = init_align_model(jax.random.PRNGKey(0), mcfg)
    eval_fn = make_eval_step(mcfg, tcfg)
    batch = make_batch(rng, batch=2)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    single = eval_fn(params, jb)

    mesh = make_mesh(data=2, model=4)
    sharded_params = shard_align_params(params, mesh, tp=True)
    bs = batch_sharding(mesh)
    sharded_batch = {k: jax.device_put(v, bs) for k, v in batch.items()}
    tp = eval_fn(sharded_params, sharded_batch)
    assert float(tp["total"]) == pytest.approx(float(single["total"]), rel=1e-3)


def test_sequence_parallel_encoder_matches_single_device(mcfg, rng):
    from lyricalignment_tpu.models.whisper import encode_audio
    from lyricalignment_tpu.parallel.mesh import sequence_sharding

    params = init_align_model(jax.random.PRNGKey(0), mcfg)
    mel = jnp.asarray(rng.standard_normal((2, 80, 3000)).astype(np.float32))
    base = np.asarray(encode_audio(params["whisper"], mcfg.whisper, mel))

    mesh = make_mesh(data=2, model=4)
    seq_sh = sequence_sharding(mesh)
    sharded_params = shard_align_params(params, mesh, tp=False)
    sp = jax.jit(lambda p, m: encode_audio(p, mcfg.whisper, m,
                                           sequence_sharding=seq_sh))
    got = np.asarray(sp(sharded_params["whisper"], mel))
    np.testing.assert_allclose(got, base, atol=2e-4, rtol=1e-4)


def test_fused_losses_train_step_matches_unfused(mcfg, tcfg, rng):
    """tcfg.fused_losses changes only the HBM layout of the align losses
    (classifier folded into chunked-lse + gathers): one full accumulated
    train step must produce the same losses and parameters."""
    import dataclasses as dc

    params = init_align_model(jax.random.PRNGKey(0), mcfg)
    batch = jax.tree_util.tree_map(jnp.asarray, make_batch(rng, accum=2))

    outs = {}
    for fused in (False, True):
        t = dc.replace(tcfg, fused_losses=fused)
        # the jitted step donates its input state: give each arm its own copy
        state, tx = init_train_state(
            jax.tree_util.tree_map(jnp.array, params), t)
        step_fn = make_train_step(mcfg, t, tx)
        new_state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
        outs[fused] = (new_state, metrics)

    m_u, m_f = outs[False][1], outs[True][1]
    for k in ("total", "align_ce", "align_ctc", "trans_ce", "trans_ctc"):
        np.testing.assert_allclose(float(m_f[k]), float(m_u[k]),
                                   rtol=1e-4, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(outs[False][0].params),
                    jax.tree_util.tree_leaves(outs[True][0].params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=1e-6)


def test_freeze_encoder_no_update_no_opt_state(mcfg, tcfg, rng):
    """--freeze-encoder parity with torch AdamW over a no_grad encoder
    (`module/align_model.py:137-139` + torch skipping grad-less params):
    encoder params must be bit-unchanged after a step (no update AND no
    decoupled weight decay), carry no mu/nu optimizer state, while the
    decoder and align head still train."""
    import dataclasses as dc

    m = dc.replace(mcfg, freeze_encoder=True)
    t = dc.replace(tcfg, freeze_encoder=True)
    params = init_align_model(jax.random.PRNGKey(0), m)
    enc_before = jax.tree_util.tree_map(np.asarray, params["whisper"]["encoder"])
    state, tx = init_train_state(params, t)

    # frozen subtree holds no Adam state (optax.set_to_zero => EmptyState)
    flat_state = jax.tree_util.tree_leaves(state.opt_state)
    n_enc = len(jax.tree_util.tree_leaves(enc_before))
    n_all = len(jax.tree_util.tree_leaves(state.params))
    # mu+nu exist only for non-frozen params (plus scalar counts)
    n_moments = sum(1 for leaf in flat_state if hasattr(leaf, "shape") and leaf.ndim > 0)
    assert n_moments <= 2 * (n_all - n_enc)

    step_fn = make_train_step(m, t, tx)
    stacked = make_batch(rng, accum=t.accum_grad_steps)
    # two steps: the warmup schedule gives lr=0 at step 0
    for _ in range(2):
        state, losses = step_fn(state, {k: jnp.asarray(v) for k, v in stacked.items()},
                                jax.random.PRNGKey(1))
    assert np.isfinite(float(losses["total"]))

    enc_after = state.params["whisper"]["encoder"]
    for a, b in zip(jax.tree_util.tree_leaves(enc_before),
                    jax.tree_util.tree_leaves(enc_after)):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
    # the trainable parts moved
    head_before = init_align_model(jax.random.PRNGKey(0), m)["align_head"]
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(head_before),
                        jax.tree_util.tree_leaves(state.params["align_head"])))
    assert moved
    dec_before = init_align_model(jax.random.PRNGKey(0), m)["whisper"]["decoder"]
    dec_moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(dec_before),
                        jax.tree_util.tree_leaves(state.params["whisper"]["decoder"])))
    assert dec_moved


def test_freeze_encoder_bf16_resident_trains(mcfg, tcfg, rng):
    """The frozen-encoder large recipe stores encoder params bf16-resident
    (they never update, so residency is the same numerics as the bf16
    inference cast). The train step must run, keep the encoder bit-frozen
    in bf16, and still train the decoder/head."""
    import dataclasses as dc

    from lyricalignment_tpu.models.whisper import bf16_resident_params

    m = dc.replace(mcfg, freeze_encoder=True)
    t = dc.replace(tcfg, freeze_encoder=True)
    params = init_align_model(jax.random.PRNGKey(0), m)
    params["whisper"]["encoder"] = bf16_resident_params(
        params["whisper"]["encoder"])
    enc_before = jax.tree_util.tree_map(np.asarray, params["whisper"]["encoder"])
    state, tx = init_train_state(params, t)
    step_fn = make_train_step(m, t, tx)
    stacked = make_batch(rng, accum=t.accum_grad_steps)
    for _ in range(2):
        state, losses = step_fn(state, {k: jnp.asarray(v) for k, v in stacked.items()},
                                jax.random.PRNGKey(1))
    assert np.isfinite(float(losses["total"]))
    for a, b in zip(jax.tree_util.tree_leaves(enc_before),
                    jax.tree_util.tree_leaves(state.params["whisper"]["encoder"])):
        assert np.asarray(b).dtype == np.asarray(a).dtype
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
