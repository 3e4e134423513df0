"""Pipeline parallelism (GPipe over a mesh axis) vs the single-device encoder.

Runs on the 8-virtual-CPU-device mesh from conftest. The pipelined encoder
must be numerically identical to ``encode_audio`` forward AND backward
(jax.grad through ppermute runs the reverse schedule).
"""

import pytest

pytestmark = pytest.mark.slow  # multi-minute on the 1-core host (see CLAUDE.md test lanes)

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lyricalignment_tpu.models.whisper import (
    WhisperConfig,
    encode_audio,
    init_whisper_params,
)
from lyricalignment_tpu.parallel.mesh import make_mesh
from lyricalignment_tpu.parallel.pipeline import (
    pipeline_encode_audio,
    place_pipeline_params,
    stack_encoder_blocks,
)


def _tiny_cfg(n_layers):
    return WhisperConfig(
        n_mels=8, n_vocab=32, n_audio_ctx=32, n_audio_state=16,
        n_audio_head=2, n_audio_layer=n_layers, n_text_ctx=8,
        n_text_state=16, n_text_head=2, n_text_layer=1,
    )


@pytest.fixture(scope="module")
def setup():
    cfg = _tiny_cfg(4)
    params = init_whisper_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(7)
    mel = jnp.asarray(rng.standard_normal((4, 8, 64)).astype(np.float32))
    return cfg, params, mel


@pytest.mark.parametrize("n_micro", [1, 2])
def test_pipeline_matches_encoder(setup, n_micro):
    cfg, params, mel = setup
    mesh = make_mesh(data=2, model=4)  # 2-way DP x 4-stage PP
    ref = encode_audio(params, cfg, mel)
    got = pipeline_encode_audio(params, cfg, mel, mesh, n_micro=n_micro)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_multiple_layers_per_stage(setup):
    cfg8 = _tiny_cfg(8)
    params = init_whisper_params(jax.random.PRNGKey(1), cfg8)
    rng = np.random.default_rng(8)
    mel = jnp.asarray(rng.standard_normal((2, 8, 64)).astype(np.float32))
    mesh = make_mesh(data=2, model=4)  # 8 layers -> 2 per stage
    ref = encode_audio(params, cfg8, mel)
    got = pipeline_encode_audio(params, cfg8, mel, mesh, n_micro=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_pure_pipe_mesh(setup):
    cfg, params, mel = setup
    mesh = make_mesh(data=1, model=4, devices=jax.devices()[:4])
    ref = encode_audio(params, cfg, mel)
    got = pipeline_encode_audio(params, cfg, mel, mesh, n_micro=2,
                                data_axis=None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_prestacked_params(setup):
    cfg, params, mel = setup
    mesh = make_mesh(data=2, model=4)
    stacked = place_pipeline_params(
        stack_encoder_blocks(params["encoder"]["blocks"], 4), mesh)
    ref = encode_audio(params, cfg, mel)
    got = pipeline_encode_audio(params, cfg, mel, mesh, n_micro=2,
                                stacked=stacked)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("n_micro", [1, 2])
def test_decoder_pipeline_matches_decoder_logits(n_micro):
    """pipeline_decoder_logits == decoder_logits (teacher-forced) on a
    DP x PP mesh, forward numerics."""
    from lyricalignment_tpu.models.whisper import decoder_logits
    from lyricalignment_tpu.parallel.pipeline import pipeline_decoder_logits

    cfg = WhisperConfig(
        n_mels=8, n_vocab=32, n_audio_ctx=16, n_audio_state=16,
        n_audio_head=2, n_audio_layer=1, n_text_ctx=8,
        n_text_state=16, n_text_head=2, n_text_layer=4)
    params = init_whisper_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(9)
    tokens = jnp.asarray(rng.integers(0, 32, (4, 6)).astype(np.int32))
    xa = jnp.asarray(rng.standard_normal((4, 16, 16)).astype(np.float32))
    mesh = make_mesh(data=2, model=4)
    ref = decoder_logits(params, cfg, tokens, xa)
    got = pipeline_decoder_logits(params, cfg, tokens, xa, mesh,
                                  n_micro=n_micro)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("remat", [False, True])
def test_decoder_pipeline_gradients_match(remat):
    """Reverse GPipe schedule through the decoder: grads wrt params AND
    the cross-attention memory match the single-device decoder."""
    from lyricalignment_tpu.models.whisper import decoder_logits
    from lyricalignment_tpu.parallel.pipeline import pipeline_decoder_logits

    cfg = WhisperConfig(
        n_mels=8, n_vocab=32, n_audio_ctx=16, n_audio_state=16,
        n_audio_head=2, n_audio_layer=1, n_text_ctx=8,
        n_text_state=16, n_text_head=2, n_text_layer=4)
    params = init_whisper_params(jax.random.PRNGKey(5), cfg)
    rng = np.random.default_rng(10)
    tokens = jnp.asarray(rng.integers(0, 32, (4, 6)).astype(np.int32))
    xa = jnp.asarray(rng.standard_normal((4, 16, 16)).astype(np.float32))
    mesh = make_mesh(data=2, model=4)

    def loss_ref(p, a):
        return jnp.mean(decoder_logits(p, cfg, tokens, a) ** 2)

    def loss_pipe(p, a):
        out = pipeline_decoder_logits(p, cfg, tokens, a, mesh, n_micro=2,
                                      remat=remat)
        return jnp.mean(out ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(params, xa)
    g_pipe = jax.grad(loss_pipe, argnums=(0, 1))(params, xa)
    flat_ref, _ = jax.tree_util.tree_flatten(g_ref)
    flat_pipe, _ = jax.tree_util.tree_flatten(g_pipe)
    assert len(flat_ref) == len(flat_pipe)
    for a, b in zip(flat_ref, flat_pipe):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-5)


def test_pipelined_train_step_matches_standard(setup):
    """make_train_step with BOTH halves staged (encode_fn + decode_fn
    pipelines) == the plain train step: identical losses and updated
    params (GPipe backward through encoder and decoder included)."""
    import dataclasses

    from lyricalignment_tpu.models.align_model import (
        AlignModelConfig, init_align_model)
    from lyricalignment_tpu.parallel.pipeline import (
        make_pipeline_encode_fn, make_pipeline_logits_fn)
    from lyricalignment_tpu.train.trainer import (
        TrainConfig, init_train_state, make_train_step)

    vocab = 12
    # full-frame config: the training path pads mel to 3000 frames, so the
    # encoder context must be the real 1500 (dims stay tiny otherwise);
    # 4 decoder layers so the decoder pipeline has one layer per stage
    wcfg = WhisperConfig(
        n_mels=80, n_vocab=32, n_audio_ctx=1500, n_audio_state=16,
        n_audio_head=2, n_audio_layer=4, n_text_ctx=8, n_text_state=16,
        n_text_head=2, n_text_layer=4)
    mcfg = AlignModelConfig(
        whisper=wcfg, hidden_dim=8, output_dim=vocab + 1,
        train_alignment=True, train_transcript=True, dropout=0.0)
    tcfg = TrainConfig(accum_grad_steps=2, use_ctc=True, vocab_size=vocab,
                       total_steps=4, warmup_steps=1)
    params = init_align_model(jax.random.PRNGKey(3), mcfg)
    mesh = make_mesh(data=2, model=4)

    rng = np.random.default_rng(11)
    accum, b = 2, 4  # per-data-shard batch 2 -> n_micro 2
    stacked = {
        "audio": jnp.asarray(rng.standard_normal((accum, b, 32000)).astype(np.float32) * 0.05),
        "ctc_labels": jnp.asarray(np.pad(
            rng.integers(1, vocab - 1, (accum, b, 3)).astype(np.int32),
            ((0, 0), (0, 0), (0, 3)), constant_values=-100)),
        "frame_labels": jnp.asarray(np.where(
            rng.random((accum, b, 1500)) < 0.3,
            rng.integers(1, vocab - 1, (accum, b, 1500)), -100).astype(np.int32)),
        "label_lengths": jnp.asarray(np.full((accum, b), 3, np.int32)),
        "has_alignment": jnp.asarray(np.ones((accum, b), bool)),
        "decoder_input": jnp.asarray(rng.integers(0, 32, (accum, b, 5)).astype(np.int32)),
        "decoder_output": jnp.asarray(rng.integers(0, 32, (accum, b, 5)).astype(np.int32)),
    }
    key = jax.random.PRNGKey(4)

    # the train step donates its state: give each run an independent copy
    params_a = jax.tree_util.tree_map(jnp.copy, params)
    params_b = jax.tree_util.tree_map(jnp.copy, params)
    state_a, tx_a = init_train_state(params_a, tcfg)
    step_a = make_train_step(mcfg, tcfg, tx_a)
    state_a, losses_a = step_a(state_a, stacked, key)

    state_b, tx_b = init_train_state(params_b, tcfg)
    step_b = make_train_step(mcfg, tcfg, tx_b,
                             encode_fn=make_pipeline_encode_fn(mesh, n_micro=2),
                             decode_fn=make_pipeline_logits_fn(mesh, n_micro=2))
    state_b, losses_b = step_b(state_b, stacked, key)

    for k in losses_a:
        np.testing.assert_allclose(float(losses_b[k]), float(losses_a[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)
    flat_a, _ = jax.tree_util.tree_flatten(state_a.params)
    flat_b, _ = jax.tree_util.tree_flatten(state_b.params)
    for a, b_ in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=2e-3, atol=2e-5)


@pytest.mark.parametrize("remat", [False, True])
def test_pipeline_gradients_match(setup, remat):
    """GPipe backward: grads through the pipeline == single-device grads."""
    cfg, params, mel = setup
    mesh = make_mesh(data=2, model=4)

    def loss_ref(p):
        return jnp.sum(encode_audio(p, cfg, mel) ** 2)

    def loss_pipe(p):
        out = pipeline_encode_audio(p, cfg, mel, mesh, n_micro=2, remat=remat)
        return jnp.sum(out ** 2)

    g_ref = jax.grad(loss_ref)(params)
    g_pipe = jax.grad(loss_pipe)(params)
    flat_ref, _ = jax.tree_util.tree_flatten(g_ref)
    flat_pipe, _ = jax.tree_util.tree_flatten(g_pipe)
    assert len(flat_ref) == len(flat_pipe)
    for a, b in zip(flat_ref, flat_pipe):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-5)
