"""Pipeline parallelism (GPipe over a mesh axis) vs the single-device encoder.

Runs on the 8-virtual-CPU-device mesh from conftest. The pipelined encoder
must be numerically identical to ``encode_audio`` forward AND backward
(jax.grad through ppermute runs the reverse schedule).
"""

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
