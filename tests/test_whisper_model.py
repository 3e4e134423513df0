"""JAX Whisper vs independent torch oracle + KV-cache consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lyricalignment_tpu.models.whisper import (
    WhisperConfig,
    decode_step,
    decoder_logits,
    encode_audio,
    init_decode_cache,
    init_whisper_params,
)

from tests import torch_whisper_oracle as oracle


@pytest.fixture(scope="module")
def tiny_cfg():
    # scaled-down config: full 30 s context is wasteful for unit tests
    return WhisperConfig(
        n_mels=80, n_vocab=128, n_audio_ctx=50, n_audio_state=64,
        n_audio_head=4, n_audio_layer=2, n_text_ctx=24, n_text_state=64,
        n_text_head=4, n_text_layer=2,
    )


@pytest.fixture(scope="module")
def params(tiny_cfg):
    return init_whisper_params(jax.random.PRNGKey(0), tiny_cfg)


def np_tree(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


def test_encoder_matches_torch_oracle(tiny_cfg, params, rng):
    mel = rng.standard_normal((2, 80, 100)).astype(np.float32)
    got = np.asarray(encode_audio(params, tiny_cfg, jnp.asarray(mel)))
    expected = oracle.encode_audio(np_tree(params), tiny_cfg, mel).detach().numpy()
    assert got.shape == (2, 50, 64)
    np.testing.assert_allclose(got, expected, atol=2e-5, rtol=1e-5)


def test_decoder_matches_torch_oracle(tiny_cfg, params, rng):
    mel = rng.standard_normal((2, 80, 100)).astype(np.float32)
    tokens = rng.integers(0, 128, size=(2, 7)).astype(np.int32)
    xa = encode_audio(params, tiny_cfg, jnp.asarray(mel))
    got = np.asarray(decoder_logits(params, tiny_cfg, jnp.asarray(tokens), xa))
    xa_t = oracle.encode_audio(np_tree(params), tiny_cfg, mel)
    expected = oracle.decoder_logits(np_tree(params), tiny_cfg, tokens, xa_t).detach().numpy()
    assert got.shape == (2, 7, 128)
    np.testing.assert_allclose(got, expected, atol=5e-5, rtol=1e-4)


def test_causal_mask_blocks_future(tiny_cfg, params, rng):
    # changing a future token must not change earlier logits
    mel = rng.standard_normal((1, 80, 100)).astype(np.float32)
    xa = encode_audio(params, tiny_cfg, jnp.asarray(mel))
    tokens = rng.integers(0, 128, size=(1, 6)).astype(np.int32)
    base = np.asarray(decoder_logits(params, tiny_cfg, jnp.asarray(tokens), xa))
    tokens2 = tokens.copy()
    tokens2[0, -1] = (tokens2[0, -1] + 1) % 128
    alt = np.asarray(decoder_logits(params, tiny_cfg, jnp.asarray(tokens2), xa))
    np.testing.assert_allclose(base[:, :-1], alt[:, :-1], atol=1e-6)
    assert np.abs(base[:, -1] - alt[:, -1]).max() > 1e-4


def test_kv_cached_decode_matches_teacher_forced(tiny_cfg, params, rng):
    mel = rng.standard_normal((2, 80, 100)).astype(np.float32)
    tokens = rng.integers(0, 128, size=(2, 5)).astype(np.int32)
    xa = encode_audio(params, tiny_cfg, jnp.asarray(mel))

    full = np.asarray(decoder_logits(params, tiny_cfg, jnp.asarray(tokens), xa))

    # prompt_len=0: every token lands in the gen section of the split cache
    cache = init_decode_cache(params, tiny_cfg, xa, 0, 8)
    step_logits = []
    for i in range(tokens.shape[1]):
        logit, cache = decode_step(params, tiny_cfg, jnp.asarray(tokens[:, i: i + 1]), cache)
        step_logits.append(np.asarray(logit))
    incremental = np.stack(step_logits, axis=1)
    np.testing.assert_allclose(incremental, full, atol=1e-4, rtol=1e-4)


def test_bf16_compute_close_to_f32(tiny_cfg, params, rng):
    mel = rng.standard_normal((1, 80, 100)).astype(np.float32)
    f32 = np.asarray(encode_audio(params, tiny_cfg, jnp.asarray(mel)))
    bf_cfg = WhisperConfig(**{**tiny_cfg.__dict__, "compute_dtype": jnp.bfloat16})
    bf16 = np.asarray(encode_audio(params, bf_cfg, jnp.asarray(mel))).astype(np.float32)
    # bf16 has ~3 decimal digits; activations are O(1)
    assert np.abs(f32 - bf16).mean() < 0.05


def test_fast_gelu_close_to_exact(rng):
    """fast_gelu (tanh approximation, applied model-wide: encoder stem/MLPs
    and every decoder MLP) stays within bf16-level tolerance of the exact-
    GELU model, and the three decoder paths (teacher-forced, prime, step)
    stay mutually consistent under the flag."""
    import dataclasses

    import jax.numpy as jnp

    from lyricalignment_tpu.models.whisper import (
        WhisperConfig,
        encode_audio,
        init_whisper_params,
        prime_decode_cache,
    )

    cfg = WhisperConfig(n_mels=80, n_vocab=32, n_audio_ctx=50, n_audio_state=32,
                        n_audio_head=4, n_audio_layer=2, n_text_ctx=16,
                        n_text_state=32, n_text_head=4, n_text_layer=1)
    cfg_f = dataclasses.replace(cfg, fast_gelu=True)
    params = init_whisper_params(jax.random.PRNGKey(0), cfg)
    mel = jnp.asarray(rng.standard_normal((2, 80, 100)).astype(np.float32))
    exact = np.asarray(encode_audio(params, cfg, mel))
    fast = np.asarray(encode_audio(params, cfg_f, mel))
    assert np.abs(exact - fast).max() < 2e-2
    assert np.sqrt(((exact - fast) ** 2).mean()) < 2e-3

    # decoder: the flag now reaches every MLP (teacher-forced AND the
    # KV-cached prime/step pair), so (a) fast logits track exact logits
    # at tanh-approximation error, and (b) the cached path reproduces the
    # teacher-forced path under the flag — no path may silently keep
    # exact GELU while the others switch.
    xa = encode_audio(params, cfg_f, mel)
    tokens = rng.integers(0, 32, size=(2, 5)).astype(np.int32)
    tf_exact = np.asarray(decoder_logits(params, cfg, jnp.asarray(tokens), xa))
    tf_fast = np.asarray(decoder_logits(params, cfg_f, jnp.asarray(tokens), xa))
    assert np.abs(tf_exact - tf_fast).max() < 5e-2
    assert 1e-8 < np.abs(tf_exact - tf_fast).max()  # flag actually bites

    cache = init_decode_cache(params, cfg_f, xa, 3, 4)
    logits, _, cache = prime_decode_cache(
        params, cfg_f, jnp.asarray(tokens[:, :3]), cache)
    np.testing.assert_allclose(np.asarray(logits), tf_fast[:, 2],
                               atol=1e-4, rtol=1e-4)
    for i in range(3, 5):
        l, cache = decode_step(
            params, cfg_f, jnp.asarray(tokens[:, i: i + 1]), cache)
        np.testing.assert_allclose(np.asarray(l), tf_fast[:, i],
                                   atol=1e-4, rtol=1e-4)


def test_onepass_encoder_matches_standard(tiny_cfg, params, rng):
    """Pad-once one-pass encoder (T=50 padded to 128, pad keys masked by
    additive bias) must match the standard path exactly in f32 — on CPU
    both reduce to einsum attention, so any mismatch is a masking bug."""
    import dataclasses

    mel = jnp.asarray(rng.standard_normal((2, 80, 100)).astype(np.float32))
    ref = np.asarray(encode_audio(params, tiny_cfg, mel))
    cfg1 = dataclasses.replace(tiny_cfg, onepass_encoder=True)
    got = np.asarray(encode_audio(params, cfg1, mel))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)
    # remat variant traces the checkpointed block with the extra bias arg
    got_r = np.asarray(encode_audio(params, cfg1, mel, remat=True))
    np.testing.assert_allclose(got_r, ref, atol=2e-5, rtol=1e-5)


def test_onepass_encoder_grad_matches(tiny_cfg, params, rng):
    """The custom-VJP (einsum-recompute) backward must agree with the
    standard path's gradients — training through onepass is correct."""
    import dataclasses

    mel = jnp.asarray(rng.standard_normal((1, 80, 100)).astype(np.float32))
    cfg1 = dataclasses.replace(tiny_cfg, onepass_encoder=True)

    def loss(p, cfg):
        return (encode_audio(p, cfg, mel) ** 2).sum()

    g_ref = jax.grad(lambda p: loss(p, tiny_cfg))(params)
    g_got = jax.grad(lambda p: loss(p, cfg1))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-3, rtol=1e-4)


def test_onepass_kernel_masks_pad_keys(rng):
    """onepass_self_attention with a -1e9 bias on pad keys must equal
    attention computed on the unpadded sequence alone."""
    from lyricalignment_tpu.ops.attention import onepass_self_attention

    B, T_real, T_pad, H, Dh = 2, 100, 128, 4, 16
    x = rng.standard_normal((B, T_real, H, Dh)).astype(np.float32)
    xp = np.zeros((B, T_pad, H, Dh), np.float32)
    xp[:, :T_real] = x
    bias = np.where(np.arange(T_pad) < T_real, 0.0, -1e9
                    ).astype(np.float32)[None]

    got = np.asarray(onepass_self_attention(
        jnp.asarray(xp), jnp.asarray(xp), jnp.asarray(xp),
        jnp.asarray(bias)))[:, :T_real]

    # reference: plain softmax attention on the REAL tokens only
    q = jnp.asarray(x)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, q)
    w = jax.nn.softmax(logits, axis=-1)
    want = np.asarray(jnp.einsum("bhqk,bkhd->bqhd", w, q))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_quantize_int8_roundtrip(rng):
    """Symmetric absmax quantization: q*scale reconstructs x within half a
    quantization step (amax/127/2) per element, exactly at the absmax."""
    from lyricalignment_tpu.models.whisper import _quantize_int8

    x = jnp.asarray(rng.standard_normal((16, 64)).astype(np.float32) * 3.0)
    q, scale = _quantize_int8(x, axis=-1)
    assert q.dtype == jnp.int8
    recon = np.asarray(q.astype(np.float32) * scale)
    amax = np.abs(np.asarray(x)).max(axis=-1, keepdims=True)
    step = amax / 127.0
    assert (np.abs(recon - np.asarray(x)) <= step / 2 + 1e-7).all()
    # the absmax element maps exactly to +/-127
    assert (np.abs(q).max(axis=-1) == 127).all()


def test_int8_encoder_close_to_f32(tiny_cfg, params, rng):
    """W8A8 dynamic int8 encoder (per-token activation x per-channel weight
    scales) stays within ~1% relative error of the f32 encoder — above bf16
    rounding, hence opt-in; see WhisperConfig.int8_encoder."""
    import dataclasses

    mel = jnp.asarray(rng.standard_normal((2, 80, 100)).astype(np.float32))
    f32 = np.asarray(encode_audio(params, tiny_cfg, mel), dtype=np.float64)
    q8 = np.asarray(encode_audio(
        params, dataclasses.replace(tiny_cfg, int8_encoder=True), mel),
        dtype=np.float64)
    rel_l2 = np.linalg.norm(q8 - f32) / np.linalg.norm(f32)
    cos = (q8 * f32).sum() / (np.linalg.norm(q8) * np.linalg.norm(f32))
    assert rel_l2 < 0.02, rel_l2
    assert cos > 0.999, cos
    # decoder is untouched by the flag: same tokens -> identical logits
    tokens = jnp.asarray(rng.integers(0, 128, size=(2, 5)).astype(np.int32))
    xa = encode_audio(params, tiny_cfg, mel)
    base = np.asarray(decoder_logits(params, tiny_cfg, tokens, xa))
    flag = np.asarray(decoder_logits(
        params, dataclasses.replace(tiny_cfg, int8_encoder=True), tokens, xa))
    np.testing.assert_array_equal(base, flag)


def test_int8_resident_params_match_dynamic_path(tiny_cfg, params, rng):
    """int8_resident_params pre-computes exactly the (q, scale) pair the
    dynamic path derives per call: encoder outputs must be identical, and
    the resident tree must hold int8 weights (no 'w' left in blocks)."""
    import dataclasses

    from lyricalignment_tpu.models.whisper import int8_resident_params

    cfg8 = dataclasses.replace(tiny_cfg, int8_encoder=True)
    mel = jnp.asarray(rng.standard_normal((2, 80, 100)).astype(np.float32))
    dyn = np.asarray(encode_audio(params, cfg8, mel))
    resident = int8_resident_params(params)
    res = np.asarray(encode_audio(resident, cfg8, mel))
    np.testing.assert_array_equal(dyn, res)
    # weight residency really happened
    blk = resident["encoder"]["blocks"][0]
    assert "w" not in blk["attn"]["q"] and blk["attn"]["q"]["wq"].dtype == jnp.int8
    assert "w" not in blk["mlp_fc1"] and blk["mlp_fc1"]["wq"].dtype == jnp.int8
    # stem / decoder untouched
    assert "w" in resident["decoder"]["blocks"][0]["attn"]["q"]


def test_int8_resident_params_shard_over_tp_mesh(tiny_cfg, params):
    """TP placement must adapt its spec tree to the int8-resident structure
    (wq inherits w's spec; ws shards only the output dim)."""
    from lyricalignment_tpu.models.whisper import int8_resident_params
    from lyricalignment_tpu.parallel.mesh import make_mesh, shard_align_params

    full = {"whisper": int8_resident_params(params), "align_head": {}}
    mesh = make_mesh(data=4, model=2)
    placed = shard_align_params(full, mesh, tp=True)
    blk = placed["whisper"]["encoder"]["blocks"][0]
    assert blk["attn"]["q"]["wq"].dtype == jnp.int8
    # column-parallel projection: both wq and its scales shard the out dim
    q_shard = blk["attn"]["q"]["wq"].sharding.spec
    assert tuple(q_shard) == (None, "model")
    assert tuple(blk["attn"]["q"]["ws"].sharding.spec) == (None, "model")


def test_per_sample_lengths_match_single_runs(tiny_cfg, params, rng):
    """Per-sample prompt lengths (i32[B] ``length`` in the split cache —
    batched long-form decoding, where each lockstep row carries its own
    conditioned-prompt length) must reproduce each sample's standalone
    prime + 4 decode steps row for row."""
    from lyricalignment_tpu.models.whisper import prime_decode_cache

    mel = rng.standard_normal((2, 80, 100)).astype(np.float32)
    xa = encode_audio(params, tiny_cfg, jnp.asarray(mel))
    P, lens, auxs = 8, (3, 6), (1, 2)
    prompts = rng.integers(0, 128, size=(2, P)).astype(np.int32)
    steps = rng.integers(0, 128, size=(4, 2, 1)).astype(np.int32)

    cache = init_decode_cache(params, tiny_cfg, xa, P, 6)
    logits, aux, cache = prime_decode_cache(
        params, tiny_cfg, jnp.asarray(prompts), cache,
        length=jnp.asarray(lens, jnp.int32),
        aux_index=jnp.asarray(auxs, jnp.int32))
    assert cache["length"].shape == (2,)
    step_logits = []
    for t in steps:
        l, cache = decode_step(params, tiny_cfg, jnp.asarray(t), cache)
        step_logits.append(np.asarray(l))
    assert int(cache["step"]) == len(steps)
    assert np.array_equal(np.asarray(cache["length"]), np.asarray(lens))

    for r, (L, A) in enumerate(zip(lens, auxs)):
        cr = init_decode_cache(params, tiny_cfg, xa[r: r + 1], P, 6)
        lr, ar, cr = prime_decode_cache(
            params, tiny_cfg, jnp.asarray(prompts[r: r + 1]), cr,
            length=jnp.asarray(L, jnp.int32), aux_index=jnp.asarray(A, jnp.int32))
        np.testing.assert_allclose(np.asarray(logits)[r], np.asarray(lr)[0],
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(aux)[r], np.asarray(ar)[0],
                                   atol=1e-4, rtol=1e-4)
        for t, batched_l in zip(steps, step_logits):
            lstep, cr = decode_step(params, tiny_cfg, jnp.asarray(t[r: r + 1]), cr)
            np.testing.assert_allclose(batched_l[r], np.asarray(lstep)[0],
                                       atol=1e-4, rtol=1e-4)


def test_int8_cross_kv_close_to_f32(tiny_cfg, params, rng):
    """int8-quantized cross-attention K/V in the decode cache (per-key K
    scales over Dh, per-channel V scales over T, dynamically quantized
    query/attention-weight sides) stays within ~2% relative error of the
    f32 decode path through prime + beam-grouped steps — above bf16
    rounding, hence opt-in; see WhisperConfig.int8_cross_kv."""
    import dataclasses

    from lyricalignment_tpu.models.whisper import prime_decode_cache

    mel = jnp.asarray(rng.standard_normal((2, 80, 100)).astype(np.float32))
    xa = encode_audio(params, tiny_cfg, mel)
    P, g = 5, 3
    prompts = jnp.asarray(rng.integers(0, 128, size=(2, P)).astype(np.int32))
    steps = rng.integers(0, 128, size=(4, 2 * g, 1)).astype(np.int32)

    cfg_q = dataclasses.replace(tiny_cfg, int8_cross_kv=True)
    outs = {}
    for name, cfg in (("f32", tiny_cfg), ("int8", cfg_q)):
        cache = init_decode_cache(params, cfg, xa, P, 6, beam_size=g)
        logits, _, cache = prime_decode_cache(params, cfg, prompts, cache)
        seq = [np.asarray(logits, dtype=np.float64)]
        for t in steps:
            l, cache = decode_step(params, cfg, jnp.asarray(t), cache)
            seq.append(np.asarray(l, dtype=np.float64))
        outs[name] = seq
    assert outs["int8"][0].shape == outs["f32"][0].shape
    for a, b in zip(outs["int8"], outs["f32"]):
        rel_l2 = np.linalg.norm(a - b) / np.linalg.norm(b)
        assert rel_l2 < 0.02, rel_l2
        # rank structure survives quantization: same top-1 token per row
        np.testing.assert_array_equal(a.argmax(-1), b.argmax(-1))
