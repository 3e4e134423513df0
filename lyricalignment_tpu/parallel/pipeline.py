"""GPipe-style pipeline parallelism for the Whisper encoder AND decoder.

The reference is single-device (SURVEY.md §2: no distributed code at all);
this module is part of the TPU-native scale-out layer owed by the rebuild,
alongside the DP/TP/SP shardings in ``parallel.mesh``. Layer stages are
sharded over a mesh axis and microbatch activations move stage-to-stage
with ``jax.lax.ppermute`` over ICI inside one ``shard_map`` — the schedule
is the classic GPipe fill/steady/drain loop written as a ``lax.scan`` over
ticks, so the whole pipeline is one compiled XLA program (no host-side
round-trips between stages).

Differentiable end-to-end: XLA transposes ``ppermute``/``psum`` for the
backward pass, so ``jax.grad`` through ``pipeline_encode_audio`` performs
the reverse pipeline schedule automatically (GPipe semantics — full
activations live between forward and backward; wrap the stage in
``jax.checkpoint`` via ``remat=True`` to trade FLOPs for memory).

Layout: encoder block params are stacked layer-major (leaves ``[L, ...]``),
reshaped to ``[n_stages, L/n_stages, ...]`` and sharded on the leading dim
over the pipe axis — each device holds only its own stage's layers, which
is the point of PP (whisper-large encoder no longer needs to fit one chip).
The conv stem and final LayerNorm are negligible compute and run replicated
outside the loop.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lyricalignment_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

try:  # jax >= 0.8
    from jax import shard_map as _shard_map
    _SHARD_MAP_NO_CHECK = {"check_vma": False}
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map
    _SHARD_MAP_NO_CHECK = {"check_rep": False}


def stack_encoder_blocks(blocks: list, n_stages: int,
                         kind: str = "encoder") -> Dict[str, Any]:
    """Stack the per-layer block dicts into one pytree with leaves
    ``[n_stages, L/n_stages, ...]`` (layer-major), ready to shard the
    leading dim over the pipe axis."""
    n_layers = len(blocks)
    if n_layers % n_stages:
        raise ValueError(
            f"{n_layers} {kind} layers not divisible by {n_stages} stages")
    per = n_layers // n_stages
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)
    return jax.tree_util.tree_map(
        lambda a: a.reshape((n_stages, per) + a.shape[1:]), stacked)


def place_pipeline_params(stacked: Dict, mesh: Mesh,
                          pipe_axis: str = MODEL_AXIS) -> Dict:
    """Shard stacked block params stage-major over the pipe axis: each
    device keeps only its stage's layers."""
    sharding = NamedSharding(mesh, P(pipe_axis))
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, sharding), stacked)


def _stage_and_tick_loop(stacked_local, x_micro, stage_fn, n_stages,
                         pipe_axis):
    """Generic GPipe fill/steady/drain loop inside shard_map on ONE pipe
    member.

    stacked_local: block leaves [1, L/S, ...] (this stage's layers);
    x_micro [n_micro, mb, T, D] (already data-sharded);
    stage_fn(local_blocks, x, micro_idx) runs this stage's layers on one
    microbatch activation (micro_idx lets the decoder look up the matching
    cross-attention memory). Returns [n_micro, mb, T, D] outputs,
    replicated over the pipe axis.
    """
    stage = jax.lax.axis_index(pipe_axis)
    local_blocks = jax.tree_util.tree_map(lambda a: a[0], stacked_local)
    n_micro = x_micro.shape[0]

    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def tick(carry, t):
        x_in, outputs = carry
        # microbatch t enters stage 0 at tick t; drain ticks (t >= n_micro)
        # re-inject the clamped LAST microbatch — their outputs map to
        # out_idx >= n_micro and are provably never written, so any value
        # works and the clamp avoids an out-of-bounds gather
        inject = x_micro[jnp.clip(t, 0, n_micro - 1)]
        x_cur = jnp.where(stage == 0, inject, x_in)
        # stage s works on microbatch t - s at tick t (clamped during
        # fill/drain, where the result is never written)
        y = stage_fn(local_blocks, x_cur,
                     jnp.clip(t - stage, 0, n_micro - 1))
        # the last stage finishes microbatch t-(S-1) at tick t
        out_idx = t - (n_stages - 1)
        write = (stage == n_stages - 1) & (out_idx >= 0)
        idx = jnp.clip(out_idx, 0, n_micro - 1)
        slot = jax.lax.dynamic_index_in_dim(outputs, idx, keepdims=False)
        outputs = jax.lax.dynamic_update_index_in_dim(
            outputs, jnp.where(write, y, slot), idx, 0)
        x_next = jax.lax.ppermute(y, pipe_axis, perm)
        return (x_next, outputs), None

    x0 = jnp.zeros(x_micro.shape[1:], x_micro.dtype)
    (_, outputs), _ = jax.lax.scan(
        tick, (x0, jnp.zeros_like(x_micro)), jnp.arange(n_micro + n_stages - 1))
    # broadcast the drain-stage results to every pipe member
    return jax.lax.psum(
        jnp.where(stage == n_stages - 1, outputs, jnp.zeros_like(outputs)),
        pipe_axis)


def pipeline_blocks(
    stacked: Dict,
    x: jnp.ndarray,              # [B, T, D] transformer input (post-stem)
    cfg,                         # WhisperConfig (n_audio_head/fast_* used)
    mesh: Mesh,
    n_micro: int = 2,
    data_axis: Optional[str] = DATA_AXIS,
    pipe_axis: str = MODEL_AXIS,
    remat: bool = False,
) -> jnp.ndarray:
    """Run the stacked encoder blocks as an ``n_stages``-deep pipeline
    (``n_stages = mesh.shape[pipe_axis]``) with ``n_micro`` microbatches
    per data shard. The batch dim stays sharded over ``data_axis`` (DP x PP
    composes); pass ``data_axis=None`` for a pure pipeline mesh."""
    n_stages = mesh.shape[pipe_axis]
    data_spec = P(data_axis) if data_axis else P()
    b_local = x.shape[0] // (mesh.shape[data_axis] if data_axis else 1)
    if b_local % n_micro:
        raise ValueError(
            f"per-shard batch {b_local} not divisible by n_micro={n_micro}")

    from lyricalignment_tpu.models.whisper import _encoder_block

    block_fn = _encoder_block
    if remat:
        block_fn = jax.checkpoint(_encoder_block, static_argnums=(2, 3, 4, 5))

    def fn(stacked_local, x_local):
        xm = x_local.reshape((n_micro, -1) + x_local.shape[1:])

        def stage_fn(local_blocks, xs, _micro_idx):
            def layer(c, blk):
                return block_fn(blk, c, cfg.n_audio_head, cfg.fast_softmax,
                                cfg.fast_gelu, cfg.int8_encoder), None
            y, _ = jax.lax.scan(layer, xs, local_blocks)
            return y

        out = _stage_and_tick_loop(stacked_local, xm, stage_fn, n_stages,
                                   pipe_axis)
        return out.reshape(x_local.shape)

    param_specs = jax.tree_util.tree_map(lambda _: P(pipe_axis), stacked)
    shard_fn = _shard_map(
        fn, mesh=mesh,
        in_specs=(param_specs, P(*data_spec, None, None)),
        out_specs=P(*data_spec, None, None),
        **_SHARD_MAP_NO_CHECK,
    )
    return shard_fn(stacked, x)


def stack_decoder_blocks(blocks: list, n_stages: int) -> Dict[str, Any]:
    """Stack the per-layer DECODER block dicts (self-attn + cross-attn +
    MLP leaves) into one pytree with leaves ``[n_stages, L/n_stages, ...]``
    — the stacking is structure-generic, so this shares the encoder
    implementation."""
    return stack_encoder_blocks(blocks, n_stages, kind="decoder")


def pipeline_decoder_blocks(
    stacked: Dict,
    x: jnp.ndarray,              # [B, S, D] token activations (post-embed)
    xa: jnp.ndarray,             # [B, Ta, D] encoder output (cross-attn memory)
    cfg,                         # WhisperConfig (n_text_head used)
    mesh: Mesh,
    n_micro: int = 2,
    data_axis: Optional[str] = DATA_AXIS,
    pipe_axis: str = MODEL_AXIS,
    remat: bool = False,
) -> jnp.ndarray:
    """Run the stacked DECODER blocks as a GPipe pipeline (teacher-forced
    full-sequence pass — the training path; KV-cached incremental decode
    stays single-stage, where PP ticks would serialize behind the tiny
    per-token compute).

    The cross-attention memory ``xa`` stays resident on every pipe member
    (it is data-sharded over ``data_axis`` like ``x``); at tick ``t`` stage
    ``s`` attends to the memory of the microbatch it is processing,
    ``xa_micro[t - s]`` — no extra ppermute traffic for xa.
    """
    from lyricalignment_tpu.models.whisper import _causal_mask, _decoder_block

    n_stages = mesh.shape[pipe_axis]
    data_spec = P(data_axis) if data_axis else P()
    b_local = x.shape[0] // (mesh.shape[data_axis] if data_axis else 1)
    if b_local % n_micro:
        raise ValueError(
            f"per-shard batch {b_local} not divisible by n_micro={n_micro}")

    block_fn = _decoder_block
    if remat:
        block_fn = jax.checkpoint(_decoder_block, static_argnums=(3, 5))
    mask = _causal_mask(x.shape[1], x.dtype)

    def fn(stacked_local, x_local, xa_local):
        xm = x_local.reshape((n_micro, -1) + x_local.shape[1:])
        xam = xa_local.reshape((n_micro, -1) + xa_local.shape[1:])

        def stage_fn(local_blocks, xs, micro_idx):
            xa_cur = xam[micro_idx]

            def layer(c, blk):
                return block_fn(blk, c, xa_cur, cfg.n_text_head, mask,
                                cfg.fast_gelu), None
            y, _ = jax.lax.scan(layer, xs, local_blocks)
            return y

        out = _stage_and_tick_loop(stacked_local, xm, stage_fn, n_stages,
                                   pipe_axis)
        return out.reshape(x_local.shape)

    param_specs = jax.tree_util.tree_map(lambda _: P(pipe_axis), stacked)
    shard_fn = _shard_map(
        fn, mesh=mesh,
        in_specs=(param_specs, P(*data_spec, None, None),
                  P(*data_spec, None, None)),
        out_specs=P(*data_spec, None, None),
        **_SHARD_MAP_NO_CHECK,
    )
    return shard_fn(stacked, x, xa)


def pipeline_decoder_logits(
    params: Dict,
    cfg,
    tokens: jnp.ndarray,         # i32[B, S]
    audio_features: jnp.ndarray,  # [B, Ta, D]
    mesh: Mesh,
    n_micro: int = 2,
    data_axis: Optional[str] = DATA_AXIS,
    pipe_axis: str = MODEL_AXIS,
    remat: bool = False,
    stacked: Optional[Dict] = None,
) -> jnp.ndarray:
    """``models.whisper.decoder_logits`` with the transformer blocks
    pipelined over ``pipe_axis``. Numerically identical to the
    single-device teacher-forced decoder (reference
    ``whisper_model.logits``, `module/align_model.py:120-121`). The
    embedding stem and the f32 unembedding run replicated — negligible
    compute next to the blocks."""
    from lyricalignment_tpu.models.whisper import _layer_norm

    dec = params["decoder"]
    if stacked is None:
        stacked = stack_decoder_blocks(dec["blocks"], mesh.shape[pipe_axis])
    dtype = cfg.compute_dtype
    xa = audio_features.astype(dtype)
    s = tokens.shape[1]
    x = (dec["token_embedding"].astype(dtype)[tokens]
         + dec["positional_embedding"].astype(dtype)[None, :s])
    x = pipeline_decoder_blocks(stacked, x, xa, cfg, mesh, n_micro=n_micro,
                                data_axis=data_axis, pipe_axis=pipe_axis,
                                remat=remat)
    x = _layer_norm(dec["ln"], x)
    # final projection in f32 for stable CE loss (matches decoder_logits)
    return (x.astype(jnp.float32)
            @ dec["token_embedding"].T.astype(jnp.float32))


def make_pipeline_logits_fn(
    mesh: Mesh,
    n_micro: int = 2,
    data_axis: Optional[str] = DATA_AXIS,
    pipe_axis: str = MODEL_AXIS,
):
    """Decoder replacement for ``forward_from_audio(decode_fn=...)`` /
    ``make_train_step(decode_fn=...)``: runs the teacher-forced whisper
    decoder as a GPipe pipeline. The returned callable has the
    ``decoder_logits`` calling convention
    ``(whisper_params, whisper_cfg, tokens, audio_features, remat=...)`` —
    pair with ``make_pipeline_encode_fn`` to stage the FULL model."""

    def decode_fn(wparams, wcfg, tokens, audio_features, remat=False):
        return pipeline_decoder_logits(
            wparams, wcfg, tokens, audio_features, mesh,
            n_micro=n_micro, data_axis=data_axis, pipe_axis=pipe_axis,
            remat=remat)

    return decode_fn


def make_pipeline_encode_fn(
    mesh: Mesh,
    n_micro: int = 2,
    data_axis: Optional[str] = DATA_AXIS,
    pipe_axis: str = MODEL_AXIS,
):
    """Encoder replacement for ``forward_from_audio(encode_fn=...)`` /
    ``make_train_step(encode_fn=...)``: runs the whisper encoder as an
    ``mesh.shape[pipe_axis]``-stage GPipe pipeline. The returned callable
    has the ``encode_audio`` calling convention
    ``(whisper_params, whisper_cfg, mel, remat=...)``."""

    def encode_fn(wparams, wcfg, mel, remat=False):
        return pipeline_encode_audio(
            {"encoder": wparams["encoder"]}, wcfg, mel, mesh,
            n_micro=n_micro, data_axis=data_axis, pipe_axis=pipe_axis,
            remat=remat)

    return encode_fn


def pipeline_encode_audio(
    params: Dict,
    cfg,
    mel: jnp.ndarray,
    mesh: Mesh,
    n_micro: int = 2,
    data_axis: Optional[str] = DATA_AXIS,
    pipe_axis: str = MODEL_AXIS,
    remat: bool = False,
    stacked: Optional[Dict] = None,
) -> jnp.ndarray:
    """``encode_audio`` with the transformer blocks pipelined over
    ``pipe_axis``. Numerically identical to the single-device encoder.

    Pass pre-stacked, pre-placed block params via ``stacked=`` (from
    ``stack_encoder_blocks`` + ``place_pipeline_params``) to avoid
    restacking on every call; otherwise they are derived from ``params``.
    """
    from lyricalignment_tpu.models.whisper import _encoder_stem, _layer_norm

    enc = params["encoder"]
    if stacked is None:
        stacked = stack_encoder_blocks(enc["blocks"], mesh.shape[pipe_axis])
    x = _encoder_stem(enc, cfg, mel)
    x = pipeline_blocks(stacked, x, cfg, mesh, n_micro=n_micro,
                        data_axis=data_axis, pipe_axis=pipe_axis, remat=remat)
    return _layer_norm(enc["ln_post"], x)
