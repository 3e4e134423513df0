"""Whisper encoder-decoder, pure-functional JAX.

TPU-first re-design of the backbone the reference consumes through the
``openai-whisper`` package (`train_multitask.py:647`,
`module/align_model.py:91,120`): parameters are plain pytrees, every apply
function is jit/pjit-compatible, attention and MLPs are einsum contractions
that tile onto the MXU, LayerNorm accumulates in f32, compute dtype is
selectable (bf16 on TPU, f32 for parity tests), and the decoder carries a
static-shape KV cache updated with ``lax.dynamic_update_slice`` so
autoregressive decoding stays on-device inside ``lax.scan``/``while_loop``.

Public surface mirrors what the reference uses:
  * ``encode_audio(params, cfg, mel)``          ≙ ``model.embed_audio(mel)``
  * ``decoder_logits(params, cfg, tokens, xa)`` ≙ ``model.logits(tokens, xa)``
  * KV-cached single-step decode for transcription (``decode/`` package).

Weight-layout conventions (converter in ``models/convert.py`` maps OpenAI
checkpoints into this layout):
  * linear weights are stored ``[in, out]`` (applied as ``x @ w + b``)
  * conv weights are stored torch-style ``[out, in, k]``
  * attention q/v/out have biases; k has none (whisper convention)
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclass(frozen=True)
class WhisperConfig:
    n_mels: int = 80
    n_vocab: int = 51865
    n_audio_ctx: int = 1500
    n_audio_state: int = 384
    n_audio_head: int = 6
    n_audio_layer: int = 4
    n_text_ctx: int = 448
    n_text_state: int = 384
    n_text_head: int = 6
    n_text_layer: int = 4
    compute_dtype: Any = jnp.float32
    # softmax in compute dtype instead of f32: ~15% faster encoder on v5e
    # (attention matrices dominate HBM traffic); off by default for parity
    fast_softmax: bool = False
    # tanh-approximate GELU instead of whisper's exact erf GELU, applied
    # across the model: encoder conv stem + every MLP (encoder,
    # teacher-forced decoder, KV-cached prime/step). Saves ~0.7 ms per
    # encoder MLP activation on v5e (~15% of the encoder); the
    # approximation error (<= 3e-3 absolute) is below bf16 rounding, but
    # off by default for strict f32 parity with the reference.
    fast_gelu: bool = False
    # W8A8 dynamic int8 quantization of the ENCODER matmuls (attention
    # q/k/v/out projections + both MLP layers): activations are quantized
    # per token (absmax over the feature axis), weights per output channel,
    # and the contraction runs int8xint8->int32 — the v5e MXU's int8 mode
    # has ~2x the bf16 peak, and the encoder is matmul-bound. INFERENCE
    # ONLY (round() has zero gradient); the conv stem, LayerNorms, softmax
    # and the whole decoder stay in compute_dtype. Opt-in because the
    # quantization error (~1% relative per matmul) is above bf16 rounding.
    int8_encoder: bool = False
    # Pad-once encoder: pad the residual stream to a lane-aligned T right
    # after the conv stem and run every block's self-attention through the
    # single-pass kernel (`ops/attention.py:onepass_self_attention`) with
    # an additive key bias masking the pad — instead of the per-layer
    # pad -> segment-ids -> unpad the flash kernel path pays. Numerically
    # identical to the flash path to bf16 rounding (f32 softmax; pad fully
    # masked). ~0.4 ms/layer faster at medium B=16 (same-run A/B,
    # PARITY.md). Differentiable (einsum-recompute VJP) but the flash
    # kernel's tuned backward is faster for training, hence opt-in;
    # ignored under `sequence_sharding` (the kernel needs the full T on
    # one device).
    onepass_encoder: bool = False
    # int8-quantized cross-attention K/V in the DECODE cache: K per-key
    # (absmax over Dh), V per-channel (absmax over T), with the matching
    # query/attention-weight side dynamically quantized so both decode-loop
    # cross contractions run int8xint8->int32. Cross K/V are the dominant
    # per-step HBM stream of autoregressive decoding (~147 MB/sample/step at
    # medium in bf16 — PARITY.md decode decomposition); int8 halves it.
    # INFERENCE ONLY and opt-in: ~0.5-1% relative attention-output error
    # (above bf16 rounding), and on a per-op-overhead-bound loop (small B)
    # it buys nothing — measure per deployment (PARITY.md).
    int8_cross_kv: bool = False

    @property
    def is_multilingual(self) -> bool:
        return self.n_vocab >= 51865


def _cfg(state: int, head: int, layer: int, **kw) -> WhisperConfig:
    return WhisperConfig(
        n_audio_state=state, n_audio_head=head, n_audio_layer=layer,
        n_text_state=state, n_text_head=head, n_text_layer=layer, **kw,
    )


WHISPER_CONFIGS: Dict[str, WhisperConfig] = {
    "tiny": _cfg(384, 6, 4),
    "base": _cfg(512, 8, 6),
    "small": _cfg(768, 12, 12),
    "medium": _cfg(1024, 16, 24),
    "large": _cfg(1280, 20, 32),
    "large-v2": _cfg(1280, 20, 32),
    # v3 family (beyond the reference's WHISPER_DIM, which stops at large):
    # 128 mel bands and one extra language token (yue -> n_vocab 51866).
    # turbo keeps the large encoder over a 4-layer decoder.
    "large-v3": _cfg(1280, 20, 32, n_mels=128, n_vocab=51866),
    "large-v3-turbo": WhisperConfig(
        n_audio_state=1280, n_audio_head=20, n_audio_layer=32,
        n_text_state=1280, n_text_head=20, n_text_layer=4,
        n_mels=128, n_vocab=51866),
}

# embed dim per model name — parity with the reference's WHISPER_DIM
# (`train_multitask.py:145-149`)
WHISPER_DIM = {name: cfg.n_audio_state for name, cfg in WHISPER_CONFIGS.items()}


# ---------------------------------------------------------------------------
# Initialisation
# ---------------------------------------------------------------------------

def _linear_init(key, n_in, n_out, bias=True):
    w_key, _ = jax.random.split(key)
    scale = 1.0 / np.sqrt(n_in)
    p = {"w": jax.random.uniform(w_key, (n_in, n_out), jnp.float32, -scale, scale)}
    if bias:
        p["b"] = jnp.zeros((n_out,), jnp.float32)
    return p


def _ln_init(dim):
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


def _attn_init(key, dim):
    kq, kk, kv, ko = jax.random.split(key, 4)
    return {
        "q": _linear_init(kq, dim, dim),
        "k": _linear_init(kk, dim, dim, bias=False),
        "v": _linear_init(kv, dim, dim),
        "out": _linear_init(ko, dim, dim),
    }


def _block_init(key, dim, cross: bool):
    keys = jax.random.split(key, 3)
    block = {
        "attn_ln": _ln_init(dim),
        "attn": _attn_init(keys[0], dim),
        "mlp_ln": _ln_init(dim),
        "mlp_fc1": _linear_init(keys[1], dim, dim * 4),
        "mlp_fc2": _linear_init(keys[2], dim * 4, dim),
    }
    if cross:
        key_c = jax.random.fold_in(key, 7)
        block["cross_attn_ln"] = _ln_init(dim)
        block["cross_attn"] = _attn_init(key_c, dim)
    return block


@functools.lru_cache(maxsize=None)
def sinusoid_position_embedding(length: int, channels: int) -> np.ndarray:
    """Whisper's fixed encoder positional embedding (log-spaced sinusoids)."""
    log_timescale_increment = np.log(10000) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_timescale_increment * np.arange(channels // 2))
    scaled_time = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled_time), np.cos(scaled_time)], axis=1).astype(np.float32)


def init_whisper_params(key: jax.Array, cfg: WhisperConfig) -> Params:
    k_enc, k_dec, k_conv1, k_conv2, k_tok = jax.random.split(key, 5)
    d_a, d_t = cfg.n_audio_state, cfg.n_text_state

    enc_blocks = [
        _block_init(jax.random.fold_in(k_enc, i), d_a, cross=False)
        for i in range(cfg.n_audio_layer)
    ]
    dec_blocks = [
        _block_init(jax.random.fold_in(k_dec, i), d_t, cross=True)
        for i in range(cfg.n_text_layer)
    ]

    conv_scale1 = 1.0 / np.sqrt(cfg.n_mels * 3)
    conv_scale2 = 1.0 / np.sqrt(d_a * 3)
    return {
        "encoder": {
            "conv1": {
                "w": jax.random.uniform(k_conv1, (d_a, cfg.n_mels, 3), jnp.float32,
                                        -conv_scale1, conv_scale1),
                "b": jnp.zeros((d_a,), jnp.float32),
            },
            "conv2": {
                "w": jax.random.uniform(k_conv2, (d_a, d_a, 3), jnp.float32,
                                        -conv_scale2, conv_scale2),
                "b": jnp.zeros((d_a,), jnp.float32),
            },
            "blocks": enc_blocks,
            "ln_post": _ln_init(d_a),
        },
        "decoder": {
            "token_embedding": jax.random.normal(k_tok, (cfg.n_vocab, d_t), jnp.float32) * 0.02,
            "positional_embedding": jnp.zeros((cfg.n_text_ctx, d_t), jnp.float32),
            "blocks": dec_blocks,
            "ln": _ln_init(d_t),
        },
    }


def bf16_resident_params(whisper_params: Params) -> Params:
    """Store whisper weights bf16-resident for inference.

    The bf16 compute path casts every matmul weight to bf16 per-op anyway,
    so storing those weights bf16 is numerics-identical and halves the
    weight-stream bytes of each forward/decode step (PARITY.md). The
    decoder's ``token_embedding`` is the one exception and stays f32: the
    unembedding logit matmuls (``decoder_logits``/``prime_decode_cache``/
    ``decode_step``) deliberately run in f32 so whisper's avg_logprob /
    no-speech quality gates see full-precision scores, and a bf16-rounded
    weight there would shift them. ``positional_embedding`` is kept f32 for
    the same embeddings-stay-f32 rule (it is tiny; under bf16 compute the
    per-op cast makes residency numerically irrelevant for it).
    """
    keep_f32 = ("token_embedding", "positional_embedding")

    def cast(path, x):
        if getattr(x, "dtype", None) != jnp.float32 or x.ndim < 2:
            return x
        for entry in path:
            if getattr(entry, "key", None) in keep_f32:
                return x
        return x.astype(jnp.bfloat16)

    return jax.tree_util.tree_map_with_path(cast, whisper_params)


def int8_resident_params(whisper_params: Params) -> Params:
    """Pre-quantize ENCODER block matmul weights to int8 residency.

    Every linear dict (a ``"w"`` matrix + optional ``"b"``) inside
    ``encoder.blocks`` is replaced by ``{"wq": int8, "ws": f32, "b"}`` —
    the exact (q, scale) pair ``_linear_int8`` would derive per call, so
    numerics are identical to the dynamic path while each forward streams
    int8 bytes instead of re-reading and re-rounding the full-precision
    weights (ADVICE r03: params are traced, XLA cannot fold the per-call
    quantization). Apply AFTER ``bf16_resident_params`` so the quantization
    grid matches the dynamic path's bf16-resident input. Only meaningful
    with ``WhisperConfig.int8_encoder=True`` — the stem, layer norms, and
    the decoder are untouched."""

    def quant_linears(node):
        if isinstance(node, dict):
            if "w" in node and getattr(node["w"], "ndim", 0) == 2:
                wq, ws = _quantize_int8(node["w"], axis=0)
                out = {"wq": wq, "ws": ws}
                if "b" in node:
                    out["b"] = node["b"]
                return out
            return {k: quant_linears(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(quant_linears(v) for v in node)
        return node

    out = dict(whisper_params)
    enc = dict(out["encoder"])
    enc["blocks"] = quant_linears(enc["blocks"])
    out["encoder"] = enc
    return out


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------

def _layer_norm(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    # f32 statistics regardless of compute dtype
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def _linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def _quantize_int8(x: jnp.ndarray, axis: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric absmax int8 quantization along ``axis``.

    Returns (q int8, scale f32 with ``axis`` kept as 1) such that
    ``q * scale ~= x``."""
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(x32 / scale), -127.0, 127.0).astype(jnp.int8)
    return q, scale


def _linear_int8(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """W8A8 dynamic-quantized linear: per-token activation scales x
    per-output-channel weight scales, int8xint8->int32 contraction on the
    MXU, f32 rescale + bias. Inference only (zero gradient through round).

    Pre-quantized weights (``int8_resident_params``: keys "wq"/"ws") are
    used directly — quantizing the static weight per call would re-stream
    the full-precision tensor every forward, defeating the residency
    (params are traced arguments, so XLA cannot constant-fold it)."""
    xq, xs = _quantize_int8(x, axis=-1)                 # [..., in], [..., 1]
    if "wq" in p:
        wq, ws = p["wq"], p["ws"]                       # int8-resident
    else:
        wq, ws = _quantize_int8(p["w"], axis=0)         # [in, out], [1, out]
    y = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (xs * ws)
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def _split_heads(x: jnp.ndarray, n_head: int) -> jnp.ndarray:
    b, t, d = x.shape
    return x.reshape(b, t, n_head, d // n_head)


def _attention(
    p: Params,
    x: jnp.ndarray,
    xa: Optional[jnp.ndarray],
    n_head: int,
    mask: Optional[jnp.ndarray] = None,
    kv_override: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    fast_softmax: bool = False,
    int8: bool = False,
    key_bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Multi-head attention. ``xa`` switches to cross-attention; a
    ``kv_override`` (pre-projected K/V) bypasses the projections — used for
    cached decoding. ``int8`` runs the four projections W8A8-quantized
    (encoder inference path). ``key_bias`` [1, T] routes encoder
    self-attention through the single-pass pad-once kernel."""
    d = x.shape[-1]
    scale = (d // n_head) ** -0.25
    lin = _linear_int8 if int8 else _linear

    q = _split_heads(lin(p["q"], x), n_head) * scale
    if kv_override is not None:
        k, v = kv_override
    else:
        src = x if xa is None else xa
        k = _split_heads(lin(p["k"], src), n_head)
        v = _split_heads(lin(p["v"], src), n_head)

    if mask is None and xa is None and kv_override is None and key_bias is not None:
        # pad-once encoder path: single-pass kernel, pad keys masked by bias
        from lyricalignment_tpu.ops.attention import onepass_self_attention

        out = onepass_self_attention(q, k * scale, v, key_bias)
        return lin(p["out"], out.reshape(x.shape[0], x.shape[1], d))

    if mask is None and xa is None and kv_override is None:
        # encoder self-attention: flash kernel on TPU (einsum materialises
        # [B, H, T, T] in HBM — the dominant cost at T=1500)
        from lyricalignment_tpu.ops.attention import self_attention

        out = self_attention(q, k * scale, v, sm_scale=1.0)
        return lin(p["out"], out.reshape(x.shape[0], x.shape[1], d))

    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k * scale)
    if mask is not None:
        logits = logits + mask
    if fast_softmax:
        weights = jax.nn.softmax(logits, axis=-1)
    else:
        weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights, v)
    return _linear(p["out"], out.reshape(x.shape[0], x.shape[1], d))


def _mlp(block: Params, x: jnp.ndarray, fast_gelu: bool = False,
         int8: bool = False) -> jnp.ndarray:
    lin = _linear_int8 if int8 else _linear
    h = jax.nn.gelu(lin(block["mlp_fc1"], x), approximate=fast_gelu)
    return lin(block["mlp_fc2"], h)


def _encoder_block(block: Params, x: jnp.ndarray, n_head: int,
                   fast_softmax: bool = False,
                   fast_gelu: bool = False,
                   int8: bool = False,
                   key_bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    x = x + _attention(block["attn"], _layer_norm(block["attn_ln"], x), None,
                       n_head, fast_softmax=fast_softmax, int8=int8,
                       key_bias=key_bias)
    x = x + _mlp(block, _layer_norm(block["mlp_ln"], x), fast_gelu=fast_gelu,
                 int8=int8)
    return x


def _encoder_stem(enc: Params, cfg: WhisperConfig, mel: jnp.ndarray) -> jnp.ndarray:
    """Conv frontend + positional embedding: mel [B, n_mels, T_mel] ->
    [B, T_mel//2, D] transformer input."""
    dtype = cfg.compute_dtype
    x = mel.astype(dtype)

    dn = jax.lax.conv_dimension_numbers(x.shape, enc["conv1"]["w"].shape, ("NCH", "OIH", "NCH"))
    x = jax.lax.conv_general_dilated(
        x, enc["conv1"]["w"].astype(dtype), (1,), [(1, 1)], dimension_numbers=dn
    ) + enc["conv1"]["b"].astype(dtype)[None, :, None]
    x = jax.nn.gelu(x, approximate=cfg.fast_gelu)
    dn2 = jax.lax.conv_dimension_numbers(x.shape, enc["conv2"]["w"].shape, ("NCH", "OIH", "NCH"))
    x = jax.lax.conv_general_dilated(
        x, enc["conv2"]["w"].astype(dtype), (2,), [(1, 1)], dimension_numbers=dn2
    ) + enc["conv2"]["b"].astype(dtype)[None, :, None]
    x = jax.nn.gelu(x, approximate=cfg.fast_gelu)

    x = x.transpose(0, 2, 1)  # [B, T, D]
    pos = sinusoid_position_embedding(cfg.n_audio_ctx, cfg.n_audio_state)
    return x + jnp.asarray(pos, dtype=dtype)[None, : x.shape[1]]


def encode_audio(
    params: Params,
    cfg: WhisperConfig,
    mel: jnp.ndarray,
    remat: bool = False,
    sequence_sharding=None,
) -> jnp.ndarray:
    """mel f32[B, n_mels, 3000] -> audio features [B, 1500, D].

    Equivalent of the reference's ``whisper_model.embed_audio``
    (`module/align_model.py:91,112`).

    ``sequence_sharding``: optional ``NamedSharding`` (or PartitionSpec-
    compatible) pinned onto the [B, T, D] activations after every block —
    sequence/context parallelism via GSPMD: shard the 1500-frame axis over
    a mesh axis and XLA inserts the K/V all-gathers for attention.
    """
    enc = params["encoder"]
    x = _encoder_stem(enc, cfg, mel)

    # pad-once path: lane-align T after the stem and mask pad KEYS with an
    # additive bias, so no block pays per-layer pad/segment-ids/unpad (the
    # single-pass kernel consumes the bias; LN/MLP are position-wise so pad
    # rows never contaminate real ones). Disabled under sequence sharding
    # — the kernel wants the full T on one device.
    t_real = x.shape[1]
    key_bias = None
    if cfg.onepass_encoder and sequence_sharding is None:
        t_pad = -(-t_real // 128) * 128
        if t_pad != t_real:
            x = jnp.pad(x, ((0, 0), (0, t_pad - t_real), (0, 0)))
        key_bias = jnp.where(jnp.arange(t_pad)[None, :] < t_real,
                             0.0, -1e9).astype(jnp.float32)

    block_fn = _encoder_block
    if remat:
        block_fn = jax.checkpoint(_encoder_block, static_argnums=(2, 3, 4, 5))
    if sequence_sharding is not None:
        x = jax.lax.with_sharding_constraint(x, sequence_sharding)
    for block in enc["blocks"]:
        x = block_fn(block, x, cfg.n_audio_head, cfg.fast_softmax,
                     cfg.fast_gelu, cfg.int8_encoder, key_bias)
        if sequence_sharding is not None:
            x = jax.lax.with_sharding_constraint(x, sequence_sharding)

    if key_bias is not None and x.shape[1] != t_real:
        x = x[:, :t_real]
    return _layer_norm(enc["ln_post"], x)


def _causal_mask(n: int, dtype) -> jnp.ndarray:
    i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return jnp.where(j > i, jnp.finfo(jnp.float32).min, 0.0).astype(dtype)


def _decoder_block(
    block: Params,
    x: jnp.ndarray,
    xa: jnp.ndarray,
    n_head: int,
    mask: jnp.ndarray,
    fast_gelu: bool = False,
) -> jnp.ndarray:
    x = x + _attention(block["attn"], _layer_norm(block["attn_ln"], x), None, n_head, mask=mask)
    x = x + _attention(block["cross_attn"], _layer_norm(block["cross_attn_ln"], x), xa, n_head)
    x = x + _mlp(block, _layer_norm(block["mlp_ln"], x), fast_gelu=fast_gelu)
    return x


def decoder_logits(
    params: Params,
    cfg: WhisperConfig,
    tokens: jnp.ndarray,
    audio_features: jnp.ndarray,
    remat: bool = False,
) -> jnp.ndarray:
    """Teacher-forced decoder: tokens i32[B, S], audio_features [B, 1500, D]
    -> logits f32[B, S, n_vocab].

    Equivalent of ``whisper_model.logits(tokens, audio_features)``
    (`module/align_model.py:120-121`).
    """
    dec = params["decoder"]
    dtype = cfg.compute_dtype
    xa = audio_features.astype(dtype)

    s = tokens.shape[1]
    x = dec["token_embedding"].astype(dtype)[tokens] + dec["positional_embedding"].astype(dtype)[None, :s]
    mask = _causal_mask(s, dtype)

    block_fn = _decoder_block
    if remat:
        block_fn = jax.checkpoint(_decoder_block, static_argnums=(3, 5))
    for block in dec["blocks"]:
        x = block_fn(block, x, xa, cfg.n_text_head, mask, cfg.fast_gelu)

    x = _layer_norm(dec["ln"], x)
    # final projection in f32 for stable CE loss
    return (x.astype(jnp.float32) @ dec["token_embedding"].T.astype(jnp.float32))


# ---------------------------------------------------------------------------
# KV-cached incremental decoding
# ---------------------------------------------------------------------------

def init_decode_cache(
    params: Params, cfg: WhisperConfig, audio_features: jnp.ndarray,
    prompt_len: int, max_new_tokens: int, beam_size: int = 1,
) -> Params:
    """Precompute cross-attention K/V and allocate the split self-attn cache.

    The self-attention cache is SPLIT by provenance, mirroring how each
    section is written and reordered:

    - ``prompt_k/v`` f32[B, prompt_len, H, Dh] — written ONCE by
      ``prime_decode_cache`` and per-SAMPLE: every beam of a sample shares
      the same (possibly long, <|startofprev|>-conditioned) prompt, so
      storing it per beam row would multiply both the per-step HBM read
      stream and the per-step beam-reorder gather by the beam width. At
      whisper-medium with a full 227-token conditioned prompt and beam 5,
      the unified per-row layout streams ~1.1 GB/step of prompt K/V and
      gathers it again on every beam reorder — the split removes both.
    - ``gen_k/v`` [B*beam, max_new_tokens, H, Dh] — appended per decode
      step at the shared ``step`` index (all rows generate in lockstep;
      per-row prompt LENGTHS are carried in ``length`` and only shift the
      position embedding and validity mask, never the storage slot).

    Cross K/V stay at ``B`` rows for the same reason (see
    ``_grouped_cross_attention``).

    ``length`` (i32[B], per-sample valid prompt length) is zero until
    ``prime_decode_cache`` sets it; a prompt_len=0 cache decodes directly
    (everything lands in the gen section).
    """
    dtype = cfg.compute_dtype
    b = audio_features.shape[0]
    xa = audio_features.astype(dtype)
    d_h = cfg.n_text_state // cfg.n_text_head
    cache = {
        "blocks": [],
        "step": jnp.zeros((), jnp.int32),
        "length": jnp.zeros((b,), jnp.int32),
    }
    for block in params["decoder"]["blocks"]:
        ck = _split_heads(_linear(block["cross_attn"]["k"], xa), cfg.n_text_head)
        cv = _split_heads(_linear(block["cross_attn"]["v"], xa), cfg.n_text_head)
        if cfg.int8_cross_kv:
            # K per key vector (over Dh): its scale multiplies the whole
            # QK^T logit column; V per (head, channel) over T: its scale
            # factors out of the weights@V contraction entirely.
            ck, ck_s = _quantize_int8(ck, axis=-1)       # s: [B, T, H, 1]
            cv, cv_s = _quantize_int8(cv, axis=1)        # s: [B, 1, H, Dh]
            extra = {"cross_k_s": ck_s, "cross_v_s": cv_s}
        else:
            extra = {}
        cache["blocks"].append({
            **extra,
            "cross_k": ck,
            "cross_v": cv,
            "prompt_k": jnp.zeros((b, prompt_len, cfg.n_text_head, d_h), dtype),
            "prompt_v": jnp.zeros((b, prompt_len, cfg.n_text_head, d_h), dtype),
            "gen_k": jnp.zeros(
                (b * beam_size, max_new_tokens, cfg.n_text_head, d_h), dtype),
            "gen_v": jnp.zeros(
                (b * beam_size, max_new_tokens, cfg.n_text_head, d_h), dtype),
        })
    return cache


def _grouped_cross_attention(
    p: Params,
    x: jnp.ndarray,          # [B*g, S, D] decoder hidden (post-LN)
    ck: jnp.ndarray,         # [B, T, H, Dh] precomputed cross K (f/bf16 or int8)
    cv: jnp.ndarray,         # [B, T, H, Dh]
    n_head: int,
    ck_s: Optional[jnp.ndarray] = None,   # int8 path: f32[B, T, H, 1]
    cv_s: Optional[jnp.ndarray] = None,   # int8 path: f32[B, 1, H, Dh]
) -> jnp.ndarray:
    """Cross-attention where g query rows share each audio row (beams).

    With ``ck_s``/``cv_s`` set (``WhisperConfig.int8_cross_kv``), K/V arrive
    int8-quantized and both contractions run int8xint8->int32 on the MXU:
    the query is dynamically quantized per query vector (scales multiply the
    logits outside the contraction, alongside K's per-key scales), and the
    f32 softmax weights per (query, head) row (V's per-channel scales factor
    out of the weights@V sum). Halves the dominant decode-loop HBM stream."""
    bg, s, d = x.shape
    b = ck.shape[0]
    g = bg // b
    scale = (d // n_head) ** -0.25
    q = _split_heads(_linear(p["q"], x), n_head)               # [B*g, S, H, Dh]
    q = q.reshape(b, g, s, n_head, d // n_head)
    if ck_s is not None:
        qq, qs = _quantize_int8(q, axis=-1)                    # qs [b,g,s,h,1]
        logits = jnp.einsum("bgshd,bthd->bgsht", qq, ck,
                            preferred_element_type=jnp.int32)
        ks = jnp.transpose(ck_s[..., 0], (0, 2, 1))            # [b, h, t]
        logits = (logits.astype(jnp.float32) * qs
                  * ks[:, None, None] * (scale * scale))
        w = jax.nn.softmax(logits, -1)
        wq, ws = _quantize_int8(w, axis=-1)                    # ws [b,g,s,h,1]
        out = jnp.einsum("bgsht,bthd->bgshd", wq, cv,
                         preferred_element_type=jnp.int32)
        out = (out.astype(jnp.float32) * ws * cv_s[:, None]).astype(x.dtype)
    else:
        logits = jnp.einsum("bgshd,bthd->bgsht", q * scale, ck * scale)
        w = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(x.dtype)
        out = jnp.einsum("bgsht,bthd->bgshd", w, cv)
    return _linear(p["out"], out.reshape(bg, s, d))


def prime_decode_cache(
    params: Params,
    cfg: WhisperConfig,
    tokens: jnp.ndarray,
    cache: Params,
    length: Optional[jnp.ndarray] = None,
    aux_index: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, Params]:
    """Prime the decode cache with a whole prompt in ONE forward pass.

    ``tokens`` i32[B, P] left-aligned, ONE row per sample (beam rows share
    their sample's prompt — the split cache stores it once). ``length``
    (i32 scalar or i32[B], default P) is the number of valid prompt tokens
    per sample; positions length..P-1 may hold padding, whose K/V land in
    the per-sample prompt section but stay masked out forever
    (``decode_step``'s ``slot < length`` prompt mask).

    Returns (logits f32[B, n_vocab] at position length-1, logits at
    ``aux_index`` (default 0 — pass the <|startoftranscript|> position to
    read whisper's no-speech probability; scalar or i32[B]), primed cache
    with step=0 and per-sample ``length``).

    Replaces a per-token unroll for long conditioned prompts (whisper's
    <|startofprev|> context, up to n_text_ctx//2 tokens), which the
    reference gets from ``model.transcribe`` (`inference_transcript.py:88`).
    """
    dec = params["decoder"]
    dtype = cfg.compute_dtype
    n_head = cfg.n_text_head
    b, p = tokens.shape
    length = jnp.broadcast_to(
        jnp.asarray(p if length is None else length, jnp.int32), (b,))
    aux_index = jnp.broadcast_to(
        jnp.asarray(0 if aux_index is None else aux_index, jnp.int32), (b,))

    x = dec["token_embedding"].astype(dtype)[tokens]
    x = x + dec["positional_embedding"].astype(dtype)[None, :p]
    mask = _causal_mask(p, dtype)

    new_blocks = []
    for block, bc in zip(dec["blocks"], cache["blocks"]):
        h = _layer_norm(block["attn_ln"], x)
        q = _split_heads(_linear(block["attn"]["q"], h), n_head)
        k = _split_heads(_linear(block["attn"]["k"], h), n_head)
        v = _split_heads(_linear(block["attn"]["v"], h), n_head)
        scale = (cfg.n_text_state // n_head) ** -0.25
        att = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k * scale) + mask
        w = jax.nn.softmax(att.astype(jnp.float32), -1).astype(dtype)
        attn_out = jnp.einsum("bhqk,bkhd->bqhd", w, v)
        x = x + _linear(block["attn"]["out"], attn_out.reshape(x.shape))

        h = _layer_norm(block["cross_attn_ln"], x)
        x = x + _grouped_cross_attention(
            block["cross_attn"], h, bc["cross_k"], bc["cross_v"], n_head,
            ck_s=bc.get("cross_k_s"), cv_s=bc.get("cross_v_s"))
        x = x + _mlp(block, _layer_norm(block["mlp_ln"], x),
                     fast_gelu=cfg.fast_gelu)
        new_blocks.append({**bc, "prompt_k": k, "prompt_v": v})

    x = _layer_norm(dec["ln"], x)
    rows = jnp.arange(b)
    last_h = x[rows, jnp.clip(length - 1, 0, p - 1)]
    aux_h = x[rows, jnp.clip(aux_index, 0, p - 1)]
    emb_t = dec["token_embedding"].T.astype(jnp.float32)
    return (
        last_h.astype(jnp.float32) @ emb_t,
        aux_h.astype(jnp.float32) @ emb_t,
        {"blocks": new_blocks, "step": jnp.zeros((), jnp.int32),
         "length": length},
    )


def decode_step(
    params: Params,
    cfg: WhisperConfig,
    tokens: jnp.ndarray,
    cache: Params,
) -> Tuple[jnp.ndarray, Params]:
    """One autoregressive step: tokens i32[R, 1] -> (logits f32[R, n_vocab],
    updated cache). Static shapes; usable inside lax.while_loop/scan.

    ``R = B * g`` rows share ``B`` samples' prompt/cross sections (``g``
    beams per sample; g=1 for greedy/sampling). Self-attention runs over
    the SPLIT cache: the per-sample prompt section (read once per sample
    per step, never reordered) and the per-row generated section (appended
    at the shared ``step`` slot, the only part a beam reorder must
    gather). Each row's true position is ``length[sample] + step`` — rows
    with different conditioned-prompt lengths (lockstep batched long-form
    decoding) differ only in position embedding and prompt-validity mask,
    not in storage layout."""
    dec = params["decoder"]
    dtype = cfg.compute_dtype
    n_head = cfg.n_text_head
    step = cache["step"]                  # i32 scalar: tokens generated so far
    length = cache["length"]              # i32[B]: per-sample prompt length
    r = tokens.shape[0]
    b = length.shape[0]
    g = r // b
    p = cache["blocks"][0]["prompt_k"].shape[1]
    g_max = cache["blocks"][0]["gen_k"].shape[1]
    neg = jnp.finfo(jnp.float32).min

    pe = dec["positional_embedding"].astype(dtype)
    pos = jnp.repeat(length, g) + step    # [R] true positions
    x = dec["token_embedding"].astype(dtype)[tokens]
    # INVARIANT: callers keep length + step < n_text_ctx (_check_context in
    # decode/beam.py and decode/longform.py). The clip below only guards the
    # traced gather against OOB — a caller violating the invariant would get
    # the LAST positional row silently repeated, not an error, so any new
    # decode loop must enforce the context bound itself.
    x = x + jnp.take(pe, jnp.clip(pos, 0, pe.shape[0] - 1), axis=0)[:, None]

    # validity masks: prompt slots < length (per sample), gen slots <= step
    slot_p = jax.lax.broadcasted_iota(jnp.int32, (b, p), 1)
    mask_p = jnp.where(slot_p < length[:, None], 0.0, neg).astype(dtype)
    slot_g = jax.lax.broadcasted_iota(jnp.int32, (g_max,), 0)
    mask_g = jnp.where(slot_g <= step, 0.0, neg).astype(dtype)

    scale = (cfg.n_text_state // n_head) ** -0.25
    new_blocks = []
    for block, bc in zip(dec["blocks"], cache["blocks"]):
        h = _layer_norm(block["attn_ln"], x)
        q = _split_heads(_linear(block["attn"]["q"], h), n_head)
        k_new = _split_heads(_linear(block["attn"]["k"], h), n_head)
        v_new = _split_heads(_linear(block["attn"]["v"], h), n_head)
        gen_k = jax.lax.dynamic_update_slice_in_dim(bc["gen_k"], k_new, step, axis=1)
        gen_v = jax.lax.dynamic_update_slice_in_dim(bc["gen_v"], v_new, step, axis=1)

        qs = (q * scale)[:, 0]                                   # [R, H, Dh]
        att_p = jnp.einsum("bghd,bphd->bghp", qs.reshape(b, g, n_head, -1),
                           bc["prompt_k"] * scale)
        att_p = att_p + mask_p[:, None, None, :]
        att_g = jnp.einsum("rhd,rkhd->rhk", qs, gen_k * scale)
        att_g = att_g + mask_g[None, None, :]
        att = jnp.concatenate([att_p.reshape(r, n_head, p), att_g], axis=-1)
        w = jax.nn.softmax(att.astype(jnp.float32), -1).astype(dtype)
        out_p = jnp.einsum("bghp,bphd->bghd",
                           w[..., :p].reshape(b, g, n_head, p), bc["prompt_v"])
        out_g = jnp.einsum("rhk,rkhd->rhd", w[..., p:], gen_v)
        attn_out = out_p.reshape(r, n_head, -1) + out_g          # [R, H, Dh]
        x = x + _linear(block["attn"]["out"], attn_out.reshape(r, 1, -1))

        h = _layer_norm(block["cross_attn_ln"], x)
        x = x + _grouped_cross_attention(
            block["cross_attn"], h, bc["cross_k"], bc["cross_v"], n_head,
            ck_s=bc.get("cross_k_s"), cv_s=bc.get("cross_v_s"))
        x = x + _mlp(block, _layer_norm(block["mlp_ln"], x),
                     fast_gelu=cfg.fast_gelu)
        new_blocks.append({**bc, "gen_k": gen_k, "gen_v": gen_v})

    x = _layer_norm(dec["ln"], x)
    logits = x.astype(jnp.float32) @ dec["token_embedding"].T.astype(jnp.float32)
    return logits[:, 0], {"blocks": new_blocks, "step": step + 1,
                          "length": length}
