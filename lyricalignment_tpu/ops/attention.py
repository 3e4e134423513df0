"""Attention dispatch: Pallas flash attention on TPU, einsum elsewhere.

The encoder's 1500-frame self-attention materialises [B, H, 1500, 1500]
score matrices in the einsum formulation — at whisper-medium that is
~0.6 GB of HBM traffic per layer and dominates the layer time. The TPU
path tiles Q/K/V through VMEM with the maintained Pallas flash-attention
kernel (`jax.experimental.pallas.ops.tpu.flash_attention`, forward and
backward), padding the sequence up to a lane-aligned length and masking
the padding with segment ids.

Block sizes are tuned for whisper encoder shapes (T=1536 after padding,
Dh=64) on v5e. Round-2 retune (same-run in-loop A/B): FORWARD blocks at
the full sequence (block_q=block_k=1536) measured 1.61 ms/layer vs 1.83
at the round-1 768/768 (B=8, H=16, bf16; einsum 3.1; the library DEFAULT
blocks measured 10.2 ms, which is why round 1 parked the kernel; large
H=20: 2.13 vs 2.28). BACKWARD blocks stay at 768 — full-T dkv/dq kernels
fail to compile (VMEM) — giving fwd+bwd 9.33 ms/layer vs 9.41 before, so
training keeps the same dispatch (the kernel's custom VJP handles the
backward).

Numerics: flash accumulates the softmax in f32 internally, matching the
einsum path's f32-softmax to bf16 rounding. Set LA_TPU_NO_FLASH_ATTENTION=1
to force the einsum path.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_LANE = 128
_BLOCK_Q = 1536      # forward: full-sequence blocks measured fastest
_BLOCK_K = 1536
_BLOCK_Q_BWD = 768   # backward: full-T dkv/dq blocks exceed VMEM
_BLOCK_K_BWD = 768


def _einsum_attention(q, k, v, sm_scale):
    """Reference path: q/k/v [B, T, H, Dh] -> [B, T, H, Dh]."""
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * sm_scale, k)
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v)


def self_attention(q, k, v, sm_scale: float = 1.0):
    """Non-causal multi-head self-attention, q/k/v [B, T, H, Dh].

    ``sm_scale`` multiplies the logits (callers pre-scaling q AND k by
    d**-0.25 should pass 1.0).
    """
    if (jax.default_backend() != "tpu"
            or os.environ.get("LA_TPU_NO_FLASH_ATTENTION")):
        return _einsum_attention(q, k, v, sm_scale)

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    b, t, h, dh = q.shape
    t_pad = -(-t // _LANE) * _LANE
    def fit(block):
        # largest lane-multiple divisor of t_pad up to the tuned block size
        # — t_pad is always a multiple of 128, so never below 128
        return max(d for d in range(_LANE, min(block, t_pad) + 1, _LANE)
                   if t_pad % d == 0)

    bq, bk = fit(_BLOCK_Q), fit(_BLOCK_K)
    bq_b, bk_b = fit(_BLOCK_Q_BWD), fit(_BLOCK_K_BWD)
    block_sizes = BlockSizes(
        block_q=bq, block_k_major=t_pad, block_k=bk, block_b=1,
        block_q_major_dkv=bq_b, block_k_major_dkv=t_pad,
        block_k_dkv=bk_b, block_q_dkv=bq_b,
        block_k_major_dq=t_pad, block_k_dq=bk_b, block_q_dq=bq_b,
    )

    # flash kernel wants [B, H, T, Dh]
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    seg = None
    if t_pad != t:
        pad = [(0, 0), (0, 0), (0, t_pad - t), (0, 0)]
        qt, kt, vt = (jnp.pad(x, pad) for x in (qt, kt, vt))
        # padding gets its own segment id -> fully masked from real tokens
        ids = (jnp.arange(t_pad) >= t).astype(jnp.int32) + 1
        ids = jnp.broadcast_to(ids[None], (b, t_pad))
        seg = SegmentIds(q=ids, kv=ids)

    out = flash_attention(qt, kt, vt, segment_ids=seg, causal=False,
                          sm_scale=sm_scale, block_sizes=block_sizes)
    out = jnp.swapaxes(out, 1, 2)
    return out[:, :t] if t_pad != t else out


# ---------------------------------------------------------------------------
# One-pass encoder attention (pad-once path)
# ---------------------------------------------------------------------------
#
# The flash kernel above is invoked on T=1500 activations, so every layer
# pays pad -> segment-id masking -> unpad (~0.4 ms of the ~3.1 ms layer
# attention at medium B=16, measured same-run). When the caller keeps the
# residual stream at a lane-aligned T and masks pad KEYS with an additive
# bias once, attention needs neither online-softmax bookkeeping (block_k =
# full T means one K pass per q block) nor segment ids. Same-run A/B at
# B=16, H=16, T=1536, Dh=64 (bf16): one-pass 2.69 ms/layer vs library
# flash + segment ids 2.76-2.85 vs the shipped per-layer-padded path
# 3.07-3.14. bf16/exp2 softmax variants measured NO faster (the f32 exp is
# already at the VPU rate), so the kernel keeps whisper's f32 softmax:
# numerics match the einsum path to bf16 rounding.

_BLOCK_Q_ONEPASS = 1536


def _onepass_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref):
    q = q_ref[0]                      # [bq, Dh]
    k = k_ref[0]                      # [T, Dh]
    v = v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s + bias_ref[0][None, :]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)                # f32 softmax, single pass
    l = p.sum(axis=-1, keepdims=True)
    o = jax.lax.dot_general(p.astype(q.dtype), v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = (o / l).astype(o_ref.dtype)


def _einsum_bias_attention(q, k, v, key_bias):
    """[B, T, H, Dh] einsum attention with an additive key bias [1, T]."""
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
    logits = logits + key_bias[0][None, None, None, :]
    weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v)


def _onepass_fwd_impl(q, k, v, key_bias):
    if (jax.default_backend() != "tpu"
            or os.environ.get("LA_TPU_NO_FLASH_ATTENTION")):
        return _einsum_bias_attention(q, k, v, key_bias)

    import functools

    from jax.experimental import pallas as pl

    b, t, h, dh = q.shape
    assert t % _LANE == 0, f"onepass attention needs T % {_LANE} == 0, got {t}"
    bq = max(d for d in range(_LANE, min(_BLOCK_Q_ONEPASS, t) + 1, _LANE)
             if t % d == 0)
    qf = jnp.swapaxes(q, 1, 2).reshape(b * h, t, dh)
    kf = jnp.swapaxes(k, 1, 2).reshape(b * h, t, dh)
    vf = jnp.swapaxes(v, 1, 2).reshape(b * h, t, dh)
    out = pl.pallas_call(
        _onepass_kernel,
        grid=(b * h, t // bq),
        in_specs=[
            pl.BlockSpec((1, bq, dh), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, t, dh), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, t, dh), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, t), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, dh), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct(qf.shape, q.dtype),
    )(qf, kf, vf, key_bias)
    return jnp.swapaxes(out.reshape(b, h, t, dh), 1, 2)


@jax.custom_vjp
def onepass_self_attention(q, k, v, key_bias):
    """Single-pass non-causal self-attention, q/k/v [B, T, H, Dh].

    ``key_bias`` [1, T] f32 is added to every score row (use -1e9 on pad
    key positions; T must be a multiple of 128 — callers pad the residual
    stream ONCE, see `models/whisper.py:encode_audio`). Callers pre-scale
    q (and k) so no sm_scale is applied. Differentiable: the backward
    recomputes the einsum formulation and takes its VJP, so training
    through this path is correct (though the flash kernel's tuned backward
    in `self_attention` remains the faster choice for the training loop).
    """
    return _onepass_fwd_impl(q, k, v, key_bias)


def _onepass_vjp_fwd(q, k, v, key_bias):
    return _onepass_fwd_impl(q, k, v, key_bias), (q, k, v, key_bias)


def _onepass_vjp_bwd(res, g):
    q, k, v, key_bias = res
    _, vjp = jax.vjp(_einsum_bias_attention, q, k, v, key_bias)
    return vjp(g)


onepass_self_attention.defvjp(_onepass_vjp_fwd, _onepass_vjp_bwd)
