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
