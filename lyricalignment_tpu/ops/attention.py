"""Attention dispatch: Pallas flash attention on TPU, einsum elsewhere.

The encoder's 1500-frame self-attention materialises [B, H, 1500, 1500]
score matrices in the einsum formulation — at whisper-medium that is
~0.6 GB of HBM traffic per layer and dominates the layer time. The TPU
path tiles Q/K/V through VMEM with the maintained Pallas flash-attention
kernel (`jax.experimental.pallas.ops.tpu.flash_attention`, forward and
backward), padding the sequence up to a lane-aligned length and masking
the padding with segment ids.

Numerics: flash accumulates the softmax in f32 internally, matching the
einsum path's f32-softmax to bf16 rounding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_LANE = 128


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
    import os

    # Measured on v5e (whisper shapes, T=1536, Dh=64): the flash kernel runs
    # 43-75 ms/call vs ~3 ms for the einsum path — the 64-wide head dim
    # wastes half the MXU lanes and the kernel grid doesn't amortise it.
    # Kept opt-in for future tuning; einsum is the production path.
    if jax.default_backend() != "tpu" or not os.environ.get("LA_TPU_FLASH_ATTENTION"):
        return _einsum_attention(q, k, v, sm_scale)

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds,
        flash_attention,
    )

    b, t, h, dh = q.shape
    t_pad = -(-t // _LANE) * _LANE
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
                          sm_scale=sm_scale)
    out = jnp.swapaxes(out, 1, 2)
    return out[:, :t] if t_pad != t else out
