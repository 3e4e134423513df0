"""Frame-wise alignment head: stacked bi-GRU -> Mish -> Linear.

Equivalent of the reference's ``RNN`` module (`module/align_model.py:11-40`):
2-layer bidirectional GRU (hidden 384, dropout 0.1) over encoder frames,
Mish activation, linear projection to ``21128 + use_ctc`` classes.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lyricalignment_tpu.ops.gru import bigru_apply, init_bigru

Params = Dict[str, Any]


def mish(x: jnp.ndarray) -> jnp.ndarray:
    return x * jnp.tanh(jax.nn.softplus(x))


def init_align_head(
    key: jax.Array,
    input_dim: int,
    hidden_dim: int,
    output_dim: int,
    num_layers: int = 2,
    bidirectional: bool = True,
) -> Params:
    k_gru, k_fc = jax.random.split(key)
    fc_in = hidden_dim * (2 if bidirectional else 1)
    s = 1.0 / np.sqrt(fc_in)
    return {
        "gru": init_bigru(k_gru, input_dim, hidden_dim, num_layers, bidirectional),
        "fc": {
            "w": jax.random.uniform(k_fc, (fc_in, output_dim), jnp.float32, -s, s),
            "b": jax.random.uniform(jax.random.fold_in(k_fc, 1), (output_dim,), jnp.float32, -s, s),
        },
    }


def align_head_hidden(
    params: Params,
    x: jnp.ndarray,
    dropout: float = 0.0,
    rng: Optional[jax.Array] = None,
    lengths: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """x [B, T, D] encoder frames -> pre-classifier hidden f32[B, T, fc_in]
    (bi-GRU -> Mish, before the fc). Feed to ``viterbi_align_fused`` to
    align without materialising the [B, T, 21129] logits."""
    h = bigru_apply(params["gru"], x, dropout=dropout, rng=rng, lengths=lengths)
    # classifier input in f32: logits feed CE/CTC losses directly
    return mish(h).astype(jnp.float32)


def align_head_apply(
    params: Params,
    x: jnp.ndarray,
    dropout: float = 0.0,
    rng: Optional[jax.Array] = None,
    lengths: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """x [B, T, D] encoder frames -> logits f32[B, T, output_dim].

    ``lengths`` (i32[B]) masks the GRU recurrences to true frame counts so
    bucketed/padded batches produce exact-trim logits at valid positions."""
    h = align_head_hidden(params, x, dropout=dropout, rng=rng, lengths=lengths)
    return h @ params["fc"]["w"] + params["fc"]["b"]
