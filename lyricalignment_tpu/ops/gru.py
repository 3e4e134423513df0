"""GRU as a `lax.scan` recurrence, TPU-first.

Replaces the cuDNN GRU the reference uses for its alignment head
(`module/align_model.py:23-28`). Design: the input-to-hidden projection for
*all* timesteps is hoisted out of the recurrence into one large matmul
([B,T,In] @ [In,3H] — rides the MXU), so the scan body only carries the
small hidden-to-hidden matmul and elementwise gates (VPU). Gate order is
torch's (r, z, n), so converted ``weight_ih_l*``/``weight_hh_l*`` tensors
drop straight in (transposed to [in, 3H]).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


def init_gru_cell(key: jax.Array, n_in: int, n_hidden: int) -> Params:
    """Uniform(-1/sqrt(H), 1/sqrt(H)) init, matching torch.nn.GRU."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    s = 1.0 / np.sqrt(n_hidden)
    u = lambda k, shape: jax.random.uniform(k, shape, jnp.float32, -s, s)
    return {
        "w_ih": u(k1, (n_in, 3 * n_hidden)),
        "w_hh": u(k2, (n_hidden, 3 * n_hidden)),
        "b_ih": u(k3, (3 * n_hidden,)),
        "b_hh": u(k4, (3 * n_hidden,)),
    }


def gru_layer(
    cell: Params,
    x: jnp.ndarray,
    reverse: bool = False,
    unroll: int = 4,
    lengths: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Run one GRU direction over x [B, T, In] -> [B, T, H].

    ``lengths`` (i32[B], optional): per-sample true sequence length. The
    hidden state passes through unchanged at positions >= length, so a
    reverse scan entering from the padded tail reaches the last true frame
    with the same zero state an exact-trim run would — outputs at true
    positions are identical to running on the trimmed sequence (the
    reference's per-sample exact trim, `module/align_model.py:86-92`).
    """
    h_dim = cell["w_hh"].shape[0]
    dtype = x.dtype

    # hoisted input projection: one MXU matmul for the whole sequence
    xw = x @ cell["w_ih"].astype(dtype) + cell["b_ih"].astype(dtype)  # [B, T, 3H]
    w_hh = cell["w_hh"].astype(dtype)
    b_hh = cell["b_hh"].astype(dtype)

    def gates(h, xw_t):
        hw = h @ w_hh + b_hh  # [B, 3H]
        xr, xz, xn = jnp.split(xw_t, 3, axis=-1)
        hr, hz, hn = jnp.split(hw, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        return (1.0 - z) * n + z * h

    if lengths is None:
        def step(h, xw_t):
            h_new = gates(h, xw_t)
            return h_new, h_new

        xs = jnp.swapaxes(xw, 0, 1)  # [T, B, 3H] scan-major
    else:
        valid_t = (jnp.arange(x.shape[1])[:, None]
                   < lengths[None, :].astype(jnp.int32))  # [T, B]

        def step(h, xs_t):
            xw_t, valid = xs_t
            h_new = jnp.where(valid[:, None], gates(h, xw_t), h)
            return h_new, h_new

        xs = (jnp.swapaxes(xw, 0, 1), valid_t)

    h0 = jnp.zeros((x.shape[0], h_dim), dtype)
    _, ys = jax.lax.scan(step, h0, xs, reverse=reverse, unroll=unroll)
    return jnp.swapaxes(ys, 0, 1)


def gru_layer_bidir(
    cell_f: Params,
    cell_b: Params,
    x: jnp.ndarray,
    unroll: int = 4,
    lengths: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Both directions of one bi-GRU layer in a SINGLE scan: [B,T,In] -> [B,T,2H].

    The forward and reverse recurrences are independent, so step ``t``
    advances fwd position ``t`` and bwd position ``T-1-t`` together,
    halving the number of sequential scans per layer via one batched einsum
    over a stacked [2,H,3H] hidden weight.

    MEASURED NEGATIVE — kept as a tested exhibit, NOT production
    (`bigru_apply` runs per-direction ``gru_layer`` scans). Same-run A/B on
    the v5e (scripts/bench_gru_fused.py, medium B=16 bf16): isolated head
    4.4 ms (separate) vs 6.3 ms (fused); end-to-end alignment 2590 vs 2562
    audio-s/s. The stacked-direction einsum + [T,2,B,3H] layout lowers
    worse per step than two plain scans, and the whole bi-GRU is only ~2%
    of the production batch. Outputs are identical to running ``gru_layer``
    twice (same per-direction reduction order; ``lengths`` pass-through
    semantics match too).
    """
    h_dim = cell_f["w_hh"].shape[0]
    dtype = x.dtype
    T = x.shape[1]

    # hoisted input projections (one MXU matmul each, whole sequence)
    xw_f = x @ cell_f["w_ih"].astype(dtype) + cell_f["b_ih"].astype(dtype)
    xw_b = x @ cell_b["w_ih"].astype(dtype) + cell_b["b_ih"].astype(dtype)
    # scan-major [T, 2, B, 3H]; lane 1 walks the sequence back-to-front
    xw = jnp.stack(
        [jnp.swapaxes(xw_f, 0, 1), jnp.swapaxes(xw_b, 0, 1)[::-1]], axis=1)

    w_hh = jnp.stack([cell_f["w_hh"], cell_b["w_hh"]]).astype(dtype)  # [2,H,3H]
    b_hh = jnp.stack([cell_f["b_hh"], cell_b["b_hh"]]).astype(dtype)[:, None, :]

    def gates(h, xw_t):
        hw = jnp.einsum("dbh,dhk->dbk", h, w_hh) + b_hh  # [2, B, 3H]
        xr, xz, xn = jnp.split(xw_t, 3, axis=-1)
        hr, hz, hn = jnp.split(hw, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        return (1.0 - z) * n + z * h

    if lengths is None:
        def step(h, xw_t):
            h_new = gates(h, xw_t)
            return h_new, h_new

        xs = xw
    else:
        t_idx = jnp.arange(T, dtype=jnp.int32)
        lens = lengths[None, :].astype(jnp.int32)
        valid = jnp.stack(
            [t_idx[:, None] < lens,            # fwd: position t
             (T - 1 - t_idx)[:, None] < lens], # bwd: position T-1-t
            axis=1)  # [T, 2, B]

        def step(h, xs_t):
            xw_t, valid_t = xs_t
            h_new = jnp.where(valid_t[..., None], gates(h, xw_t), h)
            return h_new, h_new

        xs = (xw, valid)

    h0 = jnp.zeros((2, x.shape[0], h_dim), dtype)
    _, ys = jax.lax.scan(step, h0, xs, unroll=unroll)  # [T, 2, B, H]
    out_f = jnp.swapaxes(ys[:, 0], 0, 1)
    out_b = jnp.swapaxes(ys[::-1, 1], 0, 1)
    return jnp.concatenate([out_f, out_b], axis=-1)


def init_bigru(
    key: jax.Array, n_in: int, n_hidden: int, num_layers: int = 2,
    bidirectional: bool = True,
) -> Params:
    """Stacked (optionally bidirectional) GRU parameters."""
    layers: List[Params] = []
    directions = 2 if bidirectional else 1
    for layer in range(num_layers):
        layer_in = n_in if layer == 0 else n_hidden * directions
        dirs = []
        for d in range(directions):
            k = jax.random.fold_in(key, layer * 2 + d)
            dirs.append(init_gru_cell(k, layer_in, n_hidden))
        layers.append({"dirs": dirs})
    return {"layers": layers}


def bigru_apply(
    params: Params,
    x: jnp.ndarray,
    dropout: float = 0.0,
    rng: Optional[jax.Array] = None,
    unroll: int = 4,
    lengths: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Stacked bi-GRU: x [B, T, In] -> [B, T, H * directions].

    Dropout (torch semantics: applied to the outputs of every layer except
    the last) is active only when a ``rng`` is provided. ``lengths``
    (i32[B]) masks the recurrences to each sample's true length — outputs
    at positions < length match an exact-trim run (see ``gru_layer``).
    """
    layers = params["layers"]
    for i, layer in enumerate(layers):
        outs = [gru_layer(layer["dirs"][0], x, reverse=False, unroll=unroll,
                          lengths=lengths)]
        if len(layer["dirs"]) == 2:
            outs.append(gru_layer(layer["dirs"][1], x, reverse=True,
                                  unroll=unroll, lengths=lengths))
        x = jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]
        if dropout > 0.0 and rng is not None and i < len(layers) - 1:
            keep = jax.random.bernoulli(jax.random.fold_in(rng, i), 1.0 - dropout, x.shape)
            x = jnp.where(keep, x / (1.0 - dropout), 0.0)
    return x
