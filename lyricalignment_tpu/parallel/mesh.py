"""Device mesh + sharding rules (data parallel x tensor parallel).

The reference has no distributed support at all (SURVEY.md §2: no
torch.distributed/NCCL anywhere; scale-out is grad accumulation on one GPU).
This module is the TPU-native scale-out layer: a ("data", "model") mesh over
ICI, NamedSharding rules for the Whisper backbone (Megatron-style tensor
parallelism: column-parallel qkv/fc1, row-parallel out/fc2, vocab-sharded
embedding) and data-parallel batch sharding. XLA inserts the psum /
all-gather collectives from the shardings — there is no hand-written
communication here by design.

The GRU head's gate-interleaved weights stay replicated (they are tiny:
~2 M params vs 300-1500 M for the backbone) — sharding 3H-packed gates over
the model axis would split gates unevenly.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: int = -1,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a 2-D ("data", "model") mesh. ``data=-1`` consumes the rest."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch dim over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def _attn_specs(tp: bool) -> Dict[str, Any]:
    m = MODEL_AXIS if tp else None
    return {
        "q": {"w": P(None, m), "b": P(m)},
        "k": {"w": P(None, m)},
        "v": {"w": P(None, m), "b": P(m)},
        # row-parallel: contraction dim sharded, psum'd by XLA
        "out": {"w": P(m, None), "b": P(None)},
    }


def _block_specs(cross: bool, tp: bool) -> Dict[str, Any]:
    m = MODEL_AXIS if tp else None
    spec = {
        "attn_ln": {"scale": P(None), "bias": P(None)},
        "attn": _attn_specs(tp),
        "mlp_ln": {"scale": P(None), "bias": P(None)},
        "mlp_fc1": {"w": P(None, m), "b": P(m)},
        "mlp_fc2": {"w": P(m, None), "b": P(None)},
    }
    if cross:
        spec["cross_attn_ln"] = {"scale": P(None), "bias": P(None)}
        spec["cross_attn"] = _attn_specs(tp)
    return spec


def whisper_param_specs(n_audio_layer: int, n_text_layer: int, tp: bool = True) -> Dict:
    m = MODEL_AXIS if tp else None
    return {
        "encoder": {
            "conv1": {"w": P(m, None, None), "b": P(m)},
            "conv2": {"w": P(m, None, None), "b": P(m)},
            "blocks": [_block_specs(False, tp) for _ in range(n_audio_layer)],
            "ln_post": {"scale": P(None), "bias": P(None)},
        },
        "decoder": {
            "token_embedding": P(m, None),
            "positional_embedding": P(None, None),
            "blocks": [_block_specs(True, tp) for _ in range(n_text_layer)],
            "ln": {"scale": P(None), "bias": P(None)},
        },
    }


def _replicated_like(tree) -> Any:
    return jax.tree_util.tree_map(lambda _: P(), tree)


def _adapt_specs_to_params(p_node, s_node):
    """Align the spec tree to the ACTUAL param structure.

    int8-resident linears (``models.whisper.int8_resident_params``) replace
    ``{"w", ...}`` with ``{"wq", "ws", ...}``: wq inherits w's spec (the
    quantized matrix shards exactly like the full-precision one — scales
    are global per output channel, so sharded partial contractions rescale
    then psum correctly) and ws [1, out] shards only its output dim."""
    if isinstance(s_node, dict):
        if "w" in s_node and isinstance(p_node, dict) and "wq" in p_node:
            w_spec = s_node["w"]
            out = {"wq": w_spec,
                   "ws": P(None, w_spec[1] if len(w_spec) > 1 else None)}
            if "b" in p_node and "b" in s_node:
                out["b"] = s_node["b"]
            return out
        return {k: _adapt_specs_to_params(p_node[k], v)
                for k, v in s_node.items() if k in p_node}
    if isinstance(s_node, (list, tuple)):
        return type(s_node)(
            _adapt_specs_to_params(pv, sv) for pv, sv in zip(p_node, s_node))
    return s_node


def align_param_specs(params: Dict, tp: bool = True) -> Dict:
    """PartitionSpec tree for full AlignModel params (head replicated)."""
    n_enc = len(params["whisper"]["encoder"]["blocks"])
    n_dec = len(params["whisper"]["decoder"]["blocks"])
    return {
        "whisper": _adapt_specs_to_params(
            params["whisper"], whisper_param_specs(n_enc, n_dec, tp=tp)),
        "align_head": _replicated_like(params["align_head"]),
    }


def tree_shardings(mesh: Mesh, specs) -> Any:
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s),
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_align_params(params: Dict, mesh: Mesh, tp: bool = True) -> Dict:
    """Place AlignModel params on the mesh per the TP rules.

    Conv output channels and attention head projections shard over the model
    axis; when a dim is not divisible by the axis size XLA would reject it,
    so fall back to replication for those leaves.
    """
    specs = align_param_specs(params, tp=tp)
    model_size = mesh.shape[MODEL_AXIS]

    def place(x, spec):
        for dim, axis in enumerate(spec):
            if axis == MODEL_AXIS and x.shape[dim] % model_size != 0:
                spec = P()  # indivisible -> replicate
                break
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(
        place, params, specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def sequence_sharding(mesh: Mesh) -> NamedSharding:
    """Activation sharding for sequence/context parallelism: [B, T, D]
    activations split batch-over-data and frames-over-model. Pass to
    ``models.whisper.encode_audio(sequence_sharding=...)``; XLA inserts the
    attention K/V all-gathers over ICI."""
    return NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS, None))
