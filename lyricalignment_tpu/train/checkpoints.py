"""Checkpointing: orbax pytrees + the reference's best/last policy.

The reference saves four named checkpoints by distinct criteria
(`train_multitask.py:567-585`): ``best_model`` (min total dev loss),
``best_align_model`` (min align_ce+align_ctc), ``best_trans_model``
(min trans_ce) and ``last_model`` every eval — plus optional per-step
checkpoints. It stores bare ``state_dict`` weights; this framework
checkpoints the *full train state* (params + optimizer state + step) so
resume continues the LR schedule (the reference restarts it — SURVEY.md §5),
and can additionally export reference-named ``.pt`` state dicts for interop
(``models/convert.py``).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import numpy as np
import orbax.checkpoint as ocp


def save_pytree(path: str, tree: Any) -> None:
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, tree, force=True)


def restore_pytree(path: str, template: Optional[Any] = None) -> Any:
    """Restore a checkpoint dir to HOST numpy leaves.

    Restoring to numpy (instead of letting orbax re-create jax.Arrays from
    the shardings stored in the checkpoint) makes checkpoints portable
    across topologies: a dir saved on a CPU host restores on a TPU host
    and vice versa — orbax's default path errors when the stored sharding
    names a device that doesn't exist here (e.g. ``TFRT_CPU_0`` on a TPU
    backend). jit uploads the leaves on first use either way.
    """
    import jax

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    structure = (template if template is not None
                 else ckptr.metadata(path).item_metadata)
    restore_args = jax.tree_util.tree_map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), structure)
    if template is not None:
        return ckptr.restore(path, item=template, restore_args=restore_args)
    return ckptr.restore(path, restore_args=restore_args)


def save_json(path: str, obj: Dict) -> None:
    with open(path, "w", encoding="utf-8") as f:
        json.dump(obj, f, indent=4, ensure_ascii=False)


def load_json(path: str) -> Dict:
    with open(path, "r", encoding="utf-8") as f:
        return json.load(f)


class BestCheckpointPolicy:
    """Tracks the reference's four best/last criteria and writes orbax
    checkpoints under ``save_dir/{name}_model``.

    Saves are asynchronous by default (SURVEY.md §5): the device->host
    snapshot is taken synchronously, then serialization/IO runs on a
    background thread so the train loop is not stalled by disk writes
    (the full-state medium checkpoint is ~3 GB and the host has one core).
    A pending save is awaited before the next one starts and in ``close()``
    — call ``close()`` (or use the policy as a context manager) before
    reading the files.
    """

    def __init__(self, save_dir: str, initial_losses: Dict[str, float],
                 use_async: bool = True):
        self.save_dir = save_dir
        os.makedirs(save_dir, exist_ok=True)
        self.min_total = initial_losses["total"]
        self.min_align = initial_losses["align_ce"] + initial_losses.get("align_ctc", 0.0)
        self.min_trans = initial_losses["trans_ce"]
        self._ckptr = (
            ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
            if use_async else ocp.PyTreeCheckpointer()
        )

    def _wait(self) -> None:
        if hasattr(self._ckptr, "wait_until_finished"):
            self._ckptr.wait_until_finished()

    def _save(self, name: str, tree: Any) -> None:
        self._wait()
        self._ckptr.save(os.path.abspath(os.path.join(self.save_dir, name)),
                         tree, force=True)

    def close(self) -> None:
        """Block until the last save is durable on disk."""
        self._wait()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    def update(
        self,
        eval_losses: Dict[str, float],
        params: Any,
        step: int,
        save_all: bool = False,
        full_state: Optional[Any] = None,
    ) -> Dict[str, bool]:
        """Save whichever checkpoints improved; always save last_model.
        Returns which criteria fired."""
        saved = {"best": False, "best_align": False, "best_trans": False}
        tree = full_state if full_state is not None else params

        if eval_losses["total"] < self.min_total:
            self.min_total = eval_losses["total"]
            self._save("best_model", tree)
            saved["best"] = True

        align = eval_losses["align_ce"] + eval_losses.get("align_ctc", 0.0)
        if align < self.min_align:
            self.min_align = align
            self._save("best_align_model", tree)
            saved["best_align"] = True

        if eval_losses["trans_ce"] < self.min_trans:
            self.min_trans = eval_losses["trans_ce"]
            self._save("best_trans_model", tree)
            saved["best_trans"] = True

        if save_all:
            self._save(f"step{step}", tree)
        # the trailing save runs in the background: training resumes while
        # last_model serializes
        self._save("last_model", tree)
        return saved


def export_reference_pt(params: Any, path: str,
                        n_audio_ctx: int = 1500) -> None:
    """Write a reference-named torch state dict (interop; needs torch).

    ``n_audio_ctx`` sizes the synthesized encoder positional-embedding
    buffer and must match the model's config (1500 for every published
    whisper size) or a strict ``load_state_dict`` on the reference side
    fails on the buffer shape."""
    import torch

    from lyricalignment_tpu.models.convert import align_params_to_state_dict

    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in
          align_params_to_state_dict(params, n_audio_ctx=n_audio_ctx).items()}
    torch.save(sd, path)
