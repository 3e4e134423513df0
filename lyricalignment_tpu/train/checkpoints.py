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
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    if template is not None:
        return ckptr.restore(path, item=template)
    return ckptr.restore(path)


def save_json(path: str, obj: Dict) -> None:
    with open(path, "w", encoding="utf-8") as f:
        json.dump(obj, f, indent=4, ensure_ascii=False)


def load_json(path: str) -> Dict:
    with open(path, "r", encoding="utf-8") as f:
        return json.load(f)


class BestCheckpointPolicy:
    """Tracks the reference's four best/last criteria and writes orbax
    checkpoints under ``save_dir/{name}_model``."""

    def __init__(self, save_dir: str, initial_losses: Dict[str, float]):
        self.save_dir = save_dir
        os.makedirs(save_dir, exist_ok=True)
        self.min_total = initial_losses["total"]
        self.min_align = initial_losses["align_ce"] + initial_losses.get("align_ctc", 0.0)
        self.min_trans = initial_losses["trans_ce"]

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
            save_pytree(os.path.join(self.save_dir, "best_model"), tree)
            saved["best"] = True

        align = eval_losses["align_ce"] + eval_losses.get("align_ctc", 0.0)
        if align < self.min_align:
            self.min_align = align
            save_pytree(os.path.join(self.save_dir, "best_align_model"), tree)
            saved["best_align"] = True

        if eval_losses["trans_ce"] < self.min_trans:
            self.min_trans = eval_losses["trans_ce"]
            save_pytree(os.path.join(self.save_dir, "best_trans_model"), tree)
            saved["best_trans"] = True

        if save_all:
            save_pytree(os.path.join(self.save_dir, f"step{step}"), tree)
        save_pytree(os.path.join(self.save_dir, "last_model"), tree)
        return saved


def export_reference_pt(params: Any, path: str) -> None:
    """Write a reference-named torch state dict (interop; needs torch)."""
    import torch

    from lyricalignment_tpu.models.convert import align_params_to_state_dict

    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in
          align_params_to_state_dict(params).items()}
    torch.save(sd, path)
