"""Optimizer + LR schedule factory.

Parity with the reference's optimizer setup (`train_multitask.py:683-690`):
AdamW with two parameter groups — alignment head at ``lr`` (default 5e-3)
and the Whisper backbone at ``backbone_lr`` (default 5e-6) — weight decay
1e-5, global-norm gradient clipping at 1.0 applied across *all* params
before the step (`train_multitask.py:337`), and HF's
``get_linear_schedule_with_warmup``: linear 0->lr over ``warmup_steps``,
then linear decay to 0 at ``total_steps``.
"""

from __future__ import annotations

from typing import Dict

import jax
import optax


def linear_warmup_decay(base_lr: float, warmup_steps: int, total_steps: int):
    """HF get_linear_schedule_with_warmup as an optax schedule."""
    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, warmup_steps)
        decay = (total_steps - step) / jnp.maximum(1.0, total_steps - warmup_steps)
        return base_lr * jnp.maximum(0.0, jnp.where(step < warmup_steps, warm, decay))

    return schedule


def param_group_labels(params: Dict, freeze_encoder: bool = False) -> Dict:
    """'head' for the alignment head, 'backbone' for whisper — mirroring the
    reference's two AdamW groups.

    With ``freeze_encoder`` the encoder subtree is labeled 'frozen' and
    routed to ``optax.set_to_zero`` — matching torch AdamW, which skips
    grad-less params entirely (no update, no decoupled weight decay, and no
    mu/nu state; for whisper-large that state is ~5.7 GB of HBM, the
    difference between fitting and OOM on one 16 GB chip)."""
    whisper = {
        k: jax.tree_util.tree_map(
            lambda _: "frozen" if (freeze_encoder and k == "encoder")
            else "backbone", v)
        for k, v in params["whisper"].items()
    }
    return {
        "whisper": whisper,
        "align_head": jax.tree_util.tree_map(lambda _: "head", params["align_head"]),
    }


def make_optimizer(
    params: Dict,
    head_lr: float = 5e-3,
    backbone_lr: float = 5e-6,
    weight_decay: float = 1e-5,
    warmup_steps: int = 200,
    total_steps: int = 2000,
    max_grad_norm: float = 1.0,
    mu_dtype=None,
    freeze_encoder: bool = False,
) -> optax.GradientTransformation:
    head_sched = linear_warmup_decay(head_lr, warmup_steps, total_steps)
    backbone_sched = linear_warmup_decay(backbone_lr, warmup_steps, total_steps)
    adamw = lambda sched: optax.adamw(sched, weight_decay=weight_decay,
                                      mu_dtype=mu_dtype)
    return optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.multi_transform(
            {"head": adamw(head_sched), "backbone": adamw(backbone_sched),
             "frozen": optax.set_to_zero()},
            param_group_labels(params, freeze_encoder=freeze_encoder),
        ),
    )
