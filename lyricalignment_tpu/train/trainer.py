"""Jitted multitask trainer: one compiled update, grad accumulation by scan,
data-parallel over the TPU mesh.

Reference call-stack parity (`train_multitask.py:215-342,345-458`): each
step pulls ``accum_grad_steps`` micro-batches, computes
``align_CE (+align_CTC) + transcript_CE`` with the multitask/transcript
group split, accumulates gradients, clips the global norm, and applies one
AdamW step with the two-group LR schedule. Differences by design:

  * the whole step (forward x accum, backward, clip, update) is ONE jitted
    function; micro-batches arrive stacked ``[accum, B, ...]`` and are
    consumed by ``lax.scan`` — no host round-trips inside a step;
  * the dynamic sub-batch split is a ``has_alignment`` mask into
    group-masked losses (losses.py);
  * data parallelism: batches are sharded over the mesh's "data" axis and
    params per ``parallel.mesh`` rules; XLA inserts the gradient psum.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from lyricalignment_tpu.models.align_model import (
    AlignModelConfig,
    forward_from_audio,
)
from lyricalignment_tpu.train.losses import (
    ctc_loss_grouped,
    ctc_loss_grouped_fused,
    frame_ce_loss_grouped,
    frame_ce_loss_grouped_fused,
    masked_ce_grouped,
)
from lyricalignment_tpu.train.schedule import make_optimizer


@dataclass(frozen=True)
class TrainConfig:
    head_lr: float = 5e-3
    backbone_lr: float = 5e-6
    weight_decay: float = 1e-5
    warmup_steps: int = 200
    total_steps: int = 2000
    max_grad_norm: float = 1.0
    accum_grad_steps: int = 8
    use_ctc: bool = False
    vocab_size: int = 21128          # BERT vocab; silence channel sits at this index
    remat: bool = False
    seed: int = 114514
    # memory knobs: whisper-medium + AdamW + f32 grad accumulation is ~71MB
    # over a 16G v5e HBM; bf16 accumulation (grads are averaged over 8
    # micro-steps anyway) and/or bf16 Adam mu buy back ~3GB
    grad_accum_dtype: Any = None     # None = f32; jnp.bfloat16 to halve accum
    adam_mu_dtype: Any = None        # None = f32; jnp.bfloat16 halves mu
    # fuse the 21129-class classifier into the align CE/CTC losses: the
    # [B, T, C] logit tensor (~254 MB per micro-batch at medium, plus its
    # gradient residuals) never reaches HBM — chunked-logsumexp normaliser
    # + label-column gathers, same trick as viterbi_align_fused
    fused_losses: bool = False
    # match AlignModelConfig.freeze_encoder: frozen encoder params carry NO
    # optimizer state (routed to optax.set_to_zero, like torch AdamW skipping
    # grad-less params — no update, no decoupled weight decay). Saves
    # ~6 B/param of mu/nu, which is what lets whisper-large train on one chip
    freeze_encoder: bool = False


@jax.tree_util.register_dataclass
@dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


def init_train_state(params: Dict, tcfg: TrainConfig) -> Tuple[TrainState, optax.GradientTransformation]:
    tx = make_optimizer(
        params,
        head_lr=tcfg.head_lr,
        backbone_lr=tcfg.backbone_lr,
        weight_decay=tcfg.weight_decay,
        warmup_steps=tcfg.warmup_steps,
        total_steps=tcfg.total_steps,
        max_grad_norm=tcfg.max_grad_norm,
        mu_dtype=tcfg.adam_mu_dtype,
        freeze_encoder=tcfg.freeze_encoder,
    )
    return TrainState(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32)), tx


def multitask_losses(
    params: Dict,
    mcfg: AlignModelConfig,
    tcfg: TrainConfig,
    batch: Dict[str, jnp.ndarray],
    dropout_rng: Optional[jax.Array],
    allow_transcript: bool = True,
    encode_fn=None,
    decode_fn=None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Loss composition of the reference's ``train_step`` body
    (`train_multitask.py:250-325`) on one fixed-shape batch.

    ``encode_fn`` / ``decode_fn`` optionally replace the encoder and the
    teacher-forced decoder (pipeline parallelism: ``parallel.pipeline
    .make_pipeline_encode_fn`` / ``make_pipeline_logits_fn``)."""
    fused = tcfg.fused_losses and mcfg.train_alignment
    align_out, trans_logits = forward_from_audio(
        params, mcfg, batch["audio"],
        y_in=batch["decoder_input"] if (mcfg.train_transcript and allow_transcript) else None,
        trim_to_input_length=False,
        dropout_rng=dropout_rng,
        remat=tcfg.remat,
        encode_fn=encode_fn,
        decode_fn=decode_fn,
        align_head_output="hidden" if fused else "logits",
    )

    align_mask = batch["has_alignment"]
    trans_mask = ~batch["has_alignment"]
    zero = jnp.zeros((), jnp.float32)

    align_ce = align_ctc = trans_ce = trans_ctc = zero
    if mcfg.train_alignment and fused:
        fc = params["align_head"]["fc"]
        align_ce = frame_ce_loss_grouped_fused(
            align_out, fc, batch["frame_labels"], align_mask,
            with_silence_head=tcfg.use_ctc, vocab_size=tcfg.vocab_size,
        )
        if tcfg.use_ctc:
            align_ctc = ctc_loss_grouped_fused(
                align_out, fc, batch["ctc_labels"], align_mask,
                vocab_size=tcfg.vocab_size,
            )
            if allow_transcript:
                trans_ctc = ctc_loss_grouped_fused(
                    align_out, fc, batch["ctc_labels"], trans_mask,
                    vocab_size=tcfg.vocab_size,
                )
    elif mcfg.train_alignment:
        align_ce = frame_ce_loss_grouped(
            align_out, batch["frame_labels"], align_mask,
            with_silence_head=tcfg.use_ctc, vocab_size=tcfg.vocab_size,
        )
        if tcfg.use_ctc:
            align_ctc = ctc_loss_grouped(
                align_out[:, :, : tcfg.vocab_size], batch["ctc_labels"], align_mask,
            )
            if allow_transcript:
                # the reference also applies CTC to transcript-only samples
                # (`train_multitask.py:312-315`)
                trans_ctc = ctc_loss_grouped(
                    align_out[:, :, : tcfg.vocab_size], batch["ctc_labels"], trans_mask,
                )

    if mcfg.train_transcript and allow_transcript and trans_logits is not None:
        # two group means, summed — matching the reference's separate
        # multitask/transcript F.cross_entropy calls (`:285,308`)
        trans_ce = (
            masked_ce_grouped(trans_logits, batch["decoder_output"], align_mask)
            + masked_ce_grouped(trans_logits, batch["decoder_output"], trans_mask)
        )

    total = align_ce + align_ctc + trans_ce + trans_ctc
    return total, {
        "total": total,
        "align_ce": align_ce,
        "align_ctc": align_ctc,
        "trans_ce": trans_ce,
        "trans_ctc": trans_ctc,
    }


def make_train_step(
    mcfg: AlignModelConfig,
    tcfg: TrainConfig,
    tx: optax.GradientTransformation,
    encode_fn=None,
    decode_fn=None,
) -> Callable:
    """Build the jitted update. Batch leaves are stacked [accum, B, ...].

    ``encode_fn`` / ``decode_fn`` optionally replace the encoder and the
    teacher-forced decoder in every microbatch — pass ``parallel.pipeline
    .make_pipeline_encode_fn(mesh, ...)`` / ``make_pipeline_logits_fn(mesh,
    ...)`` for a GPipe pipeline-parallel train step with both halves staged
    (gradients flow through the reverse pipeline schedule automatically)."""

    def train_step(state: TrainState, stacked: Dict[str, jnp.ndarray], rng: jax.Array):
        def micro(carry, xs):
            grad_acc, loss_acc = carry
            micro_batch, key = xs
            (loss, losses), grads = jax.value_and_grad(
                lambda p: multitask_losses(p, mcfg, tcfg, micro_batch, key,
                                           encode_fn=encode_fn,
                                           decode_fn=decode_fn),
                has_aux=True,
            )(state.params)
            grad_acc = jax.tree_util.tree_map(
                lambda a, g: a + g.astype(a.dtype), grad_acc, grads)
            loss_acc = jax.tree_util.tree_map(jnp.add, loss_acc, losses)
            return (grad_acc, loss_acc), None

        acc_dtype = tcfg.grad_accum_dtype
        def acc_zero(x):
            return jnp.zeros(x.shape, acc_dtype or x.dtype)
        grad0 = jax.tree_util.tree_map(acc_zero, state.params)
        loss0 = {k: jnp.zeros((), jnp.float32)
                 for k in ("total", "align_ce", "align_ctc", "trans_ce", "trans_ctc")}
        keys = jax.random.split(jax.random.fold_in(rng, state.step), tcfg.accum_grad_steps)

        (grads, losses), _ = jax.lax.scan(micro, (grad0, loss0), (stacked, keys))
        # mean over micro-steps: the reference backprops loss/accum per micro
        grads = jax.tree_util.tree_map(
            lambda g: (g / tcfg.accum_grad_steps).astype(jnp.float32), grads)
        losses = {k: v / tcfg.accum_grad_steps for k, v in losses.items()}

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(new_params, new_opt, state.step + 1), losses

    return jax.jit(train_step, donate_argnums=(0,))


def make_eval_step(mcfg: AlignModelConfig, tcfg: TrainConfig,
                   encode_fn=None, decode_fn=None) -> Callable:
    def eval_step(params: Dict, batch: Dict[str, jnp.ndarray]):
        _, losses = multitask_losses(params, mcfg, tcfg, batch,
                                     dropout_rng=None, encode_fn=encode_fn,
                                     decode_fn=decode_fn)
        return losses

    return jax.jit(eval_step)


def evaluate(eval_step: Callable, params: Dict, batches) -> Dict[str, float]:
    """Average eval losses over a loader (reference ``evaluate``,
    `train_multitask.py:345-458`)."""
    sums: Dict[str, float] = {}
    n = 0
    for batch in batches:
        losses = eval_step(params, batch.device_arrays())
        for k, v in losses.items():
            sums[k] = sums.get(k, 0.0) + float(v)
        n += 1
    return {k: v / max(n, 1) for k, v in sums.items()}


def stack_microbatches(batches) -> Dict[str, jnp.ndarray]:
    """accum list of MultitaskBatch -> leaves [accum, B, ...]."""
    import numpy as np

    arrays = [b.device_arrays() for b in batches]
    return {k: np.stack([a[k] for a in arrays]) for k in arrays[0]}
