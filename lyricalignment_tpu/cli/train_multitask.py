"""Multitask training CLI.

Flag-compatible re-design of the reference's ``train_multitask.py`` CLI
(`train_multitask.py:29-143,635-730`): same data/model/training flags and
the same main-loop shape (initial eval -> N steps with grad accumulation ->
eval every ``--eval-steps`` -> best/last checkpoints), plus TPU-native
extras: ``--mesh-data/--mesh-model`` parallelism, ``--bf16`` compute,
``--remat`` activation checkpointing, and offline asset flags (see
``cli/common.py``).

Example:
    python -m lyricalignment_tpu.cli.train_multitask \
        --train-data train.json --dev-data dev.json \
        --whisper-model medium --train-alignment --train-transcript \
        --use-ctc-loss --bert-vocab vocab.txt --save-dir result
"""

from __future__ import annotations

import argparse
import os
import time

import jax

from lyricalignment_tpu.cli.common import (
    add_asset_args,
    build_model_config,
    build_tokenizers,
    init_params,
    set_seed,
)
from lyricalignment_tpu.data.pipeline import (
    MultitaskExampleBuilder,
    MultitaskLoader,
    PipelineConfig,
    infinite_batches,
)
from lyricalignment_tpu.data.records import read_many
from lyricalignment_tpu.parallel.mesh import make_mesh, shard_align_params
from lyricalignment_tpu.text.pinyin import load_pronunciation_table
from lyricalignment_tpu.train.checkpoints import (
    BestCheckpointPolicy,
    save_json,
)
from lyricalignment_tpu.train.trainer import (
    TrainConfig,
    evaluate,
    init_train_state,
    make_eval_step,
    make_train_step,
    stack_microbatches,
)


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--train-data", nargs="+", type=str, required=True)
    p.add_argument("--dev-data", nargs="+", type=str, required=True)
    p.add_argument("--whisper-model", default="medium",
                   choices=["tiny", "base", "small", "medium", "large",
                            "large-v2", "large-v3", "large-v3-turbo"])
    p.add_argument("--train-alignment", action="store_true")
    p.add_argument("--train-transcript", action="store_true")
    p.add_argument("--is-mixture", type=int, choices=[0, 1, 2], default=0)
    p.add_argument("--train-batch-size", type=int, default=2)
    p.add_argument("--dev-batch-size", type=int, default=8)
    p.add_argument("--accum-grad-steps", type=int, default=8)
    p.add_argument("--freeze-encoder", action="store_true")
    p.add_argument("--use-ctc-loss", action="store_true")
    p.add_argument("--lr", type=float, default=5e-3)
    p.add_argument("--backbone-lr", type=float, default=5e-6)
    p.add_argument("--max-grad-norm", type=float, default=1.0)
    p.add_argument("--train-steps", type=int, default=2000)
    p.add_argument("--eval-steps", type=int, default=200)
    p.add_argument("--warmup-steps", type=int, default=200)
    p.add_argument("--save-dir", type=str, default="result")
    p.add_argument("--save-all-checkpoints", action="store_true")
    p.add_argument("--seed", type=int, default=114514)
    # TPU-native extras. --mesh-data 0 (default) = single device; -1 = all
    # remaining devices on the data axis
    p.add_argument("--mesh-data", type=int, default=0)
    p.add_argument("--mesh-model", type=int, default=1)
    p.add_argument("--mesh-pipe", type=int, default=1,
                   help="GPipe pipeline stages over the model mesh axis — "
                        "encoder blocks, plus the teacher-forced decoder "
                        "blocks when training the transcript task "
                        "(exclusive with --mesh-model > 1; "
                        "encoder layers must divide evenly)")
    p.add_argument("--pipe-microbatches", type=int, default=2,
                   help="pipeline microbatches per data shard")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--fast-gelu", action="store_true",
                   help="tanh-approximate encoder GELU (error below "
                        "bf16 rounding); ~15%% faster encoder on TPU")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--bf16-grad-accum", action="store_true",
                   help="accumulate micro-batch grads in bf16 (fits medium "
                        "multitask + AdamW on one 16G chip)")
    p.add_argument("--bf16-adam-mu", action="store_true",
                   help="store Adam first moment in bf16")
    p.add_argument("--fused-losses", action="store_true",
                   help="fuse the 21129-class classifier into the align "
                        "CE/CTC losses (chunked-logsumexp normaliser + "
                        "label gathers): the [B,T,C] logit tensor never "
                        "reaches HBM; numerics pinned == unfused. +1%% "
                        "steady-state but a much larger one-time compile "
                        "(~20+ min remote vs ~4) — worth it for full "
                        "schedules, not smoke runs (PARITY.md)")
    p.add_argument("--max-label-len", type=int, default=128)
    p.add_argument("--max-decoder-len", type=int, default=160)
    p.add_argument("--log-every", type=int, default=1,
                   help="write metrics every N steps (device sync per write)")
    p.add_argument("--tensorboard", action="store_true",
                   help="also write TensorBoard scalars under save-dir/tb")
    p.add_argument("--profile-at-step", type=int, default=0,
                   help="capture a device profile (save-dir/profile) around "
                        "this train step (0 = off)")
    p.add_argument("--resume", type=str, default=None,
                   help="checkpoint dir (e.g. result/last_model) to resume "
                        "params+optimizer+step from; the LR schedule "
                        "continues where it left off (the reference restarts "
                        "it — SURVEY.md §5)")
    add_asset_args(p)
    return p.parse_args()


def main():
    args = parse_args()
    set_seed(args.seed)
    os.makedirs(args.save_dir, exist_ok=True)
    save_json(os.path.join(args.save_dir, "args.json"), vars(args))

    from lyricalignment_tpu.models.whisper import WHISPER_CONFIGS
    from lyricalignment_tpu.text.whisper_tokenizer import num_languages_for_vocab

    bert, whisper_tok = build_tokenizers(
        args, num_languages=num_languages_for_vocab(
            WHISPER_CONFIGS[args.whisper_model].n_vocab))
    table = load_pronunciation_table()

    output_dim = len(bert) + int(args.use_ctc_loss)
    mcfg = build_model_config(
        args.whisper_model, output_dim=output_dim, use_bf16=args.bf16,
        freeze_encoder=args.freeze_encoder,
        train_alignment=args.train_alignment,
        train_transcript=args.train_transcript,
        fast_gelu=args.fast_gelu,
    )
    model_args = {
        "embed_dim": mcfg.whisper.n_audio_state,
        "hidden_dim": mcfg.hidden_dim,
        "output_dim": output_dim,
        "bidirectional": True,
        "freeze_encoder": args.freeze_encoder,
        "train_alignment": args.train_alignment,
        "train_transcript": args.train_transcript,
    }
    print(model_args)
    save_json(os.path.join(args.save_dir, "model_args.json"), model_args)

    tcfg = TrainConfig(
        head_lr=args.lr, backbone_lr=args.backbone_lr,
        warmup_steps=args.warmup_steps, total_steps=args.train_steps,
        max_grad_norm=args.max_grad_norm,
        accum_grad_steps=args.accum_grad_steps,
        use_ctc=args.use_ctc_loss, vocab_size=len(bert),
        remat=args.remat, seed=args.seed,
        grad_accum_dtype=jax.numpy.bfloat16 if args.bf16_grad_accum else None,
        adam_mu_dtype=jax.numpy.bfloat16 if args.bf16_adam_mu else None,
        fused_losses=args.fused_losses,
        freeze_encoder=args.freeze_encoder,
    )

    pcfg_train = PipelineConfig(
        batch_size=args.train_batch_size, use_ctc=args.use_ctc_loss,
        audio_type=args.is_mixture, max_label_len=args.max_label_len,
        max_decoder_len=args.max_decoder_len,
    )
    pcfg_dev = PipelineConfig(
        batch_size=args.dev_batch_size, use_ctc=args.use_ctc_loss,
        audio_type=args.is_mixture, max_label_len=args.max_label_len,
        max_decoder_len=args.max_decoder_len, drop_remainder=False,
    )
    builder_train = MultitaskExampleBuilder(bert, whisper_tok, table, pcfg_train)
    builder_dev = MultitaskExampleBuilder(bert, whisper_tok, table, pcfg_dev)
    train_loader = MultitaskLoader(
        read_many(*args.train_data), builder_train, shuffle=True, seed=args.seed)
    dev_loader = MultitaskLoader(read_many(*args.dev_data), builder_dev)

    params = init_params(args, mcfg, args.seed)
    if args.freeze_encoder and args.bf16:
        # a frozen encoder never updates (optax.set_to_zero group), so its
        # params can live bf16 like the inference path — numerics-identical
        # under bf16 compute's per-op cast and ~1.3 GB less HBM at large
        # (the difference between fitting and OOM on one 16 GB chip)
        from lyricalignment_tpu.models.whisper import bf16_resident_params

        params["whisper"]["encoder"] = bf16_resident_params(
            params["whisper"]["encoder"])
    mesh = None
    encode_fn = None
    decode_fn = None
    if args.mesh_pipe > 1 and args.mesh_model > 1:
        raise SystemExit("--mesh-pipe and --mesh-model both use the model "
                         "mesh axis; pick one")
    if args.mesh_data != 0 or args.mesh_model > 1 or args.mesh_pipe > 1:
        mesh = make_mesh(data=args.mesh_data,
                         model=max(args.mesh_model, args.mesh_pipe))
        params = shard_align_params(params, mesh, tp=args.mesh_model > 1)
        print(f"mesh: {dict(mesh.shape)}")
        if args.mesh_pipe > 1:
            from lyricalignment_tpu.parallel.pipeline import (
                make_pipeline_encode_fn,
                make_pipeline_logits_fn,
            )

            encode_fn = make_pipeline_encode_fn(
                mesh, n_micro=args.pipe_microbatches)
            staged = "encoder"
            if mcfg.train_transcript:
                # stage the teacher-forced decoder too (whisper models keep
                # n_text_layer == n_audio_layer, so divisibility matches)
                decode_fn = make_pipeline_logits_fn(
                    mesh, n_micro=args.pipe_microbatches)
                staged = "encoder+decoder"
            print(f"pipeline-parallel {staged}: {args.mesh_pipe} stages x "
                  f"{args.pipe_microbatches} microbatches")

    state, tx = init_train_state(params, tcfg)
    start_step = 0
    if args.resume:
        from lyricalignment_tpu.train.checkpoints import restore_pytree
        from lyricalignment_tpu.train.trainer import TrainState
        import jax.numpy as jnp

        # template restore keeps the optimizer-state NamedTuple structure
        template = {"params": state.params, "opt_state": state.opt_state,
                    "step": state.step}
        tree = restore_pytree(args.resume, template)
        state = TrainState(params=tree["params"], opt_state=tree["opt_state"],
                           step=jnp.asarray(tree["step"], jnp.int32))
        start_step = int(tree["step"])
        print(f"resumed from {args.resume} at step {start_step}")
    train_step = make_train_step(mcfg, tcfg, tx, encode_fn=encode_fn,
                                 decode_fn=decode_fn)
    eval_step = make_eval_step(mcfg, tcfg, encode_fn=encode_fn,
                               decode_fn=decode_fn)

    def run_eval():
        return evaluate(eval_step, state.params, dev_loader)

    init_losses = run_eval()
    print(f"Initial loss: {init_losses['total']:.4f}, "
          f"align CE: {init_losses['align_ce']:.4f}, "
          f"align CTC: {init_losses['align_ctc']:.4f}, "
          f"transcript: {init_losses['trans_ce']:.4f}, "
          f"transcript CTC: {init_losses['trans_ctc']:.4f}")
    policy = BestCheckpointPolicy(args.save_dir, init_losses)

    from lyricalignment_tpu.utils.observability import MetricLogger, profile_session, trace

    metrics = MetricLogger(args.save_dir, tensorboard=args.tensorboard)
    rng = jax.random.PRNGKey(args.seed)
    train_iter = infinite_batches(train_loader)
    avg = {k: 0.0 for k in init_losses}
    t_start = time.time()
    profiling = None

    for step in range(start_step + 1, args.train_steps + 1):
        if args.profile_at_step and step == args.profile_at_step:
            profiling = profile_session(os.path.join(args.save_dir, "profile"))
            profiling.__enter__()
        with trace("data"):
            micro = [next(train_iter) for _ in range(args.accum_grad_steps)]
            stacked = stack_microbatches(micro)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            sharding = NamedSharding(mesh, P(None, "data"))
            stacked = {k: jax.device_put(v, sharding) for k, v in stacked.items()}
        with trace("train_step"):
            state, losses = train_step(state, stacked, rng)
        if profiling is not None and step >= args.profile_at_step:
            jax.tree_util.tree_map(lambda x: x.block_until_ready(), losses)
            profiling.__exit__(None, None, None)
            profiling = None
        if step % args.log_every == 0:
            metrics.log(step, {k: float(v) for k, v in losses.items()})
        for k in avg:
            avg[k] += float(losses[k])

        if step % args.eval_steps == 0:
            eval_losses = run_eval()
            n = args.eval_steps
            print(f"Step {step}: valid loss={eval_losses['total']:.4f} "
                  f"align_ce={eval_losses['align_ce']:.4f} "
                  f"align_ctc={eval_losses['align_ctc']:.4f} "
                  f"trans_ce={eval_losses['trans_ce']:.4f} "
                  f"trans_ctc={eval_losses['trans_ctc']:.4f} | "
                  f"train loss={avg['total']/n:.4f} "
                  f"({(time.time()-t_start)/step:.2f}s/step)")
            avg = {k: 0.0 for k in avg}
            saved = policy.update(
                eval_losses, state.params, step,
                save_all=args.save_all_checkpoints,
                full_state={"params": state.params, "opt_state": state.opt_state,
                            "step": state.step},
            )
            for name, fired in saved.items():
                if fired:
                    print(f"Saving The {name} model")

    policy.close()  # wait for the in-flight async checkpoint write
    print(f"done in {time.time()-t_start:.1f}s")


if __name__ == "__main__":
    main()
