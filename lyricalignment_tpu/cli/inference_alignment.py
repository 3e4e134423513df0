"""Alignment evaluation CLI: forced-align test data, report MAE.

Re-design of the reference's ``inference_alignment.py`` (`:126-214`):
loads a trained model dir, runs the frame head on each sample, Viterbi
forced alignment (CE or CTC emissions), and averages MAE over batches.

TPU notes: audio lengths are bucketed (``--bucket-seconds``) so the jitted
forward compiles once per bucket instead of per unique length; the Viterbi
is masked to each sample's true frame count (round(mel_len / 2), the
reference's ``get_orig_len=True`` trim at `module/align_model.py:88-92`),
and the GRU recurrences are masked to the same count — logits at valid
frames are numerically identical to the reference's exact per-sample trim
despite the padded batch shapes.
"""

from __future__ import annotations

import argparse
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from lyricalignment_tpu import HOP_LENGTH, N_SAMPLES
from lyricalignment_tpu.cli.common import add_asset_args, build_tokenizers, load_model_dir, set_seed
from lyricalignment_tpu.data.audio_io import load_audio_file
from lyricalignment_tpu.data.records import read_data
from lyricalignment_tpu.models.align_model import forward_from_audio
from lyricalignment_tpu.ops.viterbi import (
    frames_to_seconds,
    viterbi_align,
    viterbi_align_fused,
)
from lyricalignment_tpu.text.pinyin import load_pronunciation_table
from lyricalignment_tpu.utils.metrics import mae


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-f", "--test-data", type=str, required=True)
    p.add_argument("--model-dir", type=str, required=True)
    p.add_argument("--model-name", default="best",
                   choices=["best", "best_align", "best_trans", "last"])
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--is-mixture", type=int, choices=[0, 1, 2], default=0)
    p.add_argument("--use-ctc-loss", action="store_true")
    p.add_argument("--seed", type=int, default=114514)
    p.add_argument("--bucket-seconds", type=float, default=5.0)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--fast-gelu", action="store_true",
                   help="tanh-approximate encoder GELU (error below "
                        "bf16 rounding); ~15%% faster encoder on TPU")
    p.add_argument("--int8-encoder", action="store_true",
                   help="W8A8 dynamic int8 encoder matmuls (v5e int8 MXU; "
                        "~1%% relative quantization error, inference only)")
    p.add_argument("--max-label-len", type=int, default=128)
    p.add_argument("--no-fused-align", action="store_true",
                   help="materialise the full [B, T, 21129] logits instead "
                        "of the fused classifier->Viterbi emission path")
    p.add_argument("--mesh-data", type=int, default=0,
                   help="shard inference batches over N chips (data "
                        "parallel; 0 = single device). batch-size must be "
                        "divisible by N")
    p.add_argument("--mesh-model", type=int, default=1,
                   help="tensor-shard the whisper backbone over N chips "
                        "(Megatron TP; combine with --mesh-data)")
    p.add_argument("--mesh-pipe", type=int, default=1,
                   help="GPipe-stage the encoder over N chips (exclusive "
                        "with --mesh-model; encoder layers must divide N)")
    add_asset_args(p)
    return p.parse_args()


def bucket_samples(n_samples: int, bucket_seconds: float) -> int:
    """Round audio length up to a bucket so jit compiles once per bucket.
    Above 30 s, buckets are whole 30 s windows (the chunked encoder path,
    reference `module/align_model.py:94-105`)."""
    bucket = max(1, int(round(bucket_seconds * 16000)))
    if n_samples > N_SAMPLES:
        return math.ceil(n_samples / N_SAMPLES) * N_SAMPLES
    return min(max(bucket, math.ceil(n_samples / bucket) * bucket), N_SAMPLES)


# Memoized per-configuration inference setup: repeated align_records calls
# (every serve batch, every LyricAligner.align) must reuse ONE jit wrapper so
# the compile cache hits — a fresh @jax.jit per call retraces the encoder,
# which costs 1-5 min per shape on the remote TPU tunnel.
_FORWARD_SETUP_CACHE: dict = {}


def _forward_setup(mcfg, head_output, batch_size, mesh_data, mesh_model,
                   mesh_pipe):
    """Return (forward, mesh, data_sharding, shard_params) for a config.

    ``shard_params`` re-places the (possibly new) params on the cached mesh;
    the jitted ``forward`` itself is shared across calls.
    """
    key = (mcfg, head_output, batch_size, mesh_data, mesh_model, mesh_pipe)
    hit = _FORWARD_SETUP_CACHE.get(key)
    if hit is not None:
        return hit

    mesh = None
    encode_fn = None
    data_sharding = None
    shard_params = lambda p: p
    if (mesh_data or mesh_model > 1 or mesh_pipe > 1) \
            and mcfg.whisper.onepass_encoder:
        # multi-chip runs keep the GSPMD-validated flash path; the pad-once
        # pallas kernel is single-device (see WhisperConfig.onepass_encoder)
        import dataclasses as _dc

        mcfg = _dc.replace(
            mcfg, whisper=_dc.replace(mcfg.whisper, onepass_encoder=False))
    if mesh_pipe > 1 and mesh_model > 1:
        raise SystemExit("--mesh-pipe and --mesh-model both use the model "
                         "mesh axis; pick one")
    if mesh_data or mesh_model > 1 or mesh_pipe > 1:
        from lyricalignment_tpu.parallel.mesh import (
            batch_sharding,
            make_mesh,
            shard_align_params,
        )

        model_size = max(mesh_model, mesh_pipe)
        n_dev = (mesh_data or (len(jax.devices()) // model_size)) * model_size
        mesh = make_mesh(data=mesh_data or -1, model=model_size,
                         devices=jax.devices()[:n_dev])
        if batch_size % mesh.shape["data"]:
            raise SystemExit(
                f"--batch-size {batch_size} not divisible by the data axis "
                f"({mesh.shape['data']})")
        shard_params = lambda p: shard_align_params(p, mesh, tp=mesh_model > 1)
        data_sharding = batch_sharding(mesh)
        if mesh_pipe > 1:
            # GPipe-staged encoder: each chip holds 1/N of the layers. The
            # microbatch count must divide the per-data-shard batch; prefer
            # 2 (pipeline overlap), fall back to 1 for odd local batches.
            from lyricalignment_tpu.parallel.pipeline import make_pipeline_encode_fn

            b_local = batch_size // mesh.shape["data"]
            encode_fn = make_pipeline_encode_fn(
                mesh, n_micro=2 if b_local % 2 == 0 else 1)

    @jax.jit
    def forward(params, audio, frame_lengths, mel_lengths):
        out, _ = forward_from_audio(params, mcfg, audio,
                                    trim_to_input_length=True,
                                    frame_lengths=frame_lengths,
                                    mel_lengths=mel_lengths,
                                    align_head_output=head_output,
                                    encode_fn=encode_fn)
        return out

    setup = (forward, mesh, data_sharding, shard_params)
    _FORWARD_SETUP_CACHE[key] = setup
    return setup


def align_records(records, params, mcfg, table, bert, args):
    """Yield (record, [[on, off], ...]) in input order.

    Records are grouped by length bucket (one jit compile per bucket) and
    processed ``batch_size`` at a time within a bucket — the reference
    aligns one record per step (`inference_alignment.py:145-166`); here a
    whole batch shares one device round-trip. Batches are padded to the
    next power of two up to the static ``batch_size`` (pad rows dropped
    after Viterbi), bounding compile shapes to a handful per length bucket
    under continuous batching while one-shot ``align()`` calls run B=1
    instead of paying ``batch_size`` rows. Mesh runs always pad to the full
    ``batch_size`` so data shards stay equal-sized.
    """
    from lyricalignment_tpu.data.audio_io import audio_num_samples_16k

    mode = "ctc" if args.use_ctc_loss else "ce"
    batch_size = max(1, getattr(args, "batch_size", 1))

    # fused path: forward returns the pre-classifier hidden and the Viterbi
    # computes emissions chunk-wise from the fc weights, so the
    # [B, T, 21129] logits never hit HBM (--no-fused-align restores the
    # materialised-logits path)
    fused = not getattr(args, "no_fused_align", False)
    head_output = "hidden" if fused else "logits"

    # optional multi-chip inference: batches sharded over the data axis,
    # backbone optionally tensor-sharded; XLA inserts the ICI collectives
    forward, mesh, data_sharding, shard_params = _forward_setup(
        mcfg, head_output, batch_size,
        getattr(args, "mesh_data", 0), getattr(args, "mesh_model", 1),
        getattr(args, "mesh_pipe", 1))
    params = shard_params(params)

    # group indices by bucketed length (header-only peek, no decode)
    buckets = {}
    for i, r in enumerate(records):
        n = audio_num_samples_16k(r.audio_path)
        buckets.setdefault(bucket_samples(n, args.bucket_seconds), []).append(i)

    results = {}
    for padded_len in sorted(buckets):
        idxs = buckets[padded_len]
        for start in range(0, len(idxs), batch_size):
            group = idxs[start: start + batch_size]
            # pad rows are dropped after viterbi; under a mesh the full
            # static size keeps shards equal, otherwise the next power of
            # two keeps the jit cache bounded ({1,2,4,...,batch_size} per
            # bucket) without charging one-shot calls batch_size rows
            if mesh is not None:
                B = batch_size
            else:
                B = 1
                while B < len(group):
                    B *= 2
                B = min(B, batch_size)
            a = np.zeros((B, padded_len), np.float32)
            labels = np.zeros((B, args.max_label_len), np.int32)
            lens = np.ones((B,), np.int32)
            frames = np.ones((B,), np.int32)
            mel_lens = np.ones((B,), np.int32)
            for j, i in enumerate(group):
                audio = load_audio_file(records[i].audio_path, args.is_mixture)["speech"]
                n = min(len(audio), padded_len)
                a[j, :n] = audio[:n]
                classes = table.map_tokens(np.asarray(
                    bert.encode(records[i].text, add_special_tokens=False), np.int32))
                L = min(len(classes), args.max_label_len)
                labels[j, :L] = classes[:L]
                lens[j] = L
                mel_lens[j] = n // HOP_LENGTH
                frames[j] = int(round(mel_lens[j] / 2.0))

            audio_dev = jnp.asarray(a)
            frames_dev = jnp.asarray(frames)
            mel_dev = jnp.asarray(mel_lens)
            if mesh is not None:
                audio_dev = jax.device_put(audio_dev, data_sharding)
                frames_dev = jax.device_put(frames_dev, data_sharding)
                mel_dev = jax.device_put(mel_dev, data_sharding)
            out = forward(params, audio_dev, frames_dev, mel_dev)
            frames = np.minimum(frames, out.shape[1])
            if fused:
                on, off = viterbi_align_fused(
                    out, params["align_head"]["fc"], jnp.asarray(labels),
                    jnp.asarray(lens), jnp.asarray(frames), mode=mode,
                )
            else:
                on, off = viterbi_align(
                    out, jnp.asarray(labels), jnp.asarray(lens),
                    jnp.asarray(frames), mode=mode,
                )
            sec = np.asarray(frames_to_seconds(on, off))
            for j, i in enumerate(group):
                L = int(lens[j])
                results[i] = [[float(s), float(e)] for s, e in sec[j, :L]]

    for i, record in enumerate(records):
        yield record, results[i]


def main():
    args = parse_args()
    set_seed(args.seed)
    assert os.path.exists(args.model_dir)
    assert os.path.exists(args.test_data)

    mcfg, params, _ = load_model_dir(args.model_dir, args.model_name, use_bf16=args.bf16, fast_gelu=args.fast_gelu, int8_encoder=args.int8_encoder)
    bert, _ = build_tokenizers(args)
    table = load_pronunciation_table()
    records = [r for r in read_data(args.test_data)]

    total_mae = 0.0
    cnt = 0
    for record, segments in align_records(records, params, mcfg, table, bert, args):
        if record.lyric_onset_offset is None:
            continue  # reference skips samples without ground truth (:156-157)
        sample_mae = mae([record.lyric_onset_offset], [segments])
        total_mae += sample_mae
        cnt += 1
        print(f"{os.path.basename(record.audio_path)}: MAE={sample_mae:.4f}")

    avg_mae = total_mae / max(cnt, 1)
    print("Average MAE:", avg_mae)
    return avg_mae


if __name__ == "__main__":
    main()
