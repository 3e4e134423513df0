"""Sequential A/B: fused classifier->loss training step vs unfused.

``TrainConfig.fused_losses`` folds the 21129-class alignment classifier
into the CE/CTC losses (chunked-logsumexp normaliser + label-column
gathers, backward rematerialised), so the [B, T, 21129] f32 logit tensor
(~254 MB per micro-batch at medium) and its gradient residuals never
reach HBM, and the CTC alpha recursion runs on reduced [T, blank+N]
emissions instead of optax's full-vocab path.

Arms run SEQUENTIALLY (each repeated twice back-to-back): one medium
train state + AdamW moments is ~2.3 GB and the 16 GB chip cannot hold two
at once (the alternating-arm variant of this script OOM'd). Minutes-apart
sequential pairs carry a little more tunnel drift than interleaved A/B —
treat small deltas as noise. Losses of the two arms are cross-checked
(same math, f32 reduction-order tolerance). Also reports a batch-4 x
accum-4 fused arm — the unfused recipe OOMs there without remat
(PARITY.md train-step ablation); the freed logit memory may unlock it.
"""

import dataclasses
import gc
import json
import os
import time

import numpy as np

MODEL = os.environ.get("BENCH_MODEL", "medium")
ITERS = int(os.environ.get("BENCH_ITERS", "6"))
SECONDS = float(os.environ.get("BENCH_SECONDS", "30"))


def main():
    import jax
    import jax.numpy as jnp

    from bench import _mcfg
    from lyricalignment_tpu.models.align_model import init_align_model
    from lyricalignment_tpu.train.trainer import (
        TrainConfig, init_train_state, make_train_step)

    assert jax.devices()[0].platform != "cpu", "needs the TPU"

    mcfg = dataclasses.replace(_mcfg(MODEL, inference=False),
                               train_transcript=True)
    rng = np.random.default_rng(0)
    n_samples = int(SECONDS * 16000)

    def make_stacked(accum, tb):
        return {
            "audio": jnp.asarray(rng.standard_normal(
                (accum, tb, n_samples)).astype(np.float32) * 0.05),
            "ctc_labels": jnp.asarray(np.pad(
                rng.integers(2, 400, (accum, tb, 24)).astype(np.int32),
                ((0, 0), (0, 0), (0, 24)), constant_values=-100)),
            "frame_labels": jnp.asarray(np.where(
                rng.random((accum, tb, 1500)) < 0.3,
                rng.integers(2, 400, (accum, tb, 1500)), -100).astype(np.int32)),
            "label_lengths": jnp.asarray(np.full((accum, tb), 24, np.int32)),
            "has_alignment": jnp.asarray(np.ones((accum, tb), bool)),
            "decoder_input": jnp.asarray(
                rng.integers(0, 51865, (accum, tb, 40)).astype(np.int32)),
            "decoder_output": jnp.asarray(
                rng.integers(0, 51865, (accum, tb, 40)).astype(np.int32)),
        }

    key = jax.random.PRNGKey(1)

    def measure(fused, accum, tb, stacked):
        """Build state -> warm step -> two timed runs -> free everything."""
        tcfg = TrainConfig(accum_grad_steps=accum, use_ctc=True,
                           vocab_size=21128, remat=False,
                           grad_accum_dtype=jnp.bfloat16,
                           adam_mu_dtype=jnp.bfloat16, fused_losses=fused)
        params = init_align_model(jax.random.PRNGKey(0), mcfg)
        state, tx = init_train_state(params, tcfg)
        del params  # donated into state on the first step anyway
        step_fn = make_train_step(mcfg, tcfg, tx)
        state, losses = step_fn(state, stacked, key)
        first = float(losses["total"])
        rates = []
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(ITERS):
                state, losses = step_fn(state, stacked, key)
            _ = float(losses["total"])
            rates.append(ITERS * accum * tb * SECONDS
                         / (time.perf_counter() - t0))
        del state, losses, step_fn
        gc.collect()
        return first, rates

    stacked = make_stacked(8, 2)
    first_u, rates_u = measure(False, 8, 2, stacked)
    first_f, rates_f = measure(True, 8, 2, stacked)

    # batch-4 x accum-4 fused arm (same 16 samples/step)
    del stacked
    gc.collect()
    b4 = None
    try:
        _, rates_b4 = measure(True, 4, 4, make_stacked(4, 4))
        b4 = float(np.mean(rates_b4))
    except Exception as e:  # ResourceExhausted etc.
        b4 = f"failed: {type(e).__name__}"

    print(json.dumps({
        "sweep": "fused_losses_ab", "model": MODEL,
        "audio_s_per_s": {"unfused": [round(v, 1) for v in rates_u],
                          "fused": [round(v, 1) for v in rates_f]},
        "speedup": round(np.mean(rates_f) / np.mean(rates_u), 4),
        "first_step_total_loss": {"unfused": round(first_u, 4),
                                  "fused": round(first_f, 4)},
        "fused_b4_accum4_audio_s_per_s": (round(b4, 1)
                                          if isinstance(b4, float) else b4),
    }))


if __name__ == "__main__":
    main()
