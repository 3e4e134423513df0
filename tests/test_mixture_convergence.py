"""Mixture-fixture convergence: train-to-MAE through the FULL offline prep
path (VERDICT r03 next #7; BASELINE config 4's intent — reference
`dataset_preprocessing/mix_with_musdb.py:22-100` + `replace_path.py`).

The chain this gates end-to-end:

  synthetic 44.1 kHz tone-syllable "vocals" + accompaniment "songs"
  -> prep.mix_with_musdb.main  (SNR-0 energy-matched mixing, the real CLI)
  -> prep.replace_path.main    (song_path injection, the real CLI)
  -> data.records.read_data    (dataset JSON -> Records)
  -> data.audio_io.load_audio_file  (44.1k -> 16k polyphase resample
     through the loader path; the mixer writes mono, so audio_type=0)
  -> data.frames.rasterize_frame_labels -> jitted trainer -> Viterbi -> MAE

Unlike tests/test_convergence.py (clean vocals synthesized directly at
16 kHz in memory), every sample here went through PCM16 wav round-trips,
SNR mixing against a structured accompaniment (sub-200 Hz drone + shaped
noise + 3 kHz shimmer — spectrally distinct from but concurrent with the
220-1760 Hz syllable tones), and the resampler. A regression anywhere in
that chain (mixer energy matching, resampler, loader channel semantics,
rasterizer timing) degrades the trained MAE and fails the pinned bound.
"""

import json
import os

import pytest

pytestmark = pytest.mark.slow  # multi-minute on the 1-core host

import jax
import jax.numpy as jnp
import numpy as np

from lyricalignment_tpu.data.audio_io import load_audio_file, write_wav
from lyricalignment_tpu.data.frames import rasterize_frame_labels
from lyricalignment_tpu.data.records import read_data
from lyricalignment_tpu.models.align_model import (
    AlignModelConfig,
    forward_from_audio,
    init_align_model,
)
from lyricalignment_tpu.models.whisper import WhisperConfig
from lyricalignment_tpu.ops.viterbi import frames_to_seconds, viterbi_align
from lyricalignment_tpu.prep import mix_with_musdb, replace_path
from lyricalignment_tpu.train.trainer import (
    TrainConfig,
    init_train_state,
    make_train_step,
)
from lyricalignment_tpu.utils.metrics import mae

SR_SRC = 44100  # prep runs at the MUSDB/Opencpop rate, like the reference
FREQS = {1: 220.0, 2: 440.0, 3: 880.0, 4: 1760.0}
VOCAB = 6


def _make_vocal(rng, n_syll=5):
    """8 s tone-syllable 'vocal' at 44.1 kHz with known char timings."""
    labels, onoff = [], []
    audio = np.zeros(8 * SR_SRC, np.float32)
    t = 0.3
    for _ in range(n_syll):
        c = int(rng.integers(1, 5))
        s, e = int(t * SR_SRC), int((t + 0.4) * SR_SRC)
        audio[s:e] = 0.4 * np.sin(
            2 * np.pi * FREQS[c] * np.arange(e - s) / SR_SRC)
        labels.append(c)
        onoff.append([t, t + 0.4])
        t += 0.65
    return audio, labels, onoff


def _make_accompaniment(rng, seconds=30.0):
    """Structured 'song': 130 Hz drone + low-passed noise + 3 kHz shimmer.

    Spectrally distinct from the 220-1760 Hz syllable tones (so the task
    stays learnable by a frozen random encoder at SNR 0) but temporally
    concurrent with every syllable — silence-gap cheating is impossible.
    """
    n = int(seconds * SR_SRC)
    t = np.arange(n) / SR_SRC
    drone = 0.5 * np.sin(2 * np.pi * 130.8 * t) + 0.3 * np.sin(2 * np.pi * 65.4 * t)
    noise = rng.standard_normal(n).astype(np.float32)
    # crude low-pass: cumulative mean over a 64-sample window
    kernel = np.ones(64, np.float32) / 64.0
    noise = np.convolve(noise, kernel, mode="same")
    shimmer = 0.15 * np.sin(2 * np.pi * 3000.0 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 2.0 * t))
    return (drone + 2.0 * noise + shimmer).astype(np.float32)


@pytest.fixture(scope="module")
def mixture_dataset(tmp_path_factory):
    """Run the REAL prep CLIs over synthetic sources; return (json, clips)."""
    root = tmp_path_factory.mktemp("mixfix")
    vocal_dir, mix_dir, musdb_dir = (root / "vocals", root / "mix",
                                     root / "musdb")
    vocal_dir.mkdir(), mix_dir.mkdir(), musdb_dir.mkdir()

    rng = np.random.default_rng(0)
    clips = []
    entries = []
    for i in range(6):
        audio, labels, onoff = _make_vocal(rng)
        name = f"{i:04d}.wav"
        write_wav(str(vocal_dir / name), audio, SR_SRC)
        clips.append((labels, onoff))
        entries.append({
            "song_id": name,
            "lyric": "".join(str(c) for c in labels),
            "on_offset": onoff,
        })
    for j in range(2):
        song_dir = musdb_dir / f"song{j}"
        song_dir.mkdir()
        write_wav(str(song_dir / "accompaniment.wav"),
                  _make_accompaniment(np.random.default_rng(100 + j)), SR_SRC)

    # the real prep CLI entry points (reference call shape)
    mix_with_musdb.main([str(vocal_dir), str(mix_dir), str(musdb_dir), "0"])

    raw_json = root / "dataset_raw.json"
    final_json = root / "dataset.json"
    with open(raw_json, "w", encoding="utf-8") as f:
        json.dump(entries, f)
    replace_path.main([str(raw_json), str(final_json), str(mix_dir)])
    return str(final_json), clips


def test_prep_chain_produces_loadable_mixtures(mixture_dataset):
    final_json, clips = mixture_dataset
    records = read_data(final_json)
    assert len(records) == 6
    for rec, (labels, onoff) in zip(records, clips):
        assert os.path.exists(rec.audio_path)
        out = load_audio_file(rec.audio_path, audio_type=0)
        audio = out["speech"]
        assert out["sampling_rate"] == 16000
        assert abs(len(audio) / 16000 - 8.0) < 0.01
        # accompaniment is present: the inter-syllable gaps are NOT silent
        gap = audio[int(0.05 * 16000): int(0.25 * 16000)]
        assert float(np.mean(gap ** 2)) > 1e-4, "mixture lost accompaniment"
        assert rec.text == "".join(str(c) for c in labels)


def test_mixture_convergence_to_pinned_mae(mixture_dataset):
    """CE recipe (frozen random encoder) on SNR-0 mixtures must still train
    to tight MAE — the clean-vocal twin (test_convergence.py) lands ~0.01 s;
    the mixture bound allows the SNR-0 masking penalty with margin."""
    final_json, clips = mixture_dataset
    records = read_data(final_json)
    audios = []
    for rec in records:
        audio = load_audio_file(rec.audio_path, audio_type=0)["speech"]
        buf = np.zeros(480000, np.float32)
        buf[: len(audio)] = audio
        audios.append(buf)

    mcfg = AlignModelConfig(
        whisper=WhisperConfig(n_audio_state=64, n_audio_head=4, n_audio_layer=2,
                              n_text_state=64, n_text_head=4, n_text_layer=1,
                              n_vocab=32),
        hidden_dim=32, output_dim=VOCAB,
        dropout=0.0, freeze_encoder=True,
        train_alignment=True, train_transcript=False,
    )
    tcfg = TrainConfig(accum_grad_steps=1, use_ctc=False, vocab_size=VOCAB,
                       total_steps=1000, warmup_steps=20, head_lr=2e-3)
    params = init_align_model(jax.random.PRNGKey(0), mcfg)
    state, tx = init_train_state(params, tcfg)
    step_fn = make_train_step(mcfg, tcfg, tx)

    rng = np.random.default_rng(1)

    def make_batch(idx):
        b = {"audio": np.zeros((len(idx), 480000), np.float32),
             "ctc_labels": np.full((len(idx), 8), -100, np.int32),
             "frame_labels": np.zeros((len(idx), 1500), np.int32),
             "label_lengths": np.zeros((len(idx),), np.int32),
             "has_alignment": np.ones((len(idx),), bool),
             "decoder_input": np.zeros((len(idx), 4), np.int32),
             "decoder_output": np.full((len(idx), 4), -100, np.int32)}
        for j, i in enumerate(idx):
            labels, onoff = clips[i]
            b["audio"][j] = audios[i]
            b["frame_labels"][j] = rasterize_frame_labels(
                np.array(labels), onoff, use_ctc=False, total_frames=1500)
        return {k: jnp.asarray(v[None]) for k, v in b.items()}

    key = jax.random.PRNGKey(1)
    first_loss = None
    for step in range(200):
        idx = list(rng.choice(len(records), size=2, replace=False))
        state, losses = step_fn(state, make_batch(idx), key)
        if first_loss is None:
            first_loss = float(losses["align_ce"])
    final_loss = float(losses["align_ce"])
    assert final_loss < first_loss * 0.25, (
        f"align_ce on mixtures: {first_loss} -> {final_loss}")

    total = 0.0
    for (labels, onoff), audio in zip(clips, audios):
        logits, _ = forward_from_audio(state.params, mcfg,
                                       jnp.asarray(audio[None]),
                                       trim_to_input_length=False)
        L = len(labels)
        lab = np.zeros((1, 8), np.int32)
        lab[0, :L] = labels
        on, off = viterbi_align(logits, jnp.asarray(lab),
                                jnp.asarray([L], jnp.int32),
                                jnp.asarray([400], jnp.int32), mode="ce")
        on, off = np.asarray(on)[0, :L], np.asarray(off)[0, :L]
        assert (off >= on).all() and (on >= 0).all()
        sec = np.asarray(frames_to_seconds(jnp.asarray(on[None]),
                                           jnp.asarray(off[None])))[0]
        total += mae([onoff], [sec.tolist()])
    avg = total / len(records)
    # clean-vocal twin converges to ~0.012 s; SNR-0 mixtures through the
    # full prep chain are pinned with masking margin
    assert avg < 0.15, f"mixture training did not converge: MAE={avg:.3f}s"
