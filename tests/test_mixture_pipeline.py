"""MIR-1k / separation-config integration test (BASELINE config 4 shape).

Fixture-level version of the reference's polyphonic chain
(`dataset_preprocessing/readme.md:31-89`): clean tone "vocals" are mixed
with noise "accompaniment" through the real MUSDB mixer
(`prep/mix_with_musdb.py`), MIR-1k-style stereo files exercise the
``is_mixture`` audio_type routing (channel 1 = vocal stem, average =
mixture), and a tiny trained aligner shows the paper's headline effect:
alignment on the vocal stem beats alignment on the mixture.
"""

import pytest

pytestmark = pytest.mark.slow  # multi-minute on the 1-core host (see CLAUDE.md test lanes)

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_convergence import VOCAB, make_clip

from lyricalignment_tpu.data.audio_io import load_audio_file, write_wav
from lyricalignment_tpu.data.frames import rasterize_frame_labels
from lyricalignment_tpu.models.align_model import (
    AlignModelConfig,
    forward_from_audio,
    init_align_model,
)
from lyricalignment_tpu.models.whisper import WhisperConfig
from lyricalignment_tpu.ops.viterbi import frames_to_seconds, viterbi_align
from lyricalignment_tpu.prep.mix_with_musdb import main as mix_main
from lyricalignment_tpu.train.trainer import TrainConfig, init_train_state, make_train_step
from lyricalignment_tpu.utils.metrics import mae

SR = 16000


def train_tiny_aligner(clips, steps=150):
    mcfg = AlignModelConfig(
        whisper=WhisperConfig(n_audio_state=64, n_audio_head=4, n_audio_layer=2,
                              n_text_state=64, n_text_head=4, n_text_layer=1,
                              n_vocab=32),
        hidden_dim=32, output_dim=VOCAB, dropout=0.0, freeze_encoder=True,
        train_alignment=True, train_transcript=False,
    )
    tcfg = TrainConfig(accum_grad_steps=1, use_ctc=False, vocab_size=VOCAB,
                       total_steps=1000, warmup_steps=20, head_lr=2e-3)
    params = init_align_model(jax.random.PRNGKey(0), mcfg)
    state, tx = init_train_state(params, tcfg)
    step_fn = make_train_step(mcfg, tcfg, tx)
    rng = np.random.default_rng(7)

    def make_batch(idx):
        b = {"audio": np.zeros((len(idx), 480000), np.float32),
             "ctc_labels": np.full((len(idx), 8), -100, np.int32),
             "frame_labels": np.zeros((len(idx), 1500), np.int32),
             "label_lengths": np.zeros((len(idx),), np.int32),
             "has_alignment": np.ones((len(idx),), bool),
             "decoder_input": np.zeros((len(idx), 4), np.int32),
             "decoder_output": np.full((len(idx), 4), -100, np.int32)}
        for j, i in enumerate(idx):
            a, lab, onoff = clips[i]
            b["audio"][j, : len(a)] = a
            b["frame_labels"][j] = rasterize_frame_labels(
                np.array(lab), onoff, use_ctc=False, total_frames=1500)
        return {k: jnp.asarray(v[None]) for k, v in b.items()}

    key = jax.random.PRNGKey(1)
    for _ in range(steps):
        idx = list(rng.choice(len(clips), size=2, replace=False))
        state, _ = step_fn(state, make_batch(idx), key)
    return mcfg, state.params


def align_mae(params, mcfg, audio, lab, onoff):
    buf = np.zeros((1, 480000), np.float32)
    buf[0, : len(audio)] = audio[:480000]
    logits, _ = forward_from_audio(params, mcfg, jnp.asarray(buf),
                                   trim_to_input_length=False)
    L = len(lab)
    labels = np.zeros((1, 8), np.int32)
    labels[0, :L] = lab
    on, off = viterbi_align(logits, jnp.asarray(labels),
                            jnp.asarray([L], jnp.int32),
                            jnp.asarray([400], jnp.int32), mode="ce")
    sec = np.asarray(frames_to_seconds(on, off))[0, :L]
    return float(mae([onoff], [sec.tolist()]))


@pytest.mark.slow
def test_mixture_chain_and_vocal_stem_advantage(tmp_path):
    rng = np.random.default_rng(0)
    clips = [make_clip(rng) for _ in range(4)]
    mcfg, params = train_tiny_aligner(clips)

    # sanity: the tiny model aligns clean stems
    clean = [align_mae(params, mcfg, a, lab, onoff) for a, lab, onoff in clips]
    assert np.mean(clean) < 0.15, f"stem alignment too weak: {clean}"

    # --- the real mixer CLI over a fake MUSDB layout ---
    vocal_dir = tmp_path / "vocals"
    musdb_dir = tmp_path / "musdb" / "songA"
    out_dir = tmp_path / "mixed"
    vocal_dir.mkdir()
    musdb_dir.mkdir(parents=True)
    for i, (a, _, _) in enumerate(clips):
        write_wav(str(vocal_dir / f"clip{i}.wav"), a, SR)
    accomp = (rng.standard_normal(60 * SR) * 0.5).astype(np.float32)
    write_wav(str(musdb_dir / "accompaniment.wav"), accomp, SR)

    mix_main([str(vocal_dir), str(out_dir), str(tmp_path / "musdb"), "-10"])
    mixed_files = sorted(os.listdir(out_dir))
    assert mixed_files == [f"clip{i}.wav" for i in range(len(clips))]

    mixed_mae, stem_mae = [], []
    for i, (a, lab, onoff) in enumerate(clips):
        mix = load_audio_file(str(out_dir / f"clip{i}.wav"), 0)["speech"]
        mixed_mae.append(align_mae(params, mcfg, mix, lab, onoff))
        stem_mae.append(clean[i])
    # the paper's effect (README.md:131-133): vocal stems align better than
    # -10 dB polyphonic mixtures
    assert np.mean(stem_mae) < np.mean(mixed_mae), (stem_mae, mixed_mae)

    # --- MIR-1k stereo layout: ch0 accompaniment, ch1 vocal ---
    a, lab, onoff = clips[0]
    acc_seg = accomp[: len(a)] * 0.5
    write_wav(str(tmp_path / "mir.wav"), np.stack([acc_seg, a]), SR)
    vocal = load_audio_file(str(tmp_path / "mir.wav"), 2)["speech"]   # stem
    mixture = load_audio_file(str(tmp_path / "mir.wav"), 1)["speech"]  # avg
    np.testing.assert_allclose(vocal[: len(a)], a, atol=2e-4)  # PCM16 rounding
    m_stem = align_mae(params, mcfg, vocal, lab, onoff)
    m_mix = align_mae(params, mcfg, mixture, lab, onoff)
    assert m_stem <= m_mix + 1e-9, (m_stem, m_mix)
