"""End-to-end MAE parity harness: audio -> MAE through BOTH stacks.

The BASELINE accuracy criterion is "alignment MAE within 5 ms of the
PyTorch reference". Every stage is oracle-tested individually elsewhere;
this harness runs the WHOLE pipeline on the same synthetic weights:

  torch oracle : whisper-exact mel (torch.stft) -> torch transformer
                 encoder -> exact trim to round(mel_len/2) -> torch.nn.GRU
                 + mish + fc -> f64 numpy Viterbi -> MAE
                 (the reference stack `inference_alignment.py:126-180`)
  JAX pipeline : the real user path — `cli.inference_alignment.align_records`
                 (bucketed batch, masked GRU, scan Viterbi) -> MAE

and asserts per-boundary and MAE agreement within the 5 ms budget.
"""

import pytest

pytestmark = pytest.mark.slow  # multi-minute on the 1-core host (see CLAUDE.md test lanes)

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import tests.torch_whisper_oracle as oracle
from tests.test_gru import load_cell_into_torch
from tests.test_mel import torch_oracle_log_mel
from tests.test_viterbi import oracle_viterbi

from lyricalignment_tpu import N_FRAMES
from lyricalignment_tpu.data.audio_io import write_wav
from lyricalignment_tpu.data.records import Record
from lyricalignment_tpu.models.align_model import AlignModelConfig, init_align_model
from lyricalignment_tpu.models.whisper import WhisperConfig
from lyricalignment_tpu.ops.mel import mel_filterbank
from lyricalignment_tpu.utils.metrics import mae

N_CLASSES = 12  # CE: 0=silence, 1..11 syllables; CTC: 0=blank, last=silence


@pytest.fixture(scope="module")
def model():
    wcfg = WhisperConfig(
        n_mels=80, n_vocab=32, n_audio_ctx=1500, n_audio_state=32,
        n_audio_head=4, n_audio_layer=1, n_text_ctx=8, n_text_state=32,
        n_text_head=4, n_text_layer=1,
    )
    mcfg = AlignModelConfig(
        whisper=wcfg, hidden_dim=16, output_dim=N_CLASSES + 1,  # CTC layout
        num_rnn_layers=2, bidirectional=True,
        train_alignment=True, train_transcript=False,
    )
    params = init_align_model(jax.random.PRNGKey(21), mcfg)
    return mcfg, params


def torch_head(params, emb):
    """torch.nn.GRU (weights from the JAX params) + mish + fc."""
    head = params["align_head"]
    layers = head["gru"]["layers"]
    n_in = np.asarray(layers[0]["dirs"][0]["w_ih"]).shape[0]
    n_hidden = np.asarray(layers[0]["dirs"][0]["w_hh"]).shape[0]
    tgru = torch.nn.GRU(n_in, n_hidden, num_layers=len(layers),
                        batch_first=True, bidirectional=True)
    for l in range(len(layers)):
        for d in range(2):
            load_cell_into_torch(tgru, head["gru"], l, d)
    with torch.no_grad():
        h, _ = tgru(emb)
        h = F.mish(h)
        w = torch.from_numpy(np.asarray(head["fc"]["w"]))
        b = torch.from_numpy(np.asarray(head["fc"]["b"]))
        return h @ w + b


def torch_reference_pipeline(mcfg, params, audio, labels, mode):
    """audio -> [[on, off], ...] through the independent torch/numpy stack,
    reproducing the reference's batch-1 inference exactly
    (`inference_alignment.py:126-180` + `module/align_model.py:86-92`)."""
    filters = mel_filterbank()
    mel = torch_oracle_log_mel(audio, filters)            # exact-length mel
    t_mel = mel.shape[-1]
    mel30 = np.zeros((1, 80, N_FRAMES), np.float32)       # pad_or_trim
    mel30[0, :, :t_mel] = mel[:, :N_FRAMES]
    with torch.no_grad():
        emb = oracle.encode_audio(params["whisper"], mcfg.whisper, mel30)
    n_frames = int(round(t_mel / 2.0))                    # get_orig_len trim
    emb = emb[:, :n_frames].float()
    logits = torch_head(params, emb).numpy()[0]           # [T, C]
    return oracle_viterbi(logits.astype(np.float64), list(labels), mode)


@pytest.mark.parametrize("mode", ["ce", "ctc"])
def test_e2e_mae_within_5ms_of_reference(tmp_path, model, mode):
    mcfg, params = model
    rng = np.random.default_rng(114514)

    # awkward-length audio (11.37 s): tones + noise, batch path buckets to 15 s
    sr = 16000
    n = int(11.37 * sr)
    t = np.arange(n) / sr
    audio = (0.2 * np.sin(2 * np.pi * 220 * t)
             * (np.sin(2 * np.pi * 0.7 * t) > 0)        # gated tone bursts
             + 0.02 * rng.standard_normal(n)).astype(np.float32)

    L = 8
    hi = N_CLASSES - 1 if mode == "ctc" else N_CLASSES  # ctc: labels < C-1
    labels = rng.integers(1, hi, size=L).tolist()
    gt = [[0.5 + 1.2 * i, 1.0 + 1.2 * i] for i in range(L)]

    # --- torch reference stack ---
    pred_torch = torch_reference_pipeline(mcfg, params, audio, labels, mode)
    mae_torch = float(mae([gt], [pred_torch]))

    # --- JAX stack through the real CLI path (bucketed batch) ---
    from types import SimpleNamespace

    from lyricalignment_tpu.cli.inference_alignment import align_records

    wav = str(tmp_path / "clip.wav")
    write_wav(wav, audio, sr)
    record = Record(audio_path=wav, text="x" * L, lyric_onset_offset=gt)

    class StubBert:
        def encode(self, text, add_special_tokens=False):
            return list(range(len(text)))

    class StubTable:
        def map_tokens(self, ids):
            return np.asarray(labels, np.int32)

    args = SimpleNamespace(use_ctc_loss=(mode == "ctc"), is_mixture=0,
                           bucket_seconds=5.0, max_label_len=32, batch_size=1)
    (_, pred_jax), = align_records([record], params, mcfg, StubTable(),
                                   StubBert(), args)
    mae_jax = float(mae([gt], [pred_jax]))

    # every boundary within 5 ms, and the MAEs agree within 5 ms
    diffs = np.abs(np.asarray(pred_jax) - np.asarray(pred_torch))
    assert diffs.max() <= 0.005 + 1e-9, (
        f"max boundary diff {diffs.max():.4f}s\njax={pred_jax}\n"
        f"torch={pred_torch}")
    assert abs(mae_jax - mae_torch) <= 0.005, (mae_jax, mae_torch)
