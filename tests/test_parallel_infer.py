"""Multi-chip inference: the alignment CLI sharded over a ("data","model")
mesh must produce the same boundaries as the single-device run (GSPMD DP +
Megatron TP over the virtual 8-device CPU mesh)."""

import pytest as _pytest

pytestmark = _pytest.mark.slow  # multi-mesh compiles, ~9 min on the 1-core host

from types import SimpleNamespace

import jax
import numpy as np
import pytest

from lyricalignment_tpu.cli.inference_alignment import align_records
from lyricalignment_tpu.data.audio_io import write_wav
from lyricalignment_tpu.data.records import Record
from lyricalignment_tpu.models.align_model import AlignModelConfig, init_align_model
from lyricalignment_tpu.models.whisper import WhisperConfig

N_CLASSES = 12


class StubBert:
    def encode(self, text, add_special_tokens=False):
        return list(range(len(text)))


class StubTable:
    def map_tokens(self, ids):
        rng = np.random.default_rng(7)
        return rng.integers(1, N_CLASSES - 1, size=len(ids)).astype(np.int32)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("audio")
    mcfg = AlignModelConfig(
        whisper=WhisperConfig(n_mels=80, n_vocab=32, n_audio_ctx=1500,
                              n_audio_state=32, n_audio_head=4, n_audio_layer=1,
                              n_text_ctx=8, n_text_state=32, n_text_head=4,
                              n_text_layer=1),
        hidden_dim=16, output_dim=N_CLASSES + 1,
        train_alignment=True, train_transcript=False,
    )
    params = init_align_model(jax.random.PRNGKey(3), mcfg)
    rng = np.random.default_rng(0)
    records = []
    for i in range(6):  # 6 records, batch 4 -> a full batch + a ragged one
        n = int((3.0 + 0.7 * i) * 16000)
        wav = str(d / f"r{i}.wav")
        write_wav(wav, (rng.standard_normal(n) * 0.1).astype(np.float32))
        records.append(Record(audio_path=wav, text="abcde"))
    return mcfg, params, records


def _run(mcfg, params, records, **mesh_kwargs):
    args = SimpleNamespace(use_ctc_loss=True, is_mixture=0, bucket_seconds=4.0,
                           max_label_len=16, batch_size=4, **mesh_kwargs)
    return [seg for _, seg in align_records(
        records, params, mcfg, StubTable(), StubBert(), args)]


def test_mesh_dp_tp_matches_single_device(setup):
    mcfg, params, records = setup
    single = _run(mcfg, params, records)
    meshed = _run(mcfg, params, records, mesh_data=4, mesh_model=2)
    for s, m in zip(single, meshed):
        np.testing.assert_allclose(np.asarray(s), np.asarray(m), atol=1e-4)


def test_mesh_dp_pp_matches_single_device(setup, tmp_path_factory):
    """--mesh-pipe: GPipe-staged encoder (DP4 x PP2) must produce the same
    boundaries as the single-device run."""
    _, _, records = setup
    mcfg = AlignModelConfig(
        whisper=WhisperConfig(n_mels=80, n_vocab=32, n_audio_ctx=1500,
                              n_audio_state=32, n_audio_head=4, n_audio_layer=2,
                              n_text_ctx=8, n_text_state=32, n_text_head=4,
                              n_text_layer=1),
        hidden_dim=16, output_dim=N_CLASSES + 1,
        train_alignment=True, train_transcript=False,
    )
    params = init_align_model(jax.random.PRNGKey(5), mcfg)
    single = _run(mcfg, params, records)
    piped = _run(mcfg, params, records, mesh_data=4, mesh_pipe=2)
    for s, m in zip(single, piped):
        np.testing.assert_allclose(np.asarray(s), np.asarray(m), atol=1e-4)


def test_mesh_pipe_excludes_tp(setup):
    mcfg, params, records = setup
    with pytest.raises(SystemExit, match="pick one"):
        _run(mcfg, params, records[:4], mesh_data=2, mesh_model=2, mesh_pipe=2)


def test_mesh_batch_divisibility_enforced(setup):
    mcfg, params, records = setup
    with pytest.raises(SystemExit, match="divisible"):
        _run(mcfg, params, records[:2], mesh_data=3, mesh_model=1)


def test_mesh_transcribe_matches_single(tmp_path):
    """Batched transcription sharded DP4xTP2 must emit the same tokens as
    the single-device run (exercises the pad-to-batch path: 2 windows in a
    batch of 4)."""
    from tests.test_longform import TinyTokenizer

    from lyricalignment_tpu.cli.inference_transcript import transcribe_records
    from lyricalignment_tpu.models.whisper import init_whisper_params

    tok = TinyTokenizer()
    cfg = WhisperConfig(n_mels=80, n_vocab=tok.n_vocab, n_audio_ctx=1500,
                        n_audio_state=32, n_audio_head=4, n_audio_layer=1,
                        n_text_ctx=64, n_text_state=32, n_text_head=4,
                        n_text_layer=1)
    params = init_whisper_params(jax.random.PRNGKey(5), cfg)

    rng = np.random.default_rng(2)
    records = []
    for i in range(2):
        wav = str(tmp_path / f"t{i}.wav")
        write_wav(wav, (rng.standard_normal(4 * 16000) * 0.1).astype(np.float32))
        records.append(Record(audio_path=wav, text=""))

    def run(**mesh_kwargs):
        args = SimpleNamespace(
            is_mixture=0, batch_size=4, beam_size=2, max_new_tokens=8,
            use_groundtruth=False, temperature_fallback=False,
            fast_windows=False, length_penalty=None,
            no_condition_on_previous_text=False, seed=0, **mesh_kwargs)
        return [r["inference"] for r in transcribe_records(
            records, params, cfg, tok, args)]

    single = run()
    meshed = run(mesh_data=4, mesh_model=2)
    assert single == meshed


def test_mesh_pipe_odd_local_batch(setup):
    """ADVICE r2: --mesh-pipe with an odd per-data-shard batch (batch 12
    over data=4 -> b_local=3) must fall back to n_micro=1, not crash in
    pipeline_blocks."""
    _, _, records = setup
    mcfg = AlignModelConfig(
        whisper=WhisperConfig(n_mels=80, n_vocab=32, n_audio_ctx=1500,
                              n_audio_state=32, n_audio_head=4, n_audio_layer=2,
                              n_text_ctx=8, n_text_state=32, n_text_head=4,
                              n_text_layer=1),
        hidden_dim=16, output_dim=N_CLASSES + 1,
        train_alignment=True, train_transcript=False,
    )
    params = init_align_model(jax.random.PRNGKey(5), mcfg)

    def run(**mesh_kwargs):
        args = SimpleNamespace(use_ctc_loss=True, is_mixture=0,
                               bucket_seconds=4.0, max_label_len=16,
                               batch_size=12, **mesh_kwargs)
        return [seg for _, seg in align_records(
            records, params, mcfg, StubTable(), StubBert(), args)]

    single = run()
    piped = run(mesh_data=4, mesh_pipe=2)
    for s, m in zip(single, piped):
        np.testing.assert_allclose(np.asarray(s), np.asarray(m), atol=1e-4)


def test_forward_setup_memoized(setup):
    """ADVICE r2: repeated align_records calls must reuse one jitted
    forward (continuous-batching serve path would otherwise retrace the
    encoder on every batch)."""
    from lyricalignment_tpu.cli.inference_alignment import _forward_setup

    mcfg, params, records = setup
    a = _forward_setup(mcfg, "hidden", 4, 0, 1, 1)
    b = _forward_setup(mcfg, "hidden", 4, 0, 1, 1)
    assert a is b
    assert a[0] is b[0]  # the jitted forward itself is shared
    c = _forward_setup(mcfg, "hidden", 8, 0, 1, 1)
    assert c is not a
