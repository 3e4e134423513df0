"""Checkpoint-converter CLI: import/export round-trips on tiny configs."""

import pytest as _pytest

pytestmark = _pytest.mark.slow  # orbax saves of real tiny whisper, minutes on 1 core

import numpy as np
import pytest
import torch

import jax

from lyricalignment_tpu.cli.convert_checkpoint import main as convert_main
from lyricalignment_tpu.cli.common import load_model_dir
from lyricalignment_tpu.models.align_model import AlignModelConfig, init_align_model
from lyricalignment_tpu.models.convert import align_params_to_state_dict
from lyricalignment_tpu.models.whisper import WHISPER_CONFIGS
from lyricalignment_tpu.train.checkpoints import save_json, save_pytree


@pytest.fixture()
def tiny_model_dir(tmp_path):
    d = tmp_path / "model"
    d.mkdir()
    cfg = AlignModelConfig(whisper=WHISPER_CONFIGS["tiny"], hidden_dim=384,
                           output_dim=21129, train_alignment=True,
                           train_transcript=False)
    params = init_align_model(jax.random.PRNGKey(0), cfg)
    save_json(str(d / "args.json"), {"whisper_model": "tiny", "use_ctc_loss": True})
    save_json(str(d / "model_args.json"), {
        "embed_dim": 384, "hidden_dim": 384, "output_dim": 21129,
        "bidirectional": True, "freeze_encoder": False,
        "train_alignment": True, "train_transcript": False})
    save_pytree(str(d / "best_model"), {"params": params, "step": 0})
    return str(d), params


def test_export_then_import_round_trip(tiny_model_dir, tmp_path):
    model_dir, params = tiny_model_dir
    pt = str(tmp_path / "ref.pt")
    assert convert_main(["export", "--model-dir", model_dir, "--pt", pt]) == 0

    # the exported file is a reference-named state dict torch can read
    sd = torch.load(pt, map_location="cpu", weights_only=False)
    assert "whisper_model.encoder.conv1.weight" in sd
    assert "whisper_model.encoder.positional_embedding" in sd
    assert "align_rnn.fc.weight" in sd

    out = str(tmp_path / "imported")
    assert convert_main(["import", "--pt", pt, "--whisper-model", "tiny",
                         "--output-dir", out, "--use-ctc-loss"]) == 0
    mcfg, params2, train_args = load_model_dir(out, "best")
    assert train_args["use_ctc_loss"] is True

    flat1 = jax.tree_util.tree_leaves(params["whisper"])
    flat2 = jax.tree_util.tree_leaves(params2["whisper"])
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_import_openai_infers_size(tiny_model_dir, tmp_path):
    _, params = tiny_model_dir
    # synthesize an OpenAI-format ckpt from the whisper sub-tree
    sd_full = align_params_to_state_dict(params, n_audio_ctx=1500)
    sd = {k[len("whisper_model."):]: torch.from_numpy(v)
          for k, v in sd_full.items() if k.startswith("whisper_model.")}
    cfg = WHISPER_CONFIGS["tiny"]
    dims = {"n_mels": 80, "n_vocab": cfg.n_vocab,
            "n_audio_ctx": cfg.n_audio_ctx, "n_audio_state": cfg.n_audio_state,
            "n_audio_head": cfg.n_audio_head, "n_audio_layer": cfg.n_audio_layer,
            "n_text_ctx": cfg.n_text_ctx, "n_text_state": cfg.n_text_state,
            "n_text_head": cfg.n_text_head, "n_text_layer": cfg.n_text_layer}
    pt = str(tmp_path / "openai.pt")
    torch.save({"dims": dims, "model_state_dict": sd}, pt)

    out = str(tmp_path / "pretrained")
    assert convert_main(["import-openai", "--pt", pt, "--output-dir", out]) == 0
    mcfg, params2, train_args = load_model_dir(out, "best")
    assert train_args["whisper_model"] == "tiny"
    np.testing.assert_allclose(
        np.asarray(params2["whisper"]["decoder"]["token_embedding"]),
        np.asarray(params["whisper"]["decoder"]["token_embedding"]))
    # head is random-init but correctly shaped for 21128-class output
    assert params2["align_head"]["fc"]["w"].shape[-1] == 21128


def test_import_openai_custom_dims(tmp_path):
    """Asymmetric backbones that match no size name (distil-whisper-style
    2-layer decoder) import as whisper_model "custom" with the full
    architecture persisted in args.json; load_model_dir rebuilds from it."""
    import jax

    from lyricalignment_tpu.models.whisper import WhisperConfig, encode_audio, init_whisper_params

    cfg = WhisperConfig(n_mels=80, n_vocab=96, n_audio_ctx=40,
                        n_audio_state=32, n_audio_head=4, n_audio_layer=2,
                        n_text_ctx=12, n_text_state=32, n_text_head=4,
                        n_text_layer=1)
    wp = init_whisper_params(jax.random.PRNGKey(7), cfg)
    sd_full = align_params_to_state_dict(
        {"whisper": wp, "align_head": {"gru": {"layers": []},
                                       "fc": {"w": np.zeros((1, 1)),
                                              "b": np.zeros(1)}}},
        n_audio_ctx=cfg.n_audio_ctx)
    sd = {k[len("whisper_model."):]: torch.from_numpy(v)
          for k, v in sd_full.items() if k.startswith("whisper_model.")}
    dims = {"n_mels": 80, "n_vocab": 96, "n_audio_ctx": 40,
            "n_audio_state": 32, "n_audio_head": 4, "n_audio_layer": 2,
            "n_text_ctx": 12, "n_text_state": 32, "n_text_head": 4,
            "n_text_layer": 1}
    pt = str(tmp_path / "asym.pt")
    torch.save({"dims": dims, "model_state_dict": sd}, pt)

    out = str(tmp_path / "custom_dir")
    assert convert_main(["import-openai", "--pt", pt, "--output-dir", out]) == 0
    mcfg, params2, train_args = load_model_dir(out, "best")
    assert train_args["whisper_model"] == "custom"
    assert train_args["whisper_dims"]["n_text_layer"] == 1
    assert mcfg.whisper.n_audio_layer == 2 and mcfg.whisper.n_text_layer == 1

    rng = np.random.default_rng(3)
    import jax.numpy as jnp

    mel = jnp.asarray(rng.standard_normal((1, 80, 80)).astype(np.float32))
    a = np.asarray(encode_audio(wp, cfg, mel))
    b = np.asarray(encode_audio(params2["whisper"], mcfg.whisper, mel))
    np.testing.assert_allclose(a, b, atol=1e-6)
