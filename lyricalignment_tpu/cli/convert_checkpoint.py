"""Checkpoint converter CLI: reference/OpenAI ``.pt`` <-> framework dirs.

The reference trains to ``torch.save(model.state_dict())`` files named
``{best,best_align,best_trans,last}_model.pt`` next to ``args.json`` /
``model_args.json`` (`train_multitask.py:461-465,567-585`), and its
published Zenodo checkpoints use the same layout (README.md:84). This
framework's CLIs already read those ``.pt`` files on the fly
(``cli.common.load_model_dir``); this tool materializes conversions:

    # reference AlignModel .pt -> framework model dir (orbax)
    la-convert import --pt best_model.pt --whisper-model medium \\
        --output-dir converted --use-ctc-loss

    # raw OpenAI whisper .pt -> framework model dir (random-init head),
    # the --use-pretrained transcription flow
    la-convert import-openai --pt medium.pt --output-dir pretrained

    # HF transformers Whisper save directory -> framework model dir
    la-convert import-hf --hf-dir whisper-medium --output-dir pretrained

    # framework model dir -> HF transformers save directory (the whisper
    # backbone, loadable by WhisperForConditionalGeneration.from_pretrained)
    la-convert export-hf --model-dir result --output-dir hf_out

    # framework model dir -> reference-named .pt (interop/round-trip)
    la-convert export --model-dir result --model-name best --pt out.pt

Needs torch on the host (baked into this image) for ``.pt`` IO only; no
device code runs.
"""

from __future__ import annotations

import argparse
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    imp = sub.add_parser("import", help="reference AlignModel .pt -> model dir")
    imp.add_argument("--pt", required=True)
    imp.add_argument("--whisper-model", required=True,
                     choices=["tiny", "base", "small", "medium", "large", "large-v2"])
    imp.add_argument("--output-dir", required=True)
    imp.add_argument("--use-ctc-loss", action="store_true",
                     help="head output dim 21129 (21128 + CTC blank/silence)")
    imp.add_argument("--model-name", default="best",
                     choices=["best", "best_align", "best_trans", "last"])

    impo = sub.add_parser("import-openai",
                          help="OpenAI whisper .pt -> model dir (random head)")
    impo.add_argument("--pt", required=True)
    impo.add_argument("--output-dir", required=True)
    impo.add_argument("--use-ctc-loss", action="store_true")
    impo.add_argument("--seed", type=int, default=114514)

    imph = sub.add_parser(
        "import-hf",
        help="HF transformers Whisper save dir -> model dir (random head)")
    imph.add_argument("--hf-dir", required=True,
                      help="directory from save_pretrained(): config.json + "
                           "model.safetensors / pytorch_model.bin")
    imph.add_argument("--output-dir", required=True)
    imph.add_argument("--use-ctc-loss", action="store_true")
    imph.add_argument("--seed", type=int, default=114514)

    exp = sub.add_parser("export", help="model dir -> reference-named .pt")
    exp.add_argument("--model-dir", required=True)
    exp.add_argument("--model-name", default="best",
                     choices=["best", "best_align", "best_trans", "last"])
    exp.add_argument("--pt", required=True)

    exph = sub.add_parser(
        "export-hf",
        help="model dir (whisper backbone) -> HF transformers save dir")
    exph.add_argument("--model-dir", required=True)
    exph.add_argument("--model-name", default="best",
                      choices=["best", "best_align", "best_trans", "last"])
    exph.add_argument("--output-dir", required=True)

    return p.parse_args(argv)


def _arch_dims(c):
    return (c.n_audio_state, c.n_audio_layer, c.n_audio_head,
            c.n_text_state, c.n_text_layer, c.n_text_head,
            c.n_vocab, c.n_mels)


def match_whisper_size(ckpt_cfg):
    """Name of the WHISPER_CONFIGS entry whose FULL architecture matches.

    Matching on encoder dims alone is not enough: the HF ecosystem
    publishes asymmetric variants (distil-whisper keeps the full encoder
    over 2 decoder layers; ``*.en`` models use vocab 51864) whose weights
    would disagree with the config every later ``load_model_dir``
    reconstructs from the size name — decode buffers, suppress masks and
    CE losses sized by ``cfg.n_vocab`` would then mismatch the stored
    logits/embedding. Returns None when nothing matches exactly."""
    from lyricalignment_tpu.models.whisper import WHISPER_CONFIGS

    return next((n for n, c in WHISPER_CONFIGS.items()
                 if _arch_dims(c) == _arch_dims(ckpt_cfg)), None)


def _size_aliases(name):
    """Other WHISPER_CONFIGS names with the identical architecture (large
    and large-v2 share every dim, so a large-v2 checkpoint is stored under
    the first match, "large" — functionally identical; the import message
    surfaces the aliasing so the stored name isn't mistaken for source
    fidelity — ADVICE r4)."""
    from lyricalignment_tpu.models.whisper import WHISPER_CONFIGS

    dims = _arch_dims(WHISPER_CONFIGS[name])
    return [n for n, c in WHISPER_CONFIGS.items()
            if n != name and _arch_dims(c) == dims]


def _write_model_dir(out_dir, whisper_model, use_ctc, params, model_name,
                     whisper_dims=None):
    """``whisper_model`` is a WHISPER_CONFIGS name, or "custom" with
    ``whisper_dims`` carrying the full architecture (asymmetric backbones
    like distil-whisper that match no standard size name)."""
    from lyricalignment_tpu.models.whisper import WHISPER_DIM
    from lyricalignment_tpu.train.checkpoints import save_json, save_pytree

    os.makedirs(out_dir, exist_ok=True)
    output_dim = 21128 + (1 if use_ctc else 0)
    args_json = {"whisper_model": whisper_model, "use_ctc_loss": use_ctc}
    if whisper_dims is not None:
        args_json["whisper_dims"] = dict(whisper_dims)
        embed_dim = whisper_dims["n_audio_state"]
    else:
        embed_dim = WHISPER_DIM[whisper_model]
    save_json(os.path.join(out_dir, "args.json"), args_json)
    save_json(os.path.join(out_dir, "model_args.json"), {
        "embed_dim": embed_dim,
        "hidden_dim": 384, "output_dim": output_dim, "bidirectional": True,
        "freeze_encoder": False, "train_alignment": True,
        "train_transcript": False})
    save_pytree(os.path.join(out_dir, f"{model_name}_model"),
                {"params": params, "step": 0})


def main(argv=None):
    args = parse_args(argv)

    if args.cmd == "import":
        from lyricalignment_tpu.cli.common import build_model_config
        from lyricalignment_tpu.models.convert import load_reference_align_checkpoint

        mcfg = build_model_config(
            args.whisper_model, output_dim=21128 + (1 if args.use_ctc_loss else 0))
        params = load_reference_align_checkpoint(args.pt, mcfg)
        _write_model_dir(args.output_dir, args.whisper_model,
                         args.use_ctc_loss, params, args.model_name)
        print(f"imported {args.pt} -> {args.output_dir}/{args.model_name}_model")
        return 0

    if args.cmd in ("import-openai", "import-hf"):
        import jax

        from lyricalignment_tpu.cli.common import build_model_config
        from lyricalignment_tpu.models.align_model import init_align_model
        from lyricalignment_tpu.models.convert import (
            load_hf_checkpoint, load_openai_checkpoint)

        if args.cmd == "import-hf":
            src = args.hf_dir
            ckpt_cfg, whisper_params = load_hf_checkpoint(src)
        else:
            src = args.pt
            ckpt_cfg, whisper_params = load_openai_checkpoint(src)
        name = match_whisper_size(ckpt_cfg)
        dims = None
        if name is None:
            # asymmetric variants (distil-whisper's 2-layer decoder, *.en
            # vocab 51864): store the full architecture in args.json
            # instead of a size name — load_model_dir rebuilds from it
            name = "custom"
            dims = {
                "n_mels": ckpt_cfg.n_mels, "n_vocab": ckpt_cfg.n_vocab,
                "n_audio_ctx": ckpt_cfg.n_audio_ctx,
                "n_audio_state": ckpt_cfg.n_audio_state,
                "n_audio_head": ckpt_cfg.n_audio_head,
                "n_audio_layer": ckpt_cfg.n_audio_layer,
                "n_text_ctx": ckpt_cfg.n_text_ctx,
                "n_text_state": ckpt_cfg.n_text_state,
                "n_text_head": ckpt_cfg.n_text_head,
                "n_text_layer": ckpt_cfg.n_text_layer,
            }
        mcfg = build_model_config(
            name, output_dim=21128 + (1 if args.use_ctc_loss else 0),
            whisper_dims=dims)
        params = init_align_model(jax.random.PRNGKey(args.seed), mcfg)
        params["whisper"] = whisper_params
        _write_model_dir(args.output_dir, name, args.use_ctc_loss, params,
                         "best", whisper_dims=dims)
        alias_note = ""
        if name != "custom":
            aliases = _size_aliases(name)
            if aliases:
                alias_note = (f" (architecture identical to "
                              f"{'/'.join(aliases)}; stored as {name!r})")
        print(f"imported {name} {src} -> {args.output_dir}/best_model"
              f"{alias_note}")
        return 0

    if args.cmd == "export-hf":
        from lyricalignment_tpu.cli.common import load_model_dir
        from lyricalignment_tpu.models.convert import save_hf_checkpoint

        mcfg, params, _ = load_model_dir(args.model_dir, args.model_name)
        save_hf_checkpoint(params["whisper"], mcfg.whisper, args.output_dir)
        print(f"exported {args.model_dir}/{args.model_name}_model whisper "
              f"backbone -> {args.output_dir} (HF transformers format)")
        return 0

    # export
    from lyricalignment_tpu.cli.common import load_model_dir
    from lyricalignment_tpu.train.checkpoints import export_reference_pt

    mcfg, params, _ = load_model_dir(args.model_dir, args.model_name)
    os.makedirs(os.path.dirname(os.path.abspath(args.pt)), exist_ok=True)
    export_reference_pt(params, args.pt,
                        n_audio_ctx=mcfg.whisper.n_audio_ctx)
    print(f"exported {args.model_dir}/{args.model_name}_model -> {args.pt}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
