"""Offline prep: music source separation (vocal extraction).

Re-design of ``dataset_preprocessing/demucs_dataset.py`` (`:14-47`) and
``spleeter_dataset.py`` (`:13-41`): batch-extract the vocal stem of every
file in a directory. The separators are optional heavyweight deps (demucs
is torch-based, spleeter is TF-based) — both are import-gated; without
them the CLI exits with a clear message. This is offline host-side prep,
deliberately outside the TPU compute path (SURVEY.md §2).

Usage:
    python -m lyricalignment_tpu.prep.separate_vocals demucs <in_dir> <out_dir>
    python -m lyricalignment_tpu.prep.separate_vocals spleeter <in_dir> <out_dir>
"""

from __future__ import annotations

import os
import random
import sys

import numpy as np

from lyricalignment_tpu.data.audio_io import read_wav, write_wav


def _load_mono_44k(path: str) -> np.ndarray:
    data, sr = read_wav(path)
    mono = data.mean(axis=0) if data.shape[0] > 1 else data[0]
    if sr != 44100:
        from lyricalignment_tpu.data.audio_io import resample

        mono = resample(mono, sr, 44100)
    return mono


def separate_demucs(in_dir: str, out_dir: str) -> None:
    try:
        import torch
        from demucs import apply, pretrained
    except ImportError as e:
        raise SystemExit(f"demucs not available in this environment: {e}")

    # HT-Demucs is non-deterministic (reference `demucs_dataset.py:25`);
    # seed everything anyway
    random.seed(114514)
    np.random.seed(114514)
    torch.manual_seed(114514)

    device = "cuda" if torch.cuda.is_available() else "cpu"
    model = pretrained.get_model(name="htdemucs").to(device)
    model.eval()

    os.makedirs(out_dir, exist_ok=True)
    for name in sorted(os.listdir(in_dir)):
        y = _load_mono_44k(os.path.join(in_dir, name))
        mix = torch.tensor(np.stack([y, y])).float().to(device)
        sources = apply.apply_model(model, mix[None], split=True, overlap=0.5,
                                    progress=False)[0]
        vocal = sources[model.sources.index("vocals")].detach().cpu().numpy().T
        mono = (vocal[:, 0] + vocal[:, 1]) / 2
        write_wav(os.path.join(out_dir, name), mono.astype(np.float32), 44100)


def separate_spleeter(in_dir: str, out_dir: str) -> None:
    try:
        from spleeter.separator import Separator
    except ImportError as e:
        raise SystemExit(f"spleeter not available in this environment: {e}")

    separator = Separator("spleeter:2stems")
    os.makedirs(out_dir, exist_ok=True)
    for name in sorted(os.listdir(in_dir)):
        y = _load_mono_44k(os.path.join(in_dir, name))
        stereo = np.stack([y, y], axis=1)
        vocal = separator.separate(stereo)["vocals"]
        mono = (vocal[:, 0] + vocal[:, 1]) / 2
        write_wav(os.path.join(out_dir, name), mono.astype(np.float32), 44100)


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 3 or argv[0] not in ("demucs", "spleeter"):
        raise SystemExit(__doc__)
    backend, in_dir, out_dir = argv
    if backend == "demucs":
        separate_demucs(in_dir, out_dir)
    else:
        separate_spleeter(in_dir, out_dir)


if __name__ == "__main__":
    main()
