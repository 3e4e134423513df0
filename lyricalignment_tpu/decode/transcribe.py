"""Transcription quality battery: sampling, temperature fallback, no-speech.

The reference relies on whisper's ``model.transcribe`` defaults
(`inference_transcript.py:88-91`), which wrap the core decoder in quality
gates: decode with beam search at temperature 0, and if the result is
degenerate (compression ratio > 2.4 or average logprob < -1.0), retry with
sampling at increasing temperatures (0.2 ... 1.0); segments whose
<|nospeech|> probability exceeds 0.6 while the logprob is poor are emitted
empty. This module reproduces that orchestration around the jitted
decoders (`decode/beam.py`): the retry ladder runs on host, each rung is
one on-device decode.
"""

from __future__ import annotations

import functools
import zlib
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lyricalignment_tpu.decode.beam import (
    beam_search,
    make_processor,
    sample_loop,
)
from lyricalignment_tpu.models.whisper import (
    WhisperConfig,
    decode_step,
    init_decode_cache,
    prime_decode_cache,
)

COMPRESSION_RATIO_THRESHOLD = 2.4
LOGPROB_THRESHOLD = -1.0
NO_SPEECH_THRESHOLD = 0.6
TEMPERATURES = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0)


def compression_ratio(text: str) -> float:
    data = text.encode("utf-8")
    if not data:
        return 0.0
    return len(data) / len(zlib.compress(data))


@functools.partial(
    jax.jit, static_argnames=("cfg", "max_new_tokens", "eot", "temperature",
                              "suppress_ids", "begin_suppress_ids")
)
def sample_decode(
    params: Dict,
    cfg: WhisperConfig,
    audio_features: jnp.ndarray,
    prompt: jnp.ndarray,
    rng: jax.Array,
    temperature: float = 1.0,
    max_new_tokens: int = 224,
    eot: int = 50257,
    suppress_ids: tuple = (),
    begin_suppress_ids: tuple = (),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Temperature sampling; returns (tokens [B, max_new], sum_logprob [B])."""
    cache = init_decode_cache(params, cfg, audio_features,
                              prompt.shape[1], max_new_tokens)
    logits, _, cache = prime_decode_cache(params, cfg, prompt, cache)
    process = make_processor(cfg, eot, suppress_ids, begin_suppress_ids)
    return sample_loop(params, cfg, logits, cache, process, rng, temperature,
                       max_new_tokens, eot)


@functools.partial(jax.jit, static_argnames=("cfg",))
def no_speech_probs(
    params: Dict,
    cfg: WhisperConfig,
    audio_features: jnp.ndarray,
    sot: int,
    no_speech: int,
) -> jnp.ndarray:
    """P(<|nospeech|>) at the sot position (whisper's no-speech detector)."""
    cache = init_decode_cache(params, cfg, audio_features, 0, 1)
    sot_tok = jnp.full((audio_features.shape[0], 1), sot, jnp.int32)
    logits, _ = decode_step(params, cfg, sot_tok, cache)
    probs = jax.nn.softmax(logits, axis=-1)
    return probs[:, no_speech]


def decode_with_fallback(
    params: Dict,
    cfg: WhisperConfig,
    audio_features: jnp.ndarray,
    prompt: jnp.ndarray,
    tokenizer,
    beam_size: int = 5,
    max_new_tokens: int = 224,
    temperatures: Tuple[float, ...] = TEMPERATURES,
    seed: int = 0,
    suppress_ids: tuple = (),
    begin_suppress_ids: tuple = (),
    group: int = 1,
) -> List[Dict]:
    """whisper's DecodingOptions fallback ladder over a batch.

    Returns per-sample dicts: {tokens, text, avg_logprob, no_speech_prob,
    compression_ratio, temperature}.
    """
    b = audio_features.shape[0]
    eot = tokenizer.eot
    ns_prob = np.asarray(no_speech_probs(
        params, cfg, audio_features, tokenizer.sot, tokenizer.no_speech))

    results: List[Optional[Dict]] = [None] * b
    pending = list(range(b))

    for temperature in temperatures:
        if not pending:
            break
        xa = audio_features[jnp.asarray(pending)]
        pr = prompt[jnp.asarray(pending)]
        if temperature == 0.0:
            tokens, scores = beam_search(params, cfg, xa, pr, beam_size=beam_size,
                                         max_new_tokens=max_new_tokens, eot=eot,
                                         suppress_ids=suppress_ids,
                                         begin_suppress_ids=begin_suppress_ids,
                                         group=group)
            tokens, scores = np.asarray(tokens), np.asarray(scores)
        else:
            tokens, sum_lp = sample_decode(
                params, cfg, xa, pr, jax.random.PRNGKey(seed + int(temperature * 10)),
                temperature=temperature, max_new_tokens=max_new_tokens, eot=eot,
                suppress_ids=suppress_ids,
                begin_suppress_ids=begin_suppress_ids)
            tokens, sum_lp = np.asarray(tokens), np.asarray(sum_lp)
            lengths = np.maximum((tokens != eot).sum(axis=1) + 1, 1)
            scores = sum_lp / lengths

        still_pending = []
        for row, sample in enumerate(pending):
            toks = [int(t) for t in tokens[row] if int(t) != eot]
            text = tokenizer.decode(toks) if tokenizer.has_bpe else " ".join(map(str, toks))
            cr = compression_ratio(text)
            ok = cr <= COMPRESSION_RATIO_THRESHOLD and scores[row] >= LOGPROB_THRESHOLD
            # whisper: confidently-silent samples do not retry (the
            # no-speech gate silences them below)
            ok = ok or ns_prob[sample] > NO_SPEECH_THRESHOLD
            entry = {
                "tokens": toks, "text": text, "avg_logprob": float(scores[row]),
                "no_speech_prob": float(ns_prob[sample]),
                "compression_ratio": cr, "temperature": temperature,
            }
            if ok or temperature == temperatures[-1]:
                results[sample] = entry
            else:
                results[sample] = entry  # best-so-far; may be overwritten
                still_pending.append(sample)
        pending = still_pending

    # whisper: silence segments with high no-speech prob AND poor logprob
    for entry in results:
        if (entry["no_speech_prob"] > NO_SPEECH_THRESHOLD
                and entry["avg_logprob"] < LOGPROB_THRESHOLD):
            entry["text"] = ""
            entry["tokens"] = []
    return results
