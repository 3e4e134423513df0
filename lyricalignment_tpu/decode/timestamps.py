"""Whisper timestamp-rule decoding: vectorised logit masks + segment parsing.

The reference transcribes long audio through ``model.transcribe(...,
beam_size=5)`` (`inference_transcript.py:88-91`), which applies whisper's
timestamp sampling rules inside the decoder and whisper's seek/segment
arithmetic around it. This module is an original TPU-shaped implementation
of both behaviors:

- ``apply_timestamp_rules``: the rules as one vectorised mask over
  ``[N, n_vocab]`` logits, derivable entirely from the generated-token
  buffer already carried in the jitted ``lax.while_loop`` decode state —
  no extra per-beam bookkeeping to gather on beam reorder.
- ``parse_segments``: host-side numpy split of one 30 s window's decoded
  tokens into timed segments + the next seek advance.

Rule set (behavioral spec = whisper.decoding.ApplyTimestampRules):
1. after a timestamp pair, a timestamp cannot immediately repeat;
2. after a single timestamp, only a timestamp (or <|endoftext|>) may follow;
3. timestamps are monotonically non-decreasing, and each segment must have
   nonzero duration (floor = last timestamp + 1 unless the decode is mid
   timestamp-pair);
4. the first sampled token must be a timestamp, at most
   ``max_initial_index`` (default 1.0 s = index 50);
5. if the total probability mass on timestamps exceeds the most likely
   text token, text is suppressed.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from lyricalignment_tpu import FRAMES_PER_SECOND

NEG_INF = -1.0e30

# mel frames per decoder timestamp position: N_FRAMES / n_audio_ctx = 2
INPUT_STRIDE = 2
TIME_PRECISION = 0.02  # seconds per timestamp index
MAX_INITIAL_TIMESTAMP_INDEX = 50  # whisper default max_initial_timestamp=1.0 s


def apply_timestamp_rules(
    logits: jnp.ndarray,       # f32[N, V] (suppress mask already added)
    gen: jnp.ndarray,          # i32[N, T] generated-token buffer
    i: jnp.ndarray,            # i32 scalar: current sample index (0-based)
    *,
    ts_begin: int,
    eot: int,
    max_initial_index: int = MAX_INITIAL_TIMESTAMP_INDEX,
) -> jnp.ndarray:
    """Return logits with whisper's timestamp rules applied.

    Only positions < i of ``gen`` are read, so the buffer's initial fill
    value is irrelevant. Fully traceable (static shapes, traced ``i``).
    """
    n, v = logits.shape
    t = gen.shape[1]
    ids = jnp.arange(v)
    is_ts_id = ids >= ts_begin           # [V]
    is_text_id = ids < eot

    valid = jnp.arange(t) < i            # [T]
    gen_v = jnp.where(valid[None, :], gen, -1)
    tok_is_ts = gen_v >= ts_begin        # [N, T]

    last = jnp.take(gen, jnp.clip(i - 1, 0, t - 1), axis=1)
    penult = jnp.take(gen, jnp.clip(i - 2, 0, t - 1), axis=1)
    last_was_ts = (i >= 1) & (last >= ts_begin)
    penult_was_ts = (i < 2) | (penult >= ts_begin)

    mask = jnp.zeros_like(logits)
    # 1. timestamp pair complete -> next cannot be a timestamp
    sup_ts = last_was_ts & penult_was_ts
    mask = jnp.where(sup_ts[:, None] & is_ts_id[None, :], NEG_INF, mask)
    # 2. mid-pair -> only a timestamp (or eot) may follow
    mid_pair = last_was_ts & ~penult_was_ts
    mask = jnp.where(mid_pair[:, None] & is_text_id[None, :], NEG_INF, mask)
    # 3. monotonic, nonzero-duration segments
    have_ts = jnp.any(tok_is_ts, axis=1)
    max_ts = jnp.max(jnp.where(tok_is_ts, gen_v, -1), axis=1)
    floor = max_ts + jnp.where(mid_pair, 0, 1)
    mask = jnp.where(
        have_ts[:, None] & is_ts_id[None, :] & (ids[None, :] < floor[:, None]),
        NEG_INF, mask,
    )
    # 4. first sampled token: a timestamp within the initial window
    begin = jnp.where(ids < ts_begin, NEG_INF, 0.0) + jnp.where(
        ids > ts_begin + max_initial_index, NEG_INF, 0.0)
    mask = mask + jnp.where(i == 0, begin, jnp.zeros_like(begin))[None, :]

    logits = logits + mask
    # 5. timestamp mass beats the best non-timestamp token -> force a
    # timestamp. whisper compares against max over ALL ids < timestamp_begin
    # (eot included), not just text ids.
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    ts_lp = jax.nn.logsumexp(
        jnp.where(is_ts_id[None, :], logprobs, NEG_INF), axis=-1)
    max_non_ts = jnp.max(
        jnp.where(is_ts_id[None, :], NEG_INF, logprobs), axis=-1)
    force_ts = ts_lp > max_non_ts
    return jnp.where(force_ts[:, None] & (ids < ts_begin)[None, :], NEG_INF, logits)


def parse_segments(
    tokens: Sequence[int],
    seek: int,
    segment_size: int,
    *,
    ts_begin: int,
    precision: float = TIME_PRECISION,
    input_stride: int = INPUT_STRIDE,
    frames_per_second: int = FRAMES_PER_SECOND,
) -> Tuple[List[Dict], int]:
    """Split one window's decoded tokens into timed segments.

    ``tokens``: the window's generated tokens with eot already stripped.
    ``seek``: absolute mel-frame offset of the window; ``segment_size``:
    number of content frames in the window (<= 3000).

    Returns (segments, seek_advance_in_mel_frames). Each segment dict has
    absolute ``start``/``end`` seconds and its ``tokens`` (timestamps
    included; text rendering filters ``< eot`` upstream).
    """
    toks = [int(x) for x in tokens]
    time_offset = seek / frames_per_second
    is_ts = [x >= ts_begin for x in toks]

    consecutive = [j + 1 for j in range(len(toks) - 1) if is_ts[j] and is_ts[j + 1]]
    single_ending = len(toks) >= 2 and is_ts[-1] and not is_ts[-2]

    segments: List[Dict] = []
    if consecutive:
        slices = list(consecutive)
        if single_ending:
            slices.append(len(toks))
        last = 0
        for cur in slices:
            seg = toks[last:cur]
            start_pos = seg[0] - ts_begin
            end_pos = seg[-1] - ts_begin
            segments.append({
                "start": time_offset + start_pos * precision,
                "end": time_offset + end_pos * precision,
                "tokens": seg,
            })
            last = cur
        if single_ending:
            advance = segment_size
        else:
            # seek to the end of the last complete timestamp pair
            last_ts_pos = toks[last - 1] - ts_begin
            advance = last_ts_pos * input_stride
    else:
        # no complete pair: one segment spanning the window (trimmed to the
        # final timestamp if one was produced)
        duration = segment_size / frames_per_second
        ts = [x for x in toks if x >= ts_begin]
        if ts and ts[-1] != ts_begin:
            duration = (ts[-1] - ts_begin) * precision
        segments.append({
            "start": time_offset,
            "end": time_offset + duration,
            "tokens": toks,
        })
        advance = segment_size
    return segments, int(advance)
