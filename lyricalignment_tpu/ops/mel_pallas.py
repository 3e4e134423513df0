"""Fused Pallas log-mel frontend (STFT + mel + log in one kernel).

The north-star kernel named in BASELINE.json: framing, Hann windowing, the
real DFT, the power spectrum, the mel projection and the log10 happen in a
single fused kernel — one VMEM round-trip per tile, with only the [80, T']
log-mel tile written back to HBM. The [T', 400] frame tensor and the
[T', 201] re/im/power intermediates never touch HBM.

Framing uses the zero-gather row decomposition (`ops/mel.py:_frame`):
with n_fft = 400 = 2*hop + hop/2, frame t = concat(R[t], R[t+1],
R[t+2][:80]) over hop-sized rows. Rather than concatenating (Mosaic
dislikes sub-lane-width concats), the DFT contraction splits into three
partial MXU matmuls against the matching basis row-blocks:

    rfft(frame) = R0 @ B[0:160] + R1 @ B[160:320] + R2h @ B[320:400]

The three shifted row views are materialised host-side as separate inputs
(2.5x audio bytes — identical traffic to framing, a rounding error next to
the encoder) so every Pallas block is a standard full-lane BlockSpec: no
manual DMA, no alignment edge cases.

The batch-global 8-decade dynamic-range clamp needs a cross-tile max, so it
stays outside (one cheap fused elementwise pass). Output matches
``ops.mel.log_mel_spectrogram`` to float32 rounding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lyricalignment_tpu import HOP_LENGTH, N_FFT, N_MELS, SAMPLE_RATE
from lyricalignment_tpu.ops.mel import _dft_bases, mel_filterbank

TILE_T = 512  # frames per tile (lane-aligned); frame count pads up to a multiple


def _kernel(r0_ref, r1_ref, r2_ref, cos_ref, sin_ref, mel_ref, out_ref):
    hop = HOP_LENGTH
    r0 = r0_ref[0]
    r1 = r1_ref[0]
    r2 = r2_ref[0]

    # full-f32 MXU passes: the 8-decade log dynamic range makes bf16
    # matmul error visible straight in the output (see ops/mel.py)
    hi = jax.lax.Precision.HIGHEST

    def dft(basis_ref):
        return (
            jnp.dot(r0, basis_ref[0:hop, :], preferred_element_type=jnp.float32, precision=hi)
            + jnp.dot(r1, basis_ref[hop: 2 * hop, :], preferred_element_type=jnp.float32, precision=hi)
            + jnp.dot(r2, basis_ref[2 * hop:, :], preferred_element_type=jnp.float32, precision=hi)
        )

    re = dft(cos_ref)
    im = dft(sin_ref)
    power = re * re + im * im                      # [TILE, 201]
    mel = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32, precision=hi)  # [TILE, 80]
    out_ref[0, :, :] = jnp.log(jnp.maximum(mel, 1e-10)).T * np.float32(1.0 / np.log(10.0))


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_log_mel(audio: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """audio f32[B, T] (16 kHz) -> log-mel f32[B, 80, T // 160].

    Drop-in fused equivalent of ``ops.mel.log_mel_spectrogram`` (including
    the batch-global dynamic-range clamp, applied after the kernel).
    ``interpret=True`` runs the Pallas interpreter (CPU tests).
    """
    squeeze = audio.ndim == 1
    if squeeze:
        audio = audio[None, :]
    b, t_samples = audio.shape
    hop = HOP_LENGTH
    num_frames = t_samples // hop
    # frame axis padded to a lane-aligned tile multiple; sliced back at the end
    n_tiles = -(-num_frames // TILE_T)
    padded_frames = n_tiles * TILE_T

    pad = N_FFT // 2
    padded = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    need = (padded_frames + 2) * hop
    padded = jnp.pad(padded, ((0, 0), (0, max(0, need - padded.shape[-1]))))
    rows = padded.reshape(b, padded_frames + 2, hop)
    r0 = rows[:, 0:padded_frames]
    r1 = rows[:, 1: padded_frames + 1]
    r2 = rows[:, 2: padded_frames + 2, : hop // 2]

    cos_b, sin_b = _dft_bases(N_FFT)
    mel_t = mel_filterbank(SAMPLE_RATE, N_FFT, N_MELS).T  # [201, 80]

    row_spec = lambda lanes: pl.BlockSpec(
        (1, TILE_T, lanes), lambda b_, t_: (b_, t_, 0), memory_space=pltpu.VMEM
    )
    const_spec = lambda s0, s1: pl.BlockSpec(
        (s0, s1), lambda b_, t_: (0, 0), memory_space=pltpu.VMEM
    )

    log_spec = pl.pallas_call(
        _kernel,
        grid=(b, n_tiles),
        in_specs=[
            row_spec(hop),
            row_spec(hop),
            row_spec(hop // 2),
            const_spec(N_FFT, 201),
            const_spec(N_FFT, 201),
            const_spec(201, N_MELS),
        ],
        out_specs=pl.BlockSpec(
            (1, N_MELS, TILE_T), lambda b_, t_: (b_, 0, t_), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, N_MELS, padded_frames), jnp.float32),
        interpret=interpret,
    )(r0, r1, r2, jnp.asarray(cos_b), jnp.asarray(sin_b), jnp.asarray(mel_t))

    log_spec = log_spec[:, :, :num_frames]
    peak = jnp.max(log_spec)
    log_spec = jnp.maximum(log_spec, peak - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    return log_spec[0] if squeeze else log_spec
