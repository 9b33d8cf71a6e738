"""Fused Pallas mel-spectrogram kernel (N1 in SURVEY.md §2.6).

One kernel computes, per block of frames: windowed real-DFT via two MXU
matmuls against a frequency-tiled basis, |S| = sqrt(re^2+im^2+1e-6), and
the Slaney mel projection — accumulating mel partial sums across frequency
tiles in a VMEM scratch so the [frames, 1025] spectrogram never touches
HBM. The log-compress runs in the same kernel on the final tile.

Numerically matches vcvits_tpu.dsp.spectrogram.mel_spectrogram (fp32,
HIGHEST-precision matmuls); exposed as `mel_spectrogram_fused`.

Falls back to the XLA path automatically off-TPU.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vcvits_tpu.dsp.spectrogram import (
    _dft_basis,
    _frame_indices,
    mel_filterbank,
    mel_spectrogram,
)

FRAME_BLOCK = 128  # frames per grid step (sublane-friendly)
FREQ_TILE = 256  # frequency bins per tile (lane-aligned); 1025 pads to 1280


def _padded_basis(n_fft: int, win_length: int, n_mels: int, sr: int,
                  fmin: float, fmax) -> tuple:
    cos_b, sin_b = _dft_basis(n_fft, win_length)  # [n_fft, F]
    fbank = mel_filterbank(sr, n_fft, n_mels, fmin, fmax).T  # [F, n_mels]
    f = cos_b.shape[1]
    n_tiles = -(-f // FREQ_TILE)
    f_pad = n_tiles * FREQ_TILE
    pad = ((0, 0), (0, f_pad - f))
    cos_p = np.pad(cos_b, pad).astype(np.float32)
    sin_p = np.pad(sin_b, pad).astype(np.float32)
    fb_p = np.pad(fbank, ((0, f_pad - f), (0, 0))).astype(np.float32)
    # zero fbank rows for padded freqs; also kill the +1e-6 floor leakage on
    # padded bins by zeroing their fbank row (already zero). |S|_pad becomes
    # sqrt(1e-6) but contributes 0 through the zero fbank row.
    return cos_p, sin_p, fb_p, n_tiles


def mel_spectrogram_fused(
    y: jax.Array,
    n_fft: int,
    n_mels: int,
    sr: int,
    hop_length: int,
    win_length: int,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    clip_val: float = 1e-5,
) -> jax.Array:
    """[B, T] -> [B, T/hop, n_mels] log-mel; Pallas on TPU, XLA elsewhere."""
    if jax.devices()[0].platform not in ("tpu",):
        return mel_spectrogram(y, n_fft, n_mels, sr, hop_length, win_length,
                               fmin, fmax)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t = y.shape
    pad = (n_fft - hop_length) // 2
    ypad = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    num_frames = 1 + (ypad.shape[1] - n_fft) // hop_length
    idx = _frame_indices(num_frames, n_fft, hop_length)
    frames = ypad[:, idx].reshape(b * num_frames, n_fft)

    rows = frames.shape[0]
    rows_pad = -(-rows // FRAME_BLOCK) * FRAME_BLOCK
    frames = jnp.pad(frames, ((0, rows_pad - rows), (0, 0)))

    cos_p, sin_p, fb_p, n_tiles = _padded_basis(
        n_fft, win_length, n_mels, sr, fmin, fmax if fmax is None else float(fmax)
    )

    def kernel(fr_ref, cos_ref, sin_ref, fb_ref, out_ref, acc_ref):
        ft = pl.program_id(1)
        fr = fr_ref[:]
        re = jnp.dot(fr, cos_ref[:], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        im = jnp.dot(fr, sin_ref[:], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        mag = jnp.sqrt(re * re + im * im + 1e-6)
        part = jnp.dot(mag, fb_ref[:], preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)

        @pl.when(ft == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc_ref[:] += part

        @pl.when(ft == n_tiles - 1)
        def _():
            out_ref[:] = jnp.log(jnp.clip(acc_ref[:], min=clip_val))

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows_pad, n_mels), jnp.float32),
        grid=(rows_pad // FRAME_BLOCK, n_tiles),
        in_specs=[
            pl.BlockSpec((FRAME_BLOCK, n_fft), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, FREQ_TILE), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, FREQ_TILE), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((FREQ_TILE, n_mels), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((FRAME_BLOCK, n_mels), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((FRAME_BLOCK, n_mels), jnp.float32)],
    )(frames, jnp.asarray(cos_p), jnp.asarray(sin_p), jnp.asarray(fb_p))

    return out[:rows].reshape(b, num_frames, n_mels)


def spectrogram_mel_fused(
    y: jax.Array,
    n_fft: int,
    n_mels: int,
    sr: int,
    hop_length: int,
    win_length: int,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    clip_val: float = 1e-5,
):
    """[B, T] -> (|STFT| [B, T/hop, n_fft//2+1], log-mel [B, T/hop, n_mels])
    in ONE Pallas kernel: the windowed real-DFT magnitudes are written once
    per frequency tile AND folded into the mel accumulation, so the frames
    are read from HBM a single time and the mel projection costs no extra
    spectrogram pass. This feeds the G loss (train/step.py features()):
    y_spec for the posterior encoder, y_mel for the mel-L1 term —
    mel_processing.py:54-142 semantics. Falls back to XLA off-TPU.
    """
    from vcvits_tpu.dsp.spectrogram import spec_to_mel, stft_magnitude

    if jax.devices()[0].platform not in ("tpu",):
        spec = stft_magnitude(y, n_fft, hop_length, win_length)
        mel = spec_to_mel(spec, n_fft, n_mels, sr, fmin, fmax)
        return spec, mel

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t = y.shape
    pad = (n_fft - hop_length) // 2
    ypad = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    num_frames = 1 + (ypad.shape[1] - n_fft) // hop_length
    idx = _frame_indices(num_frames, n_fft, hop_length)
    frames = ypad[:, idx].reshape(b * num_frames, n_fft)

    rows = frames.shape[0]
    rows_pad = -(-rows // FRAME_BLOCK) * FRAME_BLOCK
    frames = jnp.pad(frames, ((0, rows_pad - rows), (0, 0)))

    cos_p, sin_p, fb_p, n_tiles = _padded_basis(
        n_fft, win_length, n_mels, sr, fmin, fmax if fmax is None else float(fmax)
    )
    n_freq = n_fft // 2 + 1

    def kernel(fr_ref, cos_ref, sin_ref, fb_ref, spec_ref, mel_ref, acc_ref):
        ft = pl.program_id(1)
        fr = fr_ref[:]
        re = jnp.dot(fr, cos_ref[:], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        im = jnp.dot(fr, sin_ref[:], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        mag = jnp.sqrt(re * re + im * im + 1e-6)
        spec_ref[:] = mag
        part = jnp.dot(mag, fb_ref[:], preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)

        @pl.when(ft == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc_ref[:] += part

        @pl.when(ft == n_tiles - 1)
        def _():
            mel_ref[:] = jnp.log(jnp.clip(acc_ref[:], min=clip_val))

    spec, mel = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((rows_pad, n_tiles * FREQ_TILE), jnp.float32),
            jax.ShapeDtypeStruct((rows_pad, n_mels), jnp.float32),
        ),
        grid=(rows_pad // FRAME_BLOCK, n_tiles),
        in_specs=[
            pl.BlockSpec((FRAME_BLOCK, n_fft), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, FREQ_TILE), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, FREQ_TILE), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((FREQ_TILE, n_mels), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((FRAME_BLOCK, FREQ_TILE), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((FRAME_BLOCK, n_mels), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((FRAME_BLOCK, n_mels), jnp.float32)],
    )(frames, jnp.asarray(cos_p), jnp.asarray(sin_p), jnp.asarray(fb_p))

    spec = spec[:rows, :n_freq].reshape(b, num_frames, n_freq)
    mel = mel[:rows].reshape(b, num_frames, n_mels)
    return spec, mel
