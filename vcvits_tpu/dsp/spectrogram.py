"""STFT / mel-spectrogram front-end, TPU-native.

Capability parity with /root/reference/vits/mel_processing.py:54-142
(spectrogram_torch, spec_to_mel_torch, mel_spectrogram_torch) and the Slaney
mel filterbank of librosa.filters.mel, rebuilt for XLA:

* Framing is a single gather with a precomputed index matrix (static shapes),
  not a Python loop; the whole front-end jits and fuses.
* Two spectrogram paths: an exact fp32 `jnp.fft.rfft` path (the parity anchor
  for the mel-L1 <= 1e-3 gate) and a matmul DFT path that runs the transform
  on the MXU as frames @ dft_basis — faster inside the bf16 training step.
* The mel projection is a plain matmul, fused by XLA with the log-compress.

Semantics matched exactly: reflect-pad (n_fft-hop)/2 on both ends,
hann(win) window, center=False, |S| = sqrt(re^2 + im^2 + 1e-6),
mel = log(clamp(fbank @ |S|, 1e-5)). Layout is [B, T_frames, F] (time-major,
frequency on lanes) — the transpose of the reference's [B, F, T].
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, dtype=np.float32) -> np.ndarray:
    """Periodic Hann window (matches torch.hann_window(periodic=True))."""
    n = np.arange(win_length, dtype=np.float64)
    w = 0.5 - 0.5 * np.cos(2.0 * math.pi * n / win_length)
    return w.astype(dtype)


def _frame_indices(num_frames: int, n_fft: int, hop: int) -> np.ndarray:
    return (np.arange(num_frames)[:, None] * hop + np.arange(n_fft)[None, :]).astype(np.int32)


def frame_signal(y: jax.Array, n_fft: int, hop_length: int) -> jax.Array:
    """[B, T] -> [B, num_frames, n_fft] overlapping frames (no padding)."""
    t = y.shape[-1]
    num_frames = 1 + (t - n_fft) // hop_length
    idx = _frame_indices(num_frames, n_fft, hop_length)
    return y[..., idx]


def _reflect_pad(y: jax.Array, pad: int) -> jax.Array:
    if pad == 0:
        return y
    return jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(pad, pad)], mode="reflect")


@functools.lru_cache(maxsize=8)
def _dft_basis(n_fft: int, win_length: int) -> Tuple[np.ndarray, np.ndarray]:
    """Windowed real-DFT basis [n_fft, n_fft//2+1] (cos, -sin) as float32."""
    k = np.arange(n_fft // 2 + 1)
    n = np.arange(n_fft)
    ang = 2.0 * math.pi * np.outer(n, k) / n_fft
    win = hann_window(win_length, np.float64)
    if win_length < n_fft:
        lp = (n_fft - win_length) // 2
        win = np.pad(win, (lp, n_fft - win_length - lp))
    cos_b = (np.cos(ang) * win[:, None]).astype(np.float32)
    sin_b = (-np.sin(ang) * win[:, None]).astype(np.float32)
    return cos_b, sin_b


def stft_complex(
    y: jax.Array,
    n_fft: int,
    hop_length: int,
    win_length: int,
    pad: Optional[int] = None,
    method: str = "fft",
) -> Tuple[jax.Array, jax.Array]:
    """Real/imag STFT of [B, T] -> two [B, num_frames, n_fft//2+1] arrays.

    `pad` defaults to (n_fft - hop)/2 reflect padding, matching
    mel_processing.py:66 / pipeline.py:24. center is always False.
    """
    if pad is None:
        pad = int((n_fft - hop_length) / 2)
    if pad < 0:
        raise ValueError(
            f"n_fft ({n_fft}) must be >= hop_length ({hop_length}) for the "
            "reference's reflect-padding scheme"
        )
    y = _reflect_pad(y, pad)
    frames = frame_signal(y, n_fft, hop_length)
    if method == "fft":
        win = jnp.asarray(hann_window(win_length))
        if win_length < n_fft:
            lp = (n_fft - win_length) // 2
            win = jnp.pad(win, (lp, n_fft - win_length - lp))
        spec = jnp.fft.rfft(frames * win, axis=-1)
        return jnp.real(spec), jnp.imag(spec)
    elif method == "matmul":
        cos_b, sin_b = _dft_basis(n_fft, win_length)
        re = jnp.matmul(frames, jnp.asarray(cos_b), precision=jax.lax.Precision.HIGHEST)
        im = jnp.matmul(frames, jnp.asarray(sin_b), precision=jax.lax.Precision.HIGHEST)
        return re, im
    raise ValueError(f"unknown stft method {method!r}")


def stft_magnitude(
    y: jax.Array,
    n_fft: int,
    hop_length: int,
    win_length: int,
    method: str = "fft",
) -> jax.Array:
    """|STFT| with the reference's sqrt(re^2+im^2+1e-6) floor.

    [B, T] -> [B, num_frames, n_fft//2+1]. Parity anchor for
    mel_processing.py:54-74 (frames' = T/hop for T % hop == 0).
    """
    re, im = stft_complex(y, n_fft, hop_length, win_length, method=method)
    return jnp.sqrt(re * re + im * im + 1e-6)


def istft(
    spec_re: jax.Array,
    spec_im: jax.Array,
    n_fft: int,
    hop_length: int,
    win_length: int,
) -> jax.Array:
    """Inverse STFT with center=True trimming (torch.istft semantics).

    [B, F_frames, n_fft//2+1] -> [B, hop*(F_frames-1)] waveform. Windowed
    overlap-add normalized by the summed squared window envelope. Used by the
    train-time audio smoothing pipeline (reference pipeline.py:27,63).
    """
    b, t_frames, _ = spec_re.shape
    win = jnp.asarray(hann_window(win_length))
    if win_length < n_fft:
        lp = (n_fft - win_length) // 2
        win = jnp.pad(win, (lp, n_fft - win_length - lp))
    frames = jnp.fft.irfft(jax.lax.complex(spec_re, spec_im), n=n_fft, axis=-1)
    frames = frames * win  # synthesis window

    total = n_fft + hop_length * (t_frames - 1)
    # Overlap-add both the frames and the squared window via one
    # transposed-conv-style scatter: [B, T_frames, n_fft] -> [B, total].
    idx = _frame_indices(t_frames, n_fft, hop_length).reshape(-1)
    flat = frames.reshape(b, -1)
    wav = jnp.zeros((b, total), frames.dtype).at[:, idx].add(flat)
    wsq = jnp.zeros((total,), win.dtype).at[idx].add(jnp.tile(win * win, t_frames))
    wav = wav / jnp.maximum(wsq, 1e-11)[None, :]
    trim = n_fft // 2
    return wav[:, trim : total - trim]


@functools.lru_cache(maxsize=8)
def mel_filterbank(
    sr: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
) -> np.ndarray:
    """Slaney-scale, Slaney-normalized mel filterbank [n_mels, n_fft//2+1].

    Reimplementation of the algorithm behind librosa.filters.mel (the exact
    basis the reference caches at mel_processing.py:103; golden-tested
    against transformers.audio_utils.mel_filter_bank which ports the same
    algorithm).
    """
    if fmax is None:
        fmax = sr / 2.0

    def hz_to_mel(f):
        f = np.asanyarray(f, dtype=np.float64)
        mel = f / (200.0 / 3.0)
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / (200.0 / 3.0)
        logstep = math.log(6.4) / 27.0
        return np.where(f >= min_log_hz, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mel)

    def mel_to_hz(m):
        m = np.asanyarray(m, dtype=np.float64)
        f = m * (200.0 / 3.0)
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / (200.0 / 3.0)
        logstep = math.log(6.4) / 27.0
        return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), f)

    fft_freqs = np.linspace(0.0, sr / 2.0, n_fft // 2 + 1)
    mel_pts = mel_to_hz(np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2))
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_pts[2 : n_mels + 2] - mel_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def dynamic_range_compression(x: jax.Array, clip_val: float = 1e-5) -> jax.Array:
    """log(clamp(x, clip_val)) — mel_processing.py:22-28."""
    return jnp.log(jnp.clip(x, min=clip_val))


def spec_to_mel(
    spec: jax.Array,
    n_fft: int,
    n_mels: int,
    sr: int,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
) -> jax.Array:
    """[B, T, F] linear magnitude -> [B, T, n_mels] log-mel.

    Parity with mel_processing.py:98-112 (there: mel_basis @ spec in [F, T]
    layout; here: spec @ fbank.T in [T, F] layout).
    """
    fbank = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, fmin, fmax))
    mel = jnp.matmul(spec, fbank.T, precision=jax.lax.Precision.HIGHEST)
    return dynamic_range_compression(mel)


def mel_spectrogram(
    y: jax.Array,
    n_fft: int,
    n_mels: int,
    sr: int,
    hop_length: int,
    win_length: int,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    method: str = "fft",
) -> jax.Array:
    """Waveform [B, T] -> log-mel [B, T/hop, n_mels] (mel_processing.py:115-142)."""
    spec = stft_magnitude(y, n_fft, hop_length, win_length, method=method)
    return spec_to_mel(spec, n_fft, n_mels, sr, fmin, fmax)
