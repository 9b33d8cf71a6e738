"""Train-time source-audio smoothing (STFT -> iSTFT round trip).

Capability parity with /root/reference/vits/model/pipeline.py:11-70
(SpeechConversionAudioPipeline): the 16 kHz source is pushed through a
complex STFT (reflect pad (n_fft-hop)/2, center=False) and straight back
through an iSTFT (center=True), acting as an information bottleneck before
HuBERT; the result is zero-padded back to the input length. The optional
SpecAugment frequency masking (dormant in the reference: aug=False at
vcvits.py:62) is implemented and off by default.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from vcvits_tpu.dsp.spectrogram import istft, stft_complex


def freq_mask(spec_re: jax.Array, spec_im: jax.Array, rng: jax.Array,
              mask_param: int = 80):
    """SpecAugment frequency masking (torchaudio T.FrequencyMasking
    semantics: one random band [f0, f0+f), f ~ U[0, mask_param))."""
    f_bins = spec_re.shape[-1]
    r_f, r_f0 = jax.random.split(rng)
    f = jax.random.randint(r_f, (), 0, mask_param)
    f0 = jax.random.randint(r_f0, (), 0, jnp.maximum(f_bins - f, 1))
    idx = jnp.arange(f_bins)
    keep = ~((idx >= f0) & (idx < f0 + f))
    return spec_re * keep, spec_im * keep


def smooth_source(
    x_wav: jax.Array,
    n_fft: int = 2048,
    hop_length: int = 512,
    win_length: int = 2048,
    aug_rng: Optional[jax.Array] = None,
) -> jax.Array:
    """[B, T] -> [B, T]; wav' = istft(stft(wav)) zero-padded to T."""
    re, im = stft_complex(x_wav, n_fft, hop_length, win_length)
    if aug_rng is not None:
        re, im = freq_mask(re, im, aug_rng)
    wav = istft(re, im, n_fft, hop_length, win_length)
    t = x_wav.shape[-1]
    out = jnp.zeros_like(x_wav)
    return jax.lax.dynamic_update_slice_in_dim(out, wav[:, :t], 0, axis=1)
