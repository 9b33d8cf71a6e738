"""Golden-value parity tests for the DSP front-end vs torch.stft (CPU) and
the Slaney mel filterbank vs transformers.audio_utils (a librosa port).

The reference computes spectrograms with torch.stft
(mel_processing.py:54-74); bit-comparability here is the anchor for the
mel-L1 <= 1e-3 gate (SURVEY.md §6).
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from vcvits_tpu.dsp.spectrogram import (
    hann_window,
    istft,
    mel_filterbank,
    mel_spectrogram,
    spec_to_mel,
    stft_complex,
    stft_magnitude,
)

N_FFT, HOP, WIN = 2048, 512, 2048
SR = 48000


def _torch_spectrogram(y: np.ndarray) -> np.ndarray:
    """Reference semantics of mel_processing.spectrogram_torch (:54-74)."""
    yt = torch.from_numpy(y).float()
    pad = int((N_FFT - HOP) / 2)
    yt = torch.nn.functional.pad(yt.unsqueeze(1), (pad, pad), mode="reflect").squeeze(1)
    window = torch.hann_window(WIN)
    spec = torch.stft(
        yt, N_FFT, hop_length=HOP, win_length=WIN, window=window,
        center=False, pad_mode="reflect", normalized=False, onesided=True,
        return_complex=True,
    )
    return torch.sqrt(spec.real.pow(2) + spec.imag.pow(2) + 1e-6).numpy()  # [B, F, T]


@pytest.fixture(scope="module")
def wav():
    g = np.random.default_rng(0)
    t = np.arange(SR // 2) / SR  # 0.5 s
    y = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.1 * g.standard_normal(len(t))
    return np.stack([y, 0.3 * np.sin(2 * np.pi * 220 * t)]).astype(np.float32)


def test_hann_window_matches_torch():
    np.testing.assert_allclose(hann_window(WIN), torch.hann_window(WIN).numpy(), atol=1e-6)


@pytest.mark.parametrize("method", ["fft", "matmul"])
def test_stft_magnitude_matches_torch(wav, method):
    ours = np.asarray(stft_magnitude(jnp.asarray(wav), N_FFT, HOP, WIN, method=method))
    ref = _torch_spectrogram(wav).transpose(0, 2, 1)  # [B, T, F]
    assert ours.shape == ref.shape
    assert ours.shape[1] == wav.shape[1] // HOP  # frames == T/hop
    tol = 2e-4 if method == "fft" else 2e-3
    np.testing.assert_allclose(ours, ref, atol=tol, rtol=1e-3)


def test_mel_filterbank_matches_librosa_port():
    from transformers.audio_utils import mel_filter_bank

    ref = mel_filter_bank(
        num_frequency_bins=N_FFT // 2 + 1,
        num_mel_filters=128,
        min_frequency=0.0,
        max_frequency=SR / 2.0,
        sampling_rate=SR,
        norm="slaney",
        mel_scale="slaney",
    ).T  # transformers returns [F, n_mels]
    ours = mel_filterbank(SR, N_FFT, 128, 0.0, None)
    np.testing.assert_allclose(ours, ref, atol=1e-7)


def test_mel_spectrogram_end_to_end_vs_torch(wav):
    from transformers.audio_utils import mel_filter_bank

    spec_ref = _torch_spectrogram(wav)  # [B, F, T]
    fbank = mel_filter_bank(
        num_frequency_bins=N_FFT // 2 + 1, num_mel_filters=128,
        min_frequency=0.0, max_frequency=SR / 2.0, sampling_rate=SR,
        norm="slaney", mel_scale="slaney",
    ).T
    mel_ref = np.log(np.clip(np.einsum("mf,bft->bmt", fbank, spec_ref), 1e-5, None))

    ours = np.asarray(
        mel_spectrogram(jnp.asarray(wav), N_FFT, 128, SR, HOP, WIN)
    ).transpose(0, 2, 1)
    # log compresses; mel-L1 gate is 1e-3, hold ourselves to better than that
    assert np.abs(ours - mel_ref).mean() < 1e-4


def test_istft_roundtrip_recovers_shifted_signal(wav):
    """STFT(center=False, pad 768) -> iSTFT(center=True) reproduces the
    input shifted by pad - n_fft//2 samples (the reference audio pipeline's
    net effect, pipeline.py:48-70)."""
    re, im = stft_complex(jnp.asarray(wav), N_FFT, HOP, WIN)
    out = np.asarray(istft(re, im, N_FFT, HOP, WIN))
    pad = (N_FFT - HOP) // 2
    shift = N_FFT // 2 - pad  # 256
    expect = wav[:, shift : shift + out.shape[1]]
    # interior matches (edges differ from window tapering)
    np.testing.assert_allclose(out[:, 2048:-2048], expect[:, 2048:-2048], atol=1e-3)


def test_spec_to_mel_shape():
    spec = jnp.ones((2, 10, N_FFT // 2 + 1))
    mel = spec_to_mel(spec, N_FFT, 128, SR)
    assert mel.shape == (2, 10, 128)
