import numpy as np
import pytest
import torch

from vcvits_tpu.dsp.pitch import C2_HZ, C7_HZ, coarse_f0, estimate_pitch, pyin


def _sine(freq, sr=16000, dur=1.0, amp=0.5):
    t = np.arange(int(sr * dur)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


@pytest.mark.parametrize("freq", [110.0, 220.0, 440.0])
def test_pyin_tracks_pure_tone(freq):
    y = _sine(freq)
    f0, voiced, vprob = pyin(y, sr=16000, frame_length=2048, win_length=1024, hop_length=320)
    mid = f0[5:-5]
    assert np.isfinite(mid).mean() > 0.9  # voiced nearly everywhere
    est = np.nanmedian(mid)
    assert abs(est - freq) / freq < 0.03  # within 3% (half a semitone ~ 3%)


def test_pyin_silence_is_unvoiced():
    y = np.zeros(16000, dtype=np.float32)
    f0, voiced, _ = pyin(y, sr=16000, frame_length=2048, win_length=1024, hop_length=320)
    assert voiced.mean() < 0.2


def test_estimate_pitch_frame_alignment():
    """Frames must align 1:1 with HuBERT's 50 Hz frames: len//320."""
    for n in [16000, 32000, 16000 + 320 * 3]:
        y = _sine(200.0, dur=n / 16000)
        f0 = estimate_pitch(y, sr=16000, n_fft=2048, win_length=2048, hop_length=320)
        assert len(f0) == n // 320


def test_pyin_vibrato_follows():
    sr = 16000
    t = np.arange(sr) / sr
    freq = 220.0 * 2 ** (0.5 * np.sin(2 * np.pi * 5 * t) / 12)  # +-0.5 semitone at 5 Hz
    phase = 2 * np.pi * np.cumsum(freq) / sr
    y = (0.5 * np.sin(phase)).astype(np.float32)
    f0, voiced, _ = pyin(y, sr=sr, frame_length=2048, win_length=1024, hop_length=320)
    mid = f0[5:-5]
    assert np.isfinite(mid).mean() > 0.9
    assert np.nanstd(mid) > 1.0  # actually tracks modulation, not a flat line


def _torch_coarse_f0(f0, f0_min=50.0, f0_max=1100.0, f0_bin=512):
    """Inline port of the reference quantizer (audio.py:65-76) for parity."""
    f0 = torch.from_numpy(np.asarray(f0, dtype=np.float32))
    f0_mel_min = 1127 * np.log(1 + f0_min / 700)
    f0_mel_max = 1127 * np.log(1 + f0_max / 700)
    f0_mel = 1127 * torch.log(1 + f0 / 700)
    f0_mel[f0_mel > 0] = (f0_mel[f0_mel > 0] - f0_mel_min) * (f0_bin - 2) / (
        f0_mel_max - f0_mel_min
    ) + 1
    f0_mel[f0_mel <= 1] = 1
    f0_mel[f0_mel > f0_bin - 1] = f0_bin - 1
    return torch.round(f0_mel).long().numpy()


def test_coarse_f0_parity_with_reference():
    g = np.random.default_rng(3)
    f0 = np.concatenate([
        np.zeros(10), g.uniform(20, 1500, 500), [50.0, 1100.0, 49.9, 1100.1],
        np.linspace(C2_HZ, C7_HZ, 100),
    ]).astype(np.float32)
    ours = coarse_f0(f0)
    ref = _torch_coarse_f0(f0)
    np.testing.assert_array_equal(ours, ref)
    assert ours.min() >= 1 and ours.max() <= 511
