import pytest
import numpy as np

from vcvits_tpu.dsp.pitch_shift import pitch_shift


def _dominant_freq(y, sr):
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    return np.argmax(spec) * sr / len(y)


@pytest.mark.slow
def test_pitch_shift_semitones():
    sr = 16000
    t = np.arange(sr) / sr
    y = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    for n in [-5, -2, 2, 5]:
        z = pitch_shift(y, sr, n)
        assert len(z) == len(y)  # duration preserved
        expect = 220 * 2 ** (n / 12)
        got = _dominant_freq(z[2000:-2000], sr)
        assert abs(got - expect) / expect < 0.03, (n, got, expect)


def test_pitch_shift_zero_is_identity():
    y = np.random.default_rng(0).standard_normal(4000).astype(np.float32)
    np.testing.assert_array_equal(pitch_shift(y, 16000, 0), y)
