"""Objective evaluation metrics (vcvits_tpu/eval.py).

Contracts: MCD is 0 for identical clips and ~0 for pure gain changes
(c0 excluded), DTW recovers known alignments, F0 RMSE in cents recovers a
known pitch shift, voicing F1 is exact on constructed voicing patterns.
The reference has no objective evaluation to mirror (SURVEY §5.5) — these
are self-consistency gates.
"""

import numpy as np
import pytest

from vcvits_tpu.eval import (
    _dct_matrix,
    dtw_path,
    evaluate_pair,
    f0_metrics,
    mel_cepstral_distortion,
    mfcc,
)

SR = 16000


def _sine(freq, seconds=1.0, amp=0.4, sr=SR):
    t = np.arange(int(sr * seconds)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_dct_matrix_orthonormal():
    d = _dct_matrix(13, 128).astype(np.float64)
    full = _dct_matrix(128, 128).astype(np.float64)
    np.testing.assert_allclose(full @ full.T, np.eye(128), atol=1e-6)
    np.testing.assert_allclose(d, full[:13], atol=0)


def test_mcd_identical_is_zero():
    rng = np.random.default_rng(0)
    wav = rng.standard_normal(SR).astype(np.float32) * 0.3
    assert mel_cepstral_distortion(wav, wav, SR) == pytest.approx(0.0, abs=1e-5)


def test_mcd_gain_invariant_but_content_sensitive():
    """A pure gain change moves every log-mel bin by the same constant,
    which projects onto c0 only — excluded from MCD. Different content
    must score far higher."""
    rng = np.random.default_rng(1)
    wav = rng.standard_normal(2 * SR).astype(np.float32) * 0.3
    gain = mel_cepstral_distortion(wav, 0.5 * wav, SR)
    other = mel_cepstral_distortion(
        wav, _sine(330.0, seconds=2.0), SR)
    assert gain < 0.4, f"gain-only MCD should be ~0 dB, got {gain}"
    assert other > 10 * max(gain, 0.05)


def test_mfcc_shape():
    c = mfcc(np.zeros(SR, np.float32), SR, n_mfcc=13)
    assert c.shape[1] == 13 and c.shape[0] > 0


def test_dtw_identity_and_stretch():
    # zero-diagonal cost: the path is the diagonal
    c = np.ones((5, 5)) - np.eye(5)
    i1, i2 = dtw_path(c)
    np.testing.assert_array_equal(i1, i2)
    # y repeats x's middle frame: the path must dwell there, and the
    # aligned cost must be 0 (every x frame has an exact match in y)
    x = np.array([[0.0], [1.0], [2.0], [3.0]])
    y = np.array([[0.0], [1.0], [1.0], [1.0], [2.0], [3.0]])
    cost = np.abs(x[:, None, 0] - y[None, :, 0])
    i1, i2 = dtw_path(cost)
    assert cost[i1, i2].sum() == 0.0
    assert i1[0] == 0 and i2[0] == 0 and i1[-1] == 3 and i2[-1] == 5
    assert np.sum(i1 == 1) == 3  # x frame 1 aligned to y frames 1..3


def test_f0_rmse_recovers_pitch_shift():
    ref = _sine(220.0)
    gen = _sine(220.0 * 2 ** (200.0 / 1200.0))  # +200 cents
    m = f0_metrics(ref, gen, SR)
    assert m["voicing_f1"] > 0.95
    assert m["f0_rmse_cents"] == pytest.approx(200.0, abs=25.0)
    same = f0_metrics(ref, ref, SR)
    assert same["f0_rmse_cents"] == pytest.approx(0.0, abs=1e-6)
    assert same["voicing_f1"] == 1.0


def test_f0_metrics_unvoiced_pair():
    silent = np.zeros(SR, np.float32)
    m = f0_metrics(silent, silent, SR)
    assert m["voiced_ref"] == 0 and m["voiced_gen"] == 0
    assert np.isnan(m["f0_rmse_hz"])


def test_evaluate_pair_keys_and_pitch_sr():
    ref = _sine(220.0, sr=48000, seconds=0.5)
    gen = _sine(247.0, sr=48000, seconds=0.5)
    m = evaluate_pair(ref, gen, 48000, pitch_sr=16000)
    for k in ("mcd_db", "f0_rmse_cents", "voicing_f1", "seconds"):
        assert k in m, k
    assert m["seconds"] == pytest.approx(0.5, abs=1e-3)
    assert m["mcd_db"] > 0.0
