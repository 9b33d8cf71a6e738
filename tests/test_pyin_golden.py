"""pYIN parity vs librosa goldens + analytic contract tests.

librosa (the reference's actual pYIN, audio.py:37) is not installable on
this zero-egress host, so the literal golden comparison is two-part:
  1. tools/make_pyin_goldens.py generates librosa.pyin goldens in any dev
     environment that has librosa; the golden test below asserts bin-exact
     `coarse_f0` agreement and auto-skips while the files are absent.
  2. The analytic tests below pin the same contract librosa documents —
     fmin=C2..fmax=C7 range, 50 Hz frame cadence, NaN->0 unvoiced, and
     frequency accuracy across the musical range — so a systematic bin
     shift cannot hide even without the goldens.
"""

import glob
import os

import numpy as np
import pytest

from vcvits_tpu.dsp.pitch import C2_HZ, C7_HZ, coarse_f0, estimate_pitch

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
GOLDENS = sorted(glob.glob(os.path.join(GOLDEN_DIR, "pyin_*.npz")))

SR, N_FFT, WIN, HOP = 16000, 2048, 2048, 320


def _signals():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from make_pyin_goldens import signals

    return dict(signals())


@pytest.mark.skipif(not GOLDENS, reason=
                    "librosa goldens absent (generate with "
                    "tools/make_pyin_goldens.py in a librosa-equipped env)")
@pytest.mark.parametrize("path", GOLDENS, ids=[os.path.basename(p) for p in GOLDENS])
def test_pyin_matches_librosa_golden(path):
    g = np.load(path)
    name = os.path.basename(path)[len("pyin_"):-len(".npz")]
    y = _signals()[name]
    f0 = estimate_pitch(y, sr=int(g["sr"]), n_fft=int(g["n_fft"]),
                        win_length=int(g["win"]), hop_length=int(g["hop"]))
    bins = coarse_f0(f0)
    ref = np.asarray(g["coarse"])
    n = min(len(bins), len(ref))
    agree = float(np.mean(bins[:n] == ref[:n]))
    assert agree >= 0.98, f"{name}: only {agree:.1%} of coarse bins agree"
    # voiced frames: f0 within half a semitone of librosa's
    voiced = (np.asarray(g["f0"])[:n] > 0) & (f0[:n] > 0)
    if voiced.any():
        cents = 1200 * np.abs(np.log2(f0[:n][voiced] / np.asarray(g["f0"])[:n][voiced]))
        assert float(np.percentile(cents, 95)) < 50


# ---------------- analytic contract tests (always run) --------------------

@pytest.mark.parametrize("freq", [82.41, 110.0, 220.0, 440.0, 880.0, 1760.0])
def test_pure_tone_accuracy_across_range(freq):
    """Frequency sweep over the musical range: voiced detection and < 25
    cents error for steady tones (librosa matches this easily; a systematic
    bin-level divergence in CMNDF/parabolic/Viterbi would fail it)."""
    t = np.arange(int(SR * 0.8)) / SR
    y = (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    f0 = estimate_pitch(y, sr=SR, n_fft=N_FFT, win_length=WIN, hop_length=HOP)
    mid = f0[len(f0) // 4: -len(f0) // 4]
    voiced = mid > 0
    assert voiced.mean() > 0.9, f"{freq} Hz mostly unvoiced"
    cents = 1200 * np.abs(np.log2(mid[voiced] / freq))
    assert float(np.median(cents)) < 25, f"{freq} Hz: median {np.median(cents)} cents"


def test_range_limits_c2_c7():
    """librosa clamps the search to [C2, C7] (audio.py:31-32 defaults):
    tones outside the range must not produce f0 estimates inside it at the
    true frequency."""
    t = np.arange(int(SR * 0.6)) / SR
    low = (0.5 * np.sin(2 * np.pi * 40.0 * t)).astype(np.float32)  # < C2
    f0 = estimate_pitch(low, sr=SR, n_fft=N_FFT, win_length=WIN, hop_length=HOP)
    voiced = f0[f0 > 0]
    if len(voiced):
        assert voiced.min() >= C2_HZ * 0.97
        assert not np.any(np.abs(voiced - 40.0) < 2.0)
    assert float(C2_HZ) == pytest.approx(65.406, abs=0.01)
    assert float(C7_HZ) == pytest.approx(2093.0, abs=0.1)


def test_frame_cadence_and_nan_to_zero():
    """50 Hz frames (hop 320 @ 16 k) and NaN->0 for unvoiced (audio.py:63)."""
    t = np.arange(SR) / SR
    y = np.zeros(SR, np.float32)  # silence: all unvoiced
    f0 = estimate_pitch(y, sr=SR, n_fft=N_FFT, win_length=WIN, hop_length=HOP)
    # 1 + (T + 2*pad - frame_length)//hop = T//hop for the reference's
    # reflect pad of (n_fft - hop)/2 (audio.py:28-35): 50 Hz frames, 1:1
    # with HuBERT's
    assert len(f0) == SR // HOP
    assert np.all(f0 == 0.0)
    assert f0.dtype == np.float32


def test_coarse_f0_bin_edges():
    """coarse_f0 quantizer edges (audio.py:65-76): 0 Hz -> bin 1, f0_max ->
    bin 511, monotone in between."""
    f0 = np.array([0.0, 50.0, 100.0, 300.0, 700.0, 1100.0, 4000.0], np.float32)
    bins = coarse_f0(f0)
    assert bins[0] == 1
    assert bins[-1] == 511
    assert np.all(np.diff(bins[1:]) >= 0)
