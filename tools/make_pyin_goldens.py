#!/usr/bin/env python
"""Generate librosa.pyin golden files for the pYIN parity test.

The reference's preprocessor is librosa.pyin
(/root/reference/vits/data/audio.py:24-63: fmin=C2, fmax=C7,
frame_length=win_length, win_length=win_length//2, hop=320, NaN->0).
librosa is NOT installed on the TPU build host (zero-egress image), so this
script must be run in a dev environment that has it:

    python tools/make_pyin_goldens.py

It writes tests/goldens/pyin_<name>.npz files containing the input signal
parameters and librosa's f0/coarse output; tests/test_pyin_golden.py then
asserts bin-exact agreement of our implementation and auto-skips when the
goldens are absent. The signals are generated deterministically here so
the goldens stay reproducible.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 16000
N_FFT = 2048
WIN = 2048
HOP = 320
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "tests", "goldens")


def signals():
    """Deterministic test signals shared with tests/test_pyin_golden.py."""
    rng = np.random.default_rng(1234)
    t = np.arange(int(SR * 1.2)) / SR
    yield "tone_220", (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    yield "tone_82", (0.5 * np.sin(2 * np.pi * 82.41 * t)).astype(np.float32)
    glide = np.sin(2 * np.pi * np.cumsum(np.linspace(150, 600, len(t))) / SR)
    yield "glide_150_600", (0.5 * glide).astype(np.float32)
    vib = np.sin(2 * np.pi * np.cumsum(330 * (1 + 0.03 * np.sin(2 * np.pi * 5 * t))) / SR)
    yield "vibrato_330", (0.5 * vib).astype(np.float32)
    harm = sum(np.sin(2 * np.pi * 196 * (k + 1) * t) / (k + 1) for k in range(5))
    noisy = 0.3 * harm / np.abs(harm).max() + 0.03 * rng.standard_normal(len(t))
    yield "harmonic_196_noisy", noisy.astype(np.float32)
    gap = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    gap[len(t) // 3: 2 * len(t) // 3] = 0.001 * rng.standard_normal(len(t) // 3)
    yield "voiced_unvoiced_440", gap


def main():
    import librosa

    from vcvits_tpu.dsp.pitch import C2_HZ, C7_HZ, coarse_f0

    os.makedirs(OUT_DIR, exist_ok=True)
    for name, y in signals():
        pad = (N_FFT - HOP) // 2
        snd = np.pad(y.astype(np.float64), (pad, pad), mode="reflect")
        f0, _, _ = librosa.pyin(
            snd, fmin=float(C2_HZ), fmax=float(C7_HZ), sr=SR,
            frame_length=WIN, win_length=WIN // 2, hop_length=HOP,
        )
        f0 = np.nan_to_num(f0, nan=0.0).astype(np.float32)
        bins = coarse_f0(f0)
        path = os.path.join(OUT_DIR, f"pyin_{name}.npz")
        np.savez(path, f0=f0, coarse=bins,
                 sr=SR, n_fft=N_FFT, win=WIN, hop=HOP,
                 librosa_version=str(librosa.__version__))
        voiced = f0 > 0
        print(f"{name}: {voiced.sum()}/{len(f0)} voiced, "
              f"median f0 {np.median(f0[voiced]) if voiced.any() else 0:.1f} Hz "
              f"-> {path}")


if __name__ == "__main__":
    main()
