"""C++ native library parity vs the NumPy fallbacks."""

import math
import os
import subprocess

import numpy as np
import pytest

from vcvits_tpu import native


@pytest.fixture(scope="module", autouse=True)
def build_native():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    so = os.path.join(root, "vcvits_tpu", "native", "libvcvits_native.so")
    if not os.path.exists(so):
        subprocess.run(["make", "-C", os.path.join(root, "native")], check=True)
    assert native.available()
    yield


def _no_native(monkeypatch):
    monkeypatch.setenv("VCVITS_NATIVE", "0")


def test_resample_bit_parity(monkeypatch):
    from vcvits_tpu.dsp import resample as rs

    g = np.random.default_rng(0)
    y = g.standard_normal(12345).astype(np.float32)
    a = native.resample(y, 16000, 48000)
    monkeypatch.setenv("VCVITS_NATIVE", "0")
    b = rs.resample(y, 16000, 48000)
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_viterbi_exact_parity(monkeypatch):
    from vcvits_tpu.dsp.pitch import _viterbi_decode

    g = np.random.default_rng(1)
    t, nb = 80, 50
    log_obs = np.log(g.random((t, 2 * nb)) + 1e-9)
    half = 7
    tri = (half + 1 - np.abs(np.arange(-half, half + 1))).astype(float)
    tri /= tri.sum()
    log_tri = np.log(tri + np.finfo(float).tiny)
    s_native = native.pyin_viterbi(log_obs, nb, log_tri, math.log(0.99), math.log(0.01))
    monkeypatch.setenv("VCVITS_NATIVE", "0")
    s_numpy = _viterbi_decode(log_obs, nb, log_tri, math.log(0.99), math.log(0.01))
    np.testing.assert_array_equal(s_native, s_numpy)


def test_pyin_end_to_end_agrees(monkeypatch):
    from vcvits_tpu.dsp.pitch import estimate_pitch

    y = (0.4 * np.sin(2 * np.pi * 330 * np.arange(32000) / 16000)).astype(np.float32)
    f_native = estimate_pitch(y, 16000, 2048, 2048, 320)
    monkeypatch.setenv("VCVITS_NATIVE", "0")
    f_numpy = estimate_pitch(y, 16000, 2048, 2048, 320)
    np.testing.assert_allclose(f_native, f_numpy, atol=1e-6)
