"""Dynamic W8A8 int8 decoder parity (ops/int8_conv.py, hifigan quant_int8).

The decoder is the inference hot path the reference outsources to torch.hub
(/root/reference/vits/model/synthesizers/synthesizer_svc.py:59) — here it
optionally runs its convs as int8 x int8 -> int32 MXU passes (~2x the bf16
FLOP rate, reports/probe_int8.json). These tests pin the quantization
contract: exact-arithmetic equivalence of int8_conv1d at the op level, and
bounded end-to-end error (waveform SNR / mel-L1) at the decoder level, with
the SAME checkpoint loading in either mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vcvits_tpu.models.hifigan import HiFiGANGenerator
from vcvits_tpu.ops.int8_conv import (
    int8_conv1d,
    quantize_act_per_row,
    quantize_weight_per_channel,
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _snr_db(ref: np.ndarray, test: np.ndarray) -> float:
    err = np.square(ref - test).mean()
    sig = np.square(ref).mean()
    return 10.0 * np.log10(sig / max(err, 1e-30))


# --------------------------------------------------------------------- op
def test_int8_conv_matches_quantized_numpy(rng):
    """int8_conv1d == exact numpy int32 arithmetic on the same quantized
    operands (the conv itself must be lossless; all error is quantization)."""
    x = jnp.asarray(rng.standard_normal((2, 16, 8)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 8, 12)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal((12,)).astype(np.float32) * 0.01)
    y = np.asarray(int8_conv1d(x, w, (1, 1), bias=b), np.float32)

    wq, ws = quantize_weight_per_channel(w)
    xq, xs = quantize_act_per_row(x)
    wq, ws = np.asarray(wq, np.int32), np.asarray(ws, np.float32)
    xq = np.pad(np.asarray(xq, np.int32), ((0, 0), (1, 1), (0, 0)))
    ref = np.zeros((2, 16, 12), np.int64)
    for t in range(16):
        for k in range(3):
            ref[:, t] += np.einsum("bc,co->bo", xq[:, t + k], wq[k])
    ref = ref * np.asarray(xs, np.float32) * ws + np.asarray(b)
    np.testing.assert_allclose(y, ref.astype(np.float32), rtol=1e-6, atol=1e-6)


def test_int8_quantization_error_bounded(rng):
    """Per-channel weight + per-row act scales keep the op-level relative
    error at int8 resolution (~1/127 of the dynamic range)."""
    x = jnp.asarray(rng.standard_normal((1, 64, 32)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((5, 32, 32)).astype(np.float32) * 0.05)
    y8 = np.asarray(int8_conv1d(x, w, (2, 2)), np.float32)
    yf = np.asarray(
        jax.lax.conv_general_dilated(
            x, w, window_strides=(1,), padding=[(2, 2)],
            dimension_numbers=("NHC", "HIO", "NHC"),
            precision=jax.lax.Precision.HIGHEST), np.float32)
    assert _snr_db(yf, y8) > 35.0  # one conv: ~42 dB measured


# ---------------------------------------------------------------- decoder
@pytest.mark.slow
def test_tiny_decoder_int8_parity(rng):
    """Same params, both modes; int8 output tracks fp32 at >= 25 dB SNR
    through the full conv stack (tiny channels; full-width case is slow)."""
    x = jnp.asarray(rng.standard_normal((2, 24, 16)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((2, 8)).astype(np.float32))
    kw = dict(initial_channel=16, upsample_initial_channel=64, gin_channels=8,
              min_lanes=16)
    m0 = HiFiGANGenerator(**kw)
    m8 = HiFiGANGenerator(quant_int8=True, **kw)
    v = m0.init(jax.random.PRNGKey(0), x, g)
    # identical param trees: the same checkpoint loads in either mode
    v8 = m8.init(jax.random.PRNGKey(0), x, g)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v8)
    y0 = np.asarray(m0.apply(v, x, g), np.float32)
    y8 = np.asarray(m8.apply(v, x, g), np.float32)
    assert y0.shape == y8.shape
    assert _snr_db(y0, y8) > 25.0


@pytest.mark.slow
def test_tiny_decoder_w8_parity(rng):
    """Weight-only int8 ("w8"): weights on the per-channel int8 grid, bf16
    activations, bf16 MXU conv (ops/int8_conv.py act_quant=False). Strictly
    less quantization error than W8A8 — measured 36.8 dB vs 26.7 dB on the
    same params (the only error source is weight rounding)."""
    x = jnp.asarray(rng.standard_normal((2, 24, 16)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((2, 8)).astype(np.float32))
    kw = dict(initial_channel=16, upsample_initial_channel=64, gin_channels=8,
              min_lanes=16)
    m0 = HiFiGANGenerator(**kw)
    mw = HiFiGANGenerator(quant_int8="w8", **kw)
    m8 = HiFiGANGenerator(quant_int8=True, **kw)
    v = m0.init(jax.random.PRNGKey(0), x, g)
    y0 = np.asarray(m0.apply(v, x, g), np.float32)
    yw = np.asarray(mw.apply(v, x, g), np.float32)
    y8 = np.asarray(m8.apply(v, x, g), np.float32)
    assert y0.shape == yw.shape
    assert _snr_db(y0, yw) > 32.0
    assert _snr_db(y0, yw) > _snr_db(y0, y8)


@pytest.mark.slow
def test_full_width_decoder_int8_parity(rng):
    """Production widths (512-ch stack, fold_tail): int8-vs-fp32 waveform
    SNR >= 24 dB and mel-L1 vs the bf16 decode <= 0.05 (measured: 26.8 dB /
    0.020 on this chip; the int8 path runs bf16 activations so its error
    includes the bf16 floor — mel bf16-vs-fp32 alone is 0.008)."""
    from vcvits_tpu.dsp.spectrogram import mel_spectrogram

    x = jnp.asarray(rng.standard_normal((1, 20, 128)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((1, 256)).astype(np.float32))
    kw = dict(initial_channel=128, upsample_initial_channel=512,
              gin_channels=256)
    m32 = HiFiGANGenerator(dtype=jnp.float32, **kw)
    mbf = HiFiGANGenerator(dtype=jnp.bfloat16, **kw)
    mi8 = HiFiGANGenerator(dtype=jnp.bfloat16, quant_int8=True, **kw)
    v = jax.jit(m32.init)(jax.random.PRNGKey(0), x, g)
    y32 = np.asarray(jax.jit(m32.apply)(v, x, g), np.float32)
    ybf = np.asarray(jax.jit(mbf.apply)(v, x, g), np.float32)
    yi8 = np.asarray(jax.jit(mi8.apply)(v, x, g), np.float32)
    assert _snr_db(y32, yi8) > 24.0

    def mel(y):
        return np.asarray(mel_spectrogram(
            jnp.asarray(y[:, :, 0]), 2048, 128, 48000, 512, 2048))

    mel_i8 = float(np.abs(mel(yi8) - mel(ybf)).mean())
    assert mel_i8 < 0.05, f"int8 mel-L1 vs bf16 {mel_i8}"


@pytest.mark.slow
def test_synthesizer_int8_flag_e2e(rng):
    """dec_quant_int8 threads SynthesizerSVC -> decoder: infer runs on the
    SAME params in both modes and the int8 waveform tracks the float one."""
    from tests.test_synthesizer import TINY_HUBERT

    from vcvits_tpu.models.synthesizer import SynthesizerSVC

    model = SynthesizerSVC(
        spec_channels=33, segment_size=4, inter_channels=8,
        hidden_channels=16, filter_channels=32, n_heads=2, n_layers=1,
        kernel_size=3, p_dropout=0.0, resblock="1",
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
        upsample_rates=(8, 8, 4, 2), upsample_initial_channel=32,
        upsample_kernel_sizes=(16, 16, 4, 4), hubert_channels=16,
        num_pitch=64, n_speakers=8, gin_channels=4, hubert_cfg=TINY_HUBERT,
    )
    m8 = model.clone(dec_quant_int8=True)
    t16 = 3200
    wav = jnp.asarray(rng.standard_normal((1, t16)).astype(np.float32) * 0.1)
    lens = jnp.asarray([t16], jnp.int32)
    pitch = jnp.asarray(rng.integers(1, 64, (1, t16 // 320)))
    sid = jnp.asarray([1], jnp.int32)
    k = jax.random.PRNGKey(0)
    v = model.init({"params": k, "sample": k}, wav, lens, pitch, sid,
                   method=SynthesizerSVC.infer)
    o0, _, _ = model.apply(v, wav, lens, pitch, sid, rng=k,
                           method=SynthesizerSVC.infer)
    o8, _, _ = m8.apply(v, wav, lens, pitch, sid, rng=k,
                        method=SynthesizerSVC.infer)
    o0, o8 = np.asarray(o0, np.float32), np.asarray(o8, np.float32)
    assert np.isfinite(o8).all()
    assert _snr_db(o0, o8) > 25.0
