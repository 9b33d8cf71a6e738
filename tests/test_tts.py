"""TTS capability layer: splines, MAS, duration predictors, text front-end,
and the end-to-end SynthesizerTTS (which the reference ships broken)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vcvits_tpu.models.flow import ConvFlow
from vcvits_tpu.models.predictors import (
    DurationPredictor,
    StochasticDurationPredictor,
    VariancePredictor,
    average_by_duration,
)
from vcvits_tpu.models.synthesizer_tts import SynthesizerTTS
from vcvits_tpu.models.text_encoder import TextEncoder
from vcvits_tpu.models.transforms import piecewise_rational_quadratic_transform
from vcvits_tpu.ops.monotonic_align import maximum_path
from vcvits_tpu.text import intersperse, sequence_to_text, text_to_sequence
from vcvits_tpu.text.symbols import symbols


# ----------------------------------------------------------------- splines
def test_spline_roundtrip_and_logdet(rng):
    k = 10
    shape = (4, 7)
    x = jnp.asarray(rng.uniform(-8, 8, shape).astype(np.float32))
    uw = jnp.asarray(rng.standard_normal((*shape, k)).astype(np.float32))
    uh = jnp.asarray(rng.standard_normal((*shape, k)).astype(np.float32))
    ud = jnp.asarray(rng.standard_normal((*shape, k - 1)).astype(np.float32))

    y, lad = piecewise_rational_quadratic_transform(x, uw, uh, ud, tails="linear")
    x2, lad_inv = piecewise_rational_quadratic_transform(
        y, uw, uh, ud, inverse=True, tails="linear"
    )
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(lad + lad_inv), 0.0, atol=1e-4)
    # identity + zero logdet outside the tail bound
    outside = np.abs(np.asarray(x)) > 5.0
    np.testing.assert_allclose(np.asarray(y)[outside], np.asarray(x)[outside])
    np.testing.assert_allclose(np.asarray(lad)[outside], 0.0)


@pytest.mark.slow
def test_spline_logdet_matches_autodiff(rng):
    k = 8
    x = jnp.asarray(np.linspace(-4.5, 4.5, 30).astype(np.float32))
    uw = jnp.asarray(rng.standard_normal((30, k)).astype(np.float32))
    uh = jnp.asarray(rng.standard_normal((30, k)).astype(np.float32))
    ud = jnp.asarray(rng.standard_normal((30, k - 1)).astype(np.float32))
    grad = jax.vmap(jax.grad(
        lambda xi, w, h, d: piecewise_rational_quadratic_transform(
            xi, w, h, d, tails="linear")[0]
    ))(x, uw, uh, ud)
    _, lad = piecewise_rational_quadratic_transform(x, uw, uh, ud, tails="linear")
    np.testing.assert_allclose(
        np.asarray(lad), np.asarray(jnp.log(jnp.abs(grad))), atol=1e-4
    )


# --------------------------------------------------------------------- MAS
def _mas_bruteforce(value, t_x, t_y):
    neg = -1e9
    dp = np.full((t_x, t_y), neg)
    dp[0, 0] = value[0, 0]
    for y in range(1, t_y):
        for x in range(t_x):
            best = dp[x, y - 1]
            if x > 0:
                best = max(best, dp[x - 1, y - 1])
            dp[x, y] = best + value[x, y]
    path = np.zeros((t_x, t_y))
    x = t_x - 1
    for y in range(t_y - 1, -1, -1):
        path[x, y] = 1
        if y > 0 and x > 0 and dp[x - 1, y - 1] > dp[x, y - 1]:
            x -= 1
    return path, dp[t_x - 1, t_y - 1]


def test_maximum_path_matches_bruteforce(rng):
    b, t_x, t_y = 3, 5, 9
    value = rng.standard_normal((b, t_x, t_y)).astype(np.float32)
    lengths = [(5, 9), (3, 6), (4, 4)]
    mask = np.zeros((b, t_x, t_y), np.float32)
    for i, (lx, ly) in enumerate(lengths):
        mask[i, :lx, :ly] = 1

    path = np.asarray(maximum_path(jnp.asarray(value), jnp.asarray(mask)))
    for i, (lx, ly) in enumerate(lengths):
        ref_path, ref_score = _mas_bruteforce(value[i, :lx, :ly], lx, ly)
        got_score = (path[i, :lx, :ly] * value[i, :lx, :ly]).sum()
        # optimal score achieved (path may differ on exact ties)
        np.testing.assert_allclose(got_score, ref_score, rtol=1e-5)
        # valid monotonic path: one x per y, nondecreasing
        assert (path[i, :lx, :ly].sum(axis=0) == 1).all()
        xs = path[i, :lx, :ly].argmax(axis=0)
        assert (np.diff(xs) >= 0).all() and (np.diff(xs) <= 1).all()
        assert xs[0] == 0 and xs[-1] == lx - 1
        # nothing outside the mask
        assert path[i][mask[i] == 0].sum() == 0


# --------------------------------------------------------------- conv flow
def test_conv_flow_invertible(rng):
    cf = ConvFlow(2, 16, 3, n_layers=2, num_bins=6)
    x = jnp.asarray(rng.standard_normal((2, 11, 2)).astype(np.float32))
    mask = jnp.ones((2, 11, 1)).at[1, 8:].set(0.0)
    params = cf.init(jax.random.PRNGKey(0), x, mask)
    y, logdet = cf.apply(params, x * mask, mask)
    x2 = cf.apply(params, y, mask, reverse=True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x * mask), atol=1e-4)
    assert np.isfinite(np.asarray(logdet)).all()


# ----------------------------------------------------------------- duration
@pytest.mark.slow
def test_duration_predictors(rng):
    b, t, c = 2, 9, 16
    h = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
    mask = jnp.ones((b, t, 1)).at[1, 6:].set(0.0)
    g = jnp.asarray(rng.standard_normal((b, 4)).astype(np.float32))
    w = jnp.asarray(np.abs(rng.standard_normal((b, t, 1))).astype(np.float32) + 1)

    dp = DurationPredictor(filter_channels=24, gin_channels=4)
    params = dp.init(jax.random.PRNGKey(0), h, mask, g=g)
    logw = dp.apply(params, h, mask, g=g)
    assert logw.shape == (b, t, 1)

    sdp = StochasticDurationPredictor(c, c, 3, 0.0, n_flows=2, gin_channels=4)
    variables = sdp.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        h, mask, w=w, g=g,
    )
    nll = sdp.apply(variables, h, mask, w=w, g=g,
                    rngs={"sample": jax.random.PRNGKey(2)})
    assert nll.shape == (b,)
    assert np.isfinite(np.asarray(nll)).all()
    logw_s = sdp.apply(variables, h, mask, g=g, reverse=True,
                       rngs={"sample": jax.random.PRNGKey(3)})
    assert logw_s.shape == (b, t, 1)
    assert np.isfinite(np.asarray(logw_s)).all()


def test_average_by_duration():
    vals = jnp.asarray([[1.0, 2.0, 0.0, 4.0, 6.0, 0.0]])
    durs = jnp.asarray([[2, 3, 1]])
    avg = np.asarray(average_by_duration(vals, durs))
    np.testing.assert_allclose(avg[0], [1.5, 5.0, 0.0])


# --------------------------------------------------------------------- text
def test_text_to_sequence_roundtrip():
    seq = text_to_sequence("Dr. Smith paid $12.", ["english_cleaners"])
    assert len(seq) > 0
    text = sequence_to_text(seq)
    assert "doctor" in text and "twelve" in text  # abbreviation + number expansion
    inter = intersperse(seq, 0)
    assert len(inter) == 2 * len(seq) + 1 and inter[::2] == [0] * (len(seq) + 1)


def test_symbol_set_matches_reference():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_symbols", "/root/reference/vits/text/symbols.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert symbols == mod.symbols  # embedding rows stay aligned for conversion


# ---------------------------------------------------------------- e2e model
@pytest.fixture(scope="module")
def tts_model():
    return SynthesizerTTS(
        n_vocab=len(symbols),
        spec_channels=33,
        segment_size=4,
        inter_channels=8,
        hidden_channels=16,
        filter_channels=32,
        n_heads=2,
        n_layers=1,
        kernel_size=3,
        p_dropout=0.0,
        resblock="1",
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
        upsample_rates=(8, 8, 4, 2),
        upsample_initial_channel=32,
        upsample_kernel_sizes=(16, 16, 4, 4),
        n_speakers=4,
        gin_channels=4,
        use_sdp=True,
    )


@pytest.mark.slow
def test_tts_forward_and_infer(tts_model, rng):
    b, t_x, t_y = 2, 12, 40
    x = jnp.asarray(rng.integers(1, len(symbols), (b, t_x)))
    x_lengths = jnp.array([12, 8])
    y_spec = jnp.asarray(np.abs(rng.standard_normal((b, t_y, 33))).astype(np.float32))
    y_lengths = jnp.array([40, 30])
    sid = jnp.array([0, 3])

    variables = tts_model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        x, x_lengths, y_spec, y_lengths, sid,
    )
    fwd = jax.jit(lambda v, k: tts_model.apply(
        v, x, x_lengths, y_spec, y_lengths, sid, rng=k))
    (o, l_length, pitch_pred, energy_pred, attn, ids, x_mask, y_mask,
     latents) = fwd(variables, jax.random.PRNGKey(2))
    assert o.shape == (b, 4 * 512, 1)
    assert l_length.shape == (b,)
    assert np.isfinite(np.asarray(l_length)).all()
    assert attn.shape == (b, t_x, t_y)
    # every valid frame aligned to exactly one token
    a = np.asarray(attn)
    assert (a[0].sum(axis=0) == 1).all()
    assert pitch_pred.shape == (b, t_y, 1)

    infer = jax.jit(lambda v, k: tts_model.apply(
        v, x, x_lengths, sid, rng=k, max_frames=64,
        method=SynthesizerTTS.infer))
    o2, attn2, y_mask2, _ = infer(variables, jax.random.PRNGKey(3))
    assert o2.shape == (b, 64 * 512, 1)
    assert np.isfinite(np.asarray(o2)).all()
    assert float(np.asarray(y_mask2).sum()) > 0


def test_tts_dataset_add_blank(tmp_path):
    """add_blank intersperses blank id 0 between symbols (VITS data option)."""
    import numpy as np

    from vcvits_tpu.config import Config
    from vcvits_tpu.data.tts_dataset import TTSDataset
    from vcvits_tpu.utils.audio_io import write_wav

    cfg = Config().data
    sr = cfg.target_sampling_rate
    wav = (0.1 * np.sin(2 * np.pi * 220 * np.arange(sr // 4) / sr)).astype(np.float32)
    p = tmp_path / "a.wav"
    write_wav(str(p), wav, sr)
    fl = tmp_path / "fl.txt"
    fl.write_text(f"{p}|0|hi\n")
    plain = TTSDataset(str(fl), cfg, cache_dir=str(tmp_path / "c1"),
                       add_blank=False)[0]["text"]
    blanked = TTSDataset(str(fl), cfg, cache_dir=str(tmp_path / "c2"),
                         add_blank=True)[0]["text"]
    assert len(blanked) == 2 * len(plain) + 1
    assert (blanked[::2] == 0).all()
    assert (blanked[1::2] == plain).all()
