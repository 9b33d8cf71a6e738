"""Space-to-depth folded convolution exactness (ROADMAP item 1 / VERDICT r1
next-round #1): folded == unfolded for the conv primitives and the full
HiFi-GAN decoder, with identical parameter trees (checkpoint-compatible).

Measured on the TPU (tools/bench_decoder.py, 10 s clips, 48k config):
batch 16 fp32 folded RUNS (220x RT) where unfolded fails to compile (the
round-1 lane-padding OOM); batch 16 bf16 172.9 ms vs 253.0 ms = 1.46x."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vcvits_tpu.models.hifigan import HiFiGANGenerator, ResBlock1
from vcvits_tpu.models.layers import Conv1d, ConvTranspose1d
from vcvits_tpu.ops.folded_conv import fold_time, refold_time, unfold_time


def test_fold_unfold_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 24, 6)).astype(np.float32))
    assert jnp.array_equal(unfold_time(fold_time(x, 4), 4), x)
    f2 = refold_time(fold_time(x, 4), 4, 2)
    assert jnp.array_equal(unfold_time(f2, 2), x)
    # layout definition: x_f[b, t, f*C + c] == x[b, t*F + f, c]
    xf = fold_time(x, 3)
    assert float(xf[1, 2, 1 * 6 + 4]) == float(x[1, 2 * 3 + 1, 4])


@pytest.mark.parametrize("k,d,fold", [(3, 1, 2), (11, 5, 4), (7, 3, 2), (3, 5, 4)])
def test_folded_conv1d_exact(rng, k, d, fold):
    x = jnp.asarray(rng.standard_normal((2, 48, 6)).astype(np.float32))
    m0 = Conv1d(features=5, kernel_size=k, dilation=d, weight_norm=True)
    mf = Conv1d(features=5, kernel_size=k, dilation=d, weight_norm=True, fold=fold)
    v = m0.init(jax.random.PRNGKey(1), x)
    y0 = m0.apply(v, x)
    yf = unfold_time(mf.apply(v, fold_time(x, fold)), fold)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(y0), atol=2e-6)


@pytest.mark.parametrize("k,s,p,fi", [(16, 8, 4, 1), (4, 4, 0, 1), (4, 2, 1, 2)])
def test_folded_transpose_conv_exact(rng, k, s, p, fi):
    x = jnp.asarray(rng.standard_normal((2, 48, 6)).astype(np.float32))
    m0 = ConvTranspose1d(features=5, kernel_size=k, stride=s, padding=p,
                         weight_norm=True)
    mf = ConvTranspose1d(features=5, kernel_size=k, stride=s, padding=p,
                         weight_norm=True, fold_in=fi)
    v = m0.init(jax.random.PRNGKey(2), x)
    y0 = m0.apply(v, x)
    yf = unfold_time(mf.apply(v, fold_time(x, fi)), s * fi)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(y0), atol=2e-6)


def test_resblock_folded_exact(rng):
    x = jnp.asarray(rng.standard_normal((2, 32, 8)).astype(np.float32))
    m0 = ResBlock1(channels=8, kernel_size=3, dilations=(1, 3, 5))
    mf = ResBlock1(channels=8, kernel_size=3, dilations=(1, 3, 5), fold=4)
    v = m0.init(jax.random.PRNGKey(3), x)
    y0 = m0.apply(v, x)
    yf = unfold_time(mf.apply(v, fold_time(x, 4)), 4)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(y0), atol=2e-6)


@pytest.mark.parametrize("k,d,fold", [(3, 3, 2), (11, 5, 4), (7, 3, 2), (3, 5, 4)])
def test_phase_split_conv1d_exact(rng, k, d, fold):
    """Dilation-phase-split grouped folded conv == canonical conv (the
    residue-major reorder + feature_group_count=d path; ROADMAP item 1's
    dilation-phase-split). T chosen divisible by d*fold as the decoder's
    padding guarantees."""
    t = 2 * 3 * 5 * fold  # divisible by d*fold for d in {3, 5}
    x = jnp.asarray(rng.standard_normal((2, t, 6)).astype(np.float32))
    m0 = Conv1d(features=6, kernel_size=k, dilation=d, weight_norm=True)
    mf = Conv1d(features=6, kernel_size=k, dilation=d, weight_norm=True,
                fold=fold, phase_split=True)
    v = m0.init(jax.random.PRNGKey(1), x)
    y0 = m0.apply(v, x)
    yf = unfold_time(mf.apply(v, fold_time(x, fold)), fold)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(y0), atol=2e-6)


def test_phase_split_cuts_macs():
    """The grouped placement uses strictly fewer folded-tap MACs than the
    dense folded kernel on dilated taps (k=11, d=5, F'=4: 15 dense folded
    taps -> 5 grouped = a 3x MAC cut on that conv)."""
    from vcvits_tpu.ops.folded_conv import (_phase_split_placement,
                                            _same_conv_placement)
    wins = 0
    for k, d, fp in [(3, 3, 4), (3, 5, 4), (7, 3, 4), (7, 5, 4),
                     (11, 3, 4), (11, 5, 4)]:
        md, _ = _same_conv_placement(k, d, fp)
        kk_dense = md.shape[1] // fp
        mg, _ = _phase_split_placement(k, d, d * fp)
        kk_g = mg.shape[1] // fp
        # MACs per unfolded sample: dense kk*fp vs grouped kk_g*fp.
        # k=3 d=3 ties (3 taps either way; Conv1d skips the split there).
        assert kk_g <= kk_dense, (k, d, fp, kk_g, kk_dense)
        wins += kk_g < kk_dense
    assert wins == 5
    md, _ = _same_conv_placement(11, 5, 4)
    mg, _ = _phase_split_placement(11, 5, 20)
    assert md.shape[1] // 4 == 15 and mg.shape[1] // 4 == 5


def test_resblock_phase_split_exact(rng):
    t = 120  # divisible by d*fold for d in {3, 5}, fold 4
    x = jnp.asarray(rng.standard_normal((2, t // 4, 4 * 8)).astype(np.float32))
    m0 = ResBlock1(channels=8, kernel_size=7, dilations=(1, 3, 5), fold=4)
    mf = ResBlock1(channels=8, kernel_size=7, dilations=(1, 3, 5), fold=4,
                   phase_split=True)
    v = m0.init(jax.random.PRNGKey(3), x)
    np.testing.assert_allclose(np.asarray(mf.apply(v, x)),
                               np.asarray(m0.apply(v, x)), atol=2e-6)


@pytest.mark.slow
def test_hifigan_phase_split_parity(rng):
    """Full decoder, phase_split vs unfolded: T=13 latent frames make every
    tail stage pad (13*8*8=832 is not a multiple of 15*fold), exercising the
    pad + mask + final-slice path; params identical (checkpoint-compatible)."""
    x = jnp.asarray(rng.standard_normal((2, 13, 16)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((2, 8)).astype(np.float32))
    kw = dict(initial_channel=16, upsample_initial_channel=64, gin_channels=8,
              upsample_rates=(8, 4, 2), upsample_kernel_sizes=(16, 8, 4))
    m0 = HiFiGANGenerator(fold_tail=False, min_lanes=16, **kw)
    mp = HiFiGANGenerator(fold_tail=True, min_lanes=16, phase_split=True, **kw)
    v = m0.init(jax.random.PRNGKey(0), x, g)
    y0 = m0.apply(v, x, g)
    yp = mp.apply(v, x, g)
    assert y0.shape == yp.shape
    np.testing.assert_allclose(np.asarray(yp), np.asarray(y0), atol=2e-6)
    v2 = mp.init(jax.random.PRNGKey(0), x, g)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)


@pytest.mark.slow
def test_hifigan_phase_split_grads_match(rng):
    """Gradients flow through the pad/mask/grouped-conv path and equal the
    unfolded decoder's (the split is a linear reparametrization)."""
    x = jnp.asarray(rng.standard_normal((1, 9, 8)).astype(np.float32))
    kw = dict(initial_channel=8, upsample_initial_channel=32,
              upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
              resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),))
    m0 = HiFiGANGenerator(fold_tail=False, min_lanes=16, **kw)
    mp = HiFiGANGenerator(fold_tail=True, min_lanes=16, phase_split=True, **kw)
    v = m0.init(jax.random.PRNGKey(0), x)

    def loss(mod):
        return lambda p: jnp.sum(jnp.square(mod.apply(p, x)))

    g0 = jax.grad(loss(m0))(v)
    gp = jax.grad(loss(mp))(v)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(gp)):
        assert np.isfinite(np.asarray(b)).all()
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_hifigan_folded_parity(rng):
    """Full decoder: fold_tail == unfolded, same params, same output
    (the production configuration but scaled down; min_lanes=16 makes the
    tiny channels exercise folds 1/1/2/4 like 128 lanes do at full scale)."""
    x = jnp.asarray(rng.standard_normal((2, 24, 16)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((2, 8)).astype(np.float32))
    kw = dict(initial_channel=16, upsample_initial_channel=64, gin_channels=8)
    m0 = HiFiGANGenerator(fold_tail=False, min_lanes=16, **kw)
    mf = HiFiGANGenerator(fold_tail=True, min_lanes=16, **kw)
    v = m0.init(jax.random.PRNGKey(0), x, g)
    y0 = m0.apply(v, x, g)
    yf = mf.apply(v, x, g)
    assert y0.shape == yf.shape
    np.testing.assert_allclose(np.asarray(yf), np.asarray(y0), atol=2e-6)
    # identical param trees: checkpoints work in either mode
    v2 = mf.init(jax.random.PRNGKey(0), x, g)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)
    assert all(a.shape == b.shape for a, b in
               zip(jax.tree_util.tree_leaves(v), jax.tree_util.tree_leaves(v2)))


@pytest.mark.slow
def test_hifigan_folded_grads_finite(rng):
    """Training runs through the folded decoder: gradients exist and match
    the unfolded decoder's gradients (fold is a linear reparametrization)."""
    x = jnp.asarray(rng.standard_normal((1, 16, 8)).astype(np.float32))
    kw = dict(initial_channel=8, upsample_initial_channel=32,
              upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
              resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),))
    m0 = HiFiGANGenerator(fold_tail=False, min_lanes=16, **kw)
    mf = HiFiGANGenerator(fold_tail=True, min_lanes=16, **kw)
    v = m0.init(jax.random.PRNGKey(0), x)

    def loss(mod):
        return lambda p: jnp.sum(jnp.square(mod.apply(p, x)))

    g0 = jax.grad(loss(m0))(v)
    gf = jax.grad(loss(mf))(v)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(gf)):
        assert np.isfinite(np.asarray(b)).all()
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)
