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
