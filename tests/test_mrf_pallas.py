"""Fused Pallas MRF == the ResBlock1 module loop (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vcvits_tpu.models.hifigan import HiFiGANGenerator, ResBlock1
from vcvits_tpu.ops.mrf_pallas import fold_resblock_weights, mrf_fused

KS = (3, 7)
DS = ((1, 3), (1, 5))
CH = 16


def _params(t=64, seed=0):
    blocks = [ResBlock1(CH, k, d) for k, d in zip(KS, DS)]
    key = jax.random.PRNGKey(seed)
    x = jax.random.normal(jax.random.fold_in(key, 1), (2, t, CH))
    params = [b.init(jax.random.fold_in(key, 2 + i), x)["params"]
              for i, b in enumerate(blocks)]
    return blocks, params, x


@pytest.mark.parametrize("tile", [16, None])
def test_mrf_fused_matches_modules(tile):
    blocks, params, x = _params()
    ref = sum(b.apply({"params": p}, x) for b, p in zip(blocks, params))
    ref = np.asarray(ref) / len(blocks)
    w = [fold_resblock_weights(p, "1", len(d), jnp.float32)
         for p, d in zip(params, DS)]
    got = np.asarray(mrf_fused(x, w, KS, DS, tile=tile, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_generator_fused_mrf_matches_plain():
    """End-to-end: HiFiGANGenerator(fused_mrf=True) == default, same params.
    On CPU the fused path is gated off (platform check), so exercise the
    kernel path by comparing mrf_fused against the generator's stage loop
    above; this test asserts the fused_mrf ARG is accepted and harmless."""
    gen = HiFiGANGenerator(
        initial_channel=8, resblock="1", resblock_kernel_sizes=KS,
        resblock_dilation_sizes=DS, upsample_rates=(4, 2),
        upsample_initial_channel=32, upsample_kernel_sizes=(8, 4),
        gin_channels=0, fold_tail=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 8))
    p = gen.init(jax.random.PRNGKey(1), x)["params"]
    a = gen.apply({"params": p}, x)
    b = gen.apply({"params": p}, x, fused_mrf=True)  # CPU -> same path
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
