"""Fused Pallas coupling-reverse == XLA ResidualCouplingBlock reverse.

Runs the kernel in interpret mode on the CPU mesh; the same code compiles
on TPU (driven by tools/bench_flow.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vcvits_tpu.models.flow import ResidualCouplingBlock
from vcvits_tpu.ops.flow_pallas import flow_reverse_fused

CH, HID, GIN = 8, 16, 4


def _setup(gin=GIN, t=40, batch=1, seed=0):
    flow = ResidualCouplingBlock(CH, HID, 5, 1, 4, gin_channels=gin)
    k = jax.random.PRNGKey(seed)
    x = jax.random.normal(jax.random.fold_in(k, 1), (batch, t, CH))
    lens = jnp.asarray([t - 3 * i for i in range(batch)])
    mask = (jnp.arange(t)[None, :] < lens[:, None]).astype(jnp.float32)[..., None]
    g = (jax.random.normal(jax.random.fold_in(k, 2), (batch, gin))
         if gin else None)
    params = flow.init(jax.random.fold_in(k, 3), x, mask, g=g)["params"]
    return flow, params, x, mask, g


@pytest.mark.parametrize("tile", [8, 16])
def test_fused_matches_xla(tile):
    flow, params, x, mask, g = _setup()
    ref = flow.apply({"params": params}, x, mask, g=g, reverse=True)
    got = flow_reverse_fused(params, x, mask, g=g, tile=tile, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_fused_masked_batch():
    """Ragged batch: per-row masks + per-row speaker conditioning."""
    flow, params, x, mask, g = _setup(t=48, batch=3, seed=7)
    ref = flow.apply({"params": params}, x, mask, g=g, reverse=True)
    got = flow_reverse_fused(params, x, mask, g=g, tile=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got) * np.asarray(mask),
                               np.asarray(ref) * np.asarray(mask),
                               atol=2e-5, rtol=1e-4)


def test_fused_no_speaker():
    flow, params, x, mask, g = _setup(gin=0, t=24)
    ref = flow.apply({"params": params}, x, mask, reverse=True)
    got = flow_reverse_fused(params, x, mask, g=None, tile=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_fused_roundtrip_through_forward():
    """forward(fused_reverse(x)) == x on the valid region."""
    flow, params, x, mask, g = _setup(t=32)
    z = flow_reverse_fused(params, x, mask, g=g, interpret=True)
    y = flow.apply({"params": params}, z, mask, g=g)  # block forward
    np.testing.assert_allclose(np.asarray(y) * np.asarray(mask),
                               np.asarray(x) * np.asarray(mask),
                               atol=2e-4, rtol=1e-3)
