"""Residual-coupling flow: invertibility and identity-at-init."""

import jax
import jax.numpy as jnp
import numpy as np

from vcvits_tpu.models.flow import ResidualCouplingBlock, ResidualCouplingLayer


def _randomize(params, key, scale=0.5):
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(key, len(leaves))
    leaves = [jax.random.normal(k, l.shape, l.dtype) * scale for k, l in zip(keys, leaves)]
    return jax.tree.unflatten(treedef, leaves)


def test_flow_identity_at_init(rng):
    """post conv is zero-init (modules.py:314-315) => flow == channel perm at init."""
    block = ResidualCouplingBlock(8, 16, 5, 1, 4, gin_channels=4)
    x = jnp.asarray(rng.standard_normal((2, 12, 8)).astype(np.float32))
    mask = jnp.ones((2, 12, 1))
    g = jnp.asarray(rng.standard_normal((2, 4)).astype(np.float32))
    params = block.init(jax.random.PRNGKey(0), x, mask, g=g)
    z = block.apply(params, x, mask, g=g)
    # invertible and norm-preserving at init (mean-only coupling with m=0)
    np.testing.assert_allclose(np.sort(np.abs(np.asarray(z)).ravel()),
                               np.sort(np.abs(np.asarray(x)).ravel()), atol=1e-5)


def test_flow_inverse_roundtrip(rng):
    block = ResidualCouplingBlock(8, 16, 5, 1, 4, gin_channels=4)
    x = jnp.asarray(rng.standard_normal((2, 12, 8)).astype(np.float32))
    mask = jnp.ones((2, 12, 1)).at[1, 9:].set(0.0)
    g = jnp.asarray(rng.standard_normal((2, 4)).astype(np.float32))
    params = block.init(jax.random.PRNGKey(0), x, mask, g=g)
    # non-trivial weights
    params = {"params": _randomize(params["params"], jax.random.PRNGKey(3), 0.3)}
    x_masked = x * mask
    z = block.apply(params, x_masked, mask, g=g)
    x_rec = block.apply(params, z, mask, g=g, reverse=True)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x_masked), atol=1e-4)


def test_coupling_layer_logdet(rng):
    """mean_only coupling has logs == 0 => logdet == 0."""
    layer = ResidualCouplingLayer(8, 16, 5, 1, 4, mean_only=True)
    x = jnp.asarray(rng.standard_normal((2, 10, 8)).astype(np.float32))
    mask = jnp.ones((2, 10, 1))
    params = layer.init(jax.random.PRNGKey(0), x, mask)
    _, logdet = layer.apply(params, x, mask)
    np.testing.assert_allclose(np.asarray(logdet), 0.0, atol=1e-6)
