import jax
import jax.numpy as jnp
import numpy as np

from vcvits_tpu.utils.masking import (
    kl_divergence,
    rand_slice_segments,
    sequence_mask,
    slice_segments,
)


def test_sequence_mask():
    m = sequence_mask(jnp.array([2, 4, 0]), 5)
    assert m.shape == (3, 5, 1)
    np.testing.assert_array_equal(
        np.asarray(m)[..., 0],
        [[1, 1, 0, 0, 0], [1, 1, 1, 1, 0], [0, 0, 0, 0, 0]],
    )


def test_slice_segments_matches_manual():
    x = jnp.arange(2 * 10 * 3, dtype=jnp.float32).reshape(2, 10, 3)
    out = slice_segments(x, jnp.array([2, 5]), 4)
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(x[0, 2:6]))
    np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(x[1, 5:9]))


def test_slice_segments_clamps_out_of_range():
    x = jnp.arange(1 * 6 * 1, dtype=jnp.float32).reshape(1, 6, 1)
    out = slice_segments(x, jnp.array([100]), 4)
    np.testing.assert_array_equal(np.asarray(out[0, :, 0]), [2, 3, 4, 5])


def test_rand_slice_segments_within_lengths():
    key = jax.random.PRNGKey(0)
    x = jnp.ones((8, 100, 2))
    lengths = jnp.array([100, 50, 30, 20, 100, 100, 10, 4])
    seg, ids = rand_slice_segments(x, lengths, 10, key)
    assert seg.shape == (8, 10, 2)
    ids = np.asarray(ids)
    assert (ids >= 0).all()
    # starts stay within valid range for rows longer than the segment
    valid = np.asarray(lengths) >= 10
    assert (ids[valid] <= np.asarray(lengths)[valid] - 10).all()


def test_rand_slice_is_jittable_and_deterministic():
    f = jax.jit(lambda x, l, k: rand_slice_segments(x, l, 8, k))
    x = jnp.arange(4 * 32 * 2, dtype=jnp.float32).reshape(4, 32, 2)
    l = jnp.array([32, 16, 32, 9])
    k = jax.random.PRNGKey(7)
    a, ia = f(x, l, k)
    b, ib = f(x, l, k)
    np.testing.assert_array_equal(np.asarray(ia), np.asarray(ib))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_kl_divergence_zero_for_identical():
    m = jnp.array([[0.3, -1.2]])
    logs = jnp.array([[0.1, -0.4]])
    kl = kl_divergence(m, logs, m, logs)
    np.testing.assert_allclose(np.asarray(kl), 0.0, atol=1e-6)
