"""Phase-packed grouped conv (ops/grouped_conv.py) vs lax.conv_general_dilated.

Exactness gate for the MSD DiscriminatorS conv specs
(/root/reference/vits/model/discriminators/discriminator.py:52-58) and a
sweep of odd shapes; gradients checked through both paths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vcvits_tpu.ops.grouped_conv import grouped_conv1d_packed, use_packed


def _ref(x, w, stride, padding, groups):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=[padding],
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups, precision=jax.lax.Precision.HIGHEST)


# the actual MSD stack specs: (in_ch, out_ch, k, stride, groups, pad)
MSD_SPECS = [
    (16, 64, 41, 4, 4, (20, 20)),
    (64, 256, 41, 4, 16, (20, 20)),
    (256, 1024, 41, 4, 64, (20, 20)),
    (1024, 1024, 41, 4, 256, (20, 20)),
]

ODD_SPECS = [
    (8, 16, 5, 1, 4, (2, 2)),       # stride 1
    (12, 24, 7, 3, 4, (0, 0)),      # valid padding
    (6, 6, 3, 2, 2, (5, 1)),        # asymmetric padding, cog=3 -> skipped
    (32, 64, 15, 2, 8, (7, 7)),
]


@pytest.mark.parametrize("spec", MSD_SPECS + ODD_SPECS)
def test_matches_lax_conv(spec):
    cin, cout, k, s, g, pad = spec
    if not use_packed(g, cout, s, 1):
        pytest.skip("packed path declines this shape")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 100, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, cin // g, cout)) * 0.1,
                    jnp.float32)
    y_ref = _ref(x, w, s, pad, g)
    y = grouped_conv1d_packed(x, w, stride=s, padding=pad, groups=g,
                              precision=jax.lax.Precision.HIGHEST)
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("spec", [MSD_SPECS[1], MSD_SPECS[3], ODD_SPECS[0]])
def test_gradients_match(spec):
    cin, cout, k, s, g, pad = spec
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 64, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, cin // g, cout)) * 0.1,
                    jnp.float32)
    ct = jnp.asarray(rng.standard_normal(
        _ref(x, w, s, pad, g).shape), jnp.float32)

    def loss_ref(x, w):
        return jnp.sum(_ref(x, w, s, pad, g) * ct)

    def loss_packed(x, w):
        return jnp.sum(grouped_conv1d_packed(
            x, w, stride=s, padding=pad, groups=g,
            precision=jax.lax.Precision.HIGHEST) * ct)

    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    gx_p, gw_p = jax.grad(loss_packed, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r),
                               rtol=1e-4, atol=1e-4)


def test_ragged_t_out():
    """T_out not a multiple of the pack width P: tail handled by pad+slice."""
    for t in (97, 100, 101, 128):
        x = jnp.asarray(np.random.default_rng(t).standard_normal((1, t, 16)),
                        jnp.float32)
        w = jnp.ones((41, 4, 64), jnp.float32) * 0.01
        y_ref = _ref(x, w, 4, (20, 20), 4)
        y = grouped_conv1d_packed(x, w, stride=4, padding=(20, 20), groups=4)
        assert y.shape == y_ref.shape
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=1e-4, atol=1e-4)


def test_use_packed_gates():
    assert use_packed(4, 64, 4, 1)
    assert not use_packed(1, 64, 4, 1)      # dense
    assert not use_packed(4, 64, 4, 2)      # dilated
    assert not use_packed(2, 2048, 1, 1)    # cog=1024 too wide
    assert not use_packed(2, 6, 1, 1)       # cog=3 does not divide 128


# ---------------------------------------------------------------- time fold
from vcvits_tpu.ops.grouped_conv import pick_time_chunks, time_batch_conv1d


@pytest.mark.parametrize("spec", MSD_SPECS + ODD_SPECS)
def test_time_fold_matches_lax_conv(spec):
    cin, cout, k, s, g, pad = spec
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 96, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, cin // g, cout)) * 0.1,
                    jnp.float32)
    y_ref = _ref(x, w, s, pad, g)
    t_out = y_ref.shape[1]
    for chunks in (1, 2, 4):
        if t_out % chunks:
            continue
        y = time_batch_conv1d(x, w, stride=s, padding=pad, groups=g,
                              chunks=chunks,
                              precision=jax.lax.Precision.HIGHEST)
        assert y.shape == y_ref.shape
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=1e-5, atol=1e-5)


def test_time_fold_gradients_match():
    cin, cout, k, s, g, pad = MSD_SPECS[1]
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 64, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, cin // g, cout)) * 0.1,
                    jnp.float32)
    ct = jnp.asarray(rng.standard_normal(
        _ref(x, w, s, pad, g).shape), jnp.float32)

    def loss_ref(x, w):
        return jnp.sum(_ref(x, w, s, pad, g) * ct)

    def loss_tf(x, w):
        return jnp.sum(time_batch_conv1d(
            x, w, stride=s, padding=pad, groups=g, chunks=4,
            precision=jax.lax.Precision.HIGHEST) * ct)

    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    gx_t, gw_t = jax.grad(loss_tf, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_t), np.asarray(gx_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_t), np.asarray(gw_r),
                               rtol=1e-4, atol=1e-4)


def test_pick_time_chunks():
    assert pick_time_chunks(32, 4096) == 4
    assert pick_time_chunks(32, 64) == 1        # per-chunk T floor
    assert pick_time_chunks(32, 256) == 4
    assert pick_time_chunks(128, 4096) == 1     # lanes already full
    assert pick_time_chunks(32, 4101) == 1      # divisibility
    assert pick_time_chunks(16, 1024) == 8


def test_discriminator_s_time_fold_parity():
    """DiscriminatorS(time_fold=True) == DiscriminatorS(time_fold=False)
    with the same params (the flag only changes the lowering)."""
    from vcvits_tpu.models.discriminators import DiscriminatorS

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((4, 1024, 1)) * 0.1, jnp.float32)
    base = DiscriminatorS()
    params = base.init(jax.random.PRNGKey(0), x)["params"]
    l0, f0 = base.apply({"params": params}, x)
    l1, f1 = DiscriminatorS(time_fold=True).apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l0),
                               rtol=1e-4, atol=1e-4)
    for a, b in zip(f0, f1):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)
