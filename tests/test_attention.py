"""Relative-position attention parity vs a direct (slow) NumPy oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from vcvits_tpu.models.attention import (
    RelativeMultiHeadAttention,
    TransformerEncoder,
    _abs_to_rel,
    _rel_to_abs,
)

WS = 4  # window size used by the reference (relative_attention_transformer.py:14)


def _oracle_attention(x, wq, bq, wk, bk, wv, bv, wo, bo, emb_k, emb_v, n_heads, mask):
    """Direct relative self-attention: per-pair embedding lookup, zero
    outside the +-window (the zero padding of _get_relative_embeddings)."""
    b, t, c = x.shape
    d = c // n_heads
    q = (x @ wq.T + bq).reshape(b, t, n_heads, d).transpose(0, 2, 1, 3)
    k = (x @ wk.T + bk).reshape(b, t, n_heads, d).transpose(0, 2, 1, 3)
    v = (x @ wv.T + bv).reshape(b, t, n_heads, d).transpose(0, 2, 1, 3)
    scores = np.einsum("bhqd,bhkd->bhqk", q / np.sqrt(d), k)
    # relative key term
    for i in range(t):
        for j in range(t):
            r = j - i
            if abs(r) <= WS:
                scores[:, :, i, j] += (q[:, :, i] / np.sqrt(d)) @ emb_k[0, WS + r]
    scores = np.where(mask[:, None] == 0, -1e4, scores)
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    out = np.einsum("bhqk,bhkd->bhqd", p, v)
    for i in range(t):
        for j in range(t):
            r = j - i
            if abs(r) <= WS:
                out[:, :, i] += p[:, :, i, j, None] * emb_v[0, WS + r]
    out = out.transpose(0, 2, 1, 3).reshape(b, t, c)
    return out @ wo.T + bo


def test_rel_abs_shift_roundtrip(rng):
    b, h, l = 2, 3, 7
    rel = rng.standard_normal((b, h, l, 2 * l - 1)).astype(np.float32)
    absolute = np.asarray(_rel_to_abs(jnp.asarray(rel)))
    # abs[i, j] should equal rel[i, l-1 + (j-i)]
    for i in range(l):
        for j in range(l):
            np.testing.assert_allclose(absolute[..., i, j], rel[..., i, l - 1 + j - i])
    back = np.asarray(_abs_to_rel(jnp.asarray(absolute)))
    for i in range(l):
        for j in range(l):
            np.testing.assert_allclose(back[..., i, l - 1 + j - i], absolute[..., i, j])


def test_attention_matches_oracle(rng):
    c, heads, t, b = 16, 4, 12, 2
    x = rng.standard_normal((b, t, c)).astype(np.float32)
    lengths = np.array([12, 9])
    m = (np.arange(t)[None] < lengths[:, None]).astype(np.float32)
    attn_mask = (m[:, :, None] * m[:, None, :])[:, None]  # [B,1,T,T] — but oracle wants [B,T,T]

    mha = RelativeMultiHeadAttention(c, c, heads, window_size=WS)
    params = mha.init(jax.random.PRNGKey(1), jnp.asarray(x), jnp.asarray(x),
                      jnp.asarray(attn_mask))["params"]

    p = jax.tree.map(np.asarray, params)
    ours = np.asarray(
        mha.apply({"params": params}, jnp.asarray(x), jnp.asarray(x), jnp.asarray(attn_mask))
    )
    ref = _oracle_attention(
        x,
        p["conv_q"]["kernel"].T, p["conv_q"]["bias"],
        p["conv_k"]["kernel"].T, p["conv_k"]["bias"],
        p["conv_v"]["kernel"].T, p["conv_v"]["bias"],
        p["conv_o"]["kernel"].T, p["conv_o"]["bias"],
        p["emb_rel_k"], p["emb_rel_v"],
        heads, m[:, :, None] * m[:, None, :],
    )
    np.testing.assert_allclose(ours, ref, atol=3e-5)


def test_transformer_encoder_shapes_and_mask(rng):
    enc = TransformerEncoder(hidden_channels=16, filter_channels=32, n_heads=4,
                             n_layers=2, kernel_size=3, p_dropout=0.0)
    x = jnp.asarray(rng.standard_normal((2, 10, 16)).astype(np.float32))
    mask = jnp.ones((2, 10, 1)).at[1, 6:].set(0.0)
    params = enc.init(jax.random.PRNGKey(0), x, mask)
    out = enc.apply(params, x, mask)
    assert out.shape == (2, 10, 16)
    np.testing.assert_allclose(np.asarray(out[1, 6:]), 0.0, atol=1e-7)
    # changing padded inputs must not change valid outputs
    x2 = x.at[1, 6:].set(99.0)
    out2 = enc.apply(params, x2, mask)
    np.testing.assert_allclose(np.asarray(out[1, :6]), np.asarray(out2[1, :6]), atol=1e-5)
