"""Relative-position transformer encoder (the VITS prior encoder family).

Capability parity with
/root/reference/vits/model/transformer/relative_attention_transformer.py:
13-47 (TransformerEncoder), :103-262 (MultiHeadAttention with learned
relative-position K/V embeddings, window 4, heads shared), :265-311 (conv
FFN). TPU redesign notes:

* [B, T, C] layout; QKV projections are Dense layers (the reference's 1x1
  convs) so they hit the MXU as single [B*T, C] matmuls.
* The rel->abs index shifting is the standard pad/reshape trick — all static
  shapes, no gathers, XLA-fusable.
* Masking adds -1e4 to the logits exactly like the reference's masked_fill
  (relative_attention_transformer.py:172) to stay bit-comparable, rather
  than -inf.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vcvits_tpu.models.layers import Conv1d, Dtype, LayerNorm, conv_precision


def _rel_to_abs(x: jax.Array) -> jax.Array:
    """[B, H, L, 2L-1] relative logits -> [B, H, L, L] absolute.

    Same pad/reshape/slice scheme as the reference (:224-242).
    """
    b, h, length, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))
    x_flat = x.reshape(b, h, length * 2 * length)
    x_flat = jnp.pad(x_flat, ((0, 0), (0, 0), (0, length - 1)))
    x_final = x_flat.reshape(b, h, length + 1, 2 * length - 1)
    return x_final[:, :, :length, length - 1 :]


def _abs_to_rel(x: jax.Array) -> jax.Array:
    """[B, H, L, L] attention weights -> [B, H, L, 2L-1] relative (:244-258)."""
    b, h, length, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, length - 1)))
    x_flat = x.reshape(b, h, length * length + length * (length - 1))
    x_flat = jnp.pad(x_flat, ((0, 0), (0, 0), (length, 0)))
    return x_flat.reshape(b, h, length, 2 * length)[:, :, :, 1:]


def _slice_relative_embeddings(emb: jax.Array, length: int, window_size: int) -> jax.Array:
    """[n_heads_rel, 2*ws+1, d] -> [n_heads_rel, 2L-1, d] (:207-222)."""
    pad_length = max(length - (window_size + 1), 0)
    start = max((window_size + 1) - length, 0)
    if pad_length > 0:
        emb = jnp.pad(emb, ((0, 0), (pad_length, pad_length), (0, 0)))
    return emb[:, start : start + 2 * length - 1]


class RelativeMultiHeadAttention(nn.Module):
    """Self-attention with learned relative K/V position embeddings."""

    channels: int
    out_channels: int
    n_heads: int
    p_dropout: float = 0.0
    window_size: Optional[int] = 4
    heads_share: bool = True
    proximal_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        c: jax.Array,
        attn_mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        """x (query side), c (key/value side): [B, T, C]; attn_mask: [B, 1, Tq, Tk]."""
        k_channels = self.channels // self.n_heads
        b, t_t, _ = x.shape
        t_s = c.shape[1]

        prec = conv_precision(self.dtype)
        dense = lambda name: nn.Dense(
            self.channels, dtype=self.dtype, name=name,
            kernel_init=nn.initializers.xavier_uniform(), precision=prec,
        )
        q = dense("conv_q")(x).reshape(b, t_t, self.n_heads, k_channels).transpose(0, 2, 1, 3)
        k = dense("conv_k")(c).reshape(b, t_s, self.n_heads, k_channels).transpose(0, 2, 1, 3)
        v = dense("conv_v")(c).reshape(b, t_s, self.n_heads, k_channels).transpose(0, 2, 1, 3)

        scale = 1.0 / math.sqrt(k_channels)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k, precision=prec)

        if self.window_size is not None:
            assert t_s == t_t, "relative attention requires self-attention"
            n_heads_rel = 1 if self.heads_share else self.n_heads
            rel_stddev = k_channels**-0.5
            emb_rel_k = self.param(
                "emb_rel_k",
                nn.initializers.normal(rel_stddev),
                (n_heads_rel, 2 * self.window_size + 1, k_channels),
                jnp.float32,
            )
            emb_rel_v = self.param(
                "emb_rel_v",
                nn.initializers.normal(rel_stddev),
                (n_heads_rel, 2 * self.window_size + 1, k_channels),
                jnp.float32,
            )
            key_rel = _slice_relative_embeddings(emb_rel_k.astype(self.dtype), t_s, self.window_size)
            rel_logits = jnp.einsum("bhld,hmd->bhlm", q * scale, key_rel, precision=prec)
            scores = scores + _rel_to_abs(rel_logits)

        if self.proximal_bias:
            r = jnp.arange(t_s, dtype=jnp.float32)
            diff = r[None, :] - r[:, None]
            scores = scores + (-jnp.log1p(jnp.abs(diff)))[None, None].astype(scores.dtype)

        if attn_mask is not None:
            scores = jnp.where(attn_mask == 0, jnp.asarray(-1e4, scores.dtype), scores)

        p_attn = jax.nn.softmax(scores, axis=-1)
        p_attn = nn.Dropout(self.p_dropout, deterministic=deterministic)(p_attn)
        out = jnp.einsum("bhqk,bhkd->bhqd", p_attn, v, precision=prec)

        if self.window_size is not None:
            rel_weights = _abs_to_rel(p_attn)
            value_rel = _slice_relative_embeddings(emb_rel_v.astype(self.dtype), t_s, self.window_size)
            out = out + jnp.einsum("bhlm,hmd->bhld", rel_weights, value_rel, precision=prec)

        out = out.transpose(0, 2, 1, 3).reshape(b, t_t, self.channels)
        return nn.Dense(self.out_channels, dtype=self.dtype, name="conv_o", precision=prec)(out)


class ConvFFN(nn.Module):
    """Conv feed-forward block (kernel-3 same/causal padding) — FFN :265-311."""

    out_channels: int
    filter_channels: int
    kernel_size: int
    p_dropout: float = 0.0
    activation: Optional[str] = None
    causal: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, x_mask: jax.Array, deterministic: bool = True) -> jax.Array:
        if self.kernel_size == 1:
            pad = (0, 0)
        elif self.causal:
            pad = (self.kernel_size - 1, 0)
        else:
            pad = ((self.kernel_size - 1) // 2, self.kernel_size // 2)
        x = Conv1d(self.filter_channels, self.kernel_size, padding=pad,
                   dtype=self.dtype, name="conv_1")(x * x_mask)
        if self.activation == "gelu":
            x = x * jax.nn.sigmoid(1.702 * x)
        else:
            x = jax.nn.relu(x)
        x = nn.Dropout(self.p_dropout, deterministic=deterministic)(x)
        x = Conv1d(self.out_channels, self.kernel_size, padding=pad,
                   dtype=self.dtype, name="conv_2")(x * x_mask)
        return x * x_mask


class TransformerEncoder(nn.Module):
    """Pre-mask residual+LN encoder stack — TransformerEncoder :13-47."""

    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int = 1
    p_dropout: float = 0.0
    window_size: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, x_mask: jax.Array, deterministic: bool = True) -> jax.Array:
        """x: [B, T, C]; x_mask: [B, T, 1]."""
        m = x_mask[..., 0]  # [B, T]
        attn_mask = m[:, None, :, None] * m[:, None, None, :]  # [B, 1, T, T]
        drop = nn.Dropout(self.p_dropout, deterministic=deterministic)
        x = x * x_mask
        for i in range(self.n_layers):
            y = RelativeMultiHeadAttention(
                self.hidden_channels, self.hidden_channels, self.n_heads,
                p_dropout=self.p_dropout, window_size=self.window_size,
                dtype=self.dtype, name=f"attn_{i}",
            )(x, x, attn_mask, deterministic=deterministic)
            y = drop(y)
            x = LayerNorm(self.hidden_channels, dtype=self.dtype, name=f"norm1_{i}")(x + y)

            y = ConvFFN(
                self.hidden_channels, self.filter_channels, self.kernel_size,
                p_dropout=self.p_dropout, dtype=self.dtype, name=f"ffn_{i}",
            )(x, x_mask, deterministic=deterministic)
            y = drop(y)
            x = LayerNorm(self.hidden_channels, dtype=self.dtype, name=f"norm2_{i}")(x + y)
        return x * x_mask


class TransformerDecoder(nn.Module):
    """Causal decoder stack: masked self-attn → enc-dec cross-attn → causal FFN.

    Capability parity with
    relative_attention_transformer.py:50-100 (TransformerDecoder — dead
    code in the reference: nothing instantiates it, but it is part of the
    module surface). Same block order and residual+post-LN scheme; the
    self-attention uses the proximal log-distance bias like the reference's
    (proximal_bias=True default there). The reference's `proximal_init`
    (copying the query projection into the key projection at init) is a
    torch in-place init trick with no effect on the traced graph shape; we
    document it rather than replicate torch RNG mechanics — no checkpoint
    for this module exists to match.

    x (decoder input): [B, T_x, C]; h (encoder output): [B, T_h, C];
    masks are [B, T, 1].
    """

    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int = 1
    p_dropout: float = 0.0
    proximal_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        x_mask: jax.Array,
        h: jax.Array,
        h_mask: jax.Array,
        deterministic: bool = True,
    ) -> jax.Array:
        from vcvits_tpu.utils.masking import subsequent_mask

        t_x = x.shape[1]
        mx = x_mask[..., 0]  # [B, T_x]
        mh = h_mask[..., 0]  # [B, T_h]
        # causal AND within-length (reference :81: subsequent_mask alone;
        # padding is handled by the trailing x*x_mask there — we fold both in)
        self_attn_mask = subsequent_mask(t_x) * (
            mx[:, None, :, None] * mx[:, None, None, :]
        )
        encdec_attn_mask = mx[:, None, :, None] * mh[:, None, None, :]
        drop = nn.Dropout(self.p_dropout, deterministic=deterministic)
        x = x * x_mask
        for i in range(self.n_layers):
            y = RelativeMultiHeadAttention(
                self.hidden_channels, self.hidden_channels, self.n_heads,
                p_dropout=self.p_dropout, window_size=None,
                proximal_bias=self.proximal_bias,
                dtype=self.dtype, name=f"self_attn_{i}",
            )(x, x, self_attn_mask, deterministic=deterministic)
            y = drop(y)
            x = LayerNorm(self.hidden_channels, dtype=self.dtype, name=f"norm0_{i}")(x + y)

            y = RelativeMultiHeadAttention(
                self.hidden_channels, self.hidden_channels, self.n_heads,
                p_dropout=self.p_dropout, window_size=None,
                dtype=self.dtype, name=f"encdec_attn_{i}",
            )(x, h, encdec_attn_mask, deterministic=deterministic)
            y = drop(y)
            x = LayerNorm(self.hidden_channels, dtype=self.dtype, name=f"norm1_{i}")(x + y)

            y = ConvFFN(
                self.hidden_channels, self.filter_channels, self.kernel_size,
                p_dropout=self.p_dropout, causal=True,
                dtype=self.dtype, name=f"ffn_{i}",
            )(x, x_mask, deterministic=deterministic)
            y = drop(y)
            x = LayerNorm(self.hidden_channels, dtype=self.dtype, name=f"norm2_{i}")(x + y)
        return x * x_mask
