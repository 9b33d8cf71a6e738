"""Classic (absolute-position) transformer encoder.

Capability parity with
/root/reference/vits/model/transformer/classic_transformer.py:8-30
(TransformerEncoder over torch ``nn.TransformerEncoderLayer`` clones —
dead code in the reference: nothing instantiates it, but it is part of
the module surface, kept for checkpoint-era experiments that used an
absolute-position encoder).

torch's ``TransformerEncoderLayer`` (post-LN default) is: self-attention
→ dropout → residual → LayerNorm → Linear/ReLU/Linear FFN → dropout →
residual → LayerNorm. The ``output_layer`` argument returns the running
hidden state after only the first N layers (the HuBERT-style probe the
reference's wrapper exposes at :23-29).

TPU notes: [B, T, C] layout, Dense QKV/FFN matmuls on the MXU, additive
-1e4 masking like the rest of this repo. Pair with
``utils.masking.add_timing_signal_1d`` for absolute positions — torch's
layer carries none of its own.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vcvits_tpu.models.layers import Dtype, LayerNorm, conv_precision


class ClassicEncoderLayer(nn.Module):
    """One post-LN encoder block (torch nn.TransformerEncoderLayer parity)."""

    hidden_channels: int
    filter_channels: int
    n_heads: int
    p_dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        attn_mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        """x: [B, T, C]; attn_mask: [B, 1, T, T] multiplicative (1=attend)."""
        prec = conv_precision(self.dtype)
        b, t, _ = x.shape
        k_channels = self.hidden_channels // self.n_heads
        dense = lambda n_out, name: nn.Dense(
            n_out, dtype=self.dtype, name=name, precision=prec,
            kernel_init=nn.initializers.xavier_uniform(),
        )
        q = dense(self.hidden_channels, "q")(x).reshape(b, t, self.n_heads, k_channels)
        k = dense(self.hidden_channels, "k")(x).reshape(b, t, self.n_heads, k_channels)
        v = dense(self.hidden_channels, "v")(x).reshape(b, t, self.n_heads, k_channels)
        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", q * (1.0 / math.sqrt(k_channels)), k, precision=prec
        )
        if attn_mask is not None:
            scores = jnp.where(attn_mask == 0, jnp.asarray(-1e4, scores.dtype), scores)
        p_attn = jax.nn.softmax(scores, axis=-1)
        p_attn = nn.Dropout(self.p_dropout, deterministic=deterministic)(p_attn)
        y = jnp.einsum("bhqk,bkhd->bqhd", p_attn, v, precision=prec)
        y = dense(self.hidden_channels, "out")(y.reshape(b, t, self.hidden_channels))
        drop = nn.Dropout(self.p_dropout, deterministic=deterministic)
        x = LayerNorm(self.hidden_channels, dtype=self.dtype, name="norm1")(x + drop(y))

        y = dense(self.filter_channels, "ffn1")(x)
        y = jax.nn.relu(y)
        y = nn.Dropout(self.p_dropout, deterministic=deterministic)(y)
        y = dense(self.hidden_channels, "ffn2")(y)
        return LayerNorm(self.hidden_channels, dtype=self.dtype, name="norm2")(x + drop(y))


class ClassicTransformerEncoder(nn.Module):
    """Stack of ClassicEncoderLayer with the reference's output_layer probe."""

    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    p_dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        x_mask: Optional[jax.Array] = None,
        output_layer: Optional[int] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        """x: [B, T, C]; x_mask: [B, T, 1]; output_layer: stop after N layers.

        NOTE: every layer must be *constructed* each call regardless of
        output_layer so the parameter tree is stable across probes (flax
        init would otherwise drop the tail layers' params).
        """
        attn_mask = None
        if x_mask is not None:
            m = x_mask[..., 0]
            attn_mask = m[:, None, :, None] * m[:, None, None, :]
        n = self.n_layers if output_layer is None else min(output_layer, self.n_layers)
        for i in range(self.n_layers):
            layer = ClassicEncoderLayer(
                self.hidden_channels, self.filter_channels, self.n_heads,
                p_dropout=self.p_dropout, dtype=self.dtype, name=f"layer_{i}",
            )
            if i < n:
                x = layer(x, attn_mask, deterministic=deterministic)
            elif self.is_initializing():
                # materialize the tail layers' params at init only; at
                # apply time the skipped layers cost zero FLOPs
                _ = layer(x, attn_mask, deterministic=deterministic)
        return x
