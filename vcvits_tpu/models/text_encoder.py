"""Text encoder for the TTS path.

Capability parity with /root/reference/vits/model/encoders/text_encoder.py:
11-52: symbol embedding x sqrt(hidden) -> relative-attention encoder ->
1x1 proj to (m, logs). The reference's TTS path is broken as shipped
(SURVEY.md); here it is a working capability layer.
"""

from __future__ import annotations

import math
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vcvits_tpu.models.attention import TransformerEncoder
from vcvits_tpu.models.layers import Conv1d, Dtype
from vcvits_tpu.utils.masking import sequence_mask


class TextEncoder(nn.Module):
    n_vocab: int
    out_channels: int
    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int
    p_dropout: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, x_lengths: jax.Array, deterministic: bool = True
    ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
        """x: [B, T] int symbol ids -> (h, m, logs, x_mask), all [B, T, *]."""
        emb = nn.Embed(
            self.n_vocab, self.hidden_channels,
            embedding_init=nn.initializers.normal(self.hidden_channels**-0.5),
            dtype=self.dtype, name="emb",
        )
        h = emb(jnp.clip(x, 0, self.n_vocab - 1)) * math.sqrt(self.hidden_channels)
        x_mask = sequence_mask(x_lengths, x.shape[1]).astype(h.dtype)
        h = TransformerEncoder(
            self.hidden_channels, self.filter_channels, self.n_heads,
            self.n_layers, self.kernel_size, self.p_dropout,
            dtype=self.dtype, name="encoder",
        )(h * x_mask, x_mask, deterministic=deterministic)
        stats = Conv1d(self.out_channels * 2, 1, dtype=self.dtype, name="proj")(h) * x_mask
        m = stats[..., : self.out_channels]
        logs = stats[..., self.out_channels :]
        return h, m, logs, x_mask
