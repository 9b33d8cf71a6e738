"""Non-causal WaveNet stack (gated dilated convs with global conditioning).

Capability parity with /root/reference/vits/model/modules.py:109-183 (WN):
n_layers of [dilated conv -> gated tanh*sigmoid (+ speaker conditioning) ->
1x1 res/skip], with weight-normed convs. TPU redesign: [B, T, C] layout,
speaker conditioning is a single Dense over the global embedding broadcast
across time (the reference's 1x1 cond conv over [B, gin, 1]), and the gate
is the fused elementwise op XLA folds into the convs.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vcvits_tpu.models.layers import Conv1d, Dtype
from vcvits_tpu.ops.fused_gate import fused_add_tanh_sigmoid_multiply


class WN(nn.Module):
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0
    p_dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        x_mask: jax.Array,
        g: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        """x: [B, T, H]; x_mask: [B, T, 1]; g: [B, gin] global conditioning."""
        h = self.hidden_channels
        output = jnp.zeros_like(x)

        if g is not None:
            # cond_layer: one weight-normed 1x1 conv producing all layers'
            # conditioning at once (modules.py:124-126).
            cond = Conv1d(2 * h * self.n_layers, 1, weight_norm=True,
                          dtype=self.dtype, name="cond_layer")(g[:, None, :])

        drop = nn.Dropout(self.p_dropout, deterministic=deterministic)
        for i in range(self.n_layers):
            dilation = self.dilation_rate**i
            x_in = Conv1d(2 * h, self.kernel_size, dilation=dilation,
                          weight_norm=True, dtype=self.dtype, name=f"in_{i}")(x)
            if g is not None:
                g_l = cond[:, :, i * 2 * h : (i + 1) * 2 * h]
            else:
                g_l = jnp.zeros_like(x_in)
            acts = fused_add_tanh_sigmoid_multiply(x_in, g_l, h)
            acts = drop(acts)

            res_skip_ch = 2 * h if i < self.n_layers - 1 else h
            res_skip = Conv1d(res_skip_ch, 1, weight_norm=True,
                              dtype=self.dtype, name=f"res_skip_{i}")(acts)
            if i < self.n_layers - 1:
                x = (x + res_skip[..., :h]) * x_mask
                output = output + res_skip[..., h:]
            else:
                output = output + res_skip
        return output * x_mask
