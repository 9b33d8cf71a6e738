"""Residual-coupling normalizing flow (prior <-> posterior bridge).

Capability parity with /root/reference/vits/model/flow.py:7-37
(ResidualCouplingBlock) and modules.py:261-336 (Flip,
ResidualCouplingLayer, mean_only). TPU redesign: the forward/reverse pass
is the same static Python loop over 4 coupling+flip pairs (unrolled under
jit), channels-last, with the zero-initialized post projection the
reference relies on for identity-at-init flows (modules.py:314-315).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vcvits_tpu.models.layers import Conv1d, Dtype
from vcvits_tpu.models.wavenet import WN


class ResidualCouplingLayer(nn.Module):
    channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0
    mean_only: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        x_mask: jax.Array,
        g: Optional[jax.Array] = None,
        reverse: bool = False,
    ):
        half = self.channels // 2
        x0, x1 = x[..., :half], x[..., half:]
        h = Conv1d(self.hidden_channels, 1, dtype=self.dtype, name="pre")(x0) * x_mask
        h = WN(self.hidden_channels, self.kernel_size, self.dilation_rate,
               self.n_layers, gin_channels=self.gin_channels, dtype=self.dtype,
               name="enc")(h, x_mask, g=g)
        stats = Conv1d(half * (2 - self.mean_only), 1,
                       kernel_init=nn.initializers.zeros,
                       dtype=self.dtype, name="post")(h) * x_mask
        if self.mean_only:
            m, logs = stats, jnp.zeros_like(stats)
        else:
            m, logs = stats[..., :half], stats[..., half:]

        if not reverse:
            x1 = (m + x1 * jnp.exp(logs)) * x_mask
            logdet = jnp.sum(logs, axis=(1, 2))
            return jnp.concatenate([x0, x1], axis=-1), logdet
        x1 = (x1 - m) * jnp.exp(-logs) * x_mask
        return jnp.concatenate([x0, x1], axis=-1)


def flip_channels(x: jax.Array) -> jax.Array:
    """The Flip flow (modules.py:261-268), channel axis is last here."""
    return jnp.flip(x, axis=-1)


class ResidualCouplingBlock(nn.Module):
    """4 x (coupling + flip); forward z->z_p, reverse iterates backwards."""

    channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    n_flows: int = 4
    gin_channels: int = 0
    dtype: Dtype = jnp.float32

    def setup(self):
        self.flows = [
            ResidualCouplingLayer(
                self.channels, self.hidden_channels, self.kernel_size,
                self.dilation_rate, self.n_layers, gin_channels=self.gin_channels,
                mean_only=True, dtype=self.dtype, name=f"flow_{i}",
            )
            for i in range(self.n_flows)
        ]

    def __call__(
        self,
        x: jax.Array,
        x_mask: jax.Array,
        g: Optional[jax.Array] = None,
        reverse: bool = False,
    ) -> jax.Array:
        if not reverse:
            for flow in self.flows:
                x, _ = flow(x, x_mask, g=g, reverse=False)
                x = flip_channels(x)
        else:
            for flow in reversed(self.flows):
                x = flip_channels(x)
                x = flow(x, x_mask, g=g, reverse=True)
        return x
