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


class Log(nn.Module):
    """Log flow (modules.py:250-258)."""

    @nn.compact
    def __call__(self, x, x_mask, reverse: bool = False, **kwargs):
        if not reverse:
            y = jnp.log(jnp.clip(x, min=1e-5)) * x_mask
            logdet = jnp.sum(-y, axis=(1, 2))
            return y, logdet
        return jnp.exp(x) * x_mask


class ElementwiseAffine(nn.Module):
    """Per-channel affine flow (modules.py:271-286)."""

    channels: int

    @nn.compact
    def __call__(self, x, x_mask, reverse: bool = False, **kwargs):
        m = self.param("m", nn.initializers.zeros, (self.channels,), jnp.float32)
        logs = self.param("logs", nn.initializers.zeros, (self.channels,), jnp.float32)
        if not reverse:
            y = (m + jnp.exp(logs) * x) * x_mask
            logdet = jnp.sum(logs[None, None, :] * x_mask, axis=(1, 2))
            return y, logdet
        return (x - m) * jnp.exp(-logs) * x_mask


class DDSConv(nn.Module):
    """Dilated depth-separable conv stack (modules.py:67-106)."""

    channels: int
    kernel_size: int
    n_layers: int
    p_dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_mask, g=None, deterministic: bool = True):
        from vcvits_tpu.models.layers import LayerNorm

        if g is not None:
            x = x + g
        drop = nn.Dropout(self.p_dropout, deterministic=deterministic)
        for i in range(self.n_layers):
            dilation = self.kernel_size**i
            y = Conv1d(self.channels, self.kernel_size, dilation=dilation,
                       groups=self.channels, dtype=self.dtype,
                       name=f"sep_{i}")(x * x_mask)
            y = LayerNorm(self.channels, dtype=self.dtype, name=f"norm1_{i}")(y)
            y = jax.nn.gelu(y, approximate=False)
            y = Conv1d(self.channels, 1, dtype=self.dtype, name=f"pw_{i}")(y)
            y = LayerNorm(self.channels, dtype=self.dtype, name=f"norm2_{i}")(y)
            y = jax.nn.gelu(y, approximate=False)
            y = drop(y)
            x = x + y
        return x * x_mask


class ConvFlow(nn.Module):
    """Spline coupling flow over 2 channels (modules.py:339-388)."""

    in_channels: int
    filter_channels: int
    kernel_size: int
    n_layers: int
    num_bins: int = 10
    tail_bound: float = 5.0

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse: bool = False):
        from vcvits_tpu.models.transforms import piecewise_rational_quadratic_transform

        half = self.in_channels // 2
        x0, x1 = x[..., :half], x[..., half:]
        h = Conv1d(self.filter_channels, 1, name="pre")(x0)
        h = DDSConv(self.filter_channels, self.kernel_size, self.n_layers,
                    name="convs")(h, x_mask, g=g)
        h = Conv1d(half * (self.num_bins * 3 - 1), 1,
                   kernel_init=nn.initializers.zeros, name="proj")(h) * x_mask

        b, t, _ = x0.shape
        # [B, T, half*(3K-1)] -> [B, T, half, 3K-1]
        h = h.reshape(b, t, half, -1)
        k = self.num_bins
        scale = 1.0 / jnp.sqrt(jnp.asarray(self.filter_channels, jnp.float32))
        uw = h[..., :k] * scale
        uh = h[..., k : 2 * k] * scale
        ud = h[..., 2 * k :]

        x1_new, logabsdet = piecewise_rational_quadratic_transform(
            x1, uw, uh, ud, inverse=reverse, tails="linear",
            tail_bound=self.tail_bound,
        )
        x_out = jnp.concatenate([x0, x1_new], axis=-1) * x_mask
        logdet = jnp.sum(logabsdet * x_mask, axis=(1, 2))
        if not reverse:
            return x_out, logdet
        return x_out
