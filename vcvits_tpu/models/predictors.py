"""Variance predictors (duration / pitch / energy) for the TTS path.

Capability parity with /root/reference/vits/model/predictors/:
duration_predictor.py:9-126 (StochasticDurationPredictor spline-flow NLL +
deterministic DurationPredictor), pitch_predictor.py:9-30 /
energy_predictor.py:9-30 (FastPitch-style ConvReLUNorm stacks), and
predictors/modules.py:7-41 (ConvReLUNorm, average_pitch).
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vcvits_tpu.models.flow import ConvFlow, DDSConv, ElementwiseAffine, Log, flip_channels
from vcvits_tpu.models.layers import Conv1d, Dtype, LayerNorm


class ConvReLUNorm(nn.Module):
    """conv -> relu -> LayerNorm -> dropout (predictors/modules.py:7-24)."""

    out_channels: int
    kernel_size: int = 1
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        y = Conv1d(self.out_channels, self.kernel_size,
                   padding=(self.kernel_size // 2, self.kernel_size // 2),
                   dtype=self.dtype, name="conv")(x)
        y = jax.nn.relu(y)
        y = nn.LayerNorm(dtype=self.dtype, name="norm")(y)
        return nn.Dropout(self.dropout, deterministic=deterministic)(y)


class VariancePredictor(nn.Module):
    """FastPitch-style pitch/energy predictor (pitch_predictor.py:14-30)."""

    filter_channels: int
    kernel_size: int = 3
    dropout: float = 0.1
    n_layers: int = 2
    n_predictions: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, x_mask: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        out = x * x_mask
        for i in range(self.n_layers):
            out = ConvReLUNorm(self.filter_channels, self.kernel_size,
                               self.dropout, dtype=self.dtype,
                               name=f"layer_{i}")(out, deterministic)
        out = nn.Dense(self.n_predictions, dtype=self.dtype, name="fc")(out)
        return out * x_mask


def average_by_duration(values: jax.Array, durs: jax.Array) -> jax.Array:
    """Mean of nonzero frame values per token (predictors/modules.py:27-41).

    values: [B, T_frames]; durs: [B, T_tokens] int. Returns [B, T_tokens].
    """
    ends = jnp.cumsum(durs, axis=1).astype(jnp.int32)
    starts = jnp.pad(ends[:, :-1], ((0, 0), (1, 0)))
    nz_cum = jnp.pad(jnp.cumsum((values != 0).astype(values.dtype), axis=1), ((0, 0), (1, 0)))
    val_cum = jnp.pad(jnp.cumsum(values, axis=1), ((0, 0), (1, 0)))
    t = values.shape[1]
    take = lambda arr, idx: jnp.take_along_axis(arr, jnp.clip(idx, 0, t), axis=1)
    sums = take(val_cum, ends) - take(val_cum, starts)
    counts = take(nz_cum, ends) - take(nz_cum, starts)
    return jnp.where(counts == 0, 0.0, sums / jnp.maximum(counts, 1.0))


class DurationPredictor(nn.Module):
    """Deterministic conv duration predictor (duration_predictor.py:92-126)."""

    filter_channels: int
    kernel_size: int = 3
    p_dropout: float = 0.5
    gin_channels: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_mask, g=None, deterministic: bool = True):
        x = jax.lax.stop_gradient(x)
        if g is not None and self.gin_channels > 0:
            g = jax.lax.stop_gradient(g)
            x = x + nn.Dense(x.shape[-1], dtype=self.dtype, name="cond")(g)[:, None, :]
        drop = nn.Dropout(self.p_dropout, deterministic=deterministic)
        x = Conv1d(self.filter_channels, self.kernel_size, dtype=self.dtype,
                   name="conv_1")(x * x_mask)
        x = LayerNorm(self.filter_channels, dtype=self.dtype, name="norm_1")(jax.nn.relu(x))
        x = drop(x)
        x = Conv1d(self.filter_channels, self.kernel_size, dtype=self.dtype,
                   name="conv_2")(x * x_mask)
        x = LayerNorm(self.filter_channels, dtype=self.dtype, name="norm_2")(jax.nn.relu(x))
        x = drop(x)
        x = Conv1d(1, 1, dtype=self.dtype, name="proj")(x * x_mask)
        return x * x_mask


class StochasticDurationPredictor(nn.Module):
    """Spline-flow NLL duration model (duration_predictor.py:9-89).

    forward (training): returns per-row NLL of log-durations w given text h.
    reverse (inference): samples log-durations.
    """

    in_channels: int
    filter_channels: int  # overridden to in_channels, as in the reference :13
    kernel_size: int = 3
    p_dropout: float = 0.5
    n_flows: int = 4
    gin_channels: int = 0
    dtype: Dtype = jnp.float32

    def setup(self):
        fc = self.in_channels  # reference quirk: filter_channels = in_channels
        self.log_flow = Log()
        self.pre_affine = ElementwiseAffine(2)
        self.flows_list = [
            ConvFlow(2, fc, self.kernel_size, n_layers=3, name=f"flow_{i}")
            for i in range(self.n_flows)
        ]
        self.post_pre = Conv1d(fc, 1, name="post_pre")
        self.post_proj = Conv1d(fc, 1, name="post_proj")
        self.post_convs = DDSConv(fc, self.kernel_size, n_layers=3, name="post_convs")
        self.post_affine = ElementwiseAffine(2)
        self.post_flows_list = [
            ConvFlow(2, fc, self.kernel_size, n_layers=3, name=f"post_flow_{i}")
            for i in range(4)
        ]
        self.pre = Conv1d(fc, 1, name="pre")
        self.proj = Conv1d(fc, 1, name="proj")
        self.convs = DDSConv(fc, self.kernel_size, n_layers=3,
                             p_dropout=self.p_dropout, name="convs")
        if self.gin_channels > 0:
            self.cond = Conv1d(fc, 1, name="cond")

    def __call__(self, x, x_mask, w=None, g=None, reverse=False,
                 noise_scale=1.0, rng=None, deterministic=True):
        x = jax.lax.stop_gradient(x)
        x = self.pre(x)
        if g is not None and self.gin_channels > 0:
            g = jax.lax.stop_gradient(g)
            x = x + self.cond(g[:, None, :])
        x = self.convs(x, x_mask, deterministic=deterministic)
        x = self.proj(x) * x_mask

        b, t, _ = x.shape
        if rng is None:
            rng = self.make_rng("sample")

        if not reverse:
            assert w is not None  # [B, T, 1] durations
            logdet_tot_q = jnp.zeros((b,))
            h_w = self.post_pre(w)
            h_w = self.post_convs(h_w, x_mask, deterministic=deterministic)
            h_w = self.post_proj(h_w) * x_mask
            e_q = jax.random.normal(rng, (b, t, 2)) * x_mask
            z_q = e_q
            z_q, ld = self.post_affine(z_q, x_mask)
            logdet_tot_q += ld
            for f in self.post_flows_list:
                z_q, ld = f(z_q, x_mask, g=(x + h_w))
                logdet_tot_q += ld
                z_q = flip_channels(z_q)
            z_u, z1 = z_q[..., :1], z_q[..., 1:]
            u = jax.nn.sigmoid(z_u) * x_mask
            z0 = (w - u) * x_mask
            logdet_tot_q += jnp.sum(
                (jax.nn.log_sigmoid(z_u) + jax.nn.log_sigmoid(-z_u)) * x_mask,
                axis=(1, 2),
            )
            logq = (
                jnp.sum(-0.5 * (math.log(2 * math.pi) + e_q**2) * x_mask, axis=(1, 2))
                - logdet_tot_q
            )

            logdet_tot = jnp.zeros((b,))
            z0, ld = self.log_flow(z0, x_mask)
            logdet_tot += ld
            z = jnp.concatenate([z0, z1], axis=-1)
            z, ld = self.pre_affine(z, x_mask)
            logdet_tot += ld
            for f in self.flows_list:
                z, ld = f(z, x_mask, g=x)
                logdet_tot += ld
                z = flip_channels(z)
            nll = (
                jnp.sum(0.5 * (math.log(2 * math.pi) + z**2) * x_mask, axis=(1, 2))
                - logdet_tot
            )
            return nll + logq  # [B]

        # reverse: sample. The reference skips the first forward coupling
        # when sampling ("remove a useless vflow", duration_predictor.py:84).
        z = jax.random.normal(rng, (b, t, 2)) * noise_scale
        n = len(self.flows_list)
        for i, f in enumerate(reversed(self.flows_list)):
            z = flip_channels(z)
            if i < n - 1:
                z = f(z, x_mask, g=x, reverse=True)
        z = self.pre_affine(z, x_mask, reverse=True)
        logw = z[..., :1]
        return logw
