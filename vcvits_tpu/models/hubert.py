"""JAX HuBERT content-feature extractor (frozen in this framework).

Capability parity with the fairseq HuBERT the reference loads and freezes
(/root/reference/vits/model/encoders/content_encoder.py:32-35, N2 in
SURVEY.md §2.6): 7-layer strided conv front-end (320x downsample, receptive
field 400), feature projection, grouped positional conv embedding, and a
post-LN transformer encoder. `hubert_base` (768ch/12L) and
`hubert_xtralarge` (1280ch/48L, configs/base.json:40) are both expressible
via HubertConfig.

TPU design: one [B, T] -> [B, T/320, C] function, everything batched matmuls
and convs in NHC; runs under the same jit as the rest of the generator and
is wrapped in stop_gradient by the caller (the reference freezes params).
Checkpoint conversion from torch lives in vcvits_tpu/convert/hubert_torch.py
and is parity-tested against transformers.HubertModel.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vcvits_tpu.models.layers import Dtype, conv_precision


@dataclass(frozen=True)
class HubertConfig:
    # (dim, kernel, stride) per conv layer — fairseq "conv_feature_layers"
    conv_layers: Tuple[Tuple[int, int, int], ...] = (
        (512, 10, 5), (512, 3, 2), (512, 3, 2), (512, 3, 2),
        (512, 3, 2), (512, 2, 2), (512, 2, 2),
    )
    conv_bias: bool = False
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    pos_conv_kernel: int = 128
    pos_conv_groups: int = 16
    layer_norm_eps: float = 1e-5

    @property
    def downsample(self) -> int:
        d = 1
        for _, _, s in self.conv_layers:
            d *= s
        return d  # 320 for base

    @property
    def receptive_field(self) -> int:
        rf, d = 1, 1
        for _, k, s in self.conv_layers:
            rf += (k - 1) * d
            d *= s
        return rf  # 400 for base


HUBERT_BASE = HubertConfig()
HUBERT_XTRALARGE = HubertConfig(
    hidden_size=1280, num_layers=48, num_heads=16, intermediate_size=5120,
)


def hubert_frames(num_samples: int, cfg: HubertConfig = HUBERT_BASE) -> int:
    """Output frame count for a given (padded) sample count."""
    t = num_samples
    for _, k, s in cfg.conv_layers:
        t = (t - k) // s + 1
    return t


class _GroupNormAll(nn.Module):
    """GroupNorm with groups == channels (per-channel instance norm), the
    fairseq 'default' extractor mode's first-layer norm."""

    channels: int
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: [B, T, C]; normalize each channel over T.
        scale = self.param("scale", nn.initializers.ones, (self.channels,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.channels,), jnp.float32)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=1, keepdims=True)
        var = jnp.var(xf, axis=1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * scale + bias).astype(self.dtype)


class ConvFeatureExtractor(nn.Module):
    cfg: HubertConfig
    dtype: Dtype = jnp.float32
    # im2col the single-channel first conv into a dense [k -> dim] matmul:
    # the wav enters with 1 of 128 lanes used, so the plain conv wastes the
    # MXU 128x on its input side (ROADMAP item 2). Exact — same params,
    # same taps in the same order (tests/test_hubert.py parity covers it).
    im2col_first: bool = True

    @nn.compact
    def __call__(self, wav: jax.Array) -> jax.Array:
        """[B, T] -> [B, T/320, 512]."""
        x = wav[:, :, None]
        for i, (dim, k, s) in enumerate(self.cfg.conv_layers):
            kernel = self.param(
                f"conv_{i}_kernel", nn.initializers.he_normal(),
                (k, x.shape[-1], dim), jnp.float32,
            )
            if (i == 0 and self.im2col_first and x.shape[-1] == 1
                    and k % s == 0 and wav.shape[1] % s == 0):
                b, t = wav.shape
                nb = k // s
                xb = wav.reshape(b, t // s, s).astype(self.dtype)
                frames = jnp.concatenate(
                    [xb[:, j: xb.shape[1] - (nb - 1 - j)] for j in range(nb)],
                    axis=-1)  # [B, (T-k)//s + 1, k]
                x = jnp.einsum(
                    "btk,kd->btd", frames,
                    kernel.reshape(k, dim).astype(self.dtype),
                    precision=conv_precision(self.dtype))
            else:
                x = jax.lax.conv_general_dilated(
                    x.astype(self.dtype), kernel.astype(self.dtype),
                    window_strides=(s,), padding=[(0, 0)],
                    dimension_numbers=("NHC", "HIO", "NHC"),
                    precision=conv_precision(self.dtype),
                )
            if self.cfg.conv_bias:
                b = self.param(f"conv_{i}_bias", nn.initializers.zeros, (dim,), jnp.float32)
                x = x + b.astype(self.dtype)
            if i == 0:
                x = _GroupNormAll(dim, dtype=self.dtype, name="group_norm")(x)
            x = jax.nn.gelu(x, approximate=False)
        return x


class _SelfAttention(nn.Module):
    hidden: int
    heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array]) -> jax.Array:
        b, t, c = x.shape
        d = self.hidden // self.heads
        prec = conv_precision(self.dtype)
        dense = lambda name: nn.Dense(self.hidden, dtype=self.dtype, name=name, precision=prec)
        q = dense("q_proj")(x).reshape(b, t, self.heads, d).transpose(0, 2, 1, 3)
        k = dense("k_proj")(x).reshape(b, t, self.heads, d).transpose(0, 2, 1, 3)
        v = dense("v_proj")(x).reshape(b, t, self.heads, d).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q / jnp.sqrt(d).astype(q.dtype), k, precision=prec)
        if mask is not None:
            big_neg = jnp.asarray(jnp.finfo(jnp.float32).min, scores.dtype)
            scores = jnp.where(mask[:, None, None, :] == 0, big_neg, scores)
        p = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", p, v, precision=prec)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, c)
        return dense("out_proj")(out)


class _EncoderLayer(nn.Module):
    """Post-LN transformer block (fairseq base, layer_norm_first=False)."""

    cfg: HubertConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array]) -> jax.Array:
        c = self.cfg
        h = _SelfAttention(c.hidden_size, c.num_heads, dtype=self.dtype, name="attn")(x, mask)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="ln1")(x + h)
        prec = conv_precision(self.dtype)
        h = nn.Dense(c.intermediate_size, dtype=self.dtype, name="fc1", precision=prec)(x)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(c.hidden_size, dtype=self.dtype, name="fc2", precision=prec)(h)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="ln2")(x + h)


class PositionalConvEmbedding(nn.Module):
    """Grouped conv relative positional embedding (kernel 128, groups 16).

    fairseq weight-norms this conv along dim=2; at conversion time the norm
    is folded into a plain kernel (it is frozen here, so dynamics don't
    matter — only the materialized weight).
    """

    cfg: HubertConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = self.cfg
        k = c.pos_conv_kernel
        kernel = self.param(
            "kernel", nn.initializers.he_normal(),
            (k, c.hidden_size // c.pos_conv_groups, c.hidden_size), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (c.hidden_size,), jnp.float32)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=(1,), padding=[(k // 2, k // 2)],
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=c.pos_conv_groups,
            precision=conv_precision(self.dtype),
        ) + bias.astype(self.dtype)
        if k % 2 == 0:
            y = y[:, :-1]  # even kernel + symmetric pad overshoots by one
        return jax.nn.gelu(y, approximate=False)


class HubertModel(nn.Module):
    """wav [B, T] (+ optional frame mask) -> features [B, T/320, hidden]."""

    cfg: HubertConfig = field(default_factory=lambda: HUBERT_BASE)
    dtype: Dtype = jnp.float32
    im2col_first: bool = True  # see ConvFeatureExtractor.im2col_first

    @nn.compact
    def __call__(self, wav: jax.Array, frame_mask: Optional[jax.Array] = None) -> jax.Array:
        c = self.cfg
        feats = ConvFeatureExtractor(c, dtype=self.dtype,
                                     im2col_first=self.im2col_first,
                                     name="feature_extractor")(wav)
        # fairseq HubertModel: layer_norm over conv features, then projection.
        feats = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="feat_ln")(feats)
        x = nn.Dense(c.hidden_size, dtype=self.dtype, name="post_extract_proj",
                     precision=conv_precision(self.dtype))(feats)
        # Encoder: pos conv + pre-layers LN (post-LN variant), then blocks.
        x = x + PositionalConvEmbedding(c, dtype=self.dtype, name="pos_conv")(x)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="encoder_ln")(x)
        for i in range(c.num_layers):
            x = _EncoderLayer(c, dtype=self.dtype, name=f"layer_{i}")(x, frame_mask)
        return x
