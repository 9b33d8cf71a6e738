"""Primitive neural layers, [B, T, C] layout.

Capability parity with /root/reference/vits/model/modules.py:19-64 (LayerNorm,
conv primitives) and the weight_norm parametrization used throughout the
reference (modules.py:126-144, discriminator.py:17-25), rebuilt for TPU:

* Channels live on the last axis (lanes); time on the sublane axis. All convs
  are `lax.conv_general_dilated` in NHC layout, which XLA maps onto the MXU.
* Weight norm is an explicit (v, g) parametrization computed at call time —
  cheap relative to the conv itself, exact training dynamics of
  torch.nn.utils.weight_norm (norm over all axes except output channels).
* `ConvTranspose1d` reproduces torch's ConvTranspose1d arithmetic exactly
  (lhs dilation + (k-1-p) edge padding + spatially-flipped kernel), which the
  HiFi-GAN decoder upsampling stack depends on.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

LRELU_SLOPE = 0.1

Dtype = jnp.dtype


def leaky_relu(x: jax.Array, slope: float = LRELU_SLOPE) -> jax.Array:
    return jax.nn.leaky_relu(x, negative_slope=slope)


def conv_precision(dtype) -> jax.lax.Precision:
    """fp32 compute gets exact (HIGHEST) MXU passes; bf16 runs native.

    Without this, TPU convs silently run fp32 operands through bf16 MXU
    passes — fine for training throughput, wrong for the fp32 parity path.
    """
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else jax.lax.Precision.DEFAULT


def torch_same_padding(kernel_size: int, dilation: int = 1) -> Tuple[int, int]:
    """Symmetric torch-style padding (commons.py:14-15). Odd kernels only."""
    p = (kernel_size * dilation - dilation) // 2
    return (p, p)


class LayerNorm(nn.Module):
    """LayerNorm over the channel (last) axis — modules.py:19-31.

    The reference transposes [B, C, T] -> [B, T, C] to normalize; our layout
    is already channel-last so this is a plain fused LN.
    """

    channels: int
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        gamma = self.param("gamma", nn.initializers.ones, (self.channels,), jnp.float32)
        beta = self.param("beta", nn.initializers.zeros, (self.channels,), jnp.float32)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * gamma + beta).astype(self.dtype)


def _norm_except_last(v: jax.Array) -> jax.Array:
    """L2 norm over all axes except the trailing (output-channel) axis."""
    sq = jnp.sum(jnp.square(v), axis=tuple(range(v.ndim - 1)), keepdims=True)
    return jnp.sqrt(sq)


def spectral_normalize(kernel: jax.Array, n_iter: int = 3) -> jax.Array:
    """kernel / sigma_max, the torch.nn.utils.spectral_norm parametrization
    (discriminator.py:17: norm_f = spectral_norm when use_spectral_norm).

    Torch amortizes one power iteration per forward through a persistent `u`
    buffer; here the estimate is recomputed purely with `n_iter` iterations
    from a fixed start vector, so the op stays a pure function (no mutable
    collections threading through the jitted GAN step). The trailing axis is
    the output-channel axis; sigma_max is reshape/transpose-invariant so the
    [k, ..., out] flattening matches torch's [out, -1] view.
    """
    out = kernel.shape[-1]
    w = kernel.reshape(-1, out).astype(jnp.float32)
    u = jnp.full((out,), 1.0 / jnp.sqrt(float(out)), jnp.float32)
    for _ in range(n_iter):
        v = w @ u
        v = v / jnp.maximum(jnp.linalg.norm(v), 1e-12)
        u = w.T @ v
        u = u / jnp.maximum(jnp.linalg.norm(u), 1e-12)
    sigma = v @ (w @ u)
    return (kernel / jnp.maximum(sigma, 1e-12)).astype(kernel.dtype)


class Conv1d(nn.Module):
    """1-D convolution in NHC layout with torch Conv1d semantics.

    kernel is stored [k, in/groups, out]. `weight_norm=True` stores (v, g)
    and materializes kernel = g * v / ||v|| per call (torch weight_norm
    dim=0 equivalent). `padding="same"` is the torch symmetric padding for
    odd kernels; pass an explicit (lo, hi) tuple otherwise.
    """

    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    padding: object = "same"  # "same" | "valid" | (lo, hi)
    use_bias: bool = True
    weight_norm: bool = False
    spectral_norm: bool = False
    # fold > 1: input/output are time-folded [B, T/fold, fold*C]
    # (space-to-depth; see ops/folded_conv.py). Same params either way.
    fold: int = 1
    # phase_split: for folded dilated convs, refold to d*fold and run a
    # feature_group_count=d grouped conv over residue-major channels —
    # exact, same params, ~KK_dense*fold/(KK_g*fold') fewer MACs (the
    # dense folded kernel densifies dilated taps; the split removes them;
    # ops/folded_conv.py:_phase_split_placement). Needs T % (d*fold) == 0
    # (the caller pads). No-op unless dilation > 1 and fold > 1.
    phase_split: bool = False
    # im2col: for single-input-channel convs, gather the k taps into the
    # lane axis and run one dense [k -> features] matmul instead of a conv
    # whose input uses 1 of 128 lanes (same trick as the HuBERT front end,
    # models/hubert.py ConvFeatureExtractor.im2col_first). Exact: same
    # params, same taps in the same order. Ignored unless in_ch == 1,
    # groups == 1, fold == 1.
    im2col: bool = False
    # grouped_pack: phase-packed grouped conv (ops/grouped_conv.py) — packs
    # P output positions x out/groups channels onto the 128-lane axis so
    # the MSD's tiny per-group matmuls fill the MXU (~8% -> ~43% lane
    # ceiling). Exact (tests/test_grouped_conv.py) but measured slower
    # end-to-end on this chip (reports/train_opts_r4.json), so default
    # off. Used when groups > 1, dilation 1, out/groups <= 32.
    grouped_pack: bool = False
    # time_fold: split time into overlapping chunks folded into the batch
    # axis (ops/grouped_conv.py:time_batch_conv1d). The TPU grouped-conv
    # emitters put batch in the 128-lane axis, so the MSD's batch-32
    # passes run at ~25% lane occupancy; folding time to batch 128 fills
    # the lanes on the NATIVE conv path (plain autodiff, exact). Applied
    # when groups > 1, dilation == 1 and pick_time_chunks finds a fold.
    time_fold: bool = False
    # quant_int8: dynamic W8A8 int8 conv (ops/int8_conv.py) — int8 MXU
    # passes at ~2x the bf16 rate, per-output-channel weight scales +
    # per-row activation scales, int32 accumulation. Inference only
    # (no gradient through round()); same params/checkpoint, quantization
    # happens at call time on the materialized weight-normed kernel.
    # Ignored on the im2col path (not a decoder shape). The string value
    # "w8" selects weight-only int8: weights on the int8 grid, bf16
    # activations, bf16 MXU conv (ops/int8_conv.py act_quant=False).
    quant_int8: bool = False
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1] // self.fold
        kshape = (self.kernel_size, in_ch // self.groups, self.features)
        if self.spectral_norm:
            v = self.param("v", self.kernel_init, kshape, jnp.float32)
            kernel = spectral_normalize(v).astype(self.dtype)
        elif self.weight_norm:
            v = self.param("v", self.kernel_init, kshape, jnp.float32)
            g = self.param("g", lambda rng, shape: _norm_except_last(self.kernel_init(rng, kshape)).reshape(shape), (1, 1, self.features))
            kernel = (g * v / jnp.maximum(_norm_except_last(v), 1e-12)).astype(self.dtype)
        else:
            kernel = self.param("kernel", self.kernel_init, kshape, jnp.float32).astype(self.dtype)

        if self.fold > 1:
            same = torch_same_padding(self.kernel_size, self.dilation)
            assert self.stride == 1 and self.groups == 1 and (
                self.padding == "same" or tuple(self.padding) == same
            ), "folded Conv1d supports stride-1 same-padded ungrouped convs"
            from vcvits_tpu.ops.folded_conv import (
                fold_phase_split_conv_kernel, fold_same_conv_kernel,
                folded_conv_apply, phase_split_reorder, refold_time)
            b = (self.param("bias", self.bias_init, (self.features,), jnp.float32)
                 .astype(self.dtype) if self.use_bias else None)
            if self.phase_split and self.dilation > 1:
                from vcvits_tpu.ops.folded_conv import (
                    _phase_split_placement, _same_conv_placement)
                d = self.dilation
                f_ps = d * self.fold
                kk_dense = _same_conv_placement(
                    self.kernel_size, self.dilation, self.fold)[0].shape[1]
                kk_grouped = _phase_split_placement(
                    self.kernel_size, self.dilation, f_ps)[0].shape[1]
            else:
                kk_dense = kk_grouped = 0
            # take the split only where it actually removes MACs (k=3 d=3
            # ties at 3 folded taps either way — the reorder would be pure
            # overhead there)
            if kk_grouped and kk_grouped < kk_dense:
                t_unf = x.shape[1] * self.fold
                assert t_unf % f_ps == 0, (
                    f"phase-split conv needs T={t_unf} divisible by "
                    f"d*fold={f_ps} (the decoder pads the stage)")
                wg, gpad = fold_phase_split_conv_kernel(kernel, d, f_ps)
                xr = refold_time(x.astype(self.dtype), self.fold, f_ps)
                xr = phase_split_reorder(xr, d, f_ps)
                if self.quant_int8:
                    from vcvits_tpu.ops.int8_conv import int8_conv1d
                    y = int8_conv1d(xr, wg, gpad, bias=b, groups=d,
                                    fold_out=f_ps, out_dtype=self.dtype,
                                    act_quant=self.quant_int8 != "w8")
                else:
                    y = jax.lax.conv_general_dilated(
                        xr, wg, window_strides=(1,), padding=[gpad],
                        dimension_numbers=("NHC", "HIO", "NHC"),
                        feature_group_count=d,
                        precision=conv_precision(self.dtype))
                    if b is not None:
                        y = y + jnp.tile(b, f_ps).astype(y.dtype)
                y = phase_split_reorder(y, d, f_ps, inverse=True)
                return refold_time(y, f_ps, self.fold)
            wf, fpad = fold_same_conv_kernel(kernel, self.dilation, self.fold)
            return folded_conv_apply(x.astype(self.dtype), wf, fpad, bias=b,
                                     fold_out=self.fold,
                                     precision=conv_precision(self.dtype),
                                     quant_int8=self.quant_int8)

        if self.padding == "same":
            pad = [torch_same_padding(self.kernel_size, self.dilation)]
        elif self.padding == "valid":
            pad = [(0, 0)]
        else:
            pad = [tuple(self.padding)]

        if self.im2col and in_ch == 1 and self.groups == 1:
            lo, hi = pad[0]
            xw = jnp.pad(x.astype(self.dtype), ((0, 0), (lo, hi), (0, 0)))[..., 0]
            k, s, dil = self.kernel_size, self.stride, self.dilation
            t_out = (xw.shape[1] - dil * (k - 1) - 1) // s + 1
            frames = jnp.stack(
                [jax.lax.slice_in_dim(
                    xw, j * dil, j * dil + (t_out - 1) * s + 1, stride=s, axis=1)
                 for j in range(k)], axis=-1)  # [B, T_out, k]
            y = jnp.einsum("btk,kd->btd", frames, kernel[:, 0, :],
                           precision=conv_precision(self.dtype))
            if self.use_bias:
                b = self.param("bias", self.bias_init, (self.features,), jnp.float32)
                y = y + b.astype(self.dtype)
            return y

        if self.quant_int8:
            from vcvits_tpu.ops.int8_conv import int8_conv1d
            b = (self.param("bias", self.bias_init, (self.features,),
                            jnp.float32) if self.use_bias else None)
            return int8_conv1d(x.astype(self.dtype), kernel, pad[0], bias=b,
                               dilation=self.dilation, stride=self.stride,
                               groups=self.groups, out_dtype=self.dtype,
                               act_quant=self.quant_int8 != "w8")

        if self.time_fold and self.groups > 1 and self.dilation == 1:
            from vcvits_tpu.ops.grouped_conv import (
                pick_time_chunks, time_batch_conv1d)
            lo, hi = pad[0]
            t_out = (x.shape[1] + lo + hi - self.kernel_size) // self.stride + 1
            chunks = pick_time_chunks(x.shape[0], t_out)
            if chunks > 1:
                y = time_batch_conv1d(
                    x.astype(self.dtype), kernel, stride=self.stride,
                    padding=pad[0], groups=self.groups, chunks=chunks,
                    precision=conv_precision(self.dtype))
                if self.use_bias:
                    b = self.param("bias", self.bias_init, (self.features,),
                                   jnp.float32)
                    y = y + b.astype(self.dtype)
                return y

        if self.grouped_pack:
            from vcvits_tpu.ops.grouped_conv import (
                grouped_conv1d_packed, use_packed)
            if use_packed(self.groups, self.features, self.stride,
                          self.dilation):
                y = grouped_conv1d_packed(
                    x.astype(self.dtype), kernel, stride=self.stride,
                    padding=pad[0], groups=self.groups,
                    precision=conv_precision(self.dtype))
                if self.use_bias:
                    b = self.param("bias", self.bias_init, (self.features,),
                                   jnp.float32)
                    y = y + b.astype(self.dtype)
                return y

        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel,
            window_strides=(self.stride,),
            padding=pad,
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=self.groups,
            precision=conv_precision(self.dtype),
        )
        if self.use_bias:
            b = self.param("bias", self.bias_init, (self.features,), jnp.float32)
            y = y + b.astype(self.dtype)
        return y


class ConvTranspose1d(nn.Module):
    """Transposed 1-D conv with exact torch ConvTranspose1d arithmetic.

    out_len = (T-1)*stride - 2*padding + kernel_size. Used by the HiFi-GAN
    upsample stack (configs/48k_base.json:61-62: rates 8,8,4,2 / kernels
    16,16,4,4 / padding (k-s)//2 -> exact rate x upsampling).
    kernel stored [k, out, in] (pre-flipped torch layout — see converter).
    """

    features: int
    kernel_size: int
    stride: int
    padding: int = 0
    use_bias: bool = True
    weight_norm: bool = False
    # fold_in >= 1: input is time-folded by fold_in; output comes back folded
    # by stride*fold_in (phase-decomposed transposed conv — exact, and for
    # k = stride it is one dense matmul instead of an lhs-dilated conv).
    fold_in: int = 0  # 0 = unfolded path
    # quant_int8: dynamic W8A8 int8 conv — see Conv1d.quant_int8.
    quant_int8: bool = False
    kernel_init: Callable = nn.initializers.lecun_normal()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1] // max(self.fold_in, 1)
        kshape = (self.kernel_size, self.features, in_ch)  # [k, out, in]
        if self.weight_norm:
            # torch weight_norm(dim=0) on ConvTranspose1d weight [in, out, k]
            # normalizes per *input* channel; our trailing axis here is `in`.
            v = self.param("v", self.kernel_init, kshape, jnp.float32)
            g = self.param("g", lambda rng, shape: _norm_except_last(self.kernel_init(rng, kshape)).reshape(shape), (1, 1, in_ch))
            kernel = (g * v / jnp.maximum(_norm_except_last(v), 1e-12)).astype(self.dtype)
        else:
            kernel = self.param("kernel", self.kernel_init, kshape, jnp.float32).astype(self.dtype)

        if self.fold_in >= 1:
            from vcvits_tpu.ops.folded_conv import (
                fold_transpose_conv_kernel, folded_conv_apply)
            wf, fpad = fold_transpose_conv_kernel(
                kernel, self.stride, self.padding, self.fold_in)
            b = (self.param("bias", nn.initializers.zeros, (self.features,),
                            jnp.float32).astype(self.dtype)
                 if self.use_bias else None)
            return folded_conv_apply(x.astype(self.dtype), wf, fpad, bias=b,
                                     fold_out=self.stride * self.fold_in,
                                     precision=conv_precision(self.dtype),
                                     quant_int8=self.quant_int8)

        # Equivalent regular conv: dilate input by stride, pad k-1-p, flip kernel.
        k, p, s = self.kernel_size, self.padding, self.stride
        kernel_flipped = jnp.flip(kernel, axis=0)  # [k, out, in]
        kernel_hio = jnp.transpose(kernel_flipped, (0, 2, 1))  # [k, in, out]
        if self.quant_int8:
            from vcvits_tpu.ops.int8_conv import int8_conv1d
            b = (self.param("bias", nn.initializers.zeros, (self.features,),
                            jnp.float32) if self.use_bias else None)
            return int8_conv1d(x.astype(self.dtype), kernel_hio,
                               (k - 1 - p, k - 1 - p), bias=b,
                               lhs_dilation=s, out_dtype=self.dtype,
                               act_quant=self.quant_int8 != "w8")
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel_hio,
            window_strides=(1,),
            padding=[(k - 1 - p, k - 1 - p)],
            lhs_dilation=(s,),
            dimension_numbers=("NHC", "HIO", "NHC"),
            precision=conv_precision(self.dtype),
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + b.astype(self.dtype)
        return y


class Conv2dNorm(nn.Module):
    """Weight-normed 2-D conv in NHWC for the period discriminators
    (discriminator.py:17-25: kernels (5,1), strides (3,1))."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[Tuple[int, int], Tuple[int, int]] = ((0, 0), (0, 0))
    weight_norm: bool = True
    spectral_norm: bool = False
    kernel_init: Callable = nn.initializers.lecun_normal()
    dtype: Dtype = jnp.float32

    # fold_w > 0: the W (period) axis is folded into channels — input is
    # [B, H, W*Cin] and the (kh, 1) conv runs as ONE grouped 1-D conv with
    # feature_group_count = W and the per-column-shared kernel tiled across
    # groups. Same params, same outputs; W*C channels stay on the lanes
    # (the unfolded early layers use 1..32 of 128 lanes). ROADMAP item 5.
    fold_w: int = 0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1] // max(self.fold_w, 1)
        kshape = (*self.kernel_size, in_ch, self.features)
        if self.spectral_norm:
            v = self.param("v", self.kernel_init, kshape, jnp.float32)
            kernel = spectral_normalize(v).astype(self.dtype)
        elif self.weight_norm:
            v = self.param("v", self.kernel_init, kshape, jnp.float32)
            g = self.param("g", lambda rng, shape: _norm_except_last(self.kernel_init(rng, kshape)).reshape(shape), (1, 1, 1, self.features))
            kernel = (g * v / jnp.maximum(_norm_except_last(v), 1e-12)).astype(self.dtype)
        else:
            kernel = self.param("kernel", self.kernel_init, kshape, jnp.float32).astype(self.dtype)
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        if self.fold_w > 0:
            assert self.kernel_size[1] == 1 and self.strides[1] == 1 and \
                self.padding[1] == (0, 0), "fold_w needs a (kh, 1) conv"
            w = self.fold_w
            k1 = jnp.tile(kernel[:, 0], (1, 1, w))  # [kh, in, W*out]
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), k1,
                window_strides=(self.strides[0],),
                padding=[self.padding[0]],
                dimension_numbers=("NHC", "HIO", "NHC"),
                feature_group_count=w,
                precision=conv_precision(self.dtype),
            )
            return y + jnp.tile(b.astype(self.dtype), w)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel,
            window_strides=self.strides,
            padding=list(self.padding),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=conv_precision(self.dtype),
        )
        return y + b.astype(self.dtype)


def normal_init(std: float = 0.01) -> Callable:
    """HiFi-GAN's init_weights (commons.py:9-12): N(0, 0.01) conv kernels."""
    def init(rng, shape, dtype=jnp.float32):
        return jax.random.normal(rng, shape, dtype) * std
    return init
