"""In-repo HiFi-GAN MRF decoder (the 48 kHz waveform generator).

The reference fetches its decoder from the network at construction time
(torch.hub.load("vtuber-plan/hifi-gan:v0.3.1", "hifigan_48k"),
synthesizer_svc.py:59) and keeps only the MRF ResBlocks in-repo
(modules.py:186-247). Here the full generator lives in-repo, built from the
config hyperparameters the reference ships (configs/48k_base.json:54-63:
512 initial channels, ConvTranspose upsampling 8*8*4*2 = 512x = hop_length,
ResBlock1 MRF with kernels [3,7,11] x dilations [1,3,5]).

TPU design notes:
* [B, T, C] layout end-to-end; the transposed convs use the torch-exact
  ConvTranspose1d so converted checkpoints reproduce bit-comparable audio.
* Optional speaker conditioning (gin_channels) on the decoder input — the
  capability SynthesizerSVC.voice_conversion assumes (synthesizer_svc.py:118)
  but the hub vocoder lacks (SURVEY.md §3.4 defect, fixed here).
* All convs weight-normed with N(0, 0.01) init (commons.py:9-12).
"""

from __future__ import annotations

import math as _math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vcvits_tpu.models.layers import (
    Conv1d,
    ConvTranspose1d,
    Dtype,
    LRELU_SLOPE,
    leaky_relu,
    normal_init,
)
from vcvits_tpu.ops.folded_conv import fold_time, refold_time, unfold_time


class ResBlock1(nn.Module):
    """MRF residual block, 3 dilated + 3 plain convs (modules.py:186-216).

    fold > 1 runs the whole block in time-folded [B, T/fold, fold*C] layout
    (ops/folded_conv.py) — identical params and outputs, >=128 effective
    lanes on the low-channel tail stages."""

    channels: int
    kernel_size: int = 3
    dilations: Tuple[int, ...] = (1, 3, 5)
    fold: int = 1
    phase_split: bool = False
    quant_int8: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, x_mask: Optional[jax.Array] = None) -> jax.Array:
        # x_mask with fold > 1 is the folded [1, T', fold*C] validity mask
        # the phase-split padding path threads through (zeros past the true
        # signal end, so biased conv outputs in the pad region never bleed
        # back into valid positions).
        for i, d in enumerate(self.dilations):
            xt = leaky_relu(x, LRELU_SLOPE)
            if x_mask is not None:
                xt = xt * x_mask
            xt = Conv1d(self.channels, self.kernel_size, dilation=d, weight_norm=True,
                        fold=self.fold, phase_split=self.phase_split,
                        quant_int8=self.quant_int8, kernel_init=normal_init(),
                        dtype=self.dtype, name=f"c1_{i}")(xt)
            xt = leaky_relu(xt, LRELU_SLOPE)
            if x_mask is not None:
                xt = xt * x_mask
            xt = Conv1d(self.channels, self.kernel_size, dilation=1, weight_norm=True,
                        fold=self.fold, quant_int8=self.quant_int8,
                        kernel_init=normal_init(),
                        dtype=self.dtype, name=f"c2_{i}")(xt)
            x = xt + x
        if x_mask is not None:
            x = x * x_mask
        return x


class ResBlock2(nn.Module):
    """Lighter 2-conv MRF variant (modules.py:225-243)."""

    channels: int
    kernel_size: int = 3
    dilations: Tuple[int, ...] = (1, 3)
    fold: int = 1
    phase_split: bool = False
    quant_int8: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, x_mask: Optional[jax.Array] = None) -> jax.Array:
        for i, d in enumerate(self.dilations):
            xt = leaky_relu(x, LRELU_SLOPE)
            if x_mask is not None:
                xt = xt * x_mask
            xt = Conv1d(self.channels, self.kernel_size, dilation=d, weight_norm=True,
                        fold=self.fold, phase_split=self.phase_split,
                        quant_int8=self.quant_int8, kernel_init=normal_init(),
                        dtype=self.dtype, name=f"c_{i}")(xt)
            x = xt + x
        if x_mask is not None:
            x = x * x_mask
        return x


class HiFiGANGenerator(nn.Module):
    """ConvTranspose upsampling + multi-receptive-field fusion -> tanh wave.

    in: [B, T, inter_channels] latent; out: [B, T * prod(upsample_rates), 1].
    """

    initial_channel: int
    resblock: str = "1"
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    upsample_rates: Sequence[int] = (8, 8, 4, 2)
    upsample_initial_channel: int = 512
    upsample_kernel_sizes: Sequence[int] = (16, 16, 4, 4)
    gin_channels: int = 0
    # Run low-channel tail stages time-folded so >=min_lanes effective
    # channels stay on the TPU lanes (kills the 2-4x lane-padding waste the
    # unfolded 64/32-channel stages pay; ROADMAP item 1). Exact: same params,
    # same outputs (tests/test_folded_conv.py::test_hifigan_folded_parity).
    fold_tail: bool = True
    min_lanes: int = 128
    # Run folded dilated MRF convs dilation-phase-split: refold to d*fold
    # and compute a feature_group_count=d grouped conv over residue-major
    # channels — exact (same params/outputs, tests/test_folded_conv.py),
    # ~2-3x fewer MACs on the dilated taps (k=11,d=5: 15 dense folded taps
    # -> 5 grouped). Requires padding the tail stages to a multiple of
    # 15*fold (lcm of the d=3/5 splits), handled here with zero masks that
    # keep 'same'-padding semantics exact.
    phase_split: bool = False
    # Dynamic W8A8 int8 quantization of every decoder conv (ops/
    # int8_conv.py): int8 MXU passes at ~2x the bf16 FLOP rate, per-channel
    # weight + per-row activation scales, same checkpoint (weights quantize
    # at call time). INFERENCE ONLY — no gradient through round(). Parity
    # gate: tests/test_int8_decoder.py; measured probe:
    # reports/probe_int8.json (1.15-1.25x at these conv shapes).
    quant_int8: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, g: Optional[jax.Array] = None,
                 fused_mrf: bool = False) -> jax.Array:
        """fused_mrf=True runs each stage's MRF as one Pallas kernel
        (ops/mrf_pallas.py) when its weights fit VMEM — inference only
        (no VJP); parameters and outputs are identical either way."""
        res_cls = ResBlock1 if self.resblock == "1" else ResBlock2
        num_kernels = len(self.resblock_kernel_sizes)
        use_fused = (fused_mrf and self.resblock == "1"
                     and not self.phase_split
                     and not self.quant_int8
                     and not self.is_initializing()
                     and jax.devices()[0].platform == "tpu")
        if use_fused:
            from vcvits_tpu.ops.mrf_pallas import (
                _VMEM_WEIGHT_BUDGET, fold_resblock_weights, mrf_fused,
                mrf_weight_bytes)

        x = Conv1d(self.upsample_initial_channel, 7, padding=(3, 3), weight_norm=True,
                   quant_int8=self.quant_int8,
                   dtype=self.dtype, name="conv_pre")(x)
        if g is not None and self.gin_channels > 0:
            x = x + nn.Dense(self.upsample_initial_channel, dtype=self.dtype,
                             name="cond")(g)[:, None, :]

        fold = 1
        t_valid = x.shape[1]  # true (unpadded) unfolded length at this stage
        mask = None  # folded [1, T', fold*C] validity mask while padded
        dil_splits = sorted({d for blk in self.resblock_dilation_sizes
                             for d in blk if d > 1})
        lcm_d = 1
        for d in dil_splits:
            lcm_d = lcm_d * d // _math.gcd(lcm_d, d)
        for i, (u, k) in enumerate(zip(self.upsample_rates, self.upsample_kernel_sizes)):
            x = leaky_relu(x, LRELU_SLOPE)
            ch = self.upsample_initial_channel // (2 ** (i + 1))
            t_valid *= u
            if self.fold_tail:
                # phase-decomposed transposed conv: output folded by fold*u,
                # then refold so ch * fold_next >= min_lanes (capped by what
                # the static length divides — tiny test shapes fold less).
                x = ConvTranspose1d(ch, k, stride=u, padding=(k - u) // 2,
                                    weight_norm=True, fold_in=fold,
                                    quant_int8=self.quant_int8,
                                    kernel_init=normal_init(),
                                    dtype=self.dtype, name=f"up_{i}")(x)
                t_unfolded = x.shape[1] * fold * u
                fold_base = max(1, self.min_lanes // ch)
                if self.phase_split and fold_base > 1 and dil_splits:
                    # pad the stage so every d*fold_base refold divides,
                    # mask the pad (zeros = exact 'same' semantics; biased
                    # conv outputs there are re-zeroed by the ResBlocks).
                    step = fold_base * lcm_d
                    t_pad = -(-t_unfolded // step) * step
                    xu = unfold_time(x, fold * u)
                    if t_pad != t_unfolded:
                        xu = jnp.pad(xu, ((0, 0), (0, t_pad - t_unfolded),
                                          (0, 0)))
                    x = fold_time(xu, fold_base)
                    fold = fold_base
                    if t_valid < t_pad:
                        valid = (jnp.arange(t_pad) < t_valid).astype(x.dtype)
                        mask = jnp.broadcast_to(
                            valid.reshape(1, t_pad // fold, fold, 1),
                            (1, t_pad // fold, fold, ch),
                        ).reshape(1, t_pad // fold, fold * ch)
                        x = x * mask  # clear ConvTranspose pad leakage+bias
                    else:
                        mask = None
                else:
                    fold_next = _math.gcd(max(1, self.min_lanes // ch),
                                          t_unfolded)
                    x = refold_time(x, fold * u, fold_next)
                    fold = fold_next
            else:
                x = ConvTranspose1d(ch, k, stride=u, padding=(k - u) // 2,
                                    weight_norm=True, quant_int8=self.quant_int8,
                                    kernel_init=normal_init(),
                                    dtype=self.dtype, name=f"up_{i}")(x)
            itemsize = jnp.dtype(self.dtype).itemsize
            if use_fused and mrf_weight_bytes(
                    ch, self.resblock_kernel_sizes,
                    self.resblock_dilation_sizes,
                    itemsize) <= _VMEM_WEIGHT_BUDGET:
                xu = unfold_time(x, fold)
                blocks = [
                    fold_resblock_weights(
                        self.variables["params"][f"res_{i}_{j}"], "1",
                        len(rd), self.dtype)
                    for j, rd in enumerate(self.resblock_dilation_sizes)
                ]
                xu = mrf_fused(xu, blocks, self.resblock_kernel_sizes,
                               self.resblock_dilation_sizes)
                x = fold_time(xu, fold)
            else:
                xs = None
                for j, (rk, rd) in enumerate(
                    zip(self.resblock_kernel_sizes, self.resblock_dilation_sizes)
                ):
                    block = res_cls(ch, rk, tuple(rd), fold=fold,
                                    phase_split=self.phase_split,
                                    quant_int8=self.quant_int8,
                                    dtype=self.dtype, name=f"res_{i}_{j}")
                    xs = block(x, mask) if xs is None else xs + block(x, mask)
                x = xs / num_kernels

        x = leaky_relu(x, 0.01)  # final activation uses torch's default slope
        x = Conv1d(1, 7, padding=(3, 3), weight_norm=True, fold=fold,
                   quant_int8=self.quant_int8,
                   dtype=self.dtype, name="conv_post")(x)
        x = unfold_time(x, fold)
        if x.shape[1] > t_valid:  # drop the phase-split stage padding
            x = x[:, :t_valid]
        return jnp.tanh(x)
