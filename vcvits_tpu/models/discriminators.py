"""Multi-period + multi-scale GAN discriminators.

Capability parity with /root/reference/vits/model/discriminators/
discriminator.py:12-74 (DiscriminatorP/S), multi_period_discriminator.py:9-30
(1 x scale + one period head per prime), multi_scale_discriminator.py:10-43
(5 cascaded scale heads with AvgPool1d(4,2,pad=2)). The 48k config runs 12
periods [2..37] -> 13 MPD heads + 5 MSD heads = 18 sub-discriminators
(SURVEY.md §2.5).

TPU design: waveforms are [B, T, 1]; the period reshape puts the period on
the lane-adjacent axis ([B, T/p, p, C] NHWC) so the (5,1)-kernel strided
convs tile cleanly. All heads run inside one jit — XLA schedules them as
independent conv chains on the single program.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vcvits_tpu.models.layers import (
    Conv1d,
    Conv2dNorm,
    Dtype,
    LRELU_SLOPE,
    leaky_relu,
)

FeatureMaps = List[jax.Array]


class DiscriminatorP(nn.Module):
    """Period-p head: fold time into [T/p, p] and run (5,1)/(3,1) conv stack."""

    period: int
    kernel_size: int = 5
    stride: int = 3
    use_spectral_norm: bool = False  # discriminator.py:17 norm_f selection
    # Run the whole stack period-folded: [B, T/p, p*C] grouped 1-D convs
    # (layers.Conv2dNorm fold_w) instead of [B, T/p, p, C] NHWC. Exact —
    # the (k,1) kernels never mix period columns (tests parity). Measured
    # on a v5e train step (tools/bench_train_step.py, B=8 x 4 s bf16):
    # folding won 212 vs 265 ms/step when each head ran real and generated
    # separately, but with batch_pair=True (default, 2x batch per head)
    # the plain NHWC path wins 168 vs 186 — enough batch parallelism makes
    # the lane waste moot while the folded path still pays kernel tiling.
    # Hence default False; the folded path remains for small-batch runs.
    fold_period: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, FeatureMaps]:
        b, t, c = x.shape
        p = self.period
        if t % p != 0:
            n_pad = p - (t % p)
            x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)), mode="reflect")
            t = t + n_pad
        x = x.reshape(b, t // p, p, c)

        fmap: FeatureMaps = []
        kp = (self.kernel_size - 1) // 2
        wn, sn = not self.use_spectral_norm, self.use_spectral_norm
        fw = p if self.fold_period else 0
        if fw:
            x = x.reshape(b, t // p, p * c)

        def unfold(y):
            return y.reshape(b, y.shape[1], p, -1) if fw else y

        for i, ch in enumerate([32, 128, 512, 1024]):
            x = Conv2dNorm(ch, (self.kernel_size, 1), strides=(self.stride, 1),
                           padding=((kp, kp), (0, 0)), weight_norm=wn,
                           spectral_norm=sn, fold_w=fw, dtype=self.dtype,
                           name=f"conv_{i}")(x)
            x = leaky_relu(x, LRELU_SLOPE)
            fmap.append(unfold(x))
        x = Conv2dNorm(1024, (self.kernel_size, 1), strides=(1, 1),
                       padding=((kp, kp), (0, 0)), weight_norm=wn,
                       spectral_norm=sn, fold_w=fw, dtype=self.dtype,
                       name="conv_4")(x)
        x = leaky_relu(x, LRELU_SLOPE)
        fmap.append(unfold(x))
        x = Conv2dNorm(1, (3, 1), strides=(1, 1), padding=((1, 1), (0, 0)),
                       weight_norm=wn, spectral_norm=sn, fold_w=fw,
                       dtype=self.dtype, name="conv_post")(x)
        fmap.append(unfold(x))
        return x.reshape(b, -1), fmap


class DiscriminatorS(nn.Module):
    """Scale head: grouped 1-D conv stack (kernels 15/41/5, groups up to 256)."""

    use_spectral_norm: bool = False
    # im2col the in_channels=1 first conv into a dense [15 -> 16] matmul
    # (1/128-lane input side otherwise; exact — layers.Conv1d.im2col).
    # Measured A/B in tools/bench_train_opts.py before flipping defaults.
    im2col_first: bool = False
    # phase-packed grouped convs (ops/grouped_conv.py): packs P outputs x
    # out/groups channels onto the lane axis so the 41-tap groups=4..256
    # layers' tiny per-group matmuls fill the MXU. Exact, but measured
    # SLOWER end-to-end at B=16 (reports/train_opts_r4.json) — default off.
    grouped_pack: bool = False
    # time-fold the grouped convs into the batch axis (layers.Conv1d
    # time_fold / ops/grouped_conv.py:time_batch_conv1d) — fills the
    # 128-lane batch axis the TPU grouped-conv emitters use. Exact;
    # A/B'd at B=16 in tools/bench_train_opts.py.
    time_fold: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, FeatureMaps]:
        b = x.shape[0]
        fmap: FeatureMaps = []
        specs = [
            # (features, kernel, stride, groups, padding)
            (16, 15, 1, 1, 7),
            (64, 41, 4, 4, 20),
            (256, 41, 4, 16, 20),
            (1024, 41, 4, 64, 20),
            (1024, 41, 4, 256, 20),
            (1024, 5, 1, 1, 2),
        ]
        wn, sn = not self.use_spectral_norm, self.use_spectral_norm
        for i, (f, k, s, g, p) in enumerate(specs):
            x = Conv1d(f, k, stride=s, groups=g, padding=(p, p), weight_norm=wn,
                       spectral_norm=sn, dtype=self.dtype,
                       im2col=(i == 0 and self.im2col_first),
                       grouped_pack=self.grouped_pack,
                       time_fold=self.time_fold,
                       name=f"conv_{i}")(x)
            x = leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        x = Conv1d(1, 3, padding=(1, 1), weight_norm=wn, spectral_norm=sn,
                   dtype=self.dtype, name="conv_post")(x)
        fmap.append(x)
        return x.reshape(b, -1), fmap


def _avg_pool_4_2(x: jax.Array) -> jax.Array:
    """torch AvgPool1d(kernel=4, stride=2, padding=2), count_include_pad=True."""
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 4, 1), (1, 2, 1), [(0, 0), (2, 2), (0, 0)]
    )
    return s / 4.0


class MultiPeriodDiscriminator(nn.Module):
    """1 x DiscriminatorS + one DiscriminatorP per period (reference adds the
    scale head inside MPD — multi_period_discriminator.py:12-14)."""

    periods: Sequence[int] = (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37)
    use_spectral_norm: bool = False
    fold_period: bool = False  # see DiscriminatorP.fold_period
    # Run (real, generated) through each head as ONE batch-concatenated
    # pass: halves the number of conv chains per step (convs are
    # batch-parallel, so results are identical; larger batch tiles the
    # MXU better than two small passes).
    batch_pair: bool = True
    im2col_first: bool = False  # see DiscriminatorS.im2col_first
    grouped_pack: bool = False  # see DiscriminatorS.grouped_pack
    time_fold: bool = False  # see DiscriminatorS.time_fold
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, y: jax.Array, y_hat: jax.Array):
        logits_r, logits_g, fmaps_r, fmaps_g = [], [], [], []
        heads = [DiscriminatorS(use_spectral_norm=self.use_spectral_norm,
                                im2col_first=self.im2col_first,
                                grouped_pack=self.grouped_pack,
                                time_fold=self.time_fold,
                                dtype=self.dtype, name="disc_s")]
        heads += [
            DiscriminatorP(p, use_spectral_norm=self.use_spectral_norm,
                           fold_period=self.fold_period,
                           dtype=self.dtype, name=f"disc_p{p}")
            for p in self.periods
        ]
        b = y.shape[0]
        for head in heads:
            if self.batch_pair:
                l, f = head(jnp.concatenate([y, y_hat], axis=0))
                lr, lg = l[:b], l[b:]
                fr = [a[:b] for a in f]
                fg = [a[b:] for a in f]
            else:
                lr, fr = head(y)
                lg, fg = head(y_hat)
            logits_r.append(lr)
            logits_g.append(lg)
            fmaps_r.append(fr)
            fmaps_g.append(fg)
        return logits_r, logits_g, fmaps_r, fmaps_g


class PitchDiscriminator(nn.Module):
    """Multi-scale discriminator over F0 contours.

    Capability parity with /root/reference/vits/model/discriminators/
    pitch_discriminator.py:8-28 — which is dead AND broken in the
    reference (its __init__ builds nothing; forward references
    self.discriminators/self.meanpools that never exist). This is a
    *working reconstruction* of the evident intent: the MSD pattern
    (scale heads + mean-pool cascade, the same loop shape as
    multi_scale_discriminator.py:25-43) applied to pitch contours instead
    of waveforms. Channel widths are scaled down for frame-rate inputs
    (a 48 kHz-tuned 1024-ch stack on ~100 Hz contours would be pure
    waste). Not wired into the default training losses — the reference
    never instantiates it either; it is available for pitch-adversarial
    fine-tuning experiments.

    Inputs are [B, T_frames, 1] normalized-F0 contours (e.g.
    dsp.pitch.normalize_pitch output).
    """

    n_scales: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, y: jax.Array, y_hat: jax.Array):
        logits_r, logits_g, fmaps_r, fmaps_g = [], [], [], []
        b = y.shape[0]
        x = jnp.concatenate([y, y_hat], axis=0)
        specs = [  # (features, kernel, stride, groups, padding)
            (16, 15, 1, 1, 7),
            (64, 15, 2, 4, 7),
            (128, 15, 2, 16, 7),
            (128, 5, 1, 1, 2),
        ]
        for i in range(self.n_scales):
            if i != 0:
                x = _avg_pool_4_2(x)
            h, fmap = x, []
            for j, (f, k, s, g, p) in enumerate(specs):
                h = Conv1d(f, k, stride=s, groups=g, padding=(p, p),
                           weight_norm=True, dtype=self.dtype,
                           name=f"disc_{i}_conv_{j}")(h)
                h = leaky_relu(h, LRELU_SLOPE)
                fmap.append(h)
            h = Conv1d(1, 3, padding=(1, 1), weight_norm=True,
                       dtype=self.dtype, name=f"disc_{i}_post")(h)
            fmap.append(h)
            l = h.reshape(2 * b, -1)
            logits_r.append(l[:b])
            logits_g.append(l[b:])
            fmaps_r.append([a[:b] for a in fmap])
            fmaps_g.append([a[b:] for a in fmap])
        return logits_r, logits_g, fmaps_r, fmaps_g


class MultiScaleDiscriminator(nn.Module):
    """5 scale heads on a 2x avg-pool cascade (multi_scale_discriminator.py:10-43)."""

    n_scales: int = 5
    use_spectral_norm: bool = False  # applies to the first (full-rate) head only
    batch_pair: bool = True  # see MultiPeriodDiscriminator.batch_pair
    im2col_first: bool = False  # see DiscriminatorS.im2col_first
    grouped_pack: bool = False  # see DiscriminatorS.grouped_pack
    time_fold: bool = False  # see DiscriminatorS.time_fold
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, y: jax.Array, y_hat: jax.Array):
        logits_r, logits_g, fmaps_r, fmaps_g = [], [], [], []
        b = y.shape[0]
        x = jnp.concatenate([y, y_hat], axis=0) if self.batch_pair else None
        for i in range(self.n_scales):
            if i != 0:
                if self.batch_pair:
                    x = _avg_pool_4_2(x)
                else:
                    y = _avg_pool_4_2(y)
                    y_hat = _avg_pool_4_2(y_hat)
            head = DiscriminatorS(
                use_spectral_norm=self.use_spectral_norm and i == 0,
                im2col_first=self.im2col_first,
                grouped_pack=self.grouped_pack,
                time_fold=self.time_fold,
                dtype=self.dtype, name=f"disc_{i}")
            if self.batch_pair:
                l, f = head(x)
                lr, lg = l[:b], l[b:]
                fr = [a[:b] for a in f]
                fg = [a[b:] for a in f]
            else:
                lr, fr = head(y)
                lg, fg = head(y_hat)
            logits_r.append(lr)
            logits_g.append(lg)
            fmaps_r.append(fr)
            fmaps_g.append(fg)
        return logits_r, logits_g, fmaps_r, fmaps_g
