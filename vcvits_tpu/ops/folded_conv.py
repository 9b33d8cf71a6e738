"""Space-to-depth (time-folded) 1-D convolutions for low-channel conv stages.

Motivation (ROADMAP item 1): the HiFi-GAN decoder tail runs at 64/32
channels while the TPU pads the lane (channel) dimension to 128 — the tail
stages waste 2-4x of VPU lanes and HBM ("Extra memory due to padding"
OOMs at batch 16 x 10 s). Folding time into channels, x[B, T, C] ->
x_f[B, T/F, F*C] with x_f[b, t, f*C + c] = x[b, t*F + f, c], keeps >=128
effective channels on the lanes through the whole decoder.

A stride-1 dilated conv (and a strided *transposed* conv) over the
unfolded signal is EXACTLY a dense conv over the folded signal with a
block-Toeplitz kernel that is a pure rearrangement of the canonical
weights: output position t*F + f needs input tap t*F + f + j*d - p, i.e.
folded tap (t + q, r) with q = (f + j*d - p) // F, r = (f + j*d - p) % F.
The folded kernel placement matrix is a compile-time constant; building
the folded kernel from the (weight-normed) canonical kernel is one tiny
einsum per call, so parameters — and checkpoints — are identical between
folded and unfolded execution.

Matches the reference decoder semantics bit-for-bit (zero 'same' padding
conv stacks, modules.py:186-216; ConvTranspose1d upsampling,
configs/48k_base.json:61-62) — see tests/test_folded_conv.py.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def fold_time(x: jax.Array, fold: int) -> jax.Array:
    """[B, T, C] -> [B, T/fold, fold*C] (pure reshape; T % fold == 0)."""
    if fold == 1:
        return x
    b, t, c = x.shape
    assert t % fold == 0, f"T={t} not divisible by fold={fold}"
    return x.reshape(b, t // fold, fold * c)


def unfold_time(x: jax.Array, fold: int) -> jax.Array:
    """[B, T', fold*C] -> [B, T'*fold, C] (pure reshape)."""
    if fold == 1:
        return x
    b, t, fc = x.shape
    return x.reshape(b, t * fold, fc // fold)


def refold_time(x: jax.Array, fold_from: int, fold_to: int) -> jax.Array:
    """Change fold factor (pure reshape: the folded layout is contiguous in
    (t, f, c), so any fold_from -> fold_to with compatible lengths works)."""
    if fold_from == fold_to:
        return x
    return fold_time(unfold_time(x, fold_from), fold_to)


@functools.lru_cache(maxsize=None)
def _same_conv_placement(
    kernel_size: int, dilation: int, fold: int
) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Constant placement one-hot M[j, K*F, F] for a stride-1 torch-'same'
    conv: M[j, q_rel*F + r, f] = 1 where q_rel/r locate tap j for output
    sub-position f. Returns (M, (pad_lo, pad_hi)) with K folded taps."""
    k, d, f_ = kernel_size, dilation, fold
    p = (k * d - d) // 2  # torch same padding (odd kernels)
    ms = [(f + j * d - p) for f in range(f_) for j in range(k)]
    qmin = min(m // f_ for m in ms)
    qmax = max(m // f_ for m in ms)
    kk = qmax - qmin + 1
    m_oh = np.zeros((k, kk * f_, f_), np.float32)
    for f in range(f_):
        for j in range(k):
            m = f + j * d - p
            q, r = m // f_ - qmin, m % f_
            m_oh[j, q * f_ + r, f] = 1.0
    return m_oh, (-qmin, qmax)


def fold_same_conv_kernel(
    kernel: jax.Array, dilation: int, fold: int
) -> Tuple[jax.Array, Tuple[int, int]]:
    """Canonical [k, Ci, Co] -> folded [K, fold*Ci, fold*Co] + folded-time
    padding, for a stride-1 'same' conv."""
    k, ci, co = kernel.shape
    m_oh, pad = _same_conv_placement(k, dilation, fold)
    m = jnp.asarray(m_oh, kernel.dtype)
    # [j, KF, F] x [j, ci, co] -> [KF, ci, F, co] -> [K, F*ci, F*co]
    wf = jnp.einsum("jmf,jic->mifc", m, kernel)
    kk = m_oh.shape[1] // fold
    return wf.reshape(kk, fold * ci, fold * co), pad


@functools.lru_cache(maxsize=None)
def _transpose_conv_placement(
    kernel_size: int, stride: int, padding: int, fold_in: int
) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Placement for a torch ConvTranspose1d as a folded conv. Input folded
    by fold_in, output folded by fold_out = stride*fold_in (folded time
    length is preserved). M[u, K*F_in, f_out] one-hot."""
    k, s, p, fi = kernel_size, stride, padding, fold_in
    fo = s * fi
    entries = []  # (u, f, m)
    for f in range(fo):
        for u in range(k):
            if (f + p - u) % s == 0:
                entries.append((u, f, (f + p - u) // s))
    qmin = min(m // fi for _, _, m in entries)
    qmax = max(m // fi for _, _, m in entries)
    kk = qmax - qmin + 1
    m_oh = np.zeros((k, kk * fi, fo), np.float32)
    for u, f, m in entries:
        q, r = m // fi - qmin, m % fi
        m_oh[u, q * fi + r, f] = 1.0
    return m_oh, (-qmin, qmax)


def fold_transpose_conv_kernel(
    kernel: jax.Array, stride: int, padding: int, fold_in: int
) -> Tuple[jax.Array, Tuple[int, int]]:
    """Canonical transposed-conv kernel [k, Co, Ci] (torch pre-flip layout,
    see layers.ConvTranspose1d) -> folded conv kernel
    [K, fold_in*Ci, stride*fold_in*Co] + folded-time padding."""
    k, co, ci = kernel.shape
    m_oh, pad = _transpose_conv_placement(k, stride, padding, fold_in)
    m = jnp.asarray(m_oh, kernel.dtype)
    wf = jnp.einsum("jmf,joi->mifo", m, kernel)
    kk = m_oh.shape[1] // fold_in
    return wf.reshape(kk, fold_in * ci, stride * fold_in * co), pad


def folded_conv_apply(
    x_folded: jax.Array,
    folded_kernel: jax.Array,
    pad: Tuple[int, int],
    bias: Optional[jax.Array] = None,
    fold_out: int = 1,
    precision=None,
) -> jax.Array:
    """Run the folded conv: [B, T', F_in*Ci] x [K, F_in*Ci, F_out*Co]."""
    y = jax.lax.conv_general_dilated(
        x_folded, folded_kernel,
        window_strides=(1,), padding=[pad],
        dimension_numbers=("NHC", "HIO", "NHC"),
        precision=precision,
    )
    if bias is not None:
        y = y + jnp.tile(bias, fold_out).astype(y.dtype)
    return y
