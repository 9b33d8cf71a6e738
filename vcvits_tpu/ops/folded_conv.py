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


@functools.lru_cache(maxsize=None)
def _phase_split_placement(
    kernel_size: int, dilation: int, fold: int
) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Grouped (dilation-phase-split) placement for a folded dilated conv.

    With fold F = d*F' (d = dilation), every output sub-position
    f = a*d + beta reads only input sub-positions r with r === f (mod d)
    (torch 'same' padding p = d*(k-1)/2 is a multiple of d for odd k, so
    tap offsets j*d - p stay in residue class 0): reordering the folded
    channels residue-major (beta major, a minor) makes the dense folded
    kernel block-diagonal, i.e. a feature_group_count=d grouped conv whose
    per-group lane width is F'*C — full MXU lanes with KK_dense*F/KK_g*F'
    fewer MACs (e.g. k=11, d=5, F'=4: 15 dense folded taps over F=4 lanes
    -> 5 grouped taps over F'=4-per-group lanes, a 3x MAC cut; ROADMAP
    item 1's dilation-phase-split headroom).

    Returns (Mg[j, KK*F', F], (pad_lo, pad_hi)): one-hot placement for the
    grouped kernel — within-group input index q*F' + a_in feeding output
    index o = beta*F' + a_out (group-major, as feature_group_count needs).
    Both sides use the same pure [F', d] -> [d, F'] transpose of the folded
    channel view; no residue rotation is needed.
    """
    k, d, f_ = kernel_size, dilation, fold
    assert f_ % d == 0, f"phase-split needs dilation {d} | fold {f_}"
    fp = f_ // d
    p = (k * d - d) // 2
    assert p % d == 0, "odd-kernel 'same' padding is a multiple of d"
    m_dense, _ = _same_conv_placement(k, d, f_)
    kk = m_dense.shape[1] // f_

    def order(i):  # residue-major (group-major) index -> phase
        beta, a = i // fp, i % fp
        return a * d + beta

    # Permute the dense placement to residue-major on both sides, then
    # check and extract the block diagonal — the math above guarantees it;
    # the assert guards the index bookkeeping.
    mg = np.zeros((k, kk * fp, f_), np.float32)
    for o in range(f_):
        g = o // fp
        for q in range(kk):
            blk = m_dense[:, q * f_: (q + 1) * f_, order(o)]  # [k, F] taps
            for i in range(f_):
                v = blk[:, order(i)]
                if i // fp == g:
                    mg[:, q * fp + (i % fp), o] = v
                else:
                    assert not v.any(), "phase-split placement not block-diag"
    # Trim all-zero leading/trailing folded taps (the union of per-group
    # supports can be tighter than the dense span).
    used = [q for q in range(kk) if mg[:, q * fp: (q + 1) * fp, :].any()]
    q0, q1 = used[0], used[-1]
    mg = np.ascontiguousarray(mg[:, q0 * fp: (q1 + 1) * fp, :])
    # Dense q index range [0, kk) maps to absolute folded offsets
    # [qmin, qmax] with pad (-qmin, qmax); the trimmed support is
    # [qmin + q0, qmin + q1].
    ms = [(f + j * d - p) for f in range(f_) for j in range(k)]
    qmin = min(m // f_ for m in ms)
    return mg, (-(qmin + q0), qmin + q1)


def fold_phase_split_conv_kernel(
    kernel: jax.Array, dilation: int, fold: int
) -> Tuple[jax.Array, Tuple[int, int]]:
    """Canonical [k, Ci, Co] -> grouped folded kernel
    [KK, (fold//d)*Ci, fold*Co] + folded-time padding, for a stride-1
    'same' dilated conv run as a feature_group_count=d conv over
    residue-major folded channels (see phase_split_reorder)."""
    mg, pad = _phase_split_placement(kernel.shape[0], dilation, fold)
    m = jnp.asarray(mg, kernel.dtype)
    fp = fold // dilation
    wf = jnp.einsum("jmf,jic->mifc", m, kernel)
    kk = mg.shape[1] // fp
    return wf.reshape(kk, fp * kernel.shape[1], fold * kernel.shape[2]), pad


def phase_split_reorder(x: jax.Array, dilation: int, fold: int,
                        inverse: bool = False) -> jax.Array:
    """Reorder folded channels phase-major <-> residue-major.

    [B, T', F*C] with F = d*F': phase index f = a*d + beta sits at channel
    block f; residue-major wants block beta*F' + a. A single [F', d]
    transpose of the folded view, both directions (the permutation is an
    involution only when d == F', so `inverse` flips the transpose)."""
    d, f_ = dilation, fold
    fp = f_ // d
    b, t, fc = x.shape
    c = fc // f_
    if inverse:
        y = x.reshape(b, t, d, fp, c).transpose(0, 1, 3, 2, 4)
    else:
        y = x.reshape(b, t, fp, d, c).transpose(0, 1, 3, 2, 4)
    return y.reshape(b, t, fc)


def folded_conv_apply(
    x_folded: jax.Array,
    folded_kernel: jax.Array,
    pad: Tuple[int, int],
    bias: Optional[jax.Array] = None,
    fold_out: int = 1,
    precision=None,
    quant_int8: bool = False,
) -> jax.Array:
    """Run the folded conv: [B, T', F_in*Ci] x [K, F_in*Ci, F_out*Co].

    quant_int8 routes through the dynamic W8A8 path (ops/int8_conv.py) —
    int8 x int8 -> int32 on the MXU, dequant fused into the bias add; the
    value "w8" selects the weight-only variant (bf16 activations).
    Inference only (round() has no gradient)."""
    if quant_int8:
        from vcvits_tpu.ops.int8_conv import int8_conv1d
        return int8_conv1d(x_folded, folded_kernel, pad, bias=bias,
                           fold_out=fold_out, out_dtype=x_folded.dtype,
                           act_quant=quant_int8 != "w8")
    y = jax.lax.conv_general_dilated(
        x_folded, folded_kernel,
        window_strides=(1,), padding=[pad],
        dimension_numbers=("NHC", "HIO", "NHC"),
        precision=precision,
    )
    if bias is not None:
        y = y + jnp.tile(bias, fold_out).astype(y.dtype)
    return y
