"""Fused Pallas kernel: a decoder stage's ENTIRE MRF in one pass.

Why: after upsampling, each HiFi-GAN stage runs a multi-receptive-field
fusion of 3 ResBlock1s = 18 small dilated convs over [B, T, C] with
C = 256..32 and T up to 480 k samples. As separate XLA ops each conv
round-trips the activation through HBM; the stage is bandwidth/latency
bound (~1.5% MFU). This kernel computes the whole MRF for a T-tile with
everything VMEM-resident: convs are k shifted [R, C] @ [C, C] MXU
matmuls, leaky-ReLUs on the VPU, one HBM read and one write per tile.

Exactness: same math as the ResBlock1 loop in models/hifigan.py:54-72
(zero-'same'-padded convs, mask-free decode path). Tiles carry a
+-HALO-row overlap of REAL neighbor samples; rows beyond the sequence are
re-zeroed after every conv (the conv bias would otherwise leak where the
offline path has zero padding) — the same zero-invariant trick as
streaming_conv.py. Inference-only (no VJP): training keeps the XLA path.

Used for stages whose full MRF weight set fits comfortably in VMEM
(C <= 128 at fp32 — the long, low-channel stages where the win is);
bigger stages fall back to the XLA path automatically.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_VMEM_WEIGHT_BUDGET = 10 * 2 ** 20  # bytes of resblock weights per call


def _shift(x: jax.Array, s: int) -> jax.Array:
    """Row shift with zero fill: out[t] = x[t + s]."""
    if s == 0:
        return x
    r, c = x.shape
    z = jnp.zeros((abs(s), c), x.dtype)
    if s > 0:
        return jnp.concatenate([x[s:], z], axis=0)
    return jnp.concatenate([z, x[:s]], axis=0)


def _mrf_kernel(x_ref, *refs, tile: int, halo: int, t_total: int,
                kernel_sizes: Sequence[int],
                dilations: Sequence[Sequence[int]]):
    out_ref = refs[-1]
    wrefs = refs[:-1]
    x = x_ref[0, 0].astype(jnp.float32)  # [R, C]
    r = x.shape[0]

    i_tile = pl.program_id(1)
    # rows outside the real sequence must stay zero after biased convs
    g0 = i_tile * tile - halo
    rows = g0 + jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
    valid = ((rows >= 0) & (rows < t_total)).astype(jnp.float32)

    total = None
    wi = 0
    for k, dils in zip(kernel_sizes, dilations):
        w1, b1, w2, b2 = wrefs[wi], wrefs[wi + 1], wrefs[wi + 2], wrefs[wi + 3]
        wi += 4
        wdt = w1.dtype  # dots run at the weights' dtype (bf16 fast path),
        h = x           # accumulation in f32
        for t, d in enumerate(dils):
            xt = jax.nn.leaky_relu(h, 0.1).astype(wdt)
            acc = b1[t].astype(jnp.float32)
            for m in range(k):
                acc = acc + jnp.dot(
                    _shift(xt, (m - (k - 1) // 2) * d), w1[t, m],
                    preferred_element_type=jnp.float32)
            xt = jax.nn.leaky_relu(acc * valid, 0.1).astype(wdt)
            acc = b2[t].astype(jnp.float32)
            for m in range(k):
                acc = acc + jnp.dot(
                    _shift(xt, m - (k - 1) // 2), w2[t, m],
                    preferred_element_type=jnp.float32)
            h = h + acc * valid
        total = h if total is None else total + h

    out = total / float(len(kernel_sizes))
    out_ref[0] = out[halo: halo + tile].astype(out_ref.dtype)


def _frame_overlap(x: jax.Array, tile: int, halo: int) -> jax.Array:
    """[B, T, C] -> [B, n_t, tile + 2*halo, C] overlapped tiles, zero edges."""
    b, t, c = x.shape
    n_t = -(-t // tile)
    xp = jnp.pad(x, ((0, 0), (halo, n_t * tile - t + halo), (0, 0)))
    frames = [xp[:, i * tile: i * tile + tile + 2 * halo] for i in range(n_t)]
    return jnp.stack(frames, 1)


def mrf_weight_bytes(c: int, kernel_sizes: Sequence[int],
                     dilations: Sequence[Sequence[int]], itemsize: int) -> int:
    n = sum(2 * len(d) * k * c * c for k, d in zip(kernel_sizes, dilations))
    return n * itemsize


def mrf_fused(
    x: jax.Array,
    blocks: List[Tuple[jax.Array, jax.Array, jax.Array, jax.Array]],
    kernel_sizes: Sequence[int],
    dilations: Sequence[Sequence[int]],
    tile: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """x [B, T, C]; blocks: per resblock (w1 [D,k,C,C], b1 [D,1,C],
    w2 [D,k,C,C], b2 [D,1,C]). Returns mean of the resblock outputs."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    b, t, c = x.shape
    if tile is None:
        # VMEM sizing: Mosaic pads the lane (channel) dim to 128, so a
        # [R, C<128] f32 temporary costs R*128*4 bytes regardless of C —
        # and the k shifted copies live simultaneously. Budget ~0.25 MB
        # per padded buffer (131072//c and 65536//c both OOM'd the 16 MB
        # scoped VMEM by 64 KB on v5e at C=64/32).
        tile = max(256, 65536 // max(c, 128))
    halo = max(
        sum((k - 1) // 2 * d + (k - 1) // 2 for d in dils)
        for k, dils in zip(kernel_sizes, dilations))
    tile = min(tile, max(8, t))
    n_t = -(-t // tile)
    r = tile + 2 * halo
    xf = _frame_overlap(x, tile, halo)  # [B, n_t, R, C]

    flat_weights = []
    for w1, b1, w2, b2 in blocks:
        flat_weights += [w1, b1, w2, b2]

    out = pl.pallas_call(
        functools.partial(_mrf_kernel, tile=tile, halo=halo, t_total=t,
                          kernel_sizes=tuple(kernel_sizes),
                          dilations=tuple(tuple(d) for d in dilations)),
        grid=(b, n_t),
        in_specs=[pl.BlockSpec((1, 1, r, c), lambda bi, ti: (bi, ti, 0, 0))]
        + [pl.BlockSpec(w.shape, (lambda bi, ti, _nd=w.ndim: (0,) * _nd))
           for w in flat_weights],
        out_specs=pl.BlockSpec((1, tile, c), lambda bi, ti: (bi * n_t + ti, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b * n_t, tile, c), x.dtype),
        interpret=interpret,
    )(xf, *flat_weights)
    return out.reshape(b, n_t * tile, c)[:, :t]


def fold_resblock_weights(params: Dict, resblock: str, n_dil: int,
                          dtype) -> Tuple[jax.Array, ...]:
    """One ResBlock1 param subtree -> stacked kernel/bias arrays."""
    from vcvits_tpu.ops.flow_pallas import _fold_wn

    assert resblock == "1", "fused MRF supports ResBlock1 (the 48k config)"
    w1, b1, w2, b2 = [], [], [], []
    for i in range(n_dil):
        k, bb = _fold_wn(params[f"c1_{i}"])
        w1.append(k)  # [k, C, C]
        b1.append(bb)
        k2, bb2 = _fold_wn(params[f"c2_{i}"])
        w2.append(k2)
        b2.append(bb2)
    # stacked [D, k, C, C]; biases [D, 1, C]
    return (jnp.stack(w1).astype(dtype), jnp.stack(b1).astype(dtype)[:, None, :],
            jnp.stack(w2).astype(dtype), jnp.stack(b2).astype(dtype)[:, None, :])
