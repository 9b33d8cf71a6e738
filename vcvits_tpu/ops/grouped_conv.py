"""Phase-packed grouped 1-D convolution for the MXU.

The MSD scale heads (models/discriminators.py DiscriminatorS, parity with
/root/reference/vits/model/discriminators/discriminator.py:47-74) are
grouped convs with tiny per-group shapes: kernel 41, in/groups = 4,
out/groups = 16 (or 4). XLA lowers feature_group_count convs to per-group
matmuls of [M, 41*4] x [41*4, 16] — the 16-wide output pads to the 128
lane dim and the 164-deep contraction pads to 256, an ~8% MXU ceiling.
Profiled on a v5e train step (reports/profile_train_b16.json) the six
DiscriminatorS stacks ran at ~3 TF/s effective and ate ~40 ms of a 167 ms
step.

This op packs P = 128 // (out/groups) consecutive OUTPUT POSITIONS onto
the lane axis next to the output channels, so each group's matmul becomes

    [B*Q, W*Cg] x [W*Cg, P*Cog]   (batched over groups)

with W = stride*(P-1) + k the input window covering P outputs. Lanes are
fully used; the only waste is the K-dim zero-padding of the packed weight
(each output tap uses k of the W window positions): utilization ceiling
rises to ~43% for Cog=16 (W=69, K 276->384) and ~21% for Cog=4. The
window tensor is built from ceil(W / (stride*P)) = 2-3 shifted BLOCK
slices of a [B, Q+nb-1, stride*P, C] reshape — no gather, no im2col blowup.

Everything is plain slices/reshapes/einsum, so autodiff provides exact
dx/dw (the masked-weight construction routes dW back through a take).
Exactness vs lax.conv_general_dilated is asserted in
tests/test_grouped_conv.py.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# Keep the packed path off the table when it cannot beat the native conv:
# out/groups >= 64 already fills half the lane tile natively.
_MAX_COG = 32


def _plan(k: int, stride: int, cog: int) -> Tuple[int, int]:
    """(P outputs per tile, W window width). P*cog == lane tile (<=128)."""
    p = max(1, min(128 // cog, 32))
    return p, stride * (p - 1) + k


def use_packed(groups: int, features: int, stride: int, dilation: int) -> bool:
    cog = features // groups
    return (groups > 1 and dilation == 1 and cog <= _MAX_COG
            and 128 % cog == 0)


def pick_time_chunks(batch: int, t_out: int, *, lane_target: int = 128,
                     min_chunk_out: int = 64) -> int:
    """Chunk count for time_batch_conv1d: fill the 128-lane batch axis
    (the slow TPU emitters put batch in lanes — profile_train_b16.json)
    without shrinking per-chunk T below the tiling sweet spot."""
    c = 1
    while (batch * c * 2 <= lane_target and t_out % (c * 2) == 0
           and t_out // (c * 2) >= min_chunk_out):
        c *= 2
    return c


def time_batch_conv1d(
    x: jax.Array,
    kernel: jax.Array,
    *,
    stride: int = 1,
    padding: Tuple[int, int] = (0, 0),
    groups: int = 1,
    chunks: int,
    precision=None,
) -> jax.Array:
    """Exact grouped conv with time folded into batch (space-to-batch).

    XLA's grouped-conv emitters on this chip put BATCH in the 128-lane
    axis (`EmitInputFeaturePackedInputBatchInLanes` /
    `EmitOutputBatchInLanesKernelOutputFeatureInSublanes`), so a batch-32
    discriminator pass runs at ~25% lane occupancy. Splitting time into
    `chunks` overlapping blocks (halo = the conv's receptive overlap)
    multiplies the batch the emitter sees while staying on the native
    conv path — ordinary autodiff gives exact dx/dw through the
    slice/stack. Equivalent of lax.conv_general_dilated(..., NHC/HIO/NHC,
    feature_group_count=groups) for dilation 1; requires T_out % chunks
    == 0 (callers gate via pick_time_chunks).
    """
    b, t, c = x.shape
    k, cg, f = kernel.shape
    if chunks <= 1:
        return jax.lax.conv_general_dilated(
            x, kernel, (stride,), [padding],
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=groups, precision=precision)
    lo, hi = padding
    t_out = (t + lo + hi - k) // stride + 1
    assert t_out % chunks == 0, (t_out, chunks)
    tc_out = t_out // chunks
    span = (tc_out - 1) * stride + k
    need = (t_out - 1) * stride + k  # padded length the chunks address
    xp = jnp.pad(x, ((0, 0), (lo, max(0, need - (t + lo))), (0, 0)))
    xs = jnp.stack(
        [jax.lax.slice_in_dim(xp, i * tc_out * stride,
                              i * tc_out * stride + span, axis=1)
         for i in range(chunks)], axis=1)  # [B, NC, span, C]
    y = jax.lax.conv_general_dilated(
        xs.reshape(b * chunks, span, c), kernel, (stride,), [(0, 0)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups, precision=precision)
    return y.reshape(b, chunks * tc_out, f)


def grouped_conv1d_packed(
    x: jax.Array,
    kernel: jax.Array,
    *,
    stride: int = 1,
    padding: Tuple[int, int] = (0, 0),
    groups: int,
    precision=None,
) -> jax.Array:
    """Exact equivalent of lax.conv_general_dilated(x, kernel, (stride,),
    [padding], dimension_numbers=("NHC","HIO","NHC"),
    feature_group_count=groups) for dilation 1.

    x: [B, T, C], kernel: [k, C//groups, F] (HIO), returns [B, T_out, F].
    """
    b, t, c = x.shape
    k, cg, f = kernel.shape
    g = groups
    assert c == cg * g, (c, cg, g)
    cog = f // g
    p, w = _plan(k, stride, cog)
    lo, hi = padding
    t_out = (t + lo + hi - k) // stride + 1
    q = -(-t_out // p)  # output tiles

    bs = stride * p  # block stride: window q starts exactly at block q*bs
    nb = -(-w // bs)  # blocks spanned by one window
    # pad so (q + nb - 1) full blocks exist after the left conv padding
    need = (q + nb - 1) * bs
    xp = jnp.pad(x, ((0, 0), (lo, max(need - (t + lo), hi)), (0, 0)))
    blocks = xp[:, :need].reshape(b, q + nb - 1, bs, c)
    win = jnp.concatenate(
        [blocks[:, j:j + q] for j in range(nb)], axis=2)[:, :, :w]
    # [B, Q, W, G, Cg] -> [G, B*Q, W*Cg]
    win = win.reshape(b, q, w, g, cg).transpose(3, 0, 1, 2, 4)
    win = win.reshape(g, b * q, w * cg)

    # packed weight: Wp[w, p, ci, g, co] = kernel[w - stride*p] masked
    kr = kernel.reshape(k, cg, g, cog)
    j_idx = (jnp.arange(w)[:, None] - stride * jnp.arange(p)[None, :])  # [W,P]
    mask = (j_idx >= 0) & (j_idx < k)
    wp = jnp.take(kr, jnp.clip(j_idx, 0, k - 1), axis=0)  # [W,P,Cg,G,Cog]
    wp = jnp.where(mask[:, :, None, None, None], wp, 0)
    # -> [G, W*Cg, P*Cog] (w-major K to match win's (w, ci) order)
    wp = wp.transpose(3, 0, 2, 1, 4).reshape(g, w * cg, p * cog)

    y = jax.lax.dot_general(
        win, wp, (((2,), (1,)), ((0,), (0,))), precision=precision)
    # [G, B*Q, P*Cog] -> [B, Q*P, G*Cog]
    y = y.reshape(g, b, q, p, cog).transpose(1, 2, 3, 0, 4)
    return y.reshape(b, q * p, g * cog)[:, :t_out]
