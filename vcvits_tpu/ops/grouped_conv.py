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
