"""Fused gated-activation op for the WaveNet stacks.

Capability parity with /root/reference/vits/commons.py:99-106
(@torch.jit.script fused_add_tanh_sigmoid_multiply). On TPU, XLA already
fuses this elementwise chain into the surrounding convs; the Pallas kernel
below exists for the cases where we want to force a single VMEM-resident
pass (long sequences where HBM round-trips dominate).

Layout: [B, T, 2H] with the tanh half in [..., :H] and sigmoid half in
[..., H:] (matches the reference's channel split at commons.py:103-104).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fused_add_tanh_sigmoid_multiply(a: jax.Array, b: jax.Array, n_channels: int) -> jax.Array:
    """tanh(x[:H]) * sigmoid(x[H:]) of x = a + b; [B, T, 2H] -> [B, T, H]."""
    x = a + b
    t = jnp.tanh(x[..., :n_channels])
    s = jax.nn.sigmoid(x[..., n_channels:])
    return t * s


def fused_gate_pallas(a: jax.Array, b: jax.Array, n_channels: int) -> jax.Array:
    """Pallas TPU kernel variant: one VMEM pass over [B*T, 2H] tiles."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bsz, t, two_h = a.shape
    assert two_h == 2 * n_channels

    def kernel(a_ref, b_ref, o_ref):
        x = a_ref[:] + b_ref[:]
        o_ref[:] = jnp.tanh(x[:, :n_channels]) * jax.nn.sigmoid(x[:, n_channels:])

    a2 = a.reshape(bsz * t, two_h)
    b2 = jnp.broadcast_to(b, a.shape).reshape(bsz * t, two_h)
    rows = bsz * t
    tile = 512 if rows % 512 == 0 else rows
    grid = (rows // tile,)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, n_channels), a.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, two_h), lambda i: (i, 0)),
            pl.BlockSpec((tile, two_h), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((tile, n_channels), lambda i: (i, 0)),
    )(a2, b2)
    return out.reshape(bsz, t, n_channels)
