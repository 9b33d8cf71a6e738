"""Fused Pallas kernel: one residual-coupling REVERSE pass per call.

Why: the flow reverse (models/flow.py) is 4 couplings x (pre 1x1 + 4-layer
WN + post 1x1) = ~40 small sequential XLA ops over [B, T, 192]. Measured
~27 ms for ~14 GFLOP on a 10 s utterance (ROADMAP item 4) — 0.5% MFU,
pure dispatch/HBM-latency bound. This kernel runs an ENTIRE coupling
(pre -> 4 gated dilated-conv layers -> post -> affine) in one
pallas_call with everything VMEM-resident: the k=5 convs are 5 shifted
[R,192]@[192,384] MXU matmuls, gates on the VPU, no HBM round-trips
between layers.

Exactness: bit-for-bit the same math as ResidualCouplingLayer(reverse=True)
including the per-layer mask multiplications (tests/test_flow_pallas.py).
Reverse only — training keeps the XLA path (this defines no VJP).

Tiling: T is cut into `tile`-frame blocks with an 8-frame halo each side
(the WN stack's receptive field: 4 layers x (5-1)/2 x dilation 1); blocks
are independent, so the grid is (batch x n_tiles,) with zero-padded edges
— zeros match the offline conv's SAME padding, and the mask is framed
along so padded rows die exactly as they do in the XLA path.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

HALO = 8  # 4 WN layers x k=5, dilation 1 -> +-8 frames

_KER_N_LAYERS = 4  # SynthesizerSVC flow topology (synthesizer.py:123-126)


def _fold_wn(p: Dict) -> Tuple[jax.Array, jax.Array]:
    """(v, g[, bias]) weight-norm Conv1d params -> (kernel, bias)."""
    v = p["v"].astype(jnp.float32)
    g = p["g"].astype(jnp.float32)
    sq = jnp.sum(jnp.square(v), axis=tuple(range(v.ndim - 1)), keepdims=True)
    k = g * v / jnp.maximum(jnp.sqrt(sq), 1e-12)
    return k, p.get("bias", jnp.zeros(k.shape[-1])).astype(jnp.float32)


def _coupling_kernel(x_ref, m_ref, cond_ref, wpre_ref, bpre_ref, win_ref,
                     bin_ref, wrs_ref, brs_ref, wpost_ref, bpost_ref, out_ref,
                     *, hidden: int, half: int, tile: int):
    x = x_ref[0].astype(jnp.float32)        # [R, 2*half]
    mask = m_ref[0].astype(jnp.float32)     # [R, 1]
    cond = cond_ref[0].astype(jnp.float32)  # [1, n_layers*2H] (this batch row)
    x0 = x[:, :half]

    h = (jnp.dot(x0, wpre_ref[:], preferred_element_type=jnp.float32)
         + bpre_ref[:]) * mask

    out = jnp.zeros((x.shape[0], hidden), jnp.float32)
    for i in range(_KER_N_LAYERS):
        # [1, 2H] broadcasts over rows
        acc = bin_ref[i] + cond[:, i * 2 * hidden:(i + 1) * 2 * hidden]
        for mshift in range(5):
            d = mshift - 2
            if d == 0:
                hs = h
            elif d > 0:
                hs = jnp.concatenate(
                    [h[d:], jnp.zeros((d, hidden), jnp.float32)], axis=0)
            else:
                hs = jnp.concatenate(
                    [jnp.zeros((-d, hidden), jnp.float32), h[:d]], axis=0)
            acc = acc + jnp.dot(hs, win_ref[i, mshift],
                                preferred_element_type=jnp.float32)
        a = jnp.tanh(acc[:, :hidden]) * jax.nn.sigmoid(acc[:, hidden:])
        rs = jnp.dot(a, wrs_ref[i], preferred_element_type=jnp.float32) \
            + brs_ref[i]
        # layer 3's res_skip is packed into the skip half (residual half 0)
        h = (h + rs[:, :hidden]) * mask
        out = out + rs[:, hidden:]

    out = out * mask
    m_stats = (jnp.dot(out, wpost_ref[:], preferred_element_type=jnp.float32)
               + bpost_ref[:]) * mask

    c = HALO
    x1 = x[c: c + tile, half:]
    out_ref[0] = ((x1 - m_stats[c: c + tile]) * mask[c: c + tile]
                  ).astype(out_ref.dtype)


def _coupling_weights(p: Dict, hidden: int, half: int):
    """Fold one coupling's params into the kernel's stacked weight set."""
    w_pre = p["pre"]["kernel"][0].astype(jnp.float32)          # [half, hidden]
    b_pre = p["pre"]["bias"].astype(jnp.float32)
    enc = p["enc"]
    w_in, b_in, w_rs, b_rs = [], [], [], []
    for i in range(_KER_N_LAYERS):
        k, b = _fold_wn(enc[f"in_{i}"])                         # [5, H, 2H]
        w_in.append(k)
        b_in.append(b)
        kr, br = _fold_wn(enc[f"res_skip_{i}"])                 # [1, H, 2H|H]
        kr, br = kr[0], br
        if kr.shape[-1] == hidden:  # last layer: pack into the skip half
            kr = jnp.concatenate(
                [jnp.zeros((hidden, hidden), jnp.float32), kr], axis=-1)
            br = jnp.concatenate([jnp.zeros((hidden,), jnp.float32), br])
        w_rs.append(kr)
        b_rs.append(br)
    w_post = p["post"]["kernel"][0].astype(jnp.float32)         # [hidden, half]
    b_post = p["post"]["bias"].astype(jnp.float32)
    # biases as 2-D [*, 1, N]: 1-D VMEM refs are fragile under Mosaic tiling
    return (w_pre, b_pre[None], jnp.stack(w_in), jnp.stack(b_in)[:, None, :],
            jnp.stack(w_rs), jnp.stack(b_rs)[:, None, :], w_post,
            b_post[None])


def _frame(x: jax.Array, tile: int) -> jax.Array:
    """[B, T, C] -> [B*n_t, tile + 2*HALO, C], zero-padded edges."""
    b, t, c = x.shape
    n_t = -(-t // tile)
    xp = jnp.pad(x, ((0, 0), (HALO, n_t * tile - t + HALO), (0, 0)))
    frames = [xp[:, i * tile: i * tile + tile + 2 * HALO] for i in range(n_t)]
    return jnp.stack(frames, 1).reshape(b * n_t, tile + 2 * HALO, c)


@functools.partial(jax.jit, static_argnames=("hidden", "half", "tile",
                                             "interpret"))
def _coupling_reverse(x, mask, cond, weights, hidden, half, tile, interpret):
    from jax.experimental import pallas as pl

    b, t, c = x.shape
    n_t = -(-t // tile)
    r = tile + 2 * HALO
    xf = _frame(x, tile)
    mf = _frame(mask, tile)

    w_shapes = [w.shape for w in weights]
    grid = (b * n_t,)
    out = pl.pallas_call(
        functools.partial(_coupling_kernel, hidden=hidden, half=half,
                          tile=tile),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, r, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, r, 1), lambda i: (i, 0, 0)),
            # per-utterance conditioning row for this tile's batch element
            pl.BlockSpec((1, 1, cond.shape[-1]),
                         lambda i, _n=n_t: (i // _n, 0, 0)),
        ] + [
            pl.BlockSpec(s, (lambda i, _nd=len(s): (0,) * _nd))
            for s in w_shapes
        ],
        out_specs=pl.BlockSpec((1, tile, half), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b * n_t, tile, half), x.dtype),
        interpret=interpret,
    )(xf, mf, cond, *weights)
    x1n = out.reshape(b, n_t * tile, half)[:, :t]
    return jnp.concatenate([x[..., :half], x1n], axis=-1)


def flow_reverse_fused(
    flow_params: Dict,
    x: jax.Array,
    x_mask: jax.Array,
    g: Optional[jax.Array] = None,
    n_flows: int = 4,
    tile: int = 512,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Drop-in for ResidualCouplingBlock(reverse=True) at inference.

    flow_params: the block's param tree ({"flow_0".."flow_3"}); x [B,T,C];
    x_mask [B,T,1]; g [B,gin]. Returns z, numerically matching the XLA
    path (tests/test_flow_pallas.py).
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    c = x.shape[-1]
    half = c // 2
    p0 = flow_params["flow_0"]
    hidden = p0["pre"]["kernel"].shape[-1]
    t = x.shape[1]
    tile = min(tile, max(8, t))
    b = x.shape[0]
    for i in reversed(range(n_flows)):
        x = jnp.flip(x, axis=-1)
        p = flow_params[f"flow_{i}"]
        if g is not None and "cond_layer" in p["enc"]:
            kc, bc = _fold_wn(p["enc"]["cond_layer"])
            cond = (g.astype(jnp.float32) @ kc[0] + bc)[:, None, :]  # [B,1,2HL]
        else:
            cond = jnp.zeros((b, 1, 2 * hidden * _KER_N_LAYERS), jnp.float32)
        weights = _coupling_weights(p, hidden, half)
        x = _coupling_reverse(x, x_mask, cond, weights, hidden, half,
                              tile, interpret)
    return x
