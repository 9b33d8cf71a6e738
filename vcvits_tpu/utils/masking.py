"""Mask and segment-slicing utilities.

Capability parity with /root/reference/vits/commons.py:48-142 (sequence_mask,
slice_segments, rand_slice_segments, kl_divergence), redesigned for XLA:
segment slicing is a per-row `lax.dynamic_slice` under vmap with a *static*
segment size (the reference loops over the batch in Python), and randomness
is an explicit PRNG key instead of global torch RNG state.

Layout convention: activations are [B, T, C] (time on sublanes, channels on
lanes); masks are [B, T, 1] floats.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def sequence_mask(lengths: jax.Array, max_length: int) -> jax.Array:
    """[B] int lengths -> [B, T, 1] float32 mask (1.0 inside, 0.0 padding).

    Reference: commons.py:120-124 (which returns [B, T] bool; callers
    unsqueeze to [B, 1, T] channel-first — we bake in the [B, T, 1] layout).
    """
    pos = jnp.arange(max_length, dtype=jnp.int32)
    mask = pos[None, :] < lengths[:, None].astype(jnp.int32)
    return mask.astype(jnp.float32)[:, :, None]


def slice_segments(x: jax.Array, ids_str: jax.Array, segment_size: int) -> jax.Array:
    """Slice a fixed-size time window per batch row.

    x: [B, T, C]; ids_str: [B] int start indices; returns [B, segment_size, C].
    Reference: commons.py:48-55 (Python loop over batch); here a vmapped
    dynamic_slice so it stays inside one XLA program.
    """

    def _one(row: jax.Array, start: jax.Array) -> jax.Array:
        start = jnp.clip(start, 0, row.shape[0] - segment_size).astype(jnp.int32)
        return jax.lax.dynamic_slice_in_dim(row, start, segment_size, axis=0)

    return jax.vmap(_one)(x, ids_str)


def rand_slice_segments(
    x: jax.Array,
    x_lengths: Optional[jax.Array],
    segment_size: int,
    rng: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Randomly slice a segment per row, uniform over valid starts.

    Matches the semantics of commons.py:58-64: start ~ floor(U[0,1) *
    (len - segment_size + 1)). Rows shorter than segment_size clamp to 0.
    Returns (segments [B, segment_size, C], ids_str [B]).
    """
    b, t, _ = x.shape
    if x_lengths is None:
        x_lengths = jnp.full((b,), t, dtype=jnp.int32)
    ids_str_max = jnp.maximum(x_lengths.astype(jnp.int32) - segment_size + 1, 1)
    u = jax.random.uniform(rng, (b,))
    ids_str = jnp.floor(u * ids_str_max.astype(u.dtype)).astype(jnp.int32)
    return slice_segments(x, ids_str, segment_size), ids_str


def kl_divergence(
    m_p: jax.Array, logs_p: jax.Array, m_q: jax.Array, logs_q: jax.Array
) -> jax.Array:
    """Pointwise KL(P||Q) between diagonal Gaussians (commons.py:30-34)."""
    kl = (logs_q - logs_p) - 0.5
    kl += 0.5 * (jnp.exp(2.0 * logs_p) + (m_p - m_q) ** 2) * jnp.exp(-2.0 * logs_q)
    return kl


def subsequent_mask(length: int) -> jax.Array:
    """Causal (lower-triangular) attention mask, [1, 1, L, L] float32.

    Reference: commons.py:94-96. Multiplicative convention: 1.0 where
    position q may attend to position k<=q, 0.0 above the diagonal.
    """
    return jnp.tril(jnp.ones((length, length), jnp.float32))[None, None]


def get_timing_signal_1d(
    length: int,
    channels: int,
    min_timescale: float = 1.0,
    max_timescale: float = 1.0e4,
) -> jax.Array:
    """Sinusoidal position signal, [1, T, C] (commons.py:67-80).

    Same formula as the reference (tensor2tensor layout: the first
    channels//2 lanes are sines, the next channels//2 cosines, odd channel
    counts zero-padded), transposed to this repo's [B, T, C] convention.
    All-static shapes: XLA constant-folds the whole signal under jit.
    """
    position = jnp.arange(length, dtype=jnp.float32)
    num_timescales = channels // 2
    log_timescale_increment = (
        jnp.log(float(max_timescale) / float(min_timescale))
        / max(num_timescales - 1, 1)
    )
    inv_timescales = min_timescale * jnp.exp(
        jnp.arange(num_timescales, dtype=jnp.float32) * -log_timescale_increment
    )
    scaled_time = position[:, None] * inv_timescales[None, :]  # [T, C//2]
    signal = jnp.concatenate([jnp.sin(scaled_time), jnp.cos(scaled_time)], axis=1)
    signal = jnp.pad(signal, ((0, 0), (0, channels % 2)))
    return signal[None]  # [1, T, C]


def add_timing_signal_1d(
    x: jax.Array, min_timescale: float = 1.0, max_timescale: float = 1.0e4
) -> jax.Array:
    """x + sinusoidal positions, x: [B, T, C] (commons.py:82-85)."""
    _, t, c = x.shape
    return x + get_timing_signal_1d(t, c, min_timescale, max_timescale).astype(x.dtype)


def cat_timing_signal_1d(
    x: jax.Array,
    min_timescale: float = 1.0,
    max_timescale: float = 1.0e4,
    axis: int = -1,
) -> jax.Array:
    """Concat sinusoidal positions along channels, x: [B, T, C] (commons.py:87-91)."""
    b, t, c = x.shape
    signal = get_timing_signal_1d(t, c, min_timescale, max_timescale).astype(x.dtype)
    return jnp.concatenate([x, jnp.broadcast_to(signal, (b, t, c))], axis=axis)


def generate_path(duration: jax.Array, y_mask: jax.Array, x_mask: jax.Array) -> jax.Array:
    """Durations -> hard monotonic alignment (commons.py:127-142).

    duration: [B, T_x] (integer counts); y_mask: [B, T_y, 1]; x_mask:
    [B, T_x, 1]. Returns attn [B, T_y, T_x] with attn[b, y, x] = 1 iff
    cum_dur[x-1] <= y < cum_dur[x], masked to the valid region.
    """
    cum = jnp.cumsum(duration, axis=1)  # [B, T_x]
    t_y = y_mask.shape[1]
    ys = jnp.arange(t_y)[None, :, None]  # [1, T_y, 1]
    upper = ys < cum[:, None, :]
    lower = ys >= jnp.pad(cum[:, :-1], ((0, 0), (1, 0)))[:, None, :]
    attn = (upper & lower).astype(y_mask.dtype)
    return attn * y_mask * x_mask[:, None, :, 0]
