"""Monotonic alignment search (MAS) — vectorized JAX dynamic program.

Capability parity with the Cython `monotonic_align.maximum_path` the
reference expects but never shipped (SURVEY.md N8; synthesizer_tts.py:118,
.gitignore:9-11). Finds, per batch row, the monotonic path through
value[t_text, t_spec] maximizing the sum, under the constraint that the
path starts at (0,0), ends at (T_x-1, T_y-1), and moves +1 in t_spec each
step with t_text nondecreasing (+0/+1).

TPU design: a lax.scan over spec frames carrying the DP column
[B, T_text]; the backtrack is a reverse scan over the stored "came from
diagonal" decisions. Everything is masked for padded rows; no Python loops
over the batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def maximum_path(value: jax.Array, mask: jax.Array) -> jax.Array:
    """value: [B, T_x, T_y] scores; mask: [B, T_x, T_y] in {0,1}.

    Returns a 0/1 path matrix [B, T_x, T_y] (one t_x per t_y column within
    each row's valid region).
    """
    b, t_x, t_y = value.shape
    value = jnp.where(mask > 0, value, NEG_INF)

    x_lengths = jnp.maximum(mask[:, :, 0].sum(axis=1).astype(jnp.int32), 1)
    y_lengths = jnp.maximum(mask[:, 0, :].sum(axis=1).astype(jnp.int32), 1)

    init = jnp.full((b, t_x), NEG_INF).at[:, 0].set(value[:, 0, 0])

    def forward(carry, v_col):
        # carry: best score ending at (x, prev_y); v_col: [B, T_x]
        stay = carry
        diag = jnp.pad(carry[:, :-1], ((0, 0), (1, 0)), constant_values=NEG_INF)
        from_diag = diag > stay
        best = jnp.where(from_diag, diag, stay) + v_col
        return best, from_diag

    _, from_diag = jax.lax.scan(
        forward, init, jnp.transpose(value, (2, 0, 1))[1:]
    )  # from_diag: [T_y-1, B, T_x]
    from_diag = jnp.concatenate(
        [jnp.zeros((1, b, t_x), bool), from_diag], axis=0
    )  # align indices: decision used entering column y

    # Backtrack from (x_len-1, y_len-1).
    def backward(carry, fd_col_rev):
        # carry: (current x index [B], y index [B])
        x_idx, y = carry
        fd = jnp.take_along_axis(fd_col_rev, x_idx[:, None], axis=1)[:, 0]
        # only move while y <= y_len-1 region; outside valid region x stays
        active = (y <= y_lengths - 1) & (y >= 1)
        step = jnp.where(active & fd, 1, 0)
        new_x = x_idx - step
        return (new_x, y - 1), x_idx

    y0 = jnp.full((b,), t_y - 1, jnp.int32)
    # walk y from t_y-1 down to 0; start x at x_len-1 clamped into valid area
    x0 = x_lengths - 1

    def scan_body(carry, fd_col):
        return backward(carry, fd_col)

    (_, _), xs_rev = jax.lax.scan(
        scan_body, (x0, y0), jnp.flip(from_diag, axis=0)
    )  # xs_rev: [T_y, B] x-index per y, in reverse y order
    x_of_y = jnp.flip(xs_rev, axis=0).T  # [B, T_y]

    path = jax.nn.one_hot(x_of_y, t_x, axis=1)  # [B, T_x, T_y]
    return (path * mask).astype(value.dtype)
