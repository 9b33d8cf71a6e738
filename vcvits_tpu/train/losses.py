"""GAN losses (LS-GAN + feature matching + masked Gaussian KL).

Capability parity with /root/reference/vits/light/losses.py:4-55. All loss
math runs in float32 regardless of the compute dtype (the reference's
.float() casts — the bf16-GAN-stability hard part flagged in SURVEY.md §7e).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp


def feature_loss(fmap_r: Sequence[Sequence[jax.Array]],
                 fmap_g: Sequence[Sequence[jax.Array]]) -> jax.Array:
    """L1 feature matching over all sub-discriminator fmaps, x2 (losses.py:4-12)."""
    loss = jnp.float32(0.0)
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            rl = jax.lax.stop_gradient(rl.astype(jnp.float32))
            loss += jnp.mean(jnp.abs(rl - gl.astype(jnp.float32)))
    return loss * 2.0


def discriminator_loss(
    disc_real: Sequence[jax.Array], disc_gen: Sequence[jax.Array]
) -> Tuple[jax.Array, List[jax.Array], List[jax.Array]]:
    """LS-GAN D loss: (1-D(y))^2 + D(y_hat)^2 (losses.py:14-27)."""
    loss = jnp.float32(0.0)
    r_losses, g_losses = [], []
    for dr, dg in zip(disc_real, disc_gen):
        r = jnp.mean((1.0 - dr.astype(jnp.float32)) ** 2)
        g = jnp.mean(dg.astype(jnp.float32) ** 2)
        loss += r + g
        r_losses.append(r)
        g_losses.append(g)
    return loss, r_losses, g_losses


def generator_loss(disc_gen: Sequence[jax.Array]) -> Tuple[jax.Array, List[jax.Array]]:
    """LS-GAN G adversarial loss: (1-D(y_hat))^2 (losses.py:29-38)."""
    loss = jnp.float32(0.0)
    gen_losses = []
    for dg in disc_gen:
        l = jnp.mean((1.0 - dg.astype(jnp.float32)) ** 2)
        gen_losses.append(l)
        loss += l
    return loss, gen_losses


def kl_loss(z_p: jax.Array, logs_q: jax.Array, m_p: jax.Array,
            logs_p: jax.Array, z_mask: jax.Array) -> jax.Array:
    """Masked KL(q || prior) on the flowed posterior (losses.py:40-55).

    All inputs [B, T, C] ([B, T, 1] mask); reference layout is [B, C, T] but
    the reduction is over everything so parity is exact.
    """
    z_p = z_p.astype(jnp.float32)
    logs_q = logs_q.astype(jnp.float32)
    m_p = m_p.astype(jnp.float32)
    logs_p = logs_p.astype(jnp.float32)
    z_mask = z_mask.astype(jnp.float32)
    kl = logs_p - logs_q - 0.5
    kl += 0.5 * ((z_p - m_p) ** 2) * jnp.exp(-2.0 * logs_p)
    return jnp.sum(kl * z_mask) / jnp.sum(z_mask)
