"""Loss parity vs inline torch implementations of the reference math."""

import jax.numpy as jnp
import numpy as np
import torch

from vcvits_tpu.train.losses import (
    discriminator_loss,
    feature_loss,
    generator_loss,
    kl_loss,
)


def test_discriminator_loss_parity(rng):
    dr = [rng.standard_normal((2, 5)).astype(np.float32) for _ in range(3)]
    dg = [rng.standard_normal((2, 5)).astype(np.float32) for _ in range(3)]
    ours, r_l, g_l = discriminator_loss([jnp.asarray(x) for x in dr],
                                        [jnp.asarray(x) for x in dg])
    ref = sum(
        torch.mean((1 - torch.from_numpy(a)) ** 2) + torch.mean(torch.from_numpy(b) ** 2)
        for a, b in zip(dr, dg)
    )
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-6)
    assert len(r_l) == len(g_l) == 3


def test_generator_loss_parity(rng):
    dg = [rng.standard_normal((2, 5)).astype(np.float32) for _ in range(4)]
    ours, parts = generator_loss([jnp.asarray(x) for x in dg])
    ref = sum(torch.mean((1 - torch.from_numpy(x)) ** 2) for x in dg)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-6)
    assert len(parts) == 4


def test_feature_loss_parity(rng):
    fr = [[rng.standard_normal((2, 3, 4)).astype(np.float32) for _ in range(2)]
          for _ in range(3)]
    fg = [[rng.standard_normal((2, 3, 4)).astype(np.float32) for _ in range(2)]
          for _ in range(3)]
    ours = feature_loss(
        [[jnp.asarray(x) for x in sub] for sub in fr],
        [[jnp.asarray(x) for x in sub] for sub in fg],
    )
    ref = 0.0
    for dr, dg in zip(fr, fg):
        for rl, gl in zip(dr, dg):
            ref += torch.mean(torch.abs(torch.from_numpy(rl) - torch.from_numpy(gl)))
    np.testing.assert_allclose(float(ours), float(ref) * 2, rtol=1e-6)


def test_kl_loss_parity(rng):
    b, t, c = 2, 7, 4
    z_p = rng.standard_normal((b, t, c)).astype(np.float32)
    logs_q = rng.standard_normal((b, t, c)).astype(np.float32) * 0.1
    m_p = rng.standard_normal((b, t, c)).astype(np.float32)
    logs_p = rng.standard_normal((b, t, c)).astype(np.float32) * 0.1
    mask = np.ones((b, t, 1), np.float32)
    mask[1, 5:] = 0

    ours = kl_loss(*[jnp.asarray(x) for x in (z_p, logs_q, m_p, logs_p, mask)])

    # reference losses.py:40-55 in [B, C, T] layout
    tz, tq, tm, tp = (torch.from_numpy(x.transpose(0, 2, 1)) for x in (z_p, logs_q, m_p, logs_p))
    tmask = torch.from_numpy(mask.transpose(0, 2, 1))
    kl = tp - tq - 0.5
    kl += 0.5 * ((tz - tm) ** 2) * torch.exp(-2.0 * tp)
    ref = torch.sum(kl * tmask) / torch.sum(tmask)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)
