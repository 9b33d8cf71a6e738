"""Parity of primitive layers vs torch CPU (the reference's substrate)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from vcvits_tpu.models.layers import Conv1d, ConvTranspose1d, LayerNorm


def test_layernorm_matches_torch(rng):
    x = rng.standard_normal((2, 7, 16)).astype(np.float32)
    ln = LayerNorm(16)
    params = ln.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # randomize gamma/beta
    gamma = rng.standard_normal(16).astype(np.float32)
    beta = rng.standard_normal(16).astype(np.float32)
    params = {"params": {"gamma": jnp.asarray(gamma), "beta": jnp.asarray(beta)}}
    ours = np.asarray(ln.apply(params, jnp.asarray(x)))
    ref = torch.nn.functional.layer_norm(
        torch.from_numpy(x), (16,), torch.from_numpy(gamma), torch.from_numpy(beta), 1e-5
    ).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def _torch_conv1d(x, w, b, stride=1, dilation=1, groups=1, padding=0):
    return torch.nn.functional.conv1d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
        stride=stride, dilation=dilation, groups=groups, padding=padding,
    ).numpy()


def test_conv1d_matches_torch(rng):
    for k, dil, groups in [(5, 1, 1), (5, 4, 1), (3, 1, 4), (1, 1, 1)]:
        cin, cout, t = 8, 12, 20
        x = rng.standard_normal((2, t, cin)).astype(np.float32)
        w = rng.standard_normal((cout, cin // groups, k)).astype(np.float32)
        b = rng.standard_normal(cout).astype(np.float32)
        pad = (k * dil - dil) // 2
        conv = Conv1d(cout, k, dilation=dil, groups=groups, padding="same")
        params = {"params": {
            "kernel": jnp.asarray(w.transpose(2, 1, 0)),  # [k, in/groups, out]
            "bias": jnp.asarray(b),
        }}
        ours = np.asarray(conv.apply(params, jnp.asarray(x)))
        ref = _torch_conv1d(x.transpose(0, 2, 1), w, b, dilation=dil, groups=groups,
                            padding=pad).transpose(0, 2, 1)
        np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_weight_norm_conv_matches_torch(rng):
    cin, cout, k, t = 6, 10, 5, 16
    x = rng.standard_normal((1, t, cin)).astype(np.float32)
    tconv = torch.nn.Conv1d(cin, cout, k, padding=k // 2)
    tconv = torch.nn.utils.weight_norm(tconv)
    with torch.no_grad():
        tconv.weight_v.copy_(torch.randn_like(tconv.weight_v))
        tconv.weight_g.copy_(torch.rand_like(tconv.weight_g) + 0.5)
    ref = tconv(torch.from_numpy(x.transpose(0, 2, 1))).detach().numpy().transpose(0, 2, 1)

    conv = Conv1d(cout, k, weight_norm=True, padding="same")
    params = {"params": {
        "v": jnp.asarray(tconv.weight_v.detach().numpy().transpose(2, 1, 0)),
        "g": jnp.asarray(tconv.weight_g.detach().numpy().reshape(1, 1, cout)),
        "bias": jnp.asarray(tconv.bias.detach().numpy()),
    }}
    ours = np.asarray(conv.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_conv_transpose_matches_torch(rng):
    """HiFi-GAN upsample arithmetic: k=16,s=8,p=4 and k=4,s=2,p=1."""
    for cin, cout, k, s in [(8, 4, 16, 8), (8, 4, 4, 2)]:
        p = (k - s) // 2
        t = 12
        x = rng.standard_normal((2, t, cin)).astype(np.float32)
        w = rng.standard_normal((cin, cout, k)).astype(np.float32)
        b = rng.standard_normal(cout).astype(np.float32)
        ref = torch.nn.functional.conv_transpose1d(
            torch.from_numpy(x.transpose(0, 2, 1)), torch.from_numpy(w),
            torch.from_numpy(b), stride=s, padding=p,
        ).numpy().transpose(0, 2, 1)
        ct = ConvTranspose1d(cout, k, stride=s, padding=p)
        params = {"params": {
            "kernel": jnp.asarray(w.transpose(2, 1, 0)),  # [k, out, in]
            "bias": jnp.asarray(b),
        }}
        ours = np.asarray(ct.apply(params, jnp.asarray(x)))
        assert ours.shape == ref.shape == (2, t * s, cout)
        np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_weight_norm_conv_transpose_matches_torch(rng):
    cin, cout, k, s = 6, 4, 8, 4
    p = (k - s) // 2
    x = rng.standard_normal((1, 10, cin)).astype(np.float32)
    tconv = torch.nn.ConvTranspose1d(cin, cout, k, stride=s, padding=p)
    tconv = torch.nn.utils.weight_norm(tconv)
    with torch.no_grad():
        tconv.weight_v.copy_(torch.randn_like(tconv.weight_v))
        tconv.weight_g.copy_(torch.rand_like(tconv.weight_g) + 0.5)
    ref = tconv(torch.from_numpy(x.transpose(0, 2, 1))).detach().numpy().transpose(0, 2, 1)
    ct = ConvTranspose1d(cout, k, stride=s, padding=p, weight_norm=True)
    params = {"params": {
        "v": jnp.asarray(tconv.weight_v.detach().numpy().transpose(2, 1, 0)),
        "g": jnp.asarray(tconv.weight_g.detach().numpy().reshape(1, 1, cin)),
        "bias": jnp.asarray(tconv.bias.detach().numpy()),
    }}
    ours = np.asarray(ct.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=2e-5)
