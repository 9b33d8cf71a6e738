"""HiFi-GAN decoder: upsampling arithmetic + full parity vs a torch replica."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from vcvits_tpu.models.hifigan import HiFiGANGenerator, ResBlock1


class TorchResBlock1(torch.nn.Module):
    def __init__(self, ch, k, dilations):
        super().__init__()
        self.convs1 = torch.nn.ModuleList(
            [torch.nn.Conv1d(ch, ch, k, dilation=d, padding=(k * d - d) // 2) for d in dilations]
        )
        self.convs2 = torch.nn.ModuleList(
            [torch.nn.Conv1d(ch, ch, k, dilation=1, padding=(k - 1) // 2) for _ in dilations]
        )

    def forward(self, x):
        for c1, c2 in zip(self.convs1, self.convs2):
            xt = torch.nn.functional.leaky_relu(x, 0.1)
            xt = c1(xt)
            xt = torch.nn.functional.leaky_relu(xt, 0.1)
            xt = c2(xt)
            x = xt + x
        return x


class TorchGenerator(torch.nn.Module):
    """Independent replica of the HiFi-GAN generator math (paper + config)."""

    def __init__(self, in_ch, up_init, rates, kernels, rk, rd):
        super().__init__()
        self.conv_pre = torch.nn.Conv1d(in_ch, up_init, 7, padding=3)
        self.ups = torch.nn.ModuleList()
        self.res = torch.nn.ModuleList()
        ch = up_init
        for u, k in zip(rates, kernels):
            self.ups.append(torch.nn.ConvTranspose1d(ch, ch // 2, k, u, padding=(k - u) // 2))
            ch //= 2
            for kk, dd in zip(rk, rd):
                self.res.append(TorchResBlock1(ch, kk, dd))
        self.conv_post = torch.nn.Conv1d(ch, 1, 7, padding=3)
        self.nk = len(rk)

    def forward(self, x):
        x = self.conv_pre(x)
        for i, up in enumerate(self.ups):
            x = torch.nn.functional.leaky_relu(x, 0.1)
            x = up(x)
            xs = 0
            for j in range(self.nk):
                xs = xs + self.res[i * self.nk + j](x)
            x = xs / self.nk
        x = torch.nn.functional.leaky_relu(x)  # default slope 0.01
        x = self.conv_post(x)
        return torch.tanh(x)


def _wn_params_from_plain_conv(tc):
    w = tc.weight.detach().numpy()
    return {
        "v": jnp.asarray(w.transpose(2, 1, 0)),
        "g": jnp.asarray(np.linalg.norm(w.reshape(w.shape[0], -1), axis=1).reshape(1, 1, -1)),
        "bias": jnp.asarray(tc.bias.detach().numpy()),
    }


def _wn_params_from_plain_convtranspose(tc):
    w = tc.weight.detach().numpy()  # [in, out, k]
    return {
        "v": jnp.asarray(w.transpose(2, 1, 0)),  # [k, out, in]
        "g": jnp.asarray(
            np.linalg.norm(w.reshape(w.shape[0], -1), axis=1).reshape(1, 1, -1)
        ),
        "bias": jnp.asarray(tc.bias.detach().numpy()),
    }


RATES, KERNELS = (4, 2), (8, 4)
RK, RD = (3, 5), ((1, 2), (1, 2))
IN_CH, UP_INIT = 8, 32


def test_generator_parity_with_torch(rng):
    torch.manual_seed(1)
    ref = TorchGenerator(IN_CH, UP_INIT, RATES, KERNELS, RK, RD)
    x = rng.standard_normal((2, 11, IN_CH)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x.transpose(0, 2, 1))).numpy().transpose(0, 2, 1)

    params = {
        "conv_pre": _wn_params_from_plain_conv(ref.conv_pre),
        "conv_post": _wn_params_from_plain_conv(ref.conv_post),
    }
    nk = len(RK)
    for i, up in enumerate(ref.ups):
        params[f"up_{i}"] = _wn_params_from_plain_convtranspose(up)
        for j in range(nk):
            rb = ref.res[i * nk + j]
            blk = {}
            for m, c in enumerate(rb.convs1):
                blk[f"c1_{m}"] = _wn_params_from_plain_conv(c)
            for m, c in enumerate(rb.convs2):
                blk[f"c2_{m}"] = _wn_params_from_plain_conv(c)
            params[f"res_{i}_{j}"] = blk

    gen = HiFiGANGenerator(
        initial_channel=IN_CH, resblock="1", resblock_kernel_sizes=RK,
        resblock_dilation_sizes=RD, upsample_rates=RATES,
        upsample_initial_channel=UP_INIT, upsample_kernel_sizes=KERNELS,
    )
    ours = np.asarray(gen.apply({"params": params}, jnp.asarray(x)))
    assert ours.shape == out_ref.shape == (2, 11 * 4 * 2, 1)
    np.testing.assert_allclose(ours, out_ref, atol=3e-5)


@pytest.mark.slow
def test_generator_48k_upsample_factor():
    gen = HiFiGANGenerator(initial_channel=16, upsample_initial_channel=64)
    x = jnp.zeros((1, 8, 16))
    params = gen.init(jax.random.PRNGKey(0), x)
    out = gen.apply(params, x)
    assert out.shape == (1, 8 * 512, 1)  # 8*8*4*2 = hop_length
    assert np.abs(np.asarray(out)).max() <= 1.0  # tanh bounded


def test_generator_speaker_conditioning_changes_output(rng):
    gen = HiFiGANGenerator(initial_channel=8, upsample_initial_channel=32,
                           upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
                           gin_channels=6)
    x = jnp.asarray(rng.standard_normal((1, 5, 8)).astype(np.float32))
    g1 = jnp.asarray(rng.standard_normal((1, 6)).astype(np.float32))
    g2 = jnp.asarray(rng.standard_normal((1, 6)).astype(np.float32))
    params = gen.init(jax.random.PRNGKey(0), x, g=g1)
    o1 = gen.apply(params, x, g=g1)
    o2 = gen.apply(params, x, g=g2)
    assert not np.allclose(np.asarray(o1), np.asarray(o2))
