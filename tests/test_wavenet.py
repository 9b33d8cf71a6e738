"""WN (gated dilated WaveNet) parity vs an independent torch replica."""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import torch

from vcvits_tpu.models.wavenet import WN

H, K, DIL_RATE, N_LAYERS, GIN = 8, 5, 1, 4, 6


class TorchWN(torch.nn.Module):
    """Independent torch implementation of the gated WaveNet stack
    (same math as reference modules.py:109-175)."""

    def __init__(self, h, k, dilation_rate, n_layers, gin):
        super().__init__()
        self.h, self.n_layers = h, n_layers
        self.in_layers = torch.nn.ModuleList()
        self.res_skip = torch.nn.ModuleList()
        self.cond = torch.nn.Conv1d(gin, 2 * h * n_layers, 1)
        for i in range(n_layers):
            d = dilation_rate**i
            self.in_layers.append(
                torch.nn.Conv1d(h, 2 * h, k, dilation=d, padding=(k * d - d) // 2)
            )
            out_ch = 2 * h if i < n_layers - 1 else h
            self.res_skip.append(torch.nn.Conv1d(h, out_ch, 1))

    def forward(self, x, mask, g):
        out = torch.zeros_like(x)
        gc = self.cond(g)
        for i in range(self.n_layers):
            xin = self.in_layers[i](x)
            gl = gc[:, i * 2 * self.h : (i + 1) * 2 * self.h]
            act = torch.tanh(xin[:, : self.h] + gl[:, : self.h]) * torch.sigmoid(
                xin[:, self.h :] + gl[:, self.h :]
            )
            rs = self.res_skip[i](act)
            if i < self.n_layers - 1:
                x = (x + rs[:, : self.h]) * mask
                out = out + rs[:, self.h :]
            else:
                out = out + rs
        return out * mask


def _conv_params(tc):
    return {
        # our WN convs are weight-normed; fold plain torch weights as v with g=||v||
        "v": jnp.asarray(tc.weight.detach().numpy().transpose(2, 1, 0)),
        "g": jnp.asarray(
            np.linalg.norm(
                tc.weight.detach().numpy().reshape(tc.weight.shape[0], -1), axis=1
            ).reshape(1, 1, -1)
        ),
        "bias": jnp.asarray(tc.bias.detach().numpy()),
    }


def test_wn_parity_with_torch(rng):
    torch.manual_seed(0)
    ref = TorchWN(H, K, DIL_RATE, N_LAYERS, GIN)
    b, t = 2, 17
    x = rng.standard_normal((b, t, H)).astype(np.float32)
    g = rng.standard_normal((b, GIN)).astype(np.float32)
    lengths = np.array([17, 11])
    mask_np = (np.arange(t)[None, :] < lengths[:, None]).astype(np.float32)

    with torch.no_grad():
        out_ref = ref(
            torch.from_numpy(x.transpose(0, 2, 1)),
            torch.from_numpy(mask_np[:, None, :]),
            torch.from_numpy(g)[:, :, None],
        ).numpy().transpose(0, 2, 1)

    params = {"cond_layer": _conv_params(ref.cond)}
    for i in range(N_LAYERS):
        params[f"in_{i}"] = _conv_params(ref.in_layers[i])
        params[f"res_skip_{i}"] = _conv_params(ref.res_skip[i])

    wn = WN(H, K, DIL_RATE, N_LAYERS, gin_channels=GIN)
    ours = np.asarray(
        wn.apply({"params": params}, jnp.asarray(x), jnp.asarray(mask_np[:, :, None]),
                 g=jnp.asarray(g))
    )
    np.testing.assert_allclose(ours, out_ref, atol=3e-5)


def test_wn_respects_mask(rng):
    """Padding positions must not change unmasked outputs... they do feed
    through dilated convs in the reference too, so we check the weaker
    guarantee the reference provides: outputs at masked positions are 0."""
    wn = WN(H, K, DIL_RATE, N_LAYERS)
    x = jnp.asarray(rng.standard_normal((1, 12, H)).astype(np.float32))
    mask = jnp.ones((1, 12, 1)).at[:, 8:].set(0.0)
    params = wn.init(jax.random.PRNGKey(0), x, mask)
    out = wn.apply(params, x, mask)
    np.testing.assert_allclose(np.asarray(out[:, 8:]), 0.0, atol=1e-7)
