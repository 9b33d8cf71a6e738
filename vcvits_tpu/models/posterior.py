"""WaveNet posterior encoder q(z | y_spec, g).

Capability parity with
/root/reference/vits/model/encoders/posterior_encoder.py:9-39: 1x1 pre conv
-> 16-layer WN -> 1x1 proj -> (m, logs), reparameterized sample. The PRNG
is an explicit key (torch.randn_like at :38 becomes jax.random.normal).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vcvits_tpu.models.layers import Conv1d, Dtype
from vcvits_tpu.models.wavenet import WN
from vcvits_tpu.utils.masking import sequence_mask


class PosteriorEncoder(nn.Module):
    in_channels: int
    out_channels: int
    hidden_channels: int
    kernel_size: int = 5
    dilation_rate: int = 1
    n_layers: int = 16
    gin_channels: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        x_lengths: jax.Array,
        g: Optional[jax.Array] = None,
        rng: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
        """x: [B, T, spec_channels]; returns (z, m, logs, x_mask)."""
        x_mask = sequence_mask(x_lengths, x.shape[1]).astype(x.dtype)
        h = Conv1d(self.hidden_channels, 1, dtype=self.dtype, name="pre")(x) * x_mask
        h = WN(self.hidden_channels, self.kernel_size, self.dilation_rate,
               self.n_layers, gin_channels=self.gin_channels, dtype=self.dtype,
               name="enc")(h, x_mask, g=g)
        stats = Conv1d(self.out_channels * 2, 1, dtype=self.dtype, name="proj")(h) * x_mask
        m, logs = stats[..., : self.out_channels], stats[..., self.out_channels :]
        if rng is None:
            rng = self.make_rng("sample")
        eps = jax.random.normal(rng, m.shape, m.dtype)
        z = (m + eps * jnp.exp(logs)) * x_mask
        return z, m, logs, x_mask
