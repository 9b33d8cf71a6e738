"""SynthesizerSVC — the end-to-end voice-conversion generator.

Capability parity with
/root/reference/vits/model/synthesizers/synthesizer_svc.py:18-119:
forward (training: enc_p || enc_q -> flow -> nearest-interp prior -> random
segment -> decoder), infer (prior sample -> reverse flow -> decoder), and
the flow-swap any-to-any voice_conversion (:111-119) — here done right: the
in-repo decoder takes the target speaker embedding (the hub vocoder the
reference calls with g= is not speaker-conditioned; SURVEY.md §3.4).

TPU design: every method is one jit-able function with static shapes; the
nearest interpolation is a static gather index (no F.interpolate), segment
slicing is vmapped dynamic_slice, randomness is explicit PRNG keys.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vcvits_tpu.config import Config
from vcvits_tpu.models.content_encoder import HubertContentEncoder
from vcvits_tpu.models.flow import ResidualCouplingBlock
from vcvits_tpu.models.hifigan import HiFiGANGenerator
from vcvits_tpu.models.hubert import HUBERT_BASE, HUBERT_XTRALARGE, HubertConfig
from vcvits_tpu.models.layers import Dtype
from vcvits_tpu.models.posterior import PosteriorEncoder
from vcvits_tpu.utils.masking import rand_slice_segments, sequence_mask


def nearest_interp(x: jax.Array, t_out: int) -> jax.Array:
    """[B, T_in, C] -> [B, t_out, C], torch F.interpolate(mode='nearest')
    semantics: out[j] = in[floor(j * T_in / t_out)]."""
    t_in = x.shape[1]
    idx = (jnp.arange(t_out) * t_in // t_out).astype(jnp.int32)
    return x[:, idx, :]


def hubert_config_for(hubert_channels: int) -> HubertConfig:
    return HUBERT_XTRALARGE if hubert_channels == 1280 else HUBERT_BASE


class SynthesizerSVC(nn.Module):
    spec_channels: int
    segment_size: int  # in spec frames (train.segment_size // hop_length)
    inter_channels: int
    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int
    p_dropout: float
    resblock: str
    resblock_kernel_sizes: Tuple[int, ...]
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...]
    upsample_rates: Tuple[int, ...]
    upsample_initial_channel: int
    upsample_kernel_sizes: Tuple[int, ...]
    hubert_channels: int
    num_pitch: int
    n_speakers: int = 0
    gin_channels: int = 0
    hubert_cfg: Optional[HubertConfig] = None  # override (tests / custom sizes)
    # Inference-only fused Pallas kernels — both measured on a v5e and
    # defaulted OFF because XLA holds its own (ROADMAP item 4):
    # * pallas_flow (ops/flow_pallas.py): whole coupling reverse in one
    #   VMEM-resident kernel. Bit-exact on chip; timing tied the XLA path
    #   (30.9 vs 31.0 ms incl. tunnel sync) — XLA already pipelines the
    #   small sequential convs well.
    # * pallas_mrf (ops/mrf_pallas.py): per-stage fused MRF. Correct
    #   (1e-5) but SLOWER than the space-to-depth folded XLA path
    #   (62.0 vs 47.2 ms decoder fwd): sub-128-channel tiles waste lanes
    #   in-kernel, while the folded path keeps 128 lanes busy.
    # Both kernels stay available (flags + tests + tools/bench_{flow,mrf})
    # as the measured record and for future shapes where they may win.
    pallas_flow: bool = False
    pallas_mrf: bool = False
    # Dilation-phase-split folded decoder tail (hifigan.py phase_split):
    # grouped convs remove the dense folded kernel's dilated-tap
    # densification — exact, same checkpoint (tests/test_folded_conv.py).
    dec_phase_split: bool = False
    # int8 decoder convs (hifigan.py quant_int8), inference only (no VJP),
    # same checkpoint; parity gate tests/test_int8_decoder.py. True =
    # dynamic W8A8 (int8 MXU, measured 0.90-0.96x end-to-end — BENCH r4);
    # "w8" = weight-only int8, bf16 activations.
    dec_quant_int8: bool = False
    dtype: Dtype = jnp.float32

    @classmethod
    def from_config(cls, cfg: Config, dtype=jnp.float32) -> "SynthesizerSVC":
        m = cfg.model
        return cls(
            spec_channels=cfg.data.spec_channels,
            segment_size=cfg.train.segment_size // cfg.data.hop_length,
            inter_channels=m.inter_channels,
            hidden_channels=m.hidden_channels,
            filter_channels=m.filter_channels,
            n_heads=m.n_heads,
            n_layers=m.n_layers,
            kernel_size=m.kernel_size,
            p_dropout=m.p_dropout,
            resblock=m.resblock,
            resblock_kernel_sizes=m.resblock_kernel_sizes,
            resblock_dilation_sizes=m.resblock_dilation_sizes,
            upsample_rates=m.upsample_rates,
            upsample_initial_channel=m.upsample_initial_channel,
            upsample_kernel_sizes=m.upsample_kernel_sizes,
            hubert_channels=m.hubert_channels,
            num_pitch=m.num_pitch,
            n_speakers=cfg.data.n_speakers,
            gin_channels=m.gin_channels,
            dec_phase_split=m.dec_phase_split,
            dec_quant_int8=m.dec_quant_int8,
            dtype=dtype,
        )

    @property
    def resolved_hubert_cfg(self) -> HubertConfig:
        """The HuBERT architecture setup() actually builds into enc_p.

        Single source of truth for the explicit-override-or-derived rule —
        external callers that run the frozen backbone out-of-graph (e.g.
        train/step.py's share_frozen_hubert path) must use this so the
        shared features cannot drift from the model's own encoder."""
        return self.hubert_cfg or hubert_config_for(self.hubert_channels)

    def setup(self):
        self.enc_p = HubertContentEncoder(
            hubert_cfg=self.resolved_hubert_cfg,
            out_channels=self.inter_channels,
            hidden_channels=self.hidden_channels,
            filter_channels=self.filter_channels,
            n_heads=self.n_heads,
            n_layers=self.n_layers,
            kernel_size=self.kernel_size,
            p_dropout=self.p_dropout,
            num_pitch=self.num_pitch,
            dtype=self.dtype,
        )
        self.dec = HiFiGANGenerator(
            initial_channel=self.inter_channels,
            resblock=self.resblock,
            resblock_kernel_sizes=self.resblock_kernel_sizes,
            resblock_dilation_sizes=self.resblock_dilation_sizes,
            upsample_rates=self.upsample_rates,
            upsample_initial_channel=self.upsample_initial_channel,
            upsample_kernel_sizes=self.upsample_kernel_sizes,
            gin_channels=self.gin_channels,
            phase_split=self.dec_phase_split,
            quant_int8=self.dec_quant_int8,
            dtype=self.dtype,
        )
        self.enc_q = PosteriorEncoder(
            self.spec_channels, self.inter_channels, self.hidden_channels,
            5, 1, 16, gin_channels=self.gin_channels, dtype=self.dtype,
        )
        self.flow = ResidualCouplingBlock(
            self.inter_channels, self.hidden_channels, 5, 1, 4,
            gin_channels=self.gin_channels, dtype=self.dtype,
        )
        if self.n_speakers >= 1:
            self.emb_g = nn.Embed(self.n_speakers, self.gin_channels,
                                  dtype=self.dtype, name="emb_g")

    def _speaker(self, sid: Optional[jax.Array]) -> Optional[jax.Array]:
        if self.n_speakers >= 1 and sid is not None:
            return self.emb_g(sid)  # [B, gin]
        return None

    def _flow_reverse(self, z_p: jax.Array, y_mask: jax.Array,
                      g: Optional[jax.Array]) -> jax.Array:
        """Flow reverse: fused Pallas kernel on TPU, module path otherwise
        (and during init, where the module must create its params)."""
        if (self.pallas_flow and not self.is_initializing()
                and jax.devices()[0].platform == "tpu"):
            from vcvits_tpu.ops.flow_pallas import flow_reverse_fused

            return flow_reverse_fused(
                self.flow.variables["params"], z_p, y_mask, g=g
            ).astype(z_p.dtype)
        return self.flow(z_p, y_mask, g=g, reverse=True)

    def __call__(
        self,
        x_wav: jax.Array,
        x_wav_lengths: jax.Array,
        x_pitch: jax.Array,
        y_spec: jax.Array,
        y_spec_lengths: jax.Array,
        sid: Optional[jax.Array] = None,
        rng: Optional[jax.Array] = None,
        deterministic: bool = True,
        hubert_features: Optional[jax.Array] = None,
    ):
        """Training forward (synthesizer_svc.py:70-88). Returns
        (y_hat, ids_slice, x_mask, y_mask, (z, z_p, m_p, logs_p, m_q, logs_q)).
        `hubert_features` (preload path) skips the frozen HuBERT forward.
        """
        if rng is None:
            rng = self.make_rng("sample")
        r_post, r_slice = jax.random.split(rng)

        _, m_p, logs_p, x_mask = self.enc_p(
            x_wav, x_wav_lengths, x_pitch, deterministic=deterministic,
            hubert_features=hubert_features,
        )
        g = self._speaker(sid)
        z, m_q, logs_q, y_mask = self.enc_q(y_spec, y_spec_lengths, g=g, rng=r_post)
        z_p = self.flow(z, y_mask, g=g)

        t_spec = y_spec.shape[1]
        m_p = nearest_interp(m_p, t_spec)
        logs_p = nearest_interp(logs_p, t_spec)

        z_slice, ids_slice = rand_slice_segments(
            z, y_spec_lengths, self.segment_size, r_slice
        )
        o = self.dec(z_slice, g=g)
        return o, ids_slice, x_mask, y_mask, (z, z_p, m_p, logs_p, m_q, logs_q)

    def infer(
        self,
        x_wav: jax.Array,
        x_wav_lengths: jax.Array,
        x_pitch: jax.Array,
        sid: Optional[jax.Array] = None,
        noise_scale: float = 1.0,
        length_scale: float = (48000 / 512) / 16000,
        max_len: Optional[int] = None,
        rng: Optional[jax.Array] = None,
    ):
        """Inference (synthesizer_svc.py:90-109). Static output length
        t_out = round(T_wav * length_scale); per-row validity via y_mask."""
        if rng is None:
            rng = self.make_rng("sample")
        _, m_p, logs_p, x_mask = self.enc_p(x_wav, x_wav_lengths, x_pitch)
        g = self._speaker(sid)

        t_out = int(round(x_wav.shape[1] * length_scale))
        y_lengths = (x_wav_lengths.astype(jnp.float32) * length_scale).astype(jnp.int32)
        y_mask = sequence_mask(y_lengths, t_out).astype(m_p.dtype)

        m_p = nearest_interp(m_p, t_out)
        logs_p = nearest_interp(logs_p, t_out)

        eps = jax.random.normal(rng, m_p.shape, m_p.dtype)
        z_p = m_p + eps * jnp.exp(logs_p) * noise_scale
        z = self._flow_reverse(z_p, y_mask, g=g)
        z = z * y_mask
        if max_len is not None:
            z = z[:, :max_len]
            y_mask = y_mask[:, :max_len]
        o = self.dec(z, g=g, fused_mrf=self.pallas_mrf)
        return o, y_mask, (z, z_p, m_p, logs_p)

    def voice_conversion(
        self,
        y_spec: jax.Array,
        y_spec_lengths: jax.Array,
        sid_src: jax.Array,
        sid_tgt: jax.Array,
        rng: Optional[jax.Array] = None,
    ):
        """Any-to-any flow swap (synthesizer_svc.py:111-119), with the
        speaker-conditioned in-repo decoder."""
        assert self.n_speakers > 0, "voice_conversion requires speaker embeddings"
        if rng is None:
            rng = self.make_rng("sample")
        g_src = self.emb_g(sid_src)
        g_tgt = self.emb_g(sid_tgt)
        z, m_q, logs_q, y_mask = self.enc_q(y_spec, y_spec_lengths, g=g_src, rng=rng)
        z_p = self.flow(z, y_mask, g=g_src)
        z_hat = self._flow_reverse(z_p, y_mask, g=g_tgt)
        o_hat = self.dec(z_hat * y_mask, g=g_tgt, fused_mrf=self.pallas_mrf)
        return o_hat, y_mask, (z, z_p, z_hat)
