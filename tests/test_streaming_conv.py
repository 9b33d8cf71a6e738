"""Cached-conv-state streaming == offline, exactly.

The StreamingFlowDecoder (vcvits_tpu/streaming_conv.py) streams the flow
reverse + HiFi-GAN decoder with per-layer ring buffers. These tests assert
the concatenated streamed output equals the offline rendering to float
tolerance — boundary-free, no crossfading, no left-context recompute."""

from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vcvits_tpu.models.flow import ResidualCouplingBlock
from vcvits_tpu.models.hifigan import HiFiGANGenerator
from vcvits_tpu.streaming_conv import StreamingFlowDecoder

INTER, HIDDEN, GIN = 8, 16, 4
RATES, KS = (4, 2), (8, 4)
RES_K, RES_D = (3, 7), ((1, 3), (1, 5))
UP0 = 32


def _build(resblock="1", gin=GIN):
    model = SimpleNamespace(
        inter_channels=INTER, hidden_channels=HIDDEN, gin_channels=gin,
        resblock=resblock, resblock_kernel_sizes=RES_K,
        resblock_dilation_sizes=RES_D, upsample_rates=RATES,
        upsample_kernel_sizes=KS)
    flow = ResidualCouplingBlock(INTER, HIDDEN, 5, 1, 4, gin_channels=gin)
    dec = HiFiGANGenerator(
        initial_channel=INTER, resblock=resblock,
        resblock_kernel_sizes=RES_K, resblock_dilation_sizes=RES_D,
        upsample_rates=RATES, upsample_initial_channel=UP0,
        upsample_kernel_sizes=KS, gin_channels=gin, fold_tail=False)
    k = jax.random.PRNGKey(0)
    t = 16
    zp = jax.random.normal(jax.random.fold_in(k, 1), (1, t, INTER))
    mask = jnp.ones((1, t, 1))
    g = (jax.random.normal(jax.random.fold_in(k, 2), (1, gin))
         if gin else None)
    pf = flow.init(jax.random.fold_in(k, 3), zp, mask, g=g)["params"]
    pd = dec.init(jax.random.fold_in(k, 4),
                  jnp.zeros((1, t, INTER)), g=g)["params"]
    return model, flow, dec, pf, pd, g


def _offline(flow, dec, pf, pd, z_p, g):
    mask = jnp.ones((*z_p.shape[:2], 1), z_p.dtype)
    z = flow.apply({"params": pf}, z_p, mask, g=g, reverse=True)
    return np.asarray(dec.apply({"params": pd}, z * mask, g=g))[0, :, 0]


def _streamed(model, pf, pd, z_p, g, chunk_frames):
    sfd = StreamingFlowDecoder(model, {"flow": pf, "dec": pd}, chunk_frames)
    sfd.bind({"flow": pf, "dec": pd})
    state = sfd.init_state()
    t = z_p.shape[1]
    assert t % chunk_frames == 0
    pieces = []
    for i in range(t // chunk_frames):
        y, state = sfd.step(state, z_p[:, i * chunk_frames:(i + 1) * chunk_frames], g)
        pieces.append(np.asarray(y)[0, :, 0])
    zeros = jnp.zeros((1, chunk_frames, z_p.shape[-1]), z_p.dtype)
    for _ in range(sfd.flush_chunks()):
        y, state = sfd.step(state, zeros, g, total_frames=t)
        pieces.append(np.asarray(y)[0, :, 0])
    out = np.concatenate(pieces)
    return out[sfd.delay_samples:], sfd


@pytest.mark.parametrize(
    "chunk_frames",
    [pytest.param(4, marks=pytest.mark.slow), 16])  # 4 = 4x the steps: slow tier
def test_streamed_equals_offline(chunk_frames):
    model, flow, dec, pf, pd, g = _build()
    z_p = jax.random.normal(jax.random.PRNGKey(42), (1, 32, INTER))
    ref = _offline(flow, dec, pf, pd, z_p, g)
    got, sfd = _streamed(model, pf, pd, z_p, g, chunk_frames)
    n = len(ref)
    assert len(got) >= n
    np.testing.assert_allclose(got[:n], ref, atol=2e-5, rtol=1e-4)


@pytest.mark.slow  # variant coverage; the primary exactness gate runs fast
def test_streamed_resblock2_no_speaker():
    model, flow, dec, pf, pd, g = _build(resblock="2", gin=0)
    z_p = jax.random.normal(jax.random.PRNGKey(7), (1, 24, INTER))
    ref = _offline(flow, dec, pf, pd, z_p, None)
    got, _ = _streamed(model, pf, pd, z_p, None, 8)
    np.testing.assert_allclose(got[: len(ref)], ref, atol=2e-5, rtol=1e-4)


def test_state_is_static_and_small():
    """State buffers are fixed-size (ring buffers), independent of how much
    audio has streamed — the property that kills left-context recompute."""
    model, flow, dec, pf, pd, g = _build()
    sfd = StreamingFlowDecoder(model, {"flow": pf, "dec": pd}, 8)
    sfd.bind({"flow": pf, "dec": pd})
    state = sfd.init_state()
    sizes0 = {k: v.shape for k, v in state.items() if not k.startswith("__n")}
    z = jnp.ones((1, 8, INTER))
    for _ in range(5):
        _, state = sfd.step(state, z, g)
    sizes5 = {k: v.shape for k, v in state.items() if not k.startswith("__n")}
    assert sizes0 == sizes5
    assert int(state["__n"]) == 5
