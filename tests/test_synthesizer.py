"""End-to-end SynthesizerSVC: train forward, infer, and voice conversion,
all jitted, on a tiny configuration (CPU-sized)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vcvits_tpu.models.hubert import HubertConfig
from vcvits_tpu.models.synthesizer import SynthesizerSVC, nearest_interp

TINY_HUBERT = HubertConfig(
    conv_layers=((16, 10, 5), (16, 8, 8), (16, 8, 8)),  # 320x downsample
    hidden_size=16, num_layers=1, num_heads=2, intermediate_size=32,
    pos_conv_kernel=8, pos_conv_groups=2,
)

HOP = 512
SEG_FRAMES = 4


@pytest.fixture(scope="module")
def model():
    return SynthesizerSVC(
        spec_channels=33,
        segment_size=SEG_FRAMES,
        inter_channels=8,
        hidden_channels=16,
        filter_channels=32,
        n_heads=2,
        n_layers=1,
        kernel_size=3,
        p_dropout=0.0,
        resblock="1",
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
        upsample_rates=(8, 8, 4, 2),
        upsample_initial_channel=32,
        upsample_kernel_sizes=(16, 16, 4, 4),
        hubert_channels=16,
        num_pitch=64,
        n_speakers=8,
        gin_channels=4,
        hubert_cfg=TINY_HUBERT,
    )


@pytest.fixture(scope="module")
def batch(model):
    g = np.random.default_rng(0)
    b, t_wav = 2, 6400  # 0.4 s @ 16 kHz
    t50 = t_wav // 320
    t_spec = t_wav * 3 // 512  # 48 kHz spec frames for same duration
    return {
        "x_wav": jnp.asarray(g.standard_normal((b, t_wav)).astype(np.float32) * 0.1),
        "x_wav_lengths": jnp.array([t_wav, t_wav - 1600]),
        "x_pitch": jnp.asarray(g.integers(1, 64, (b, t50))),
        "y_spec": jnp.asarray(np.abs(g.standard_normal((b, t_spec, 33))).astype(np.float32)),
        "y_spec_lengths": jnp.array([t_spec, t_spec - 19]),
        "sid": jnp.array([1, 5]),
    }


@pytest.fixture(scope="module")
def params(model, batch):
    return model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        batch["x_wav"], batch["x_wav_lengths"], batch["x_pitch"],
        batch["y_spec"], batch["y_spec_lengths"], batch["sid"],
    )


def test_nearest_interp_matches_torch_semantics():
    import torch

    x = np.arange(10, dtype=np.float32).reshape(1, 10, 1)
    for t_out in [3, 10, 17, 31]:
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(x.transpose(0, 2, 1)), size=t_out, mode="nearest"
        ).numpy().transpose(0, 2, 1)
        ours = np.asarray(nearest_interp(jnp.asarray(x), t_out))
        np.testing.assert_array_equal(ours, ref)


def test_train_forward_shapes(model, params, batch):
    fwd = jax.jit(
        lambda p, b, k: model.apply(
            p, b["x_wav"], b["x_wav_lengths"], b["x_pitch"],
            b["y_spec"], b["y_spec_lengths"], b["sid"], rng=k,
        )
    )
    o, ids, x_mask, y_mask, (z, z_p, m_p, logs_p, m_q, logs_q) = fwd(
        params, batch, jax.random.PRNGKey(2)
    )
    b, t_spec, _ = batch["y_spec"].shape
    assert o.shape == (b, SEG_FRAMES * 512, 1)  # segment * hop samples
    assert z.shape == z_p.shape == (b, t_spec, 8)
    assert m_p.shape == logs_p.shape == (b, t_spec, 8)  # interpolated to spec rate
    assert x_mask.shape == (b, 6400 // 320, 1)
    ids = np.asarray(ids)
    assert (ids >= 0).all()
    assert (ids + SEG_FRAMES <= np.asarray(batch["y_spec_lengths"])).all()


def test_infer_shapes_and_mask(model, params, batch):
    infer = jax.jit(
        lambda p, b, k: model.apply(
            p, b["x_wav"], b["x_wav_lengths"], b["x_pitch"], b["sid"],
            rng=k, method=SynthesizerSVC.infer,
        )
    )
    o, y_mask, (z, z_p, m_p, logs_p) = infer(params, batch, jax.random.PRNGKey(3))
    t_out = int(round(6400 * (48000 / 512) / 16000))
    assert o.shape == (2, t_out * 512, 1)
    assert np.abs(np.asarray(o)).max() <= 1.0
    # row 1 is shorter: mask reflects its scaled length
    expect_len1 = int((6400 - 1600) * (48000 / 512) / 16000)
    np.testing.assert_allclose(np.asarray(y_mask)[1].sum(), expect_len1, atol=1)


def test_voice_conversion_runs_and_differs_by_target(model, params, batch):
    vc = jax.jit(
        lambda p, spec, lens, s, t, k: model.apply(
            p, spec, lens, s, t, rng=k, method=SynthesizerSVC.voice_conversion,
        )
    )
    k = jax.random.PRNGKey(4)
    o1, _, _ = vc(params, batch["y_spec"], batch["y_spec_lengths"],
                  jnp.array([1, 1]), jnp.array([2, 2]), k)
    o2, _, _ = vc(params, batch["y_spec"], batch["y_spec_lengths"],
                  jnp.array([1, 1]), jnp.array([6, 6]), k)
    assert o1.shape[1] == batch["y_spec"].shape[1] * 512
    assert not np.allclose(np.asarray(o1), np.asarray(o2))
