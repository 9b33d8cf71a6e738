"""TTS GAN train step: runs jitted, finite metrics, params update."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vcvits_tpu.config import Config
from vcvits_tpu.train.state import create_train_state
from vcvits_tpu.train.tts_step import init_tts_params, make_tts_train_step

N_VOCAB = 40


@pytest.fixture(scope="module")
def cfg():
    return Config.from_dict({
        "train": {"segment_size": 2048, "batch_size": 2, "steps_per_epoch": 10, "disc_time_fold": False},
        "data": {"filter_length": 1024, "win_length": 1024, "hop_length": 512,
                 "n_mel_channels": 8, "n_speakers": 4},
        "model": {
            "inter_channels": 8, "hidden_channels": 16, "filter_channels": 32,
            "n_heads": 2, "n_layers": 1, "kernel_size": 3, "p_dropout": 0.1,
            "hubert_channels": 16, "num_pitch": 64, "gin_channels": 4,
            "upsample_initial_channel": 32,
            "resblock_kernel_sizes": [3], "resblock_dilation_sizes": [[1, 3]],
            "multi_period_discriminator_periods": [2, 3],
        },
    })


@pytest.mark.slow
def test_tts_train_step(cfg):
    g = np.random.default_rng(0)
    b, t_x, ty = 2, 10, 15360
    t_frames = ty // 512
    batch = {
        "text": jnp.asarray(g.integers(1, N_VOCAB, (b, t_x))),
        "text_lengths": jnp.array([10, 7]),
        "y_wav": jnp.asarray(g.standard_normal((b, ty)).astype(np.float32) * 0.1),
        "y_wav_lengths": jnp.array([ty, ty - 2048]),
        "pitch": jnp.asarray(np.abs(g.standard_normal((b, t_frames))).astype(np.float32)),
        "sid": jnp.array([0, 3]),
    }
    g_params, d_params = init_tts_params(cfg, jax.random.PRNGKey(0), batch,
                                         n_vocab=N_VOCAB)
    state = create_train_state(cfg, g_params, d_params, freeze_hubert=False)
    step = jax.jit(make_tts_train_step(cfg, n_vocab=N_VOCAB))
    state1, m1 = step(state, batch, jax.random.PRNGKey(1))
    state2, m2 = step(state1, batch, jax.random.PRNGKey(2))

    for k, v in m2.items():
        assert np.isfinite(np.asarray(v)).all(), f"{k}: {v}"
    assert int(state2.step) == 2
    moved = jax.tree.map(lambda a, b_: float(jnp.abs(a - b_).max()),
                         state.g_params, state1.g_params)
    assert max(jax.tree.leaves(moved)) > 0
    for key in ("loss/g/dur", "loss/g/pitch", "loss/g/energy"):
        assert key in m1
