"""TTSSynthesizer: checkpoint -> text -> waveform (the TTS inference surface).

The reference has no TTS inference entry point (broken path, SURVEY.md §2.5);
these tests pin this framework's text->wav surface end-to-end: raw Orbax
restore without an optimizer template, text bucketing to static shapes, and
valid-frame output trimming.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vcvits_tpu.config import Config

TINY = {
    "train": {"segment_size": 2048, "batch_size": 2, "fp16_run": False},
    "data": {"filter_length": 1024, "win_length": 1024, "hop_length": 512,
             "n_mel_channels": 8, "n_speakers": 4},
    "model": {
        "inter_channels": 8, "hidden_channels": 16, "filter_channels": 32,
        "n_heads": 2, "n_layers": 1, "kernel_size": 3, "p_dropout": 0.1,
        "num_pitch": 64, "gin_channels": 4, "upsample_initial_channel": 32,
        "resblock_kernel_sizes": [3], "resblock_dilation_sizes": [[1, 3]],
        "multi_period_discriminator_periods": [2, 3],
    },
}


@pytest.fixture(scope="module")
def tts_workdir(tmp_path_factory):
    """A TTS workdir as TTSTrainer would leave it: config.json + a ckpt."""
    from vcvits_tpu.train.checkpoint import CheckpointManager
    from vcvits_tpu.train.state import create_train_state
    from vcvits_tpu.train.tts_step import init_tts_params

    cfg = Config.from_dict(TINY)
    workdir = tmp_path_factory.mktemp("tts_logs")
    batch = {
        "text": jnp.zeros((2, 32), jnp.int32),
        "text_lengths": jnp.array([5, 7], jnp.int32),
        "y_wav": jnp.zeros((2, 8192), jnp.float32),
        "y_wav_lengths": jnp.array([8192, 4096], jnp.int32),
        "sid": jnp.array([0, 1], jnp.int32),
    }
    g_params, d_params = init_tts_params(cfg, jax.random.PRNGKey(0), batch)
    state = create_train_state(cfg, g_params, d_params, freeze_hubert=False)
    ckpt = CheckpointManager(os.path.join(workdir, "checkpoints"))
    ckpt.save(7, state)
    ckpt.wait()
    with open(os.path.join(workdir, "config.json"), "w") as f:
        json.dump(cfg.to_dict(), f)
    return str(workdir)


@pytest.fixture(scope="module")
def tts(tts_workdir):
    """ONE restored synthesizer shared by the module: from_checkpoint costs
    a restore + trace, and re-running it per test tripled this file's wall
    time (VERDICT r3 #10 — the fast tier's largest line item)."""
    from vcvits_tpu.infer_tts import TTSSynthesizer

    return TTSSynthesizer.from_checkpoint(tts_workdir, text_unit=16,
                                          frames_per_token=4)


def test_from_checkpoint_and_synthesize(tts, tmp_path):
    assert tts.cfg.model.hidden_channels == 16  # config.json was picked up
    wav = tts.synthesize("hello world", sid=1, seed=3)
    assert wav.dtype == np.float32 and wav.ndim == 1
    assert 0 < len(wav) <= 4 * 16 * tts.cfg.data.hop_length
    assert len(wav) % tts.cfg.data.hop_length == 0  # trimmed at frame edges
    assert np.isfinite(wav).all()

    out = tts.synthesize_to_file("hello again", str(tmp_path / "o.wav"), sid=0)
    from vcvits_tpu.utils.audio_io import read_wav

    data, sr = read_wav(out)
    assert sr == tts.cfg.data.target_sampling_rate and len(data) > 0


def test_text_bucketing_bounds_program_count(tts):
    """Same-bucket texts must reuse one compiled program (static shapes)."""
    sizes = set()
    for text in ("abc", "abcd efg", "hi"):
        seq = tts.encode_text(text)
        sizes.add(int(np.ceil(len(seq) / tts.text_unit) * tts.text_unit))
    assert sizes == {16}  # all three pad to the same 16-token bucket

    w1 = tts.synthesize("abc", seed=1)
    w2 = tts.synthesize("abc", seed=1)
    np.testing.assert_array_equal(w1, w2)  # deterministic per seed


def test_empty_text_raises(tts):
    with pytest.raises(ValueError):
        tts.encode_text("")  # cleans to nothing
